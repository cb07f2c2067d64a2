"""Engine-plugin hook tests: cable elasticity vs the C plugin.

The pip ``mujoco`` package ships the first-party plugin libraries, so the
C side of the differential runs the real ``mujoco.elasticity.cable``
(reference ``plugin/elasticity/cable.cc``); ours runs the registry port
(``plugins/cable.py``) inside the jitted pipeline.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _cable_xml(twist="4e6", bend="8e6", curve="s", count=9):
  return f"""
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <extension><plugin plugin="mujoco.elasticity.cable"/></extension>
    <worldbody>
      <composite type="cable" curve="{curve}" count="{count} 1 1" size="1"
                 offset="0 0 1" initial="none">
        <plugin plugin="mujoco.elasticity.cable">
          <config key="twist" value="{twist}"/>
          <config key="bend" value="{bend}"/>
        </plugin>
        <joint kind="main" damping="0.05"/>
        <geom type="capsule" size=".005" density="1000"/>
      </composite>
    </worldbody>
  </mujoco>
  """


def test_cable_passive_force_vs_c():
  """qfrc_passive matches the C plugin at bent configurations."""
  mjm = mujoco.MjModel.from_xml_string(_cable_xml())
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  fwd = jax.jit(lambda dd: mi.forward(m, dd))

  rng = np.random.RandomState(0)
  for trial in range(4):
    mujoco.mj_resetData(mjm, mjd)
    # bend the cable: random ball-joint rotations
    for j in range(mjm.njnt):
      if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
        adr = mjm.jnt_qposadr[j]
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        ang = 0.25 * rng.rand()
        mjd.qpos[adr:adr + 4] = np.concatenate(
            [[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    mjd.qvel[:] = 0.1 * rng.randn(mjm.nv)
    mujoco.mj_forward(mjm, mjd)

    d = mi.put_data(m, mjd)
    d = fwd(d)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-6,
        err_msg=f"trial {trial}")


def test_cable_rollout_vs_c():
  """A swinging cable tracks the C engine through a 100-step rollout."""
  mjm = mujoco.MjModel.from_xml_string(_cable_xml())
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)

  @jax.jit
  def roll(dd):
    def body(dd, _):
      return mi.step(m, dd), ()
    dd, _ = jax.lax.scan(body, dd, None, length=100)
    return dd

  d = roll(mi.make_data(m))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-5)


def _pid_xml(kp="40", ki="", kd="", imax="", slewmax="", actdim=0):
  cfg = "".join(
      f'<config key="{k}" value="{v}"/>'
      for k, v in (("kp", kp), ("ki", ki), ("kd", kd), ("imax", imax),
                   ("slewmax", slewmax)) if v)
  dim = f' actdim="{actdim}"' if actdim else ""
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    <extension><plugin plugin="mujoco.pid">
      <instance name="pid0">{cfg}</instance>
    </plugin></extension>
    <worldbody>
      <body pos="0 0 1">
        <joint name="j" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.5"/>
      </body>
    </worldbody>
    <actuator>
      <plugin plugin="mujoco.pid" instance="pid0" joint="j"{dim}/>
    </actuator>
  </mujoco>
  """


@pytest.mark.parametrize("cfg", [
    dict(kp="40", kd="2"),
    dict(kp="25", ki="30", imax="5", actdim=1),
    dict(kp="30", ki="20", kd="1", imax="4", slewmax="8", actdim=2),
])
def test_pid_rollout_vs_c(cfg):
  """PID actuator (P/PI/PID+slew) tracks the C plugin over a rollout."""
  mjm = mujoco.MjModel.from_xml_string(_pid_xml(**cfg))
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  rng = np.random.RandomState(0)
  for t in range(150):
    u = 0.8 * np.sin(0.05 * t) + 0.1 * rng.randn()
    mjd.ctrl[0] = u
    d = d.replace(ctrl=jnp.asarray([u], d.ctrl.dtype))
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)
  if m.na:
    np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-8)


def _touch_grid_xml(size="3 3", fov="60 60", gamma="0", nchannel="1",
                    drop=0.06):
  return f"""
  <mujoco>
    <option timestep="0.002"/>
    <extension><plugin plugin="mujoco.sensor.touch_grid">
      <instance name="tg">
        <config key="size" value="{size}"/>
        <config key="fov" value="{fov}"/>
        <config key="gamma" value="{gamma}"/>
        <config key="nchannel" value="{nchannel}"/>
      </instance>
    </plugin></extension>
    <worldbody>
      <body pos="0.01 -0.02 {0.1 - drop}">
        <joint type="slide" axis="0 0 1" damping="1"/>
        <joint type="slide" axis="1 0 0" damping="1"/>
        <geom type="sphere" size="0.1" mass="1" friction="0.8"/>
        <site name="s" pos="0 0 -0.02" size="0.01"/>
      </body>
      <geom type="plane" size="2 2 0.1"/>
    </worldbody>
    <sensor>
      <plugin plugin="mujoco.sensor.touch_grid" instance="tg"
              objtype="site" objname="s"/>
    </sensor>
  </mujoco>
  """


@pytest.mark.parametrize("cfg", [
    dict(size="3 3", nchannel="1"),
    dict(size="7 5", fov="45 30", nchannel="3"),
    dict(size="5 5", gamma="0.7", nchannel="6"),
])
def test_touch_grid_vs_c(cfg):
  """Taxel histogram matches the C plugin on a pressed sphere."""
  xml = _touch_grid_xml(**cfg)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon > 0

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  assert np.abs(mjd.sensordata).max() > 0, "degenerate test: no reading"
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-6)


def _shell_xml(face="", count="6 6 1", young="3e3", poisson="0.2",
               thickness="0.02"):
  face_cfg = f'<config key="face" value="{face}"/>' if face else ""
  return f"""
  <mujoco>
    <option timestep="0.002" gravity="0 0 -9.81"/>
    <extension><plugin plugin="mujoco.elasticity.shell"/></extension>
    <worldbody>
      <flexcomp type="grid" count="{count}" spacing="0.1 0.1 0.1"
                radius=".01" name="sheet" dim="2" mass="0.5">
        <contact internal="false" selfcollide="none"/>
        <plugin plugin="mujoco.elasticity.shell">
          <config key="poisson" value="{poisson}"/>
          <config key="young" value="{young}"/>
          <config key="thickness" value="{thickness}"/>
          {face_cfg}
        </plugin>
      </flexcomp>
    </worldbody>
  </mujoco>
  """


@pytest.fixture(scope="module")
def shell_c_plugin():
  """Builds the reference shell plugin (not shipped in the pip wheel)
  against the pip headers and loads it into the C engine, enabling a true
  differential test.  Skips if the toolchain or sources are absent."""
  import ctypes
  import glob
  import os
  import subprocess
  import tempfile

  ref = "/root/reference/plugin/elasticity"
  inc = os.path.join(os.path.dirname(mujoco.__file__), "include")
  if not (os.path.isdir(ref) and os.path.isdir(inc)):
    pytest.skip("reference plugin sources or mujoco headers unavailable")

  build = tempfile.mkdtemp(prefix="shellplugin")
  os.makedirs(os.path.join(build, "shim", "mujoco"), exist_ok=True)
  with open(os.path.join(build, "shim", "mujoco", "mjtnum.h"), "w") as f:
    f.write("#include <mujoco/mjtype.h>\n")  # renamed after 3.3
  with open(os.path.join(build, "reg.cc"), "w") as f:
    f.write(
        '#include <mujoco/mjplugin.h>\n#include "shell.h"\n'
        "namespace mujoco::plugin::elasticity {\n"
        "mjPLUGIN_LIB_INIT(shell) { Shell::RegisterPlugin(); }\n}\n")
  lib = os.path.join(build, "libshell_plugin.so")
  cmd = ["g++", "-shared", "-fPIC", "-O2", "-std=c++17",
         "-I" + os.path.join(build, "shim"), "-I" + inc, "-I" + ref,
         os.path.join(ref, "shell.cc"), os.path.join(ref, "elasticity.cc"),
         os.path.join(build, "reg.cc"), "-o", lib]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
  except Exception as e:
    pytest.skip(f"cannot build reference shell plugin: {e}")
  libmj = glob.glob(
      os.path.join(os.path.dirname(mujoco.__file__), "libmujoco.so*"))[0]
  ctypes.CDLL(libmj, mode=ctypes.RTLD_GLOBAL)
  mujoco.mj_loadPluginLibrary(lib)
  return lib


def _shell_face_string(mjm):
  """Triangle list of the compiled flex, as the body-relative vertex-id
  string the 3.3.1-era plugin consumed via its 'face' config."""
  f = 0
  va, vn = int(mjm.flex_vertadr[f]), int(mjm.flex_vertnum[f])
  vb = np.asarray(mjm.flex_vertbodyid[va:va + vn])
  i0 = int(vb.min())
  ea, en = int(mjm.flex_elemdataadr[f]), int(mjm.flex_elemnum[f])
  elem = np.asarray(mjm.flex_elem[ea:ea + 3 * en]).reshape(en, 3)
  return " ".join(str(int(v)) for v in (vb[elem] - i0).ravel())


def test_shell_passive_force_vs_c(shell_c_plugin):
  """Thin-shell bending qfrc_passive matches the C plugin at deformed
  configurations.

  The pip-3.10 compiler no longer forwards face/edge configs to the
  plugin, so the face table is passed explicitly (read from a first
  compile) — the C plugin and the port then act on identical stencils.
  """
  mjm0 = mujoco.MjModel.from_xml_string(_shell_xml())
  xml = _shell_xml(face=_shell_face_string(mjm0))
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  fwd = jax.jit(lambda dd: mi.forward(m, dd))

  rng = np.random.RandomState(0)
  for trial in range(4):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = mjm.qpos0 + 0.02 * rng.randn(mjm.nq)
    mjd.qvel[:] = 0.05 * rng.randn(mjm.nv)
    mujoco.mj_forward(mjm, mjd)
    assert np.abs(mjd.qfrc_passive).max() > 0

    d = mi.put_data(m, mjd)
    d = fwd(d)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-6,
        err_msg=f"trial {trial}")


def test_shell_rollout_vs_c(shell_c_plugin):
  """A deforming shell tracks the C engine through a 50-step rollout."""
  mjm0 = mujoco.MjModel.from_xml_string(_shell_xml())
  xml = _shell_xml(face=_shell_face_string(mjm0))
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(1)
  v0 = 0.05 * rng.randn(mjm.nv)
  mjd.qvel[:] = v0
  m = mi.put_model(mjm)
  d0 = mi.make_data(m)
  d = d0.replace(qvel=jnp.asarray(v0, d0.qvel.dtype))

  @jax.jit
  def roll(dd):
    def body(dd, _):
      return mi.step(m, dd), ()
    dd, _ = jax.lax.scan(body, dd, None, length=50)
    return dd

  d = roll(d)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-5)


def test_shell_flex_derived_face_matches_explicit():
  """With no face config (the 3.10 compiler's behavior) the port derives
  the stencils from the flex element table — identical forces to the
  explicit-face path."""
  mjm_empty = mujoco.MjModel.from_xml_string(_shell_xml())
  face = _shell_face_string(mjm_empty)
  mjm_face = mujoco.MjModel.from_xml_string(_shell_xml(face=face))

  m_e = mi.put_model(mjm_empty)
  m_f = mi.put_model(mjm_face)
  rng = np.random.RandomState(2)
  mjd = mujoco.MjData(mjm_empty)
  mjd.qpos[:] = mjm_empty.qpos0 + 0.02 * rng.randn(mjm_empty.nq)
  mujoco.mj_kinematics(mjm_empty, mjd)

  d_e = jax.jit(lambda dd: mi.forward(m_e, dd))(mi.put_data(m_e, mjd))
  d_f = jax.jit(lambda dd: mi.forward(m_f, dd))(mi.put_data(m_f, mjd))
  qf_e = np.asarray(d_e.qfrc_passive)
  assert np.abs(qf_e).max() > 0
  np.testing.assert_allclose(qf_e, np.asarray(d_f.qfrc_passive), atol=1e-12)


def test_unknown_plugin_refused():
  """A model with an unregistered plugin fails loudly at load."""
  from mujoco_inversedynamicstest_tpu.plugins import registry

  xml = _touch_grid_xml()
  mjm = mujoco.MjModel.from_xml_string(xml)
  saved = registry._REGISTRY.pop("mujoco.sensor.touch_grid")
  try:
    with pytest.raises(NotImplementedError, match="plugin|sensor"):
      mi.put_model(mjm)
  finally:
    registry._REGISTRY["mujoco.sensor.touch_grid"] = saved


def test_plugin_sensor_without_hook_refused():
  """A registered plugin that lacks the sensor hook cannot back a PLUGIN
  sensor (loud refusal, not silent zeros)."""
  from mujoco_inversedynamicstest_tpu.plugins import registry

  class NoSensor(registry.PluginInstance):
    def __init__(self, mjm, instance, dtype):
      pass

  xml = _touch_grid_xml()
  mjm = mujoco.MjModel.from_xml_string(xml)
  saved = registry._REGISTRY["mujoco.sensor.touch_grid"]
  registry._REGISTRY["mujoco.sensor.touch_grid"] = (
      lambda mjm_, i, dt: NoSensor(mjm_, i, dt))
  try:
    with pytest.raises(NotImplementedError, match="sensor hook"):
      mi.put_model(mjm)
  finally:
    registry._REGISTRY["mujoco.sensor.touch_grid"] = saved
