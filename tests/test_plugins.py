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


def test_unknown_plugin_refused():
  """A model with an unregistered plugin fails loudly at load."""
  xml = """
  <mujoco>
    <extension><plugin plugin="mujoco.sensor.touch_grid">
      <instance name="tg">
        <config key="size" value="3 3"/>
        <config key="fov" value="45 45"/>
        <config key="gamma" value="0"/>
        <config key="nchannel" value="1"/>
      </instance>
    </plugin></extension>
    <worldbody>
      <body pos="0 0 0.5"><freejoint/>
        <geom type="sphere" size="0.1" mass="1"/>
        <site name="s" size="0.01"/>
      </body>
      <geom type="plane" size="2 2 0.1"/>
    </worldbody>
    <sensor>
      <plugin plugin="mujoco.sensor.touch_grid" instance="tg"
              objtype="site" objname="s"/>
    </sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match="plugin|sensor"):
    mi.put_model(mjm)
