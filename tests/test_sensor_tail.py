"""Sensor-tail differential tests: touch, rangefinder, geomdist family,
camera kinematics + projection (VERDICT item 6/camlight)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

SCENE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 .1"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" mass="1"/>
      <site name="tip" pos="0 0 -0.05" type="sphere" size="0.06"/>
      <site name="rf" pos="0 0 0" euler="180 0 0"/>
    </body>
    <body pos="0.5 0 0.2"><freejoint/>
      <geom name="box2" type="box" size="0.1 0.1 0.1" mass="0.5"/></body>
  </worldbody>
  <sensor>
    <touch site="tip"/>
    <rangefinder site="rf"/>
    <distance geom1="ball" geom2="box2" cutoff="3"/>
    <normal geom1="ball" geom2="box2" cutoff="3"/>
    <fromto geom1="ball" geom2="box2" cutoff="3"/>
  </sensor>
</mujoco>"""

CAMS = """
<mujoco>
  <worldbody>
    <body name="b" pos="0 0 0.5">
      <joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <site name="tip" pos="0.3 0 0"/>
      <camera name="fixedcam" pos="0.1 0.2 0.1" euler="30 0 0"/>
    </body>
    <camera name="track" mode="trackcom" target="b" pos="1 1 1"/>
    <camera name="tgt" mode="targetbody" target="b" pos="1.5 0 1"/>
    <camera name="proj" pos="0 -1.5 0.5" euler="90 0 0"
            resolution="640 480" fovy="45"/>
  </worldbody>
  <sensor><camprojection site="tip" camera="proj"/></sensor>
</mujoco>"""


def test_touch_rangefinder_geomdist():
  """Resting ball: touch = weight, rangefinder = height, geom distance
  triple matches mj_geomDistance."""
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.sensordata, mjd.sensordata, atol=1e-7)
  # physical sanity: touch reads the ball's weight
  assert abs(float(out.sensordata[0]) - 9.81) < 1e-6


def test_touch_zero_when_airborne():
  mjm = mujoco.MjModel.from_xml_string(SCENE)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  out = jax.jit(mi.forward)(m, d)
  assert float(out.sensordata[0]) == 0.0
  # rangefinder: own body excluded, so it sees the floor 0.5 below
  assert abs(float(out.sensordata[1]) - 0.5) < 1e-9


def test_camera_kinematics_and_projection():
  mjm = mujoco.MjModel.from_xml_string(CAMS)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = 0.4
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.cam_xpos, mjd.cam_xpos, atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(out.cam_xmat).reshape(-1, 9), mjd.cam_xmat, atol=1e-12)
  np.testing.assert_allclose(out.sensordata, mjd.sensordata, atol=1e-9)


def test_reference_sensor_corpus():
  """Reference mjx sensor test model matches C where shared."""
  import os
  path = "/root/reference/mjx/mujoco/mjx/test_data/sensor"
  if not os.path.isdir(path):
    pytest.skip("reference corpus not mounted")
  files = [f for f in os.listdir(path) if f.endswith(".xml")]
  assert files
  ran = 0
  for f in sorted(files):
    mjm = mujoco.MjModel.from_xml_path(os.path.join(path, f))
    try:
      m = mi.put_model(mjm)
    except NotImplementedError:
      continue  # model uses a feature outside our surface — guard fired
    mjd = mujoco.MjData(mjm)
    rng = np.random.RandomState(0)
    mjd.qpos[:] = mjm.qpos0 + 0.02 * rng.randn(mjm.nq)
    mjd.qvel[:] = 0.05 * rng.randn(mjm.nv)
    mujoco.mj_forward(mjm, mjd)
    d = mi.put_data(m, mjd)
    out = jax.jit(mi.forward)(m, d)
    np.testing.assert_allclose(
        out.sensordata, mjd.sensordata, atol=1e-6,
        err_msg=f"sensor corpus file {f}")
    ran += 1
  assert ran > 0, "no corpus file exercised"


def test_user_sensor_matches_mjcb_sensor():
  """USER sensors run a traceable callback at their declared stage (the
  mjcb_sensor analog, ref engine_callback.c / mjSENS_USER) and match the
  C engine running the identical callback."""
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1">
        <joint name="j0" type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
      </body>
    </worldbody>
    <sensor>
      <user dim="2" needstage="vel" datatype="real"/>
      <user dim="1" needstage="pos" datatype="real"/>
    </sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)

  def user_fn(m_, d_, sid):
    if sid == 0:
      return jnp.stack([d_.qvel[0], 3.0 * d_.qpos[0]])
    return 2.0 * d_.qpos[0:1]

  m = mi.put_model(mjm, user_sensor_fn=user_fn)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[0] = 0.4
  mjd.qvel[0] = -0.7

  def c_cb(cm, cd, stage):
    if stage == mujoco.mjtStage.mjSTAGE_POS:
      cd.sensordata[2] = 2.0 * cd.qpos[0]
    if stage == mujoco.mjtStage.mjSTAGE_VEL:
      cd.sensordata[0] = cd.qvel[0]
      cd.sensordata[1] = 3.0 * cd.qpos[0]

  mujoco.set_mjcb_sensor(c_cb)
  try:
    mujoco.mj_forward(mjm, mjd)
  finally:
    mujoco.set_mjcb_sensor(None)

  d = jax.jit(lambda dd: mi.forward(m, dd))(mi.put_data(m, mjd))
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             atol=1e-12)


def test_user_sensor_without_fn_refused():
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1"><joint type="hinge"/><geom type="sphere"
        size="0.05" mass="1"/></body>
    </worldbody>
    <sensor><user dim="1" needstage="pos" datatype="real"/></sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match="USER sensor"):
    mi.put_model(mjm)


def test_camera_frame_sensors_match_c():
  """Frame sensors attached to cameras (objtype CAMERA; ref
  get_xpos_xmat/get_xquat camera branches, engine_sensor.c:92/117)."""
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1">
        <joint name="j0" type="ball"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
        <camera name="cam" pos="0.1 0.05 0.2" euler="20 30 10"/>
      </body>
      <body pos="1 0 1">
        <joint type="hinge" axis="0 0 1"/>
        <geom type="sphere" size="0.05" mass="0.5"/>
        <camera name="cam2" pos="0 0 0.1"/>
      </body>
    </worldbody>
    <sensor>
      <framepos objtype="camera" objname="cam"/>
      <framequat objtype="camera" objname="cam"/>
      <framexaxis objtype="camera" objname="cam"/>
      <framelinvel objtype="camera" objname="cam"/>
      <frameangvel objtype="camera" objname="cam"/>
      <framelinacc objtype="camera" objname="cam"/>
      <framepos objtype="camera" objname="cam" reftype="camera"
                refname="cam2"/>
    </sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(3)
  quat = rng.randn(4); quat /= np.linalg.norm(quat)
  mjd.qpos[:4] = quat
  mjd.qpos[4] = 0.7
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = mi.put_model(mjm)
  d = jax.jit(lambda dd: mi.forward(m, dd))(mi.put_data(m, mjd))
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-9)
