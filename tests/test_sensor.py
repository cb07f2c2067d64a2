"""Differential tests: sensors + energy vs the C engine."""

import jax
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

SENSOR_RICH = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body name="base" pos="0 0 0.5">
      <freejoint/>
      <geom type="box" size="0.05 0.04 0.03" mass="0.5"/>
      <site name="imu" pos="0.02 0.01 0.03" quat="0.95 0.2 0.1 0.2"/>
      <body name="arm" pos="0.06 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.015" fromto="0 0 0 0.15 0 0" mass="0.2"/>
        <site name="tip" pos="0.15 0 0"/>
        <body name="wrist" pos="0.15 0 0">
          <joint name="ball" type="ball" damping="0.01"/>
          <geom type="sphere" size="0.03" mass="0.1"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="ten">
      <joint joint="elbow" coef="0.7"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="m0" joint="elbow" gear="1.2"/>
    <position name="p0" joint="elbow" kp="4"/>
  </actuator>
  <sensor>
    <jointpos joint="elbow"/>
    <jointvel joint="elbow"/>
    <ballquat joint="ball"/>
    <ballangvel joint="ball"/>
    <tendonpos tendon="ten"/>
    <tendonvel tendon="ten"/>
    <actuatorpos actuator="m0"/>
    <actuatorvel actuator="m0"/>
    <actuatorfrc actuator="m0"/>
    <jointactuatorfrc joint="elbow"/>
    <framepos objtype="site" objname="tip"/>
    <framepos objtype="body" objname="wrist" reftype="site" refname="imu"/>
    <framequat objtype="xbody" objname="arm"/>
    <framequat objtype="site" objname="tip" reftype="body" refname="base"/>
    <framexaxis objtype="site" objname="tip"/>
    <framezaxis objtype="geom" objname="floor" reftype="site" refname="imu"/>
    <framelinvel objtype="site" objname="tip"/>
    <frameangvel objtype="body" objname="wrist"/>
    <framelinvel objtype="site" objname="tip" reftype="site" refname="imu"/>
    <framelinacc objtype="site" objname="tip"/>
    <frameangacc objtype="body" objname="wrist"/>
    <subtreecom body="base"/>
    <subtreelinvel body="base"/>
    <subtreeangmom body="base"/>
    <velocimeter site="imu"/>
    <gyro site="imu"/>
    <accelerometer site="imu"/>
    <force site="imu"/>
    <torque site="imu"/>
    <magnetometer site="imu"/>
    <clock/>
    <e_potential/>
    <e_kinetic/>
    <jointlimitpos joint="elbow"/>
    <jointlimitvel joint="elbow"/>
    <jointlimitfrc joint="elbow"/>
  </sensor>
</mujoco>
""".replace(
    '<joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"/>',
    '<joint name="elbow" type="hinge" axis="0 1 0" damping="0.05"'
    ' range="-50 50" limited="true"/>',
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sensors(seed):
  mjm = mujoco.MjModel.from_xml_string(SENSOR_RICH)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.2 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.4 * rng.randn(mjm.nv)
  mjd.ctrl[:] = rng.randn(mjm.nu)
  mjd.xfrc_applied[:] = 0.2 * rng.randn(mjm.nbody, 6)
  mujoco.mj_forward(mjm, mjd)

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)

  ours = np.array(out.sensordata)
  for i in range(mjm.nsensor):
    adr, dim = mjm.sensor_adr[i], mjm.sensor_dim[i]
    name = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_SENSOR, i) or str(i)
    np.testing.assert_allclose(
        ours[adr:adr + dim], mjd.sensordata[adr:adr + dim], atol=1e-8,
        err_msg=f"sensor {i} ({mjm.sensor_type[i]})",
    )


def test_energy():
  mjm = mujoco.MjModel.from_xml_string(SENSOR_RICH)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_ENERGY
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(3)
  mjd.qpos[:] = mjm.qpos0 + 0.2 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.4 * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  d = jax.jit(mi.fwd_position)(m, d)
  d = jax.jit(mi.fwd_velocity)(m, d)
  from mujoco_inversedynamicstest_tpu.ops import sensor as sensor_mod
  epot = float(sensor_mod.energy_pos(m, d))
  ekin = float(sensor_mod.energy_vel(m, d))
  np.testing.assert_allclose(epot, mjd.energy[0], atol=1e-10)
  np.testing.assert_allclose(ekin, mjd.energy[1], atol=1e-10)
