"""Spatial tendons + muscle actuators — differential tests vs C MuJoCo.

Model: the reference's own arm26 (2-link 6-muscle arm,
``/root/reference/model/tendon_arm/arm26.xml``), which exercises spatial
tendons with cylinder wrapping, sidesites, multi-branch paths, muscle
gain/bias/activation dynamics, and tendon transmission — the tendon_arm
config of the escalating benchmark suite (BASELINE.md).
"""

import os

import jax
import numpy as np
import pytest

import mujoco

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops import forward as fwd
from mujoco_inversedynamicstest_tpu.ops import smooth
from mujoco_inversedynamicstest_tpu.ops import wrap as wrap_mod

ARM26 = "/root/reference/model/tendon_arm/arm26.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ARM26), reason="reference arm26 model not available"
)


@pytest.fixture(scope="module")
def arm26():
  mjm = mujoco.MjModel.from_xml_path(ARM26)
  m = mi.put_model(mjm)
  return mjm, m


@pytest.mark.parametrize(
    "qpos", [(0.0, 0.0), (0.6, 0.9), (1.2, 0.3), (0.1, 2.0), (2.0, 0.05)]
)
def test_tendon_length_matches_c(arm26, qpos):
  mjm, m = arm26
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = qpos
  mujoco.mj_forward(mjm, mjd)

  d = mi.make_data(m).replace(qpos=np.array(qpos, dtype=np.float64))
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)
  np.testing.assert_allclose(
      np.asarray(d.ten_length), mjd.ten_length, atol=1e-12
  )


def test_tendon_moment_matches_fd(arm26):
  """ten_J rows equal d(ten_length)/d(qpos) by central differences."""
  mjm, m = arm26
  q0 = np.array([0.7, 1.1])

  def lengths(q):
    d = mi.make_data(m).replace(qpos=q)
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.tendon(m, d)
    return d.ten_length

  d = mi.make_data(m).replace(qpos=q0)
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.tendon(m, d)

  eps = 1e-6
  for k in range(m.nv):
    dq = np.zeros(m.nv)
    dq[k] = eps
    fd = (np.asarray(lengths(q0 + dq)) - np.asarray(lengths(q0 - dq))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.asarray(d.ten_J)[:, k], fd, atol=1e-6)


def test_muscle_forward_matches_c(arm26):
  mjm, m = arm26
  rng = np.random.RandomState(3)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.5, 1.0]
  mjd.qvel[:] = 0.4 * rng.randn(2)
  mjd.ctrl[:] = rng.rand(mjm.nu)
  mjd.act[:] = rng.rand(mjm.na)
  mujoco.mj_forward(mjm, mjd)

  d = mi.make_data(m).replace(
      qpos=mjd.qpos.copy(), qvel=mjd.qvel.copy(),
      ctrl=mjd.ctrl.copy(), act=mjd.act.copy(),
  )
  d = jax.jit(lambda d: fwd.forward(m, d))(d)

  np.testing.assert_allclose(
      np.asarray(d.actuator_force), mjd.actuator_force, atol=1e-10
  )
  np.testing.assert_allclose(np.asarray(d.act_dot), mjd.act_dot, atol=1e-10)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_actuator), mjd.qfrc_actuator, atol=1e-10
  )
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-7)


def test_arm26_step_trajectory_matches_c(arm26):
  """50 Euler steps with constant excitation track the C engine."""
  mjm, m = arm26
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = [0.4, 0.8]
  ctrl = np.array([0.8, 0.1, 0.6, 0.2, 0.3, 0.7])
  mjd.ctrl[:] = ctrl

  d = mi.make_data(m).replace(qpos=mjd.qpos.copy(), ctrl=ctrl.copy())
  step = jax.jit(lambda d: mi.step(m, d))
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-6)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-5)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-8)


_WRAP_XML = """
<mujoco>
  <option>
    <flag contact="disable" gravity="disable"/>
  </option>
  <worldbody>
    <geom name="wrapgeom" type="{gtype}" size="0.15 0.4" contype="0"
          conaffinity="0"/>
    <site name="side" pos="0 -0.4 0" size="0.01"/>
    <body name="a" pos="-0.5 0.3 0.05">
      <joint type="free"/>
      <geom type="sphere" size="0.02" mass="0.1"/>
      <site name="s0" size="0.01"/>
    </body>
    <body name="b" pos="0.5 0.3 -0.05">
      <joint type="free"/>
      <geom type="sphere" size="0.02" mass="0.1"/>
      <site name="s1" size="0.01"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="t0">
      <site site="s0"/>
      <geom geom="wrapgeom" {side}/>
      <site site="s1"/>
    </spatial>
  </tendon>
</mujoco>
"""


@pytest.mark.parametrize("gtype", ["sphere", "cylinder"])
@pytest.mark.parametrize("use_side", [False, True])
def test_wrap_randomized_matches_c(gtype, use_side):
  """Wrap length agrees with the C engine across random endpoint poses.

  Two free bodies carry the tendon end sites; randomizing their positions
  sweeps wrap / no-wrap / sidesite configurations of ``mju_wrap``
  (reference ``engine_util_misc.c:284``).
  """
  xml = _WRAP_XML.format(
      gtype=gtype, side='sidesite="side"' if use_side else ""
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  mjd = mujoco.MjData(mjm)

  rng = np.random.RandomState(7)
  n_wrapped = 0
  for _ in range(40):
    qpos = np.array(mjm.qpos0)
    qpos[0:3] = np.array([-0.5, 0.3, 0.05]) + 0.4 * rng.randn(3)
    qpos[7:10] = np.array([0.5, 0.3, -0.05]) + 0.4 * rng.randn(3)
    # keep endpoints outside the wrap geom
    for off in (0, 7):
      while np.linalg.norm(qpos[off:off + 3]) < 0.2:
        qpos[off:off + 3] *= 1.5
    mjd.qpos[:] = qpos
    mujoco.mj_forward(mjm, mjd)

    d = mi.make_data(m).replace(qpos=jax.numpy.asarray(qpos))
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.tendon(m, d)
    np.testing.assert_allclose(
        float(d.ten_length[0]), float(mjd.ten_length[0]), atol=1e-9
    )
    straight = np.linalg.norm(mjd.site_xpos[1] - mjd.site_xpos[0])
    if mjd.ten_length[0] > straight + 1e-9:
      n_wrapped += 1
  assert n_wrapped >= 5  # the sweep must actually exercise wrapping
