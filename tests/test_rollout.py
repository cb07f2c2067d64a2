"""Tests: state-vector API, batched rollout, least squares.

Differential reference points: ``mj_getState``/``mj_setState`` (reference
``src/engine/engine_support.c:176/208``), the threaded batch rollout
(reference ``python/mujoco/rollout.py`` — semantics, not threading), and
``least_squares`` (reference ``python/mujoco/minimize.py:138``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu import opt
from mujoco_inversedynamicstest_tpu.models.types import StateFlag
from mujoco_inversedynamicstest_tpu.ops import support

from models import PENDULUM, ACTUATED


def _setup(xml, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


# ---------------------------------------------------------------------------
# state vector API vs mj_getState / mj_setState
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("spec", [
    StateFlag.FULLPHYSICS, StateFlag.INTEGRATION, StateFlag.PHYSICS,
])
def test_get_state_matches_c(spec):
  mjm, mjd, m, d = _setup(ACTUATED)
  rng = np.random.RandomState(1)
  mjd.ctrl[:] = rng.randn(mjm.nu)
  mjd.qfrc_applied[:] = rng.randn(mjm.nv)
  mjd.xfrc_applied[:] = rng.randn(mjm.nbody, 6)
  d = mi.put_data(m, mjd)

  assert support.state_size(m, spec) == mujoco.mj_stateSize(mjm, spec)
  ref = np.zeros(mujoco.mj_stateSize(mjm, spec))
  mujoco.mj_getState(mjm, mjd, ref, spec)
  ours = support.get_state(m, d, spec)
  np.testing.assert_allclose(ours, ref, atol=0)


def test_set_state_roundtrip():
  mjm, mjd, m, d = _setup(ACTUATED, seed=2)
  spec = StateFlag.INTEGRATION
  vec = support.get_state(m, d, spec)
  d2 = support.set_state(m, mi.make_data(m), vec, spec)
  np.testing.assert_allclose(d2.qpos, d.qpos)
  np.testing.assert_allclose(d2.qvel, d.qvel)
  np.testing.assert_allclose(d2.ctrl, d.ctrl)
  np.testing.assert_allclose(d2.xfrc_applied, d.xfrc_applied)
  np.testing.assert_allclose(float(d2.time), float(d.time))


# ---------------------------------------------------------------------------
# batched rollout vs serial C rollout
# ---------------------------------------------------------------------------


def test_rollout_matches_c_serial():
  mjm, mjd, m, d = _setup(ACTUATED)
  nbatch, nstep = 4, 25
  rng = np.random.RandomState(3)
  nfull = support.state_size(m, StateFlag.FULLPHYSICS)

  init = np.zeros((nbatch, nfull))
  ctrl = 0.3 * rng.randn(nbatch, nstep, mjm.nu)
  for b in range(nbatch):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
    mjd.qvel[:] = 0.1 * rng.randn(mjm.nv)
    mujoco.mj_getState(mjm, mjd, init[b], StateFlag.FULLPHYSICS)

  out = jax.jit(
      lambda s, c: opt.rollout(m, mi.make_data(m), s, c)
  )(jnp.asarray(init), jnp.asarray(ctrl))

  # serial reference rollouts
  for b in range(nbatch):
    mujoco.mj_resetData(mjm, mjd)
    mujoco.mj_setState(mjm, mjd, init[b], StateFlag.FULLPHYSICS)
    for t in range(nstep):
      mjd.ctrl[:] = ctrl[b, t]
      mujoco.mj_step(mjm, mjd)
      ref = np.zeros(nfull)
      mujoco.mj_getState(mjm, mjd, ref, StateFlag.FULLPHYSICS)
      np.testing.assert_allclose(
          out.state[b, t], ref, atol=1e-8,
          err_msg=f"batch {b} step {t}",
      )


def test_rollout_closed_loop_ctrl_fn_matches_c_callback():
  """In-step control hook (mjcb_control analog, engine_forward.c:1108).

  A PD feedback policy traced inside the ``lax.scan`` rollout must match
  the C engine running the identical policy via ``mjcb_control``.
  """
  mjm, mjd, m, d = _setup(ACTUATED)
  nstep = 25
  nfull = support.state_size(m, StateFlag.FULLPHYSICS)

  kp, kd = 2.0, 0.4
  trn_id = np.asarray(mjm.actuator_trnid[:, 0])
  qadr = np.asarray(mjm.jnt_qposadr[trn_id])
  vadr = np.asarray(mjm.jnt_dofadr[trn_id])

  def ctrl_fn(m_, d_):
    return -kp * d_.qpos[qadr] - kd * d_.qvel[vadr]

  init = np.zeros((1, nfull))
  mujoco.mj_getState(mjm, mjd, init[0], StateFlag.FULLPHYSICS)

  out = jax.jit(
      lambda s: opt.rollout(m, mi.make_data(m), s, nstep=nstep,
                            ctrl_fn=ctrl_fn)
  )(jnp.asarray(init))

  def c_callback(cm, cd):
    cd.ctrl[:] = -kp * np.asarray(cd.qpos)[qadr] - kd * np.asarray(
        cd.qvel)[vadr]

  mujoco.mj_resetData(mjm, mjd)
  mujoco.mj_setState(mjm, mjd, init[0], StateFlag.FULLPHYSICS)
  mujoco.set_mjcb_control(c_callback)
  try:
    for t in range(nstep):
      mujoco.mj_step(mjm, mjd)
      ref = np.zeros(nfull)
      mujoco.mj_getState(mjm, mjd, ref, StateFlag.FULLPHYSICS)
      np.testing.assert_allclose(
          out.state[0, t], ref, atol=1e-8, err_msg=f"step {t}")
  finally:
    mujoco.set_mjcb_control(None)


def test_rollout_no_control():
  mjm, mjd, m, d = _setup(PENDULUM)
  nfull = support.state_size(m, StateFlag.FULLPHYSICS)
  init = np.zeros((2, nfull))
  mujoco.mj_getState(mjm, mjd, init[0], StateFlag.FULLPHYSICS)
  init[1] = init[0]
  out = opt.rollout(m, mi.make_data(m), jnp.asarray(init), nstep=10)
  assert out.state.shape == (2, 10, nfull)
  np.testing.assert_allclose(out.state[0], out.state[1])


# ---------------------------------------------------------------------------
# least squares
# ---------------------------------------------------------------------------


def test_least_squares_rosenbrock():
  def residual(x):
    return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

  res = jax.jit(
      lambda x0: opt.least_squares(residual, x0, max_iter=100)
  )(jnp.asarray([-1.2, 1.0]))
  np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)


def test_least_squares_bounded():
  # quadratic with minimum outside the box
  a = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])
  target = jnp.asarray([2.0, -3.0])

  def residual(x):
    return a @ (x - target)

  lo = jnp.asarray([-1.0, -1.0])
  hi = jnp.asarray([1.0, 1.0])
  res = opt.least_squares(residual, jnp.zeros(2), bounds=(lo, hi))
  x = np.asarray(res.x)
  assert np.all(x >= -1 - 1e-9) and np.all(x <= 1 + 1e-9)
  # KKT check: projected gradient is zero at the constrained optimum
  g = np.asarray(jax.jacfwd(residual)(res.x).T @ residual(res.x))
  for i in range(2):
    if abs(x[i] - 1.0) < 1e-9:
      assert g[i] <= 1e-6
    elif abs(x[i] + 1.0) < 1e-9:
      assert g[i] >= -1e-6
    else:
      assert abs(g[i]) < 1e-6
