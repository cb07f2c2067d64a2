"""Differential tests: constraints (equality/limits/friction) + solvers.

The slider_crank connect-equality model is BASELINE config #1 (the
single-step inverse-dynamics check, reference
``model/slider_crank/slider_crank.xml`` analog built from scratch here).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

from models import ALL_CONSTRAINED


def _setup(xml, seed=0, solver=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  if solver is not None:
    mjm.opt.solver = solver
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.3 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.6 * rng.randn(mjm.nv)
  if mjm.nu:
    mjd.ctrl[:] = rng.randn(mjm.nu)
  mjd.qfrc_applied[:] = 0.1 * rng.randn(mjm.nv)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


def _active_row_map(mjm, mjd, m, d_out):
  """Maps our static rows onto the C engine's dynamically-packed rows.

  Returns (ours_idx, ref_idx) pairs for rows active on both sides.
  """
  ours_active = np.array(d_out.efc_active)
  ours_idx = np.nonzero(ours_active)[0]
  assert len(ours_idx) == mjd.nefc, (
      f"active rows {len(ours_idx)} != C nefc {mjd.nefc}"
  )
  return ours_idx


@pytest.mark.parametrize("name", sorted(ALL_CONSTRAINED))
def test_constraint_rows(name):
  """efc row data matches the C engine row-by-row (active rows)."""
  mjm, mjd, m, d = _setup(ALL_CONSTRAINED[name])
  mujoco.mj_forward(mjm, mjd)

  d_out = jax.jit(lambda m, d: mi.fwd_velocity(m, mi.fwd_position(m, d)))(
      m, d
  )
  ours_idx = _active_row_map(mjm, mjd, m, d_out)

  if mujoco.mj_isSparse(mjm):
    efc_j_ref = np.zeros((mjd.nefc, mjm.nv))
    mujoco.mju_sparse2dense(
        efc_j_ref, mjd.efc_J, mjd.efc_J_rownnz, mjd.efc_J_rowadr,
        mjd.efc_J_colind,
    )
  else:
    efc_j_ref = mjd.efc_J.reshape(mjd.nefc, mjm.nv).copy()
  np.testing.assert_allclose(
      np.array(d_out.efc_J)[ours_idx], efc_j_ref, atol=1e-10
  )
  np.testing.assert_allclose(
      np.array(d_out.efc_pos)[ours_idx], mjd.efc_pos, atol=1e-10
  )
  np.testing.assert_allclose(
      np.array(d_out.efc_D)[ours_idx], mjd.efc_D, atol=1e-7, rtol=1e-9
  )
  np.testing.assert_allclose(
      np.array(d_out.efc_aref)[ours_idx], mjd.efc_aref, atol=1e-9
  )


@pytest.mark.parametrize("name", sorted(ALL_CONSTRAINED))
@pytest.mark.parametrize("solver", ["newton", "cg"])
def test_forward_constrained(name, solver):
  sol = {"newton": mujoco.mjtSolver.mjSOL_NEWTON,
         "cg": mujoco.mjtSolver.mjSOL_CG}[solver]
  mjm, mjd, m, d = _setup(ALL_CONSTRAINED[name], solver=sol)
  mujoco.mj_forward(mjm, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=5e-6)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=5e-6
  )


@pytest.mark.parametrize("name", sorted(ALL_CONSTRAINED))
def test_step_constrained(name):
  mjm, mjd, m, d = _setup(ALL_CONSTRAINED[name])
  step = jax.jit(mi.step)
  for _ in range(20):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-5)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-4)


@pytest.mark.parametrize("name", sorted(ALL_CONSTRAINED))
@pytest.mark.parametrize("seed", [0, 3])
def test_inverse_constrained(name, seed):
  """Inverse dynamics with constraint forces matches mj_inverse."""
  mjm, mjd, m, d = _setup(ALL_CONSTRAINED[name], seed)
  rng = np.random.RandomState(seed + 50)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(mi.inverse)(m, d)
  np.testing.assert_allclose(out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-8)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-8
  )


def test_slider_crank_fwdinv():
  """BASELINE config #1: slider_crank forward/inverse consistency.

  The fork's harness randomizes qfrc_applied/xfrc_applied/ctrl and checks
  |qforce - qfrc_inverse| (reference src/inverse/inverse_test.cpp:120-125,
  tolerance 1e-6).
  """
  mjm, mjd, m, d = _setup(ALL_CONSTRAINED["slider_crank"], seed=5)
  rng = np.random.RandomState(11)

  def fn(m, d):
    d = mi.forward(m, d)
    return mi.compare_fwd_inv(m, d)

  fn = jax.jit(fn)
  step = jax.jit(mi.step)
  for i in range(10):
    qfrc = 0.3 * rng.randn(mjm.nv)
    xfrc = 0.3 * rng.randn(mjm.nbody, 6)
    d = d.replace(
        qfrc_applied=jnp.asarray(qfrc), xfrc_applied=jnp.asarray(xfrc)
    )
    out = fn(m, d)
    fwdinv = np.array(out.solver_fwdinv)
    assert fwdinv[1] < 1e-6, (i, fwdinv)
    d = step(m, d)
    assert not np.any(np.isnan(np.array(d.qpos)))
