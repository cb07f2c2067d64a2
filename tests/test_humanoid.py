"""Humanoid (the reference's flagship benchmark model) differential tests.

Model loaded from the reference tree at test time (asset, not code):
``/root/reference/model/humanoid/humanoid.xml`` — nv=27, free+21 hinges,
plane/sphere/capsule contacts, 21 motors, 2 limited fixed tendons.
This is BASELINE configs 3-4 territory (LQR / SQP-MPC substrate).
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

HUMANOID_PATH = "/root/reference/model/humanoid/humanoid.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(HUMANOID_PATH), reason="reference model not mounted"
)


def _setup(seed=0, drop=0.0):
  mjm = mujoco.MjModel.from_xml_path(HUMANOID_PATH)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0
  mjd.qpos[2] += drop
  mjd.qpos[7:] += 0.08 * rng.randn(mjm.nq - 7)
  mjd.qvel[:] = 0.1 * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.2 * rng.randn(mjm.nu)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_humanoid_forward(seed):
  mjm, mjd, m, d = _setup(seed)
  mujoco.mj_forward(mjm, mjd)
  out = jax.jit(mi.forward)(m, d)
  ours_active = int(
      np.sum(np.array(out.contact.dist) < np.array(out.contact.includemargin))
  )
  assert ours_active == mjd.ncon
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-6
  )


def test_humanoid_step_trajectory():
  """50 steps of standing-ish humanoid with random ctrl."""
  mjm, mjd, m, d = _setup(0)
  step = jax.jit(mi.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-5)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_humanoid_inverse(seed):
  """The north-star check: humanoid inverse-dynamics torque parity.

  Mirrors the fork's harness (reference src/inverse/inverse_test.cpp:62-125,
  tolerance 1e-6) with random applied forces and accelerations.
  """
  mjm, mjd, m, d = _setup(seed)
  rng = np.random.RandomState(seed + 20)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mjd.qfrc_applied[:] = 0.3 * rng.randn(mjm.nv)
  mjd.xfrc_applied[:] = 0.3 * rng.randn(mjm.nbody, 6)
  mujoco.mj_inverse(mjm, mjd)
  d = mi.put_data(m, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(mi.inverse)(m, d)
  err = np.abs(np.array(out.qfrc_inverse) - mjd.qfrc_inverse).max()
  assert err < 1e-6, err  # the fork's tolerance
  assert err < 1e-8, err  # and much better in f64


def test_humanoid_fwdinv_consistency():
  """solver_fwdinv diagnostic on humanoid (ref engine_inverse_test.cc:35)."""
  mjm, mjd, m, d = _setup(0)

  def fn(m, d):
    return mi.compare_fwd_inv(m, mi.forward(m, d))

  out = jax.jit(fn)(m, d)
  fwdinv = np.array(out.solver_fwdinv)
  assert fwdinv[0] < 1e-8, fwdinv
  assert fwdinv[1] < 1e-8, fwdinv


def test_humanoid_vmap_batch():
  """Batched humanoid stepping (the MPC rollout substrate)."""
  mjm, mjd, m, d = _setup(0)
  rng = np.random.RandomState(0)
  n = 8
  qpos = jnp.asarray(
      np.array(d.qpos)[None]
      + np.concatenate([np.zeros((n, 7)), 0.05 * rng.randn(n, mjm.nq - 7)],
                       axis=1)
  )
  ds = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
  out = jax.jit(jax.vmap(mi.step, in_axes=(None, 0)))(m, ds)
  assert out.qpos.shape == (n, mjm.nq)
  assert bool(jnp.all(jnp.isfinite(out.qpos)))
