"""Differential tests: forward pipeline, integrators, inverse dynamics.

Mirrors the reference's test strategy: the fork's own harness randomizes
applied forces each step and checks inverse torque consistency at 1e-6
(reference ``src/inverse/inverse_test.cpp:62-125``); the engine test
asserts ``solver_fwdinv`` < 1e-10 (reference
``test/engine/engine_inverse_test.cc:35-59``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

from models import ALL_STEPPABLE


def _setup(xml, seed=0, vel_scale=0.5):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.2 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = vel_scale * rng.randn(mjm.nv)
  if mjm.nu:
    mjd.ctrl[:] = rng.randn(mjm.nu)
  if mjm.na:
    mjd.act[:] = 0.3 * rng.randn(mjm.na)
  mjd.qfrc_applied[:] = 0.2 * rng.randn(mjm.nv)
  mjd.xfrc_applied[:] = 0.3 * rng.randn(mjm.nbody, 6)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


@pytest.mark.parametrize("name", sorted(ALL_STEPPABLE))
def test_forward(name):
  mjm, mjd, m, d = _setup(ALL_STEPPABLE[name])
  mujoco.mj_forward(mjm, mjd)
  out = jax.jit(mi.forward)(m, d)

  np.testing.assert_allclose(out.qfrc_passive, mjd.qfrc_passive, atol=1e-10)
  if mjm.nu:
    np.testing.assert_allclose(
        out.actuator_length, mjd.actuator_length, atol=1e-10
    )
    np.testing.assert_allclose(
        out.actuator_velocity, mjd.actuator_velocity, atol=1e-10
    )
    np.testing.assert_allclose(
        out.actuator_force, mjd.actuator_force, atol=1e-10
    )
    np.testing.assert_allclose(
        out.qfrc_actuator, mjd.qfrc_actuator, atol=1e-10
    )
  np.testing.assert_allclose(out.qfrc_smooth, mjd.qfrc_smooth, atol=1e-9)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-8)
  if mjm.na:
    np.testing.assert_allclose(out.act_dot, mjd.act_dot, atol=1e-10)


@pytest.mark.parametrize("name", sorted(ALL_STEPPABLE))
@pytest.mark.parametrize("integrator", ["euler", "rk4"])
def test_step_trajectory(name, integrator):
  xml = ALL_STEPPABLE[name]
  if integrator == "rk4":
    xml = xml.replace("<option ", '<option integrator="RK4" ')
  mjm, mjd, m, d = _setup(xml)

  step = jax.jit(mi.step)
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)

  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-7)
  if mjm.na:
    np.testing.assert_allclose(d.act, mjd.act, atol=1e-9)
  np.testing.assert_allclose(float(d.time), mjd.time, atol=1e-12)


@pytest.mark.parametrize("name", sorted(ALL_STEPPABLE))
@pytest.mark.parametrize("seed", [0, 1])
def test_inverse(name, seed):
  """qfrc_inverse matches the C engine given identical (q, v, a)."""
  mjm, mjd, m, d = _setup(ALL_STEPPABLE[name], seed)
  rng = np.random.RandomState(seed + 100)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(mi.inverse)(m, d)
  np.testing.assert_allclose(out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-9)


@pytest.mark.parametrize("name", sorted(ALL_STEPPABLE))
def test_fwd_inv_consistency(name):
  """The fork's core check: forward then inverse recovers applied forces.

  (reference src/inverse/inverse_test.cpp:120-125, tolerance 1e-6; we run
  in f64 and ask for much better.)
  """
  mjm, mjd, m, d = _setup(ALL_STEPPABLE[name])

  def fn(m, d):
    d = mi.forward(m, d)
    return mi.compare_fwd_inv(m, d)

  out = jax.jit(fn)(m, d)
  fwdinv = np.array(out.solver_fwdinv)
  assert fwdinv[0] < 1e-10, fwdinv
  assert fwdinv[1] < 1e-9, fwdinv


def test_inverse_discrete_euler():
  """INVDISCRETE: inverse of the actually-integrated discrete dynamics."""
  xml = ALL_STEPPABLE["actuated"]
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_INVDISCRETE
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(7)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(mi.inverse)(m, d)
  np.testing.assert_allclose(out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-9)
  # qacc must be restored after the discrete mapping
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-12)


def test_warning_counters_and_autoreset():
  """Per-lane warning counters (mjWARN_BADQPOS/BADQVEL analog) increment on
  masked auto-reset and stay independent across vmapped lanes."""
  xml = ALL_STEPPABLE["actuated"]
  m = mi.put_model(mujoco.MjModel.from_xml_string(xml))
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))

  good = step(d)
  assert np.array_equal(np.array(good.warning), [0, 0])

  bad = step(d.replace(qpos=d.qpos.at[0].set(jnp.nan)))
  assert np.array_equal(np.array(bad.warning), [1, 0])
  assert bool(jnp.all(jnp.isfinite(bad.qpos)))

  batch = jax.vmap(
      lambda i: d.replace(
          qvel=jnp.where(i == 1, d.qvel.at[0].set(jnp.inf), d.qvel))
  )(jnp.arange(3))
  out = jax.jit(jax.vmap(lambda dd: mi.step(m, dd)))(batch)
  assert np.array_equal(np.array(out.warning)[:, 1], [0, 1, 0])
