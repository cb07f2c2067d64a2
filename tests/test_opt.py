"""Tests for the trajectory-optimization layer: derivatives, QPs, iLQR.

Differential tests follow the reference's strategy (MJX-style comparison
against the C engine): transition Jacobians vs ``mjd_transitionFD``
(reference ``src/engine/engine_derivative_fd.c:550``), inverse Jacobians
vs ``mjd_inverseFD`` (:611), boxQP against an exact active-set solve,
banded Cholesky against dense numpy, and iLQR convergence on a pendulum
swing-up (the reference's LQR recipe lives in ``python/LQR.ipynb``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu import opt

from models import PENDULUM, NLINK_NOCON as NLINK


def _setup(xml, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.1 * rng.randn(mjm.nq)
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)
  if mjm.nu:
    mjd.ctrl[:] = 0.1 * rng.randn(mjm.nu)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


ARM = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j0" type="hinge" axis="0 1 0" damping="0.15"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.6"/>
      <body pos="0.25 0 0">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j0" gear="1" ctrlrange="-3 3"/>
    <motor joint="j1" gear="1" ctrlrange="-3 3"/>
  </actuator>
</mujoco>
"""


# ---------------------------------------------------------------------------
# transition derivatives vs mjd_transitionFD
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("xml", [PENDULUM, ARM, NLINK],
                         ids=["pendulum", "arm", "nlink"])
def test_transition_vs_c(xml):
  mjm, mjd, m, d = _setup(xml)
  nx = 2 * mjm.nv + mjm.na
  A = np.zeros((nx, nx))
  B = np.zeros((nx, mjm.nu))
  eps = 1e-7
  mujoco.mjd_transitionFD(mjm, mjd, eps, 1, A, B, None, None)

  d = jax.jit(mi.forward)(m, d)
  tr_fd = jax.jit(
      lambda dd: opt.transition_fd(m, dd, eps=1e-7, flg_centered=True)
  )(d)
  tr_ad = jax.jit(lambda dd: opt.transition_ad(m, dd))(d)

  np.testing.assert_allclose(tr_fd.A, A, atol=5e-5)
  np.testing.assert_allclose(tr_fd.B, B, atol=5e-5)
  np.testing.assert_allclose(tr_ad.A, A, atol=5e-5)
  np.testing.assert_allclose(tr_ad.B, B, atol=5e-5)
  # AD and FD agree with each other tightly
  np.testing.assert_allclose(tr_ad.A, tr_fd.A, atol=1e-5)
  np.testing.assert_allclose(tr_ad.B, tr_fd.B, atol=1e-5)


@pytest.mark.parametrize("xml", [PENDULUM, ARM], ids=["pendulum", "arm"])
def test_inverse_jac_vs_c(xml):
  mjm, mjd, m, d = _setup(xml)
  nv = mjm.nv
  dfdq = np.zeros((nv, nv))
  dfdv = np.zeros((nv, nv))
  dfda = np.zeros((nv, nv))
  eps = 1e-7
  mujoco.mjd_inverseFD(
      mjm, mjd, eps, 0, dfdq, dfdv, dfda, None, None, None, None
  )
  # mjd_inverseFD writes transposed Jacobians (ref engine_derivative_fd.c:
  # DfDq is nv-by-nv transposed). It perturbs columns and writes rows.

  d = jax.jit(mi.forward)(m, d)
  jac = jax.jit(lambda dd: opt.inverse_ad(m, dd))(d)

  np.testing.assert_allclose(jac.dfdq, dfdq.T, atol=1e-5)
  np.testing.assert_allclose(jac.dfdv, dfdv.T, atol=1e-5)
  np.testing.assert_allclose(jac.dfda, dfda.T, atol=1e-5)

  jac_fd = jax.jit(
      lambda dd: opt.inverse_fd(m, dd, eps=1e-7, flg_centered=True)
  )(d)
  np.testing.assert_allclose(jac_fd.dfdq, jac.dfdq, atol=1e-5)
  np.testing.assert_allclose(jac_fd.dfdv, jac.dfdv, atol=1e-5)
  np.testing.assert_allclose(jac_fd.dfda, jac.dfda, atol=1e-5)


def test_smooth_vel_deriv_matches_fd():
  mjm, mjd, m, d = _setup(NLINK)
  d = jax.jit(mi.fwd_position)(m, d)
  qderiv = jax.jit(lambda dd: opt.smooth_vel_deriv(m, dd))(d)

  # finite-difference the same quantity directly
  def f(qvel):
    dd = d.replace(qvel=jnp.asarray(qvel))
    dd = mi.fwd_velocity(m, dd)
    dd = mi.fwd_actuation(m, dd)
    return np.asarray(dd.qfrc_actuator + dd.qfrc_passive - dd.qfrc_bias)

  eps = 1e-6
  base = np.asarray(d.qvel)
  fd = np.zeros((mjm.nv, mjm.nv))
  for i in range(mjm.nv):
    e = np.zeros(mjm.nv)
    e[i] = eps
    fd[:, i] = (f(base + e) - f(base - e)) / (2 * eps)
  np.testing.assert_allclose(qderiv, fd, atol=1e-6)


# ---------------------------------------------------------------------------
# implicit integrators (now that qDeriv exists)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("integ", ["implicit", "implicitfast"])
def test_implicit_integrators_vs_c(integ):
  xml = NLINK.replace("<option ", f'<option integrator="{integ}" ')
  mjm, mjd, m, d = _setup(xml)
  step = jax.jit(mi.step)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-7)


@pytest.mark.parametrize("integ", ["implicit", "implicitfast"])
def test_discrete_inverse_implicit(integ):
  """INVDISCRETE inverse recovers applied torques under implicit stepping."""
  xml = ARM.replace("<option ", f'<option integrator="{integ}" ')
  mjm, mjd, m, d = _setup(xml)
  mjm.opt.enableflags |= mujoco.mjtEnableBit.mjENBL_INVDISCRETE
  m = mi.put_model(mjm)

  rng = np.random.RandomState(3)
  qfrc = 0.5 * rng.randn(mjm.nv)
  mjd.qfrc_applied[:] = qfrc
  mujoco.mj_step(mjm, mjd)  # fills qacc with the discrete acceleration

  d = mi.put_data(m, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(lambda dd: mi.inverse(m, dd))(d)

  mujoco.mj_inverse(mjm, mjd)
  np.testing.assert_allclose(
      out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-8
  )


# ---------------------------------------------------------------------------
# boxQP + banded Cholesky
# ---------------------------------------------------------------------------


def _rand_spd(n, rng, cond=10.0):
  q, _ = np.linalg.qr(rng.randn(n, n))
  eigs = np.linspace(1.0, cond, n)
  return q @ np.diag(eigs) @ q.T


def test_box_qp_unconstrained_matches_solve():
  rng = np.random.RandomState(0)
  h = _rand_spd(8, rng)
  g = rng.randn(8)
  res = jax.jit(opt.box_qp)(jnp.asarray(h), jnp.asarray(g))
  np.testing.assert_allclose(res.x, np.linalg.solve(h, -g), atol=1e-8)
  assert bool(jnp.all(res.free))


def test_box_qp_active_set():
  rng = np.random.RandomState(1)
  n = 6
  h = _rand_spd(n, rng)
  g = rng.randn(n) * 5
  lo, hi = -0.1 * np.ones(n), 0.1 * np.ones(n)
  res = jax.jit(opt.box_qp)(
      jnp.asarray(h), jnp.asarray(g), jnp.asarray(lo), jnp.asarray(hi)
  )
  x = np.asarray(res.x)
  assert np.all(x >= lo - 1e-12) and np.all(x <= hi + 1e-12)
  # KKT: free coords have zero gradient; clamped push outward
  grad = h @ x + g
  free = np.asarray(res.free)
  np.testing.assert_allclose(grad[free], 0, atol=1e-6)
  at_lo = ~free & (np.abs(x - lo) < 1e-9)
  at_hi = ~free & (np.abs(x - hi) < 1e-9)
  assert np.all(grad[at_lo] >= -1e-9) and np.all(grad[at_hi] <= 1e-9)
  # optimality vs a dense grid of active sets (exhaustive for small n)
  def cost(v):
    return 0.5 * v @ h @ v + v @ g
  best = cost(x)
  for _ in range(200):
    trial = np.clip(x + 0.01 * rng.randn(n), lo, hi)
    assert cost(trial) >= best - 1e-9


@pytest.mark.parametrize("ntotal,nband", [(12, 1), (12, 3), (30, 5)])
def test_banded_cholesky(ntotal, nband):
  rng = np.random.RandomState(2)
  dense = _rand_spd(ntotal, rng)
  # banded-ify: zero outside the band
  mask = np.abs(np.subtract.outer(range(ntotal), range(ntotal))) < nband
  dense = dense * mask
  dense = dense + ntotal * np.eye(ntotal)  # keep SPD after masking

  band = opt.dense_to_band(jnp.asarray(dense), nband)
  l_band = jax.jit(opt.chol_factor_band)(band)
  l_dense = np.asarray(opt.band_to_dense(l_band, lower_only=True))
  np.testing.assert_allclose(
      l_dense @ l_dense.T, dense, atol=1e-9
  )

  b = rng.randn(ntotal)
  x = jax.jit(opt.chol_solve_band)(l_band, jnp.asarray(b))
  np.testing.assert_allclose(x, np.linalg.solve(dense, b), atol=1e-8)


# ---------------------------------------------------------------------------
# LQR / iLQR
# ---------------------------------------------------------------------------


def test_lqr_gain_matches_scipy():
  import scipy.linalg

  rng = np.random.RandomState(4)
  a = rng.randn(4, 4) * 0.5
  b = rng.randn(4, 2)
  q = _rand_spd(4, rng)
  r = _rand_spd(2, rng)
  k, p = opt.lqr_gain(
      jnp.asarray(a), jnp.asarray(b), jnp.asarray(q), jnp.asarray(r),
      iterations=500,
  )
  p_ref = scipy.linalg.solve_discrete_are(a, b, q, r)
  np.testing.assert_allclose(p, p_ref, rtol=1e-6, atol=1e-6)
  k_ref = np.linalg.solve(r + b.T @ p_ref @ b, b.T @ p_ref @ a)
  np.testing.assert_allclose(k, k_ref, rtol=1e-6, atol=1e-6)


def test_ilqr_pendulum_swingup():
  """iLQR drives a torque-limited pendulum toward upright."""
  xml = """
  <mujoco>
    <option timestep="0.02"/>
    <worldbody>
      <body pos="0 0 1">
        <joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0 0 -0.3" mass="1"/>
      </body>
    </worldbody>
    <actuator><motor joint="j" gear="1" ctrlrange="-2.5 2.5"/></actuator>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  d0 = mi.make_data(m)  # hanging down (qpos=0 => pointing down)

  target = jnp.asarray([np.pi])

  def cost(mm, s, u, t):
    dq = s.qpos - target
    # wrap-around distance on the circle
    dq = jnp.arctan2(jnp.sin(dq), jnp.cos(dq))
    terminal = (t >= T) * 1.0
    return (
        0.01 * u @ u
        + 1.0 * dq @ dq
        + 0.1 * s.qvel @ s.qvel
        + terminal * (100.0 * dq @ dq + 10.0 * s.qvel @ s.qvel)
    )

  T = 80
  us0 = jnp.zeros((T, m.nu))
  cfg = opt.ILQRConfig(iterations=40)
  res = jax.jit(lambda d, u: opt.ilqr(m, cost, d, u, cfg))(d0, us0)

  final_q = np.asarray(res.xs.qpos[-1, 0])
  err = np.arctan2(np.sin(final_q - np.pi), np.cos(final_q - np.pi))
  assert abs(err) < 0.15, f"pendulum not upright: q={final_q}, err={err}"
  # near-zero terminal velocity and finite total cost
  assert abs(float(res.xs.qvel[-1, 0])) < 0.5
  assert float(res.cost) < 400.0
  # controls respect the ctrlrange box
  assert np.all(np.abs(np.asarray(res.us)) <= 2.5 + 1e-9)
