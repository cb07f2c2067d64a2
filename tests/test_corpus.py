"""Mesh-heavy corpus differential tests (barkour quadruped, shadow hand).

The reference's own integration sweep uses these models
(``mjx/mujoco/mjx/test_data/``); they exercise the convex-mesh collision
path, muscle-free tendon actuation, and deep kinematic trees at
production scale (14-15 meshes each).
"""

import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

ROOT = "/root/reference/mjx/mujoco/mjx/test_data"
BARKOUR = f"{ROOT}/barkour_v0/assets/barkour_v0_mjx.xml"
SHADOW = f"{ROOT}/shadow_hand/scene_right.xml"


def _cases():
  return [p for p in (BARKOUR, SHADOW) if os.path.exists(p)]


@pytest.mark.parametrize("path", _cases())
def test_smooth_dynamics_parity(path):
  """Smooth pipeline (no contacts involved): qM, bias forces, actuator
  moments match C at machine precision across random configurations."""
  mjm = mujoco.MjModel.from_xml_path(path)
  m = mi.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  fwd = jax.jit(lambda dd: mi.forward(m, dd))

  rng = np.random.RandomState(0)
  for trial in range(3):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = mjm.qpos0 + 0.05 * rng.randn(mjm.nq)
    mjd.qvel[:] = 0.2 * rng.randn(mjm.nv)
    mjd.ctrl[:] = 0.1 * rng.randn(mjm.nu)
    mujoco.mj_forward(mjm, mjd)

    d = fwd(mi.put_data(m, mjd))
    qm = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, qm)
    np.testing.assert_allclose(np.asarray(d.qM), qm, atol=1e-10,
                               err_msg=f"{path} trial {trial}")
    np.testing.assert_allclose(
        np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-9)
    # C stores moments sparse (moment_rownnz/rowadr/colind, MuJoCo 3.2+)
    moment = np.zeros((mjm.nu, mjm.nv))
    flat = np.asarray(mjd.actuator_moment).reshape(-1)
    for i in range(mjm.nu):
      adr, nnz = mjd.moment_rowadr[i], mjd.moment_rownnz[i]
      moment[i, mjd.moment_colind[adr:adr + nnz]] = flat[adr:adr + nnz]
    np.testing.assert_allclose(
        np.asarray(d.actuator_moment), moment, atol=1e-9)


@pytest.mark.parametrize("path", _cases())
def test_forward_qacc_parity(path):
  """Full forward incl. mesh contacts: when both engines agree on the
  active contact count, qacc matches to solver tolerance."""
  mjm = mujoco.MjModel.from_xml_path(path)
  # the corpus ships MJX-tuned solver budgets (iterations=1): a single
  # unconverged Newton step is line-search-implementation-sensitive, so
  # parity is only well-defined at convergence — raise the budget for
  # BOTH engines (the converged QP solution is unique given the manifold)
  mjm.opt.iterations = 50
  mjm.opt.ls_iterations = 25
  m = mi.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  fwd = jax.jit(lambda dd: mi.forward(m, dd))

  rng = np.random.RandomState(1)
  matched = 0
  for trial in range(8):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[:] = mjm.qpos0 + 0.02 * rng.randn(mjm.nq)
    mujoco.mj_forward(mjm, mjd)
    d = fwd(mi.put_data(m, mjd))
    act = np.where(np.asarray(d.contact.dist)
                   < np.asarray(d.contact.includemargin))[0]
    # qacc can only be compared when the manifolds agree *geometrically*
    # (our branchless SAT and the reference's CCD legitimately produce
    # different contact points on curved mesh features)
    if len(act) != mjd.ncon:
      continue
    pos_o = np.asarray(d.contact.pos)[act]
    dist_o = np.asarray(d.contact.dist)[act]
    frame_o = np.asarray(d.contact.frame)[act]
    used, geom_match = set(), True
    for k in range(len(act)):
      hit = None
      for c in range(mjd.ncon):
        if c in used:
          continue
        if (np.abs(pos_o[k] - mjd.contact.pos[c]).max() < 1e-6
            and abs(dist_o[k] - mjd.contact.dist[c]) < 1e-6
            # frames too: with iterations=1 (this corpus' solver config)
            # the one Newton step depends on the pyramid tangents, so
            # rotated-but-equivalent frames yield different qacc
            and np.abs(np.asarray(frame_o[k]).ravel()
                       - mjd.contact.frame[c]).max() < 1e-6):
          hit = c
          break
      if hit is None:
        geom_match = False
        break
      used.add(hit)
    if not geom_match:
      continue
    matched += 1
    scale = max(1.0, np.abs(mjd.qacc).max())
    err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
    # both engines stop at their own tolerance crossing; residual is
    # solver-tolerance-limited, not manifold-limited
    assert err < 1e-5, f"{path} trial {trial}: rel qacc err {err}"
  # exact geometric agreement between our SAT manifolds and the
  # reference's CCD is the exception on curved mesh features, not the
  # rule — require at least one fully-matched configuration per model
  assert matched >= 1, f"no manifold matched in 8 trials"


@pytest.mark.slow
@pytest.mark.parametrize("path", _cases())
def test_rollout_stays_stable(path):
  """200-step actuated rollout remains finite and bounded (capability:
  the mesh contact path sustains production models)."""
  mjm = mujoco.MjModel.from_xml_path(path)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  rng = np.random.RandomState(2)
  ctrl = jnp.asarray(0.1 * rng.randn(mjm.nu))
  d = d.replace(ctrl=ctrl)

  @jax.jit
  def roll(dd):
    def body(dd, _):
      return mi.step(m, dd), ()
    dd, _ = jax.lax.scan(body, dd, None, length=200)
    return dd

  d = roll(d)
  assert bool(jnp.all(jnp.isfinite(d.qpos)))
  assert float(jnp.abs(d.qvel).max()) < 100.0
