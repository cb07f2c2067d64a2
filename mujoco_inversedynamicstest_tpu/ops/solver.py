"""Constraint solvers: primal Newton and Polak-Ribière NCG.

Analog of ``src/engine/engine_solver.c`` (``mj_solCG``:1896,
``mj_solNewton``:1910, line search ``CGsearch``:1204) re-derived for XLA:
the solve minimizes the convex primal cost

    cost(qacc) = 0.5 (qacc - qacc_smooth)' M (qacc - qacc_smooth)
                 + sum_i s_i(J_i qacc - aref_i)

over accelerations, with s_i the per-row piecewise-quadratic constraint
penalty.  Everything is fixed-shape: the iteration is a
``lax.while_loop``, the exact 1-D line search is a bracketed safeguarded
Newton on the piecewise-quadratic directional derivative (a scan with a
fixed iteration budget).  The Newton Hessian ``M + J' diag(D·active) J`` is
one MXU matmul + dense Cholesky per iteration.

Supports pyramidal/frictionless rows and dof friction; elliptic cone
terms arrive with the contact milestone.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    DisableBit,
    Model,
    SolverType,
)
from mujoco_inversedynamicstest_tpu.ops import math, smooth

_MINVAL = math.MINVAL


class _State(NamedTuple):
  """Solver iterate."""
  qacc: jnp.ndarray
  Ma: jnp.ndarray            # M @ qacc
  jaref: jnp.ndarray         # J @ qacc - aref
  efc_force: jnp.ndarray
  qfrc_constraint: jnp.ndarray
  quad_mask: jnp.ndarray     # rows currently in the quadratic zone
  cone_middle: jnp.ndarray   # elliptic slots currently in the cone zone
  cost: jnp.ndarray
  prev_cost: jnp.ndarray
  grad: jnp.ndarray
  mgrad: jnp.ndarray         # preconditioned gradient
  search: jnp.ndarray
  niter: jnp.ndarray
  lineslope: jnp.ndarray     # phi'(alpha) at the accepted line-search point
  stats: jnp.ndarray         # (stat_cap, 3) per-iter improvement/grad/slope


def stat_cap(m: Model) -> int:
  """Static length of the per-iteration solver-stat trace (the analog of
  the reference's ``mjNSOLVER``-bounded ``mjSolverStat`` array,
  ``mjdata.h:38`` / ``saveStats`` engine_solver.c:38)."""
  return max(1, min(int(m.opt.iterations), 32))


def _forces_and_cost(m: Model, d: Data, jar: jnp.ndarray):
  """Constraint forces + penalty cost at jar (all zones, both cones)."""
  from mujoco_inversedynamicstest_tpu.ops import constraint

  return constraint.forces_cost(m, d, jar)


def _gauss_cost(d: Data, qacc, ma):
  return 0.5 * jnp.dot(ma - d.qfrc_smooth, qacc - d.qacc_smooth)


def _eval_state(m: Model, d: Data, qacc, with_grad: bool) -> _State:
  ma = smooth.mul_m(m, d, qacc)
  jaref = d.efc_J @ qacc - d.efc_aref
  force, ccost, quad, cone_mid = _forces_and_cost(m, d, jaref)
  qfrc = d.efc_J.T @ force
  cost = ccost + _gauss_cost(d, qacc, ma)
  nv0 = jnp.zeros_like(qacc)
  st = _State(
      qacc=qacc, Ma=ma, jaref=jaref, efc_force=force,
      qfrc_constraint=qfrc, quad_mask=quad, cone_middle=cone_mid,
      cost=cost,
      prev_cost=jnp.asarray(jnp.inf, dtype=qacc.dtype),
      grad=nv0, mgrad=nv0, search=nv0,
      niter=jnp.asarray(0, dtype=jnp.int32),
      lineslope=jnp.zeros((), dtype=qacc.dtype),
      stats=jnp.zeros((stat_cap(m), 3), dtype=qacc.dtype),
  )
  if with_grad:
    st = _refresh_gradient(m, d, st)
    st = st._replace(search=-st.mgrad)
  return st


def _refresh_gradient(m: Model, d: Data, st: _State) -> _State:
  """grad = M qacc - qfrc_smooth - qfrc_constraint; precondition.

  Newton preconditions with the exact constraint Hessian
  ``M + J' diag(D·quad) J`` plus, for elliptic contacts in the cone zone,
  the per-contact cone Hessian blocks ``J_c' H_c J_c`` (ref
  ``MakeHessian``/``FactorizeHessian``/``HessianCone``,
  engine_solver.c:1387/1501/1574); CG with M itself.
  """
  from mujoco_inversedynamicstest_tpu.ops import constraint, linalg

  grad = st.Ma - d.qfrc_smooth - st.qfrc_constraint
  if m.opt.solver == SolverType.NEWTON:
    dd = d.efc_D * st.quad_mask
    # full-precision assembly: the default TPU matmul accumulates in
    # bf16, leaving J'DJ asymmetric by ~1e-3 relative — the factorization
    # then solves a slightly different system than the gradient uses,
    # which destabilizes the one-iteration Newton configurations
    hess = d.qM + jax.numpy.matmul(
        d.efc_J.T * dd, d.efc_J, precision=jax.lax.Precision.HIGHEST)
    hess = 0.5 * (hess + hess.T)
    ct = constraint.cone_tables(m)
    if ct.nes:
      U, N, T, T2, Dm, mu, coef = constraint.cone_quantities(
          m, d, ct, st.jaref)
      Hc = constraint.cone_hessian(ct, U, N, T, Dm, mu, coef,
                                   st.cone_middle)
      Jc = d.efc_J[np.minimum(ct.rows, d.nefc - 1)] * jnp.asarray(
          ct.rmask, grad.dtype)[:, :, None]           # (nes, 6, nv)
      hess = hess + jnp.einsum('eiv,eij,ejw->vw', Jc, Hc, Jc)
    chol = linalg.chol_factor(hess)
    mgrad = linalg.chol_solve(chol, grad)
  else:
    mgrad = smooth.solve_m(m, d, grad)
  return st._replace(grad=grad, mgrad=mgrad)


class _LSPoint(NamedTuple):
  alpha: jnp.ndarray
  cost: jnp.ndarray
  d0: jnp.ndarray   # phi'(alpha)
  d1: jnp.ndarray   # phi''(alpha)


def _linesearch(m: Model, d: Data, st: _State) -> _State:
  """Exact line search along ``st.search`` (ref ``CGsearch``:1204).

  phi(alpha) is piecewise quadratic (zones change with alpha); we run a
  fixed budget of safeguarded-Newton bracket updates on phi'.
  """
  from mujoco_inversedynamicstest_tpu.ops import constraint

  dtype = st.qacc.dtype
  mv = smooth.mul_m(m, d, st.search)
  jv = d.efc_J @ st.search

  gauss0 = _gauss_cost(d, st.qacc, st.Ma)
  quad_gauss = jnp.stack([
      gauss0,
      jnp.dot(st.search, st.Ma - d.qfrc_smooth),
      0.5 * jnp.dot(st.search, mv),
  ])
  # per-row quadratics of 0.5*D*(jaref + alpha jv)^2
  quad_rows = jnp.stack([
      0.5 * d.efc_D * st.jaref * st.jaref,
      d.efc_D * jv * st.jaref,
      0.5 * d.efc_D * jv * jv,
  ], axis=1)  # (nefc, 3)

  idx = np.arange(d.nefc)
  is_eq = jnp.asarray(idx < d.ne)
  is_fri = jnp.asarray((idx >= d.ne) & (idx < d.ne + d.nf))
  floss = d.efc_frictionloss
  rf = d.efc_R * floss

  # elliptic cone per-slot quantities along the search direction
  # (ref ``CGprepare`` engine_solver.c:969-1012)
  ct = constraint.cone_tables(m)
  is_ell_np = np.zeros(d.nefc, bool)
  if ct.nes:
    is_ell_np[ct.rows[ct.rmask]] = True
    U, _, _, _, Dm, mu_c, coef = constraint.cone_quantities(
        m, d, ct, st.jaref)
    V = jv[np.minimum(ct.rows, d.nefc - 1)] * coef
    U0, V0 = U[:, 0], V[:, 0]
    UU = jnp.sum(U[:, 1:] ** 2, axis=1)
    UV = jnp.sum(U[:, 1:] * V[:, 1:], axis=1)
    VV = jnp.sum(V[:, 1:] ** 2, axis=1)
    # per-slot summed row quadratics (bottom-zone contribution)
    slot_quad = jnp.sum(
        quad_rows[np.minimum(ct.rows, d.nefc - 1)]
        * jnp.asarray(ct.rmask, dtype)[:, :, None], axis=1)   # (nes, 3)
  is_ell = jnp.asarray(is_ell_np)

  def phi(alpha):
    x = st.jaref + alpha * jv
    lin_neg = is_fri & (x <= -rf)
    lin_pos = is_fri & (x >= rf)
    quad = is_eq | (is_fri & ~lin_neg & ~lin_pos) | (
        ~is_eq & ~is_fri & ~is_ell & (x < 0)
    )
    # rows in quadratic zone contribute their quadratic; friction rows in
    # the linear zones contribute affine terms
    rows = jnp.where(quad[:, None], quad_rows, 0.0)
    neg_terms = jnp.stack([
        -0.5 * rf * floss - floss * st.jaref, -floss * jv,
        jnp.zeros_like(jv),
    ], axis=1)
    pos_terms = jnp.stack([
        -0.5 * rf * floss + floss * st.jaref, floss * jv,
        jnp.zeros_like(jv),
    ], axis=1)
    rows = jnp.where(lin_neg[:, None], neg_terms, rows)
    rows = jnp.where(lin_pos[:, None], pos_terms, rows)
    total = quad_gauss + jnp.sum(rows, axis=0)

    cost = total[0] + alpha * total[1] + alpha * alpha * total[2]
    d0 = total[1] + 2 * alpha * total[2]
    d1 = 2 * total[2]

    if ct.nes:
      # cone zones at this alpha (ref ``CGeval`` engine_solver.c:1081-1137)
      N = U0 + alpha * V0
      Tsqr = UU + alpha * (2 * UV + alpha * VV)
      no_t = Tsqr <= _MINVAL**2
      T = jnp.sqrt(jnp.maximum(Tsqr, _MINVAL**2))
      top = (N >= mu_c * T) | (no_t & (N >= 0))
      bottom = ((mu_c * N + T <= 0) & ~top) | (no_t & (N < 0))
      middle = ~top & ~bottom

      b = bottom.astype(dtype)
      cost += jnp.dot(b, slot_quad[:, 0] + alpha * slot_quad[:, 1]
                      + alpha * alpha * slot_quad[:, 2])
      d0 += jnp.dot(b, slot_quad[:, 1] + 2 * alpha * slot_quad[:, 2])
      d1 += 2 * jnp.dot(b, slot_quad[:, 2])

      NmT = N - mu_c * T
      N1 = V0
      T1 = (UV + alpha * VV) / T
      T2d = VV / T - (UV + alpha * VV) * T1 / (T * T)
      mmid = middle.astype(dtype)
      cost += jnp.dot(mmid, 0.5 * Dm * NmT * NmT)
      d0 += jnp.dot(mmid, Dm * NmT * (N1 - mu_c * T1))
      d1 += jnp.dot(
          mmid,
          Dm * ((N1 - mu_c * T1) ** 2 + NmT * (-mu_c * T2d)),
      )

    d1 = d1 + (d1 == 0) * _MINVAL
    return _LSPoint(alpha=alpha, cost=cost, d0=d0, d1=d1)

  smag = math.norm_safe(st.search) * m.stat_meaninertia * max(1, m.nv)
  gtol = m.opt.tolerance * m.opt.ls_tolerance * smag

  p0 = phi(jnp.asarray(0.0, dtype=dtype))
  pn = phi(p0.alpha - p0.d0 / p0.d1)
  pick_pn = pn.d0 < p0.d0
  lo = jax.tree.map(lambda a, b: jnp.where(pick_pn, b, a), p0, pn)
  hi = jax.tree.map(lambda a, b: jnp.where(pick_pn, a, b), p0, pn)

  def ls_cond(carry):
    lo, hi, live, it = carry
    return live & (it < m.opt.ls_iterations)

  def ls_body(carry):
    lo, hi, live, it = carry

    cand_lo = phi(lo.alpha - lo.d0 / lo.d1)
    cand_hi = phi(hi.alpha - hi.d0 / hi.d1)
    cand_mid = phi(0.5 * (lo.alpha + hi.alpha))

    def shrinks(cur_d0, new_d0):
      # candidate tightens the bracket if its derivative lies strictly
      # between the current endpoint derivative and zero
      return ((cur_d0 < new_d0) & (new_d0 < 0)) | (
          (cur_d0 > new_d0) & (new_d0 > 0)
      )

    moved = jnp.asarray(False)
    for cand in (cand_lo, cand_mid, cand_hi):
      take_lo = shrinks(lo.d0, cand.d0)
      lo = jax.tree.map(lambda a, b, t=take_lo: jnp.where(t, b, a), lo, cand)
      moved = moved | take_lo
    for cand in (cand_hi, cand_mid, cand_lo):
      take_hi = shrinks(hi.d0, cand.d0)
      hi = jax.tree.map(lambda a, b, t=take_hi: jnp.where(t, b, a), hi, cand)
      moved = moved | take_hi

    done = ~moved
    done |= (lo.d0 < 0) & (lo.d0 > -gtol)
    done |= (hi.d0 > 0) & (hi.d0 < gtol)
    return (lo, hi, live & ~done, it + 1)

  (lo, hi, _, _) = jax.lax.while_loop(
      ls_cond, ls_body,
      (lo, hi, jnp.asarray(True), jnp.asarray(0, dtype=jnp.int32)),
  )

  improved = (lo.cost < p0.cost) | (hi.cost < p0.cost)
  alpha = jnp.where(lo.cost < hi.cost, lo.alpha, hi.alpha) * improved

  return st._replace(
      qacc=st.qacc + alpha * st.search,
      Ma=st.Ma + alpha * mv,
      jaref=st.jaref + alpha * jv,
      lineslope=jnp.where(lo.cost < hi.cost, lo.d0, hi.d0) * improved,
  )


def solve(m: Model, d: Data) -> Data:
  """Main solver loop (ref ``mj_solNewton``:1910 / ``mj_solCG``:1896)."""
  dtype = d.qacc_smooth.dtype

  # warmstart: best of (qacc_warmstart, qacc_smooth)
  # (ref warmstart(), engine_forward.c:536)
  if not (m.opt.disableflags & DisableBit.WARMSTART):
    warm = _eval_state(m, d, d.qacc_warmstart, with_grad=False)
    smth = _eval_state(m, d, d.qacc_smooth, with_grad=False)
    qacc0 = jnp.where(warm.cost < smth.cost, d.qacc_warmstart, d.qacc_smooth)
  else:
    qacc0 = d.qacc_smooth

  st = _eval_state(m, d, qacc0, with_grad=True)

  # below ~10 ulp the cost comparison is float noise; floor the tolerance
  # so low-precision runs terminate (no-op in f64 for typical tolerances)
  tol = jnp.maximum(
      jnp.asarray(m.opt.tolerance, dtype=dtype),
      10 * jnp.finfo(dtype).eps,
  )

  def converged(st: _State):
    scale = m.stat_meaninertia * max(1, m.nv)
    improvement = (st.prev_cost - st.cost) / scale
    gradient = math.norm_safe(st.grad) / scale
    done = st.niter >= m.opt.iterations
    done |= improvement < tol
    done |= gradient < tol
    return ~done

  def iterate(st: _State) -> _State:
    st = _linesearch(m, d, st)
    prev_grad, prev_mgrad, prev_cost = st.grad, st.mgrad, st.cost
    force, ccost, quad, cone_mid = _forces_and_cost(m, d, st.jaref)
    qfrc = d.efc_J.T @ force
    cost = ccost + _gauss_cost(d, st.qacc, st.Ma)
    st = st._replace(
        efc_force=force, qfrc_constraint=qfrc, quad_mask=quad,
        cone_middle=cone_mid, cost=cost, prev_cost=prev_cost,
    )
    st = _refresh_gradient(m, d, st)
    if m.opt.solver == SolverType.NEWTON:
      search = -st.mgrad
    else:  # Polak-Ribière nonlinear CG
      beta = jnp.dot(st.grad, st.mgrad - prev_mgrad)
      beta = beta / jnp.maximum(_MINVAL, jnp.dot(prev_grad, prev_mgrad))
      search = -st.mgrad + jnp.maximum(0.0, beta) * st.search
    # per-iteration trace (ref saveStats, engine_solver.c:38): scaled
    # improvement, scaled gradient norm, accepted line-search slope
    scale = m.stat_meaninertia * max(1, m.nv)
    row = jnp.stack([
        (st.prev_cost - st.cost) / scale,
        math.norm_safe(st.grad) / scale,
        st.lineslope / scale,
    ])[None]
    # past the trace capacity the write becomes a no-op (the reference's
    # saveStats likewise stops recording at its bound rather than
    # overwriting the tail row, engine_solver.c:38)
    cap = st.stats.shape[0]
    slot = jnp.minimum(st.niter, cap - 1)
    updated = jax.lax.dynamic_update_slice(
        st.stats, row.astype(st.stats.dtype), (slot, jnp.zeros_like(slot)))
    stats = jnp.where(st.niter < cap, updated, st.stats)
    return st._replace(search=search, niter=st.niter + 1, stats=stats)

  if m.opt.iterations == 1:
    st = iterate(st)
  else:
    st = jax.lax.while_loop(converged, iterate, st)

  return d.replace(
      qacc=st.qacc,
      qacc_warmstart=st.qacc,
      qfrc_constraint=st.qfrc_constraint,
      efc_force=st.efc_force,
      solver_niter=st.niter,
      solver_stat=st.stats,
  )


def fwd_constraint(m: Model, d: Data) -> Data:
  """Constraint forces and final qacc (ref ``mj_fwdConstraint``:654)."""
  if d.nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros_like(d.qfrc_constraint),
        qacc_warmstart=d.qacc_smooth,
    )
  if m.opt.solver == SolverType.PGS:
    from mujoco_inversedynamicstest_tpu.ops import pgs as pgs_mod

    d = pgs_mod.pgs(m, d)
  else:
    d = solve(m, d)
  if m.opt.noslip_iterations > 0:
    from mujoco_inversedynamicstest_tpu.ops import noslip as noslip_mod

    d = noslip_mod.noslip(m, d)
  return d
