"""Noslip post-pass: dual Gauss-Seidel friction polishing.

Analog of ``mj_solNoSlip`` (reference ``src/engine/engine_solver.c:550``):
after the main solver converges, friction forces are re-optimized in the
dual with the friction-row regularization R removed — eliminating the
residual frictional drift that regularized cones permit.  The sweep is
Gauss-Seidel over friction "units" in efc order:

* dry-friction rows (dof/tendon): scalar update clamped to ±frictionloss;
* pyramidal contacts: per opposing-edge pair, keeping the pair sum
  (= normal force share) fixed while redistributing within [0, 2·mid];
* elliptic contacts: friction block re-solved as a QCQP inside the
  friction ellipsoid of radius f_normal (``mju_QCQP``/``QCQP2``/``QCQP3``,
  reference ``engine_util_solve.c:785-1008``).

TPU mapping: the dual matrix AR = J M⁻¹ Jᵀ + diag(R) is one dense
MXU-shaped product (the reference's ``mj_projectConstraint``,
``engine_core_constraint.c:2121``); the sequential sweep is a
``lax.scan`` over a static unit table with padded 5-wide blocks; sweeps
iterate under ``lax.while_loop`` with the reference's improvement-based
termination.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    ConstraintType,
    Data,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math, smooth

_MINVAL = math.MINVAL

# unit kinds
_DRY = 0
_PYR = 1
_ELL = 2

_BMAX = 5  # max block width (elliptic dim-1 <= 5; pyramidal pair = 2)


class _Units(NamedTuple):
  """Static sweep schedule."""
  n: int
  kind: np.ndarray      # (n,)
  rows: np.ndarray      # (n, _BMAX) efc row indices (pad nefc)
  nrow: np.ndarray      # (n,) true block width
  normal: np.ndarray    # (n,) normal-row index for contacts (pad nefc)
  slot: np.ndarray      # (n,) contact slot (-1 for dry friction)


def _units(m: Model, d_nefc: int, lay) -> _Units:
  from mujoco_inversedynamicstest_tpu.ops import collision

  clay = collision.contact_layout(m)
  kind, rows, nrow, normal, slot = [], [], [], [], []

  def pad(r):
    return r + [d_nefc] * (_BMAX - len(r))

  for i in range(lay.ne, lay.ne + lay.nf):
    kind.append(_DRY)
    rows.append(pad([i]))
    nrow.append(1)
    normal.append(d_nefc)
    slot.append(-1)

  base = lay.ne + lay.nf + lay.nl
  for s, condim in enumerate(clay.dim):
    if condim == 1:
      continue
    adr = base + int(clay.efc_address[s])
    if m.opt.cone == 1:  # elliptic
      kind.append(_ELL)
      rows.append(pad([adr + 1 + j for j in range(condim - 1)]))
      nrow.append(condim - 1)
      normal.append(adr)
      slot.append(s)
    else:
      for k in range(condim - 1):
        kind.append(_PYR)
        rows.append(pad([adr + 2 * k, adr + 2 * k + 1]))
        nrow.append(2)
        normal.append(d_nefc)
        slot.append(s)

  if not kind:
    return _Units(0, np.zeros(0, np.int32), np.zeros((0, _BMAX), np.int32),
                  np.zeros(0, np.int32), np.zeros(0, np.int32),
                  np.zeros(0, np.int32))
  return _Units(
      n=len(kind), kind=np.array(kind, np.int32),
      rows=np.array(rows, np.int32), nrow=np.array(nrow, np.int32),
      normal=np.array(normal, np.int32), slot=np.array(slot, np.int32),
  )


def _qcqp(A, b, mu, r, nr):
  """min ½v'Av + b'v  s.t.  Σ (v_i/mu_i)² ≤ r²  (ref ``mju_QCQP``:942).

  Fixed-shape (_BMAX) with ``nr`` valid dims; padding has A=I, b=0, mu=1.
  Fixed 20 Newton iterations on the Lagrange multiplier with masked
  convergence, exactly the reference's update rule.
  """
  dtype = A.dtype
  msk = (jnp.arange(_BMAX) < nr).astype(dtype)
  # scale so the constraint is x'x <= r^2
  d_s = jnp.where(msk > 0, mu, 1.0)
  As = A * d_s[:, None] * d_s[None, :]
  # sanitize padding: identity diagonal, zero offdiag/b
  As = As * msk[:, None] * msk[None, :] + jnp.diag(1.0 - msk)
  bs = b * d_s * msk

  eye = jnp.eye(_BMAX, dtype=dtype)

  def body(carry, _):
    la, done, failed = carry
    Ala = As + la * eye
    L = jnp.linalg.cholesky(Ala)
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(jnp.diag(L) > 1e-10)
    L_safe = jnp.where(ok, L, eye)
    v = -jax.scipy.linalg.cho_solve((L_safe, True), bs)
    val = jnp.dot(v, v) - r * r
    tmp = jax.scipy.linalg.cho_solve((L_safe, True), v)
    deriv = -2.0 * jnp.dot(v, tmp)
    delta = -val / jnp.where(deriv == 0, -1.0, deriv)
    new_done = done | (val < 1e-10) | (delta < 1e-10)
    la_new = jnp.where(done | new_done | ~ok, la, la + delta)
    return (la_new, new_done, failed | ~ok), None

  (la, _, failed), _ = jax.lax.scan(
      body, (jnp.zeros((), dtype), jnp.asarray(False), jnp.asarray(False)),
      None, length=20)

  Ala = As + la * eye
  L = jnp.linalg.cholesky(Ala)
  ok = jnp.all(jnp.isfinite(L)) & jnp.all(jnp.diag(L) > 1e-10)
  L_safe = jnp.where(ok, L, eye)
  v = -jax.scipy.linalg.cho_solve((L_safe, True), bs)
  v = jnp.where(ok & ~failed, v, 0.0)
  active = la != 0

  # on constraint: renormalize onto the ellipsoid (ref :724-734)
  res = v * d_s
  s2 = jnp.sum(jnp.where(msk > 0, (res / d_s) ** 2, 0.0))
  scl = jnp.sqrt(r * r / jnp.maximum(_MINVAL, s2))
  res = jnp.where(active, res * scl, res)
  return res * msk


def noslip(m: Model, d: Data) -> Data:
  """Runs the noslip post-pass; returns Data with polished friction."""
  from mujoco_inversedynamicstest_tpu.ops import constraint as con_mod
  from mujoco_inversedynamicstest_tpu.ops import collision

  lay = con_mod.row_layout(m)
  nefc = lay.nefc
  units = _units(m, nefc, lay)
  if units.n == 0 or nefc == 0:
    return d

  dtype = d.qpos.dtype
  clay = collision.contact_layout(m)

  # dual matrix AR = J M^-1 J' + R  (ref mj_projectConstraint:2121)
  JT = d.efc_J.T                                   # (nv, nefc)
  MinvJT = smooth.solve_m(m, d, JT)
  AR = d.efc_J @ MinvJT + jnp.diag(d.efc_R)
  b = d.efc_J @ d.qacc_smooth - d.efc_aref

  ARdiag_noR = jnp.maximum(_MINVAL, jnp.diag(AR) - d.efc_R)
  R = d.efc_R

  # per-unit gathers (static tables lifted to device arrays for the scan)
  u_rows = jnp.asarray(units.rows)                 # (n, _BMAX)
  u_msk = jnp.asarray(
      np.arange(_BMAX)[None, :] < units.nrow[:, None], dtype)
  u_kind = jnp.asarray(units.kind)
  u_nrow = jnp.asarray(units.nrow)
  u_normal = jnp.asarray(np.minimum(units.normal, nefc - 1))
  fric_slots = np.maximum(units.slot, 0)

  floss_u = d.efc_frictionloss[np.minimum(units.rows[:, 0], nefc - 1)]
  fr_all = d.contact.friction if clay.ncon else jnp.zeros((1, 5), dtype)
  mu_ell = fr_all[fric_slots]                      # (n, 5)

  def sweep(force):
    improvement = jnp.zeros((), dtype)

    def body(carry, k):
      force, imp = carry
      rows = u_rows[k]
      msk = u_msk[k]
      kind = u_kind[k]
      rsel = jnp.minimum(rows, nefc - 1)
      valid = rows < nefc

      # residual with R removed on the block rows (flg_subR)
      ARrows = AR[rsel]                            # (_BMAX, nefc)
      res = (b[rsel] + ARrows @ force
             - R[rsel] * force[rsel]) * msk
      fold = force[rsel] * msk

      # --- dry friction scalar update ---
      fl = floss_u[k]
      f_dry0 = fold[0] - res[0] / ARdiag_noR[rsel[0]]
      f_dry = jnp.clip(f_dry0, -fl, fl)
      delta_dry = f_dry - fold[0]
      imp_dry = -(0.5 * delta_dry * delta_dry * ARdiag_noR[rsel[0]]
                  + delta_dry * res[0])
      new_dry = jnp.zeros(_BMAX, dtype).at[0].set(f_dry)

      # --- block quantities (pyramidal pair / elliptic) ---
      Ac = ARrows[:, rsel] * msk[:, None] * msk[None, :]
      Ac = Ac - jnp.diag(R[rsel] * msk)
      Ac = Ac + jnp.diag(jnp.maximum(1e-10, jnp.diag(Ac)) - jnp.diag(Ac))
      bc = res - Ac @ fold

      # --- pyramidal pair update ---
      mid = 0.5 * (fold[0] + fold[1])
      y0 = 0.5 * (fold[0] - fold[1])
      K1 = Ac[0, 0] + Ac[1, 1] - Ac[0, 1] - Ac[1, 0]
      K0 = mid * (Ac[0, 0] - Ac[1, 1]) + bc[0] - bc[1]
      y = jnp.clip(-K0 / jnp.where(K1 < _MINVAL, 1.0, K1), -mid, mid)
      y = jnp.where(K1 < _MINVAL, 0.0, y)
      new_pyr = jnp.zeros(_BMAX, dtype).at[0].set(mid + y).at[1].set(mid - y)

      # --- elliptic QCQP update ---
      f_norm = force[u_normal[k]]
      mu_k = mu_ell[k]
      v = _qcqp(Ac, bc, mu_k, f_norm, u_nrow[k])
      new_ell = jnp.where(f_norm < _MINVAL, jnp.zeros(_BMAX, dtype), v)

      new = jnp.where(kind == _DRY, new_dry,
                      jnp.where(kind == _PYR, new_pyr, new_ell)) * msk

      # cost change; restore if positive (ref costChange:213)
      delta = new - fold
      change = 0.5 * delta @ (Ac @ delta) + delta @ res
      change_dry = imp_dry * -1.0
      change = jnp.where(kind == _DRY, change_dry, change)
      restore = (change > 1e-10) & (kind != _DRY)
      new = jnp.where(restore, fold, new)
      change = jnp.where(restore, 0.0, change)

      force = force.at[rows].set(
          jnp.where(valid, new, force[rsel]), mode="drop")
      return (force, imp - change), None

    (force, improvement), _ = jax.lax.scan(
        body, (force, improvement), jnp.arange(units.n))
    return force, improvement

  scale = 1.0 / (m.stat_meaninertia * max(1, m.nv))
  maxiter = m.opt.noslip_iterations

  def cond(carry):
    force, it, imp = carry
    return (it < maxiter) & (imp >= m.opt.noslip_tolerance)

  def body(carry):
    force, it, _ = carry
    force, imp = sweep(force)
    return force, it + 1, imp * scale

  force0 = d.efc_force
  # iteration 0 includes the regularization-energy correction (ref :577)
  reg_corr = 0.5 * jnp.sum(force0 * force0 * R) * scale
  force, imp1 = sweep(force0)
  force, it, imp = jax.lax.while_loop(
      cond, body,
      (force, jnp.asarray(1, jnp.int32), imp1 * scale + reg_corr))

  qfrc = d.efc_J.T @ force
  qacc = d.qacc_smooth + smooth.solve_m(m, d, qfrc)
  return d.replace(
      efc_force=force, qfrc_constraint=qfrc, qacc=qacc,
      solver_niter=d.solver_niter + it,
  )
