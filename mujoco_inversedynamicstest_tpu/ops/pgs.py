"""Dual projected Gauss-Seidel solver (``mj_solPGS`` analog).

The reference's third solver (``src/engine/engine_solver.c:328``) works in
the dual: minimize ``½ f'(A+R)f + f'b`` over constraint forces ``f`` with
``A = J M⁻¹ Jᵀ`` (``mj_projectConstraint``,
``engine_core_constraint.c:2121``), ``b = J qacc_smooth − aref``, subject
to per-constraint feasibility — equality rows free, friction rows boxed
to ±frictionloss, inequality rows nonnegative, elliptic contact blocks
inside the friction cone (normal/ray update + friction QCQP at fixed
normal).

TPU mapping (same strategy as the noslip post-pass, ``ops/noslip.py``):
the dual matrix is one dense MXU product; the inherently sequential
Gauss-Seidel sweep is a ``lax.scan`` over a static unit table (scalar
rows for equality/friction/limit/pyramidal contacts — the reference
treats every non-elliptic row as a scalar — and 6-wide padded blocks for
elliptic contacts); sweeps iterate under ``lax.while_loop`` with the
reference's scaled-improvement termination, recording per-iteration
stats like the primal solvers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    ConeType,
    Data,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math, smooth
from mujoco_inversedynamicstest_tpu.ops import noslip as noslip_mod

_MINVAL = math.MINVAL
_BLK = 6  # max elliptic block width (condim <= 6)

_FREE = 0     # equality: unconstrained
_BOXED = 1    # dof/tendon friction: |f| <= frictionloss
_LOWER = 2    # limits, frictionless + pyramidal contact rows: f >= 0
_ELL = 3      # elliptic contact block


class _Units(NamedTuple):
  n: int
  kind: np.ndarray    # (n,)
  rows: np.ndarray    # (n, _BLK) efc rows (pad nefc)
  nrow: np.ndarray    # (n,)
  slot: np.ndarray    # (n,) contact slot for elliptic (-1 else)


def _units(m: Model, nefc: int, lay) -> _Units:
  from mujoco_inversedynamicstest_tpu.ops import collision

  clay = collision.contact_layout(m)
  kind, rows, nrow, slot = [], [], [], []

  def pad(r):
    return r + [nefc] * (_BLK - len(r))

  for i in range(lay.ne):
    kind.append(_FREE); rows.append(pad([i])); nrow.append(1); slot.append(-1)
  for i in range(lay.ne, lay.ne + lay.nf):
    kind.append(_BOXED); rows.append(pad([i])); nrow.append(1); slot.append(-1)
  for i in range(lay.ne + lay.nf, lay.ne + lay.nf + lay.nl):
    kind.append(_LOWER); rows.append(pad([i])); nrow.append(1); slot.append(-1)

  base = lay.ne + lay.nf + lay.nl
  elliptic = m.opt.cone == ConeType.ELLIPTIC
  for s, condim in enumerate(clay.dim):
    adr = base + int(clay.efc_address[s])
    if condim == 1 or not elliptic:
      nrows = 1 if condim == 1 else 2 * (condim - 1)
      for j in range(nrows):
        kind.append(_LOWER); rows.append(pad([adr + j]))
        nrow.append(1); slot.append(-1)
    else:
      kind.append(_ELL)
      rows.append(pad([adr + j for j in range(condim)]))
      nrow.append(int(condim)); slot.append(s)

  return _Units(
      n=len(kind), kind=np.asarray(kind, np.int32),
      rows=np.asarray(rows, np.int32), nrow=np.asarray(nrow, np.int32),
      slot=np.asarray(slot, np.int32),
  )


def pgs(m: Model, d: Data) -> Data:
  """Runs dual PGS from the warmstarted forces; returns updated Data."""
  from mujoco_inversedynamicstest_tpu.ops import collision
  from mujoco_inversedynamicstest_tpu.ops import constraint as con_mod

  lay = con_mod.row_layout(m)
  nefc = lay.nefc
  dtype = d.qpos.dtype
  units = _units(m, nefc, lay)
  clay = collision.contact_layout(m)

  # dual quantities
  JT = d.efc_J.T
  MinvJT = smooth.solve_m(m, d, JT)
  AR = d.efc_J @ MinvJT + jnp.diag(d.efc_R)
  b = d.efc_J @ d.qacc_smooth - d.efc_aref
  ARdiag = jnp.maximum(_MINVAL, jnp.diag(AR))

  # initial forces: primal-consistent forces at the warmstarted qacc
  # (ref mj_fwdConstraint:670-690: constraintUpdate at the warmstart)
  from mujoco_inversedynamicstest_tpu.models.types import DisableBit

  qacc0 = d.qacc_smooth
  if not (m.opt.disableflags & DisableBit.WARMSTART):
    jar_w = d.efc_J @ d.qacc_warmstart - d.efc_aref
    jar_s = d.efc_J @ d.qacc_smooth - d.efc_aref
    fw, cw, _, _ = con_mod.forces_cost(m, d, jar_w)
    fs, cs, _, _ = con_mod.forces_cost(m, d, jar_s)
    force0 = jnp.where(cw < cs, fw, fs)
  else:
    force0, _, _, _ = con_mod.forces_cost(
        m, d, d.efc_J @ qacc0 - d.efc_aref)

  u_rows = jnp.asarray(units.rows)
  u_msk = jnp.asarray(
      np.arange(_BLK)[None, :] < units.nrow[:, None], dtype)
  u_kind = jnp.asarray(units.kind)
  u_nrow = jnp.asarray(units.nrow)
  floss_u = d.efc_frictionloss[np.minimum(units.rows[:, 0], nefc - 1)]
  fr_all = (d.contact.friction if clay.ncon
            else jnp.zeros((1, 5), dtype))
  mu_ell = fr_all[np.maximum(units.slot, 0)]       # (n, 5)

  def sweep(force):
    def body(carry, k):
      force, imp = carry
      rows = u_rows[k]
      msk = u_msk[k]
      kind = u_kind[k]
      rsel = jnp.minimum(rows, nefc - 1)
      valid = rows < nefc

      ARrows = AR[rsel]                           # (_BLK, nefc)
      res = (b[rsel] + ARrows @ force) * msk      # residual incl. R
      fold = force[rsel] * msk
      Athis = ARrows[:, rsel] * msk[:, None] * msk[None, :]
      Athis = Athis + jnp.diag(jnp.where(msk > 0, 0.0, 1.0))

      # --- scalar update with bounds by kind ---
      f0 = fold[0] - res[0] / ARdiag[rsel[0]]
      fl = floss_u[k]
      lo = jnp.where(kind == _BOXED, -fl,
                     jnp.where(kind == _LOWER, 0.0, -jnp.inf))
      hi = jnp.where(kind == _BOXED, fl, jnp.inf)
      new_scalar = jnp.zeros(_BLK, dtype).at[0].set(jnp.clip(f0, lo, hi))

      # --- elliptic block update (ref mj_solPGS:393-492) ---
      f_n = fold[0]
      # normal update branch (f_n ~ 0): nonnegative scalar, friction 0
      f_n_upd = jnp.maximum(0.0, f_n - res[0] / ARdiag[rsel[0]])
      # ray update branch: scale the whole force ray
      v1 = Athis @ fold
      denom = jnp.dot(fold, v1)
      x = -jnp.dot(fold, res) / jnp.where(denom < _MINVAL, 1.0, denom)
      x = jnp.where(denom < _MINVAL, 0.0, x)
      x = jnp.where(f_n + x * f_n < 0, -1.0, x)   # keep normal >= 0
      ray = fold * (1.0 + x)
      f_ell = jnp.where(f_n < _MINVAL,
                        jnp.zeros(_BLK, dtype).at[0].set(f_n_upd), ray)
      fn_new = f_ell[0]
      # friction QCQP at fixed normal: Ac/bc on rows 1..dim-1
      Ac = Athis[1:, 1:]
      bc = (res[1:] - Ac @ fold[1:]
            + Athis[1:, 0] * (fn_new - fold[0])) * msk[1:]
      vfr = noslip_mod._qcqp(Ac, bc, mu_ell[k], fn_new, u_nrow[k] - 1)
      f_ell = f_ell.at[1:].set(
          jnp.where(fn_new < _MINVAL, jnp.zeros(5, dtype), vfr))
      f_ell = f_ell * msk

      new = jnp.where(kind == _ELL, f_ell, new_scalar) * msk

      # cost change (ref costChange:213): 0.5 d'Ad + d'res, A incl. R
      delta = new - fold
      change = 0.5 * delta @ (Athis @ delta) + delta @ res
      imp = imp - change

      force = force.at[rows].set(
          jnp.where(valid, new, force[rsel]), mode="drop")
      return (force, imp), None

    (force, imp), _ = jax.lax.scan(
        body, (force, jnp.zeros((), dtype)), jnp.arange(units.n))
    return force, imp

  scale = 1.0 / (m.stat_meaninertia * max(1, m.nv))
  tol = jnp.maximum(jnp.asarray(m.opt.tolerance, dtype),
                    10 * jnp.finfo(dtype).eps)
  cap = d.solver_stat.shape[0]

  def cond(carry):
    force, it, imp, stats = carry
    return (it < m.opt.iterations) & (imp >= tol)

  def body(carry):
    force, it, _, stats = carry
    force, imp = sweep(force)
    imp = imp * scale
    row = jnp.stack([imp, jnp.zeros((), dtype), jnp.zeros((), dtype)])
    slot = jnp.minimum(it, cap - 1)
    upd = jax.lax.dynamic_update_slice(
        stats, row[None].astype(stats.dtype), (slot, jnp.zeros_like(slot)))
    stats = jnp.where(it < cap, upd, stats)
    return force, it + 1, imp, stats

  stats0 = jnp.zeros_like(d.solver_stat)
  force, it, imp, stats = jax.lax.while_loop(
      cond, body,
      (force0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype),
       stats0))

  qfrc = d.efc_J.T @ force
  qacc = d.qacc_smooth + smooth.solve_m(m, d, qfrc)
  return d.replace(
      efc_force=force, qfrc_constraint=qfrc, qacc=qacc,
      qacc_warmstart=qacc, solver_niter=it, solver_stat=stats,
  )
