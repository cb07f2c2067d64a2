"""Constraint assembly: static-shape efc rows with activity masks.

Analog of the reference constraint pipeline
(``src/engine/engine_core_constraint.c``): row instantiation
(``mj_instantiateEquality``:493, ``mj_instantiateFriction``:768,
``mj_instantiateLimit``:824), diagonal approximation (``mj_diagApprox``:1138),
impedance (``mj_makeImpedance``:1494), reference acceleration
(``mj_referenceConstraint``:2362) and the state-dependent force update
(``mj_constraintUpdate``:2556).

TPU-first re-design: the reference allocates only *active* rows in a dynamic
arena; here every potential row exists statically (equality rows per
equality element, two limit rows per limited scalar joint, one per limited
ball joint, one friction row per frictional dof) and inactivity is encoded
by zeroing the row's Jacobian and regularization (D = 0), which makes
inactive rows exact no-ops in every downstream reduction.  Row order
follows the reference: equality, friction, limits, contacts — so the
``ne/nf/nl`` segmentation semantics carry over.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    ConstraintType,
    Data,
    DisableBit,
    EqType,
    JointType,
    Model,
    ObjType,
)
from mujoco_inversedynamicstest_tpu.ops import math
from mujoco_inversedynamicstest_tpu.ops import support

# mjMINIMP / mjMAXIMP (reference include/mujoco/mjmodel.h)
_MINIMP = 0.0001
_MAXIMP = 0.9999

_EQ_ROWS = {EqType.CONNECT: 3, EqType.WELD: 6, EqType.JOINT: 1,
            EqType.TENDON: 1, EqType.DISTANCE: 1}


class RowLayout(NamedTuple):
  """Static efc row layout for a model."""
  ne: int
  nf: int
  nl: int
  ncon_rows: int
  nefc: int
  efc_type: np.ndarray   # (nefc,)
  efc_id: np.ndarray     # (nefc,)


def row_layout(m: Model) -> RowLayout:
  """Computes the static constraint row budget and type/id tables."""
  from mujoco_inversedynamicstest_tpu.ops import collision

  flags = m.opt.disableflags
  types, ids = [], []
  ne = nf = nl = 0

  # contact rows (ref mj_instantiateContact:964): pyramidal 2(dim-1) rows,
  # elliptic dim rows, frictionless 1
  from mujoco_inversedynamicstest_tpu.models.types import ConeType

  elliptic = m.opt.cone == ConeType.ELLIPTIC
  con_types, con_ids = [], []
  clay = collision.contact_layout(m)
  for slot, condim in enumerate(clay.dim):
    if condim == 1:
      con_types.append(ConstraintType.CONTACT_FRICTIONLESS)
      con_ids.append(slot)
    elif elliptic:
      con_types += [ConstraintType.CONTACT_ELLIPTIC] * condim
      con_ids += [slot] * condim
    else:
      con_types += [ConstraintType.CONTACT_PYRAMIDAL] * (2 * (condim - 1))
      con_ids += [slot] * (2 * (condim - 1))
  ncon_rows = len(con_types)

  if not (flags & DisableBit.CONSTRAINT):
    if not (flags & DisableBit.EQUALITY):
      for i in range(m.neq):
        if m.eq_type[i] == EqType.FLEX:
          # one row per non-rigid edge of the flex (ref :721-745)
          rows = len(_flex_eq_edges(m, int(m.eq_obj1id[i])))
        else:
          rows = _EQ_ROWS.get(EqType(m.eq_type[i]))
        if rows is None:
          raise NotImplementedError(f"equality type {m.eq_type[i]}")
        if m.eq_type[i] == EqType.DISTANCE:
          # removed from the reference in MuJoCo 2.2.2 (its reader throws)
          raise NotImplementedError("distance equality (removed upstream)")
        types += [ConstraintType.EQUALITY] * rows
        ids += [i] * rows
        ne += rows
    if not (flags & DisableBit.FRICTIONLOSS):
      for i in np.nonzero(m.dof_frictionloss_nz)[0]:
        types.append(ConstraintType.FRICTION_DOF)
        ids.append(int(i))
        nf += 1
      for t in np.nonzero(m.tendon_frictionloss_nz)[0]:
        types.append(ConstraintType.FRICTION_TENDON)
        ids.append(int(t))
        nf += 1
    if not (flags & DisableBit.LIMIT):
      for j in np.nonzero(m.jnt_limited)[0]:
        t = JointType(m.jnt_type[j])
        rows = 1 if t == JointType.BALL else 2
        if t == JointType.FREE:
          raise ValueError("free joints cannot be limited")
        types += [ConstraintType.LIMIT_JOINT] * rows
        ids += [int(j)] * rows
        nl += rows
      for t in np.nonzero(m.tendon_limited)[0]:
        types += [ConstraintType.LIMIT_TENDON] * 2
        ids += [int(t)] * 2
        nl += 2

  nefc = ne + nf + nl + ncon_rows
  return RowLayout(
      ne=ne, nf=nf, nl=nl, ncon_rows=ncon_rows, nefc=nefc,
      efc_type=np.array(types + con_types, dtype=np.int32),
      efc_id=np.array(ids + con_ids, dtype=np.int32),
  )


# kept for the smooth-path fast check used elsewhere
def count_rows(m: Model) -> dict:
  lay = row_layout(m)
  return dict(ne=lay.ne, nf=lay.nf, nl=lay.nl)


def collision_stage(m: Model, d: Data) -> Data:
  """Collision detection (analog of ``mj_collision``, reference
  ``src/engine/engine_collision_driver.c:265``)."""
  from mujoco_inversedynamicstest_tpu.ops import collision

  return collision.collision(m, d)


def _flex_eq_edges(m: Model, f: int) -> np.ndarray:
  """Static global indices of the non-rigid edges of flex ``f``."""
  adr, num = int(m.flex_edgeadr[f]), int(m.flex_edgenum[f])
  local = np.nonzero(~m.flexedge_rigid[adr:adr + num])[0]
  return (local + adr).astype(np.int32)


def _eq_rows(m: Model, d: Data, i: int):
  """Jacobian + residual rows for one equality element (static index).

  Follows ``mj_instantiateEquality`` (ref :493).  Returns (J, pos, active)
  with J (rows, nv).
  """
  dtype = d.qpos.dtype
  nv = m.nv
  etype = EqType(m.eq_type[i])
  data = m.eq_data[i]
  active = d.eq_active[i]
  o1, o2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
  is_site = int(m.eq_objtype[i]) == ObjType.SITE

  if etype in (EqType.CONNECT, EqType.WELD):
    if is_site:
      b1, b2 = int(m.site_bodyid[o1]), int(m.site_bodyid[o2])
      pos1, pos2 = d.site_xpos[o1], d.site_xpos[o2]
    else:
      b1, b2 = o1, o2
      if etype == EqType.CONNECT:
        anchor1, anchor2 = data[0:3], data[3:6]
      else:
        anchor1, anchor2 = data[3:6], data[0:3]
      pos1 = d.xmat[b1] @ anchor1 + d.xpos[b1]
      pos2 = d.xmat[b2] @ anchor2 + d.xpos[b2]

    jacp1, jacr1 = support.jac(m, d, pos1, b1)
    jacp2, jacr2 = support.jac(m, d, pos2, b2)
    jdifp = (jacp1 - jacp2).T            # (3, nv)
    cpos = pos1 - pos2

    if etype == EqType.CONNECT:
      return jdifp, cpos, active

    # WELD: add orientation rows
    torquescale = data[10]
    relpose = data[6:10]
    if is_site:
      q0 = math.quat_mul(d.xquat[b1], m.site_quat[o1])
      q1 = math.quat_mul(d.xquat[b2], m.site_quat[o2])
      quat = q0  # site semantics: relpose not used
    else:
      quat = math.quat_mul(d.xquat[b1], relpose)   # q0 * relpose
      q1 = d.xquat[b2]
    quat1 = math.quat_conj(q1)
    crot = math.quat_mul(quat1, quat)[1:4] * torquescale

    # rotation Jacobian: 0.5 * [neg(q1) * (jacr1-jacr2)_col * q0*relpose]
    jdifr = jacr1 - jacr2                 # (nv, 3)
    zeros = jnp.zeros((nv, 1), dtype=dtype)
    axis_quat = jnp.concatenate([zeros, jdifr], axis=1)  # (nv, 4)
    q2 = math.quat_mul(quat1[None, :], axis_quat)
    q3 = math.quat_mul(q2, quat[None, :])
    jrot = (0.5 * torquescale) * q3[:, 1:4].T  # (3, nv)

    return (
        jnp.concatenate([jdifp, jrot], axis=0),
        jnp.concatenate([cpos, crot]),
        active,
    )

  if etype == EqType.FLEX:
    # one row per non-rigid edge: residual = length - length0, Jacobian =
    # the flex edge Jacobian row (ref mj_instantiateEquality :721-745)
    edges = _flex_eq_edges(m, o1)
    J = d.flexedge_J[edges]
    cpos = d.flexedge_length[edges] - m.flexedge_length0[edges]
    return J, cpos, active

  if etype in (EqType.JOINT, EqType.TENDON):
    # cubic coupling of two scalar positions (ref :640-718); joint uses
    # qpos/qpos0 with a unit dof Jacobian, tendon uses
    # ten_length/tendon_length0 with the tendon Jacobian
    if etype == EqType.JOINT:
      p1 = d.qpos[m.jnt_qposadr[o1]]
      r1 = m.qpos0[m.jnt_qposadr[o1]]
      row = jnp.zeros((1, nv), dtype=dtype).at[0, m.jnt_dofadr[o1]].set(1.0)
    else:
      p1 = d.ten_length[o1]
      r1 = m.tendon_length0[o1]
      row = d.ten_J[o1][None]
    if o2 >= 0:
      if etype == EqType.JOINT:
        p2 = d.qpos[m.jnt_qposadr[o2]]
        r2 = m.qpos0[m.jnt_qposadr[o2]]
        j2 = jnp.zeros((1, nv), dtype=dtype).at[0, m.jnt_dofadr[o2]].set(1.0)
      else:
        p2 = d.ten_length[o2]
        r2 = m.tendon_length0[o2]
        j2 = d.ten_J[o2][None]
      dif = p2 - r2
      powers = jnp.stack([jnp.ones_like(dif), dif, dif**2, dif**3, dif**4])
      cpos = p1 - r1 - jnp.dot(data[0:5], powers)
      deriv = (
          data[1] + 2 * data[2] * dif + 3 * data[3] * dif**2
          + 4 * data[4] * dif**3
      )
      row = row - deriv * j2
    else:
      cpos = p1 - r1 - data[0]
    return row, cpos[None], active

  raise NotImplementedError(f"equality type {etype}")


def _eq_diag_approx(m: Model, i: int) -> jax.Array:
  """Per-row inverse-inertia approximation for one equality element
  (ref ``mj_diagApprox``:1138)."""
  etype = EqType(m.eq_type[i])
  o1, o2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
  if etype in (EqType.CONNECT, EqType.WELD):
    if int(m.eq_objtype[i]) == ObjType.SITE:
      b1, b2 = int(m.site_bodyid[o1]), int(m.site_bodyid[o2])
    else:
      b1, b2 = o1, o2
    tran = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
    if etype == EqType.CONNECT:
      return jnp.tile(tran, (3,))
    rot = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
    return jnp.concatenate([jnp.tile(tran, (3,)), jnp.tile(rot, (3,))])
  if etype == EqType.JOINT:
    da = m.dof_invweight0[m.jnt_dofadr[o1]]
    if o2 >= 0:
      da = da + m.dof_invweight0[m.jnt_dofadr[o2]]
    return da[None]
  if etype == EqType.TENDON:
    da = m.tendon_invweight0[o1]
    if o2 >= 0:
      da = da + m.tendon_invweight0[o2]
    return da[None]
  if etype == EqType.FLEX:
    # per-edge invweight (ref mj_diagApprox :1198-1210)
    return m.flexedge_invweight0[_flex_eq_edges(m, o1)]
  raise NotImplementedError(f"equality type {etype}")


def _impedance(solimp: jax.Array, pos: jax.Array, margin: jax.Array):
  """Constraint impedance and its derivative (ref ``getimpedance``:1441).

  solimp = (dmin, dmax, width, midpoint, power); operates row-wise.
  """
  d0 = jnp.clip(solimp[:, 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[:, 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[:, 2], 0.0)
  mid = jnp.clip(solimp[:, 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[:, 4], 1.0)

  flat = (d0 == dmax) | (width <= math.MINVAL)

  x_raw = (pos - margin) / jnp.maximum(width, math.MINVAL)
  sgn = jnp.where(x_raw < 0, -1.0, 1.0)
  x = jnp.clip(jnp.abs(x_raw), 0.0, 1.0)

  # spline y(x): a*x^p below midpoint, 1-b*(1-x)^p above
  xm = jnp.maximum(x, math.MINVAL)
  a = 1.0 / jnp.maximum(mid, math.MINVAL) ** (power - 1)
  b = 1.0 / jnp.maximum(1 - mid, math.MINVAL) ** (power - 1)
  y_lo = a * xm**power
  yp_lo = power * a * xm ** (power - 1)
  one_mx = jnp.maximum(1 - x, math.MINVAL)
  y_hi = 1 - b * one_mx**power
  yp_hi = power * b * one_mx ** (power - 1)

  below = x <= mid
  y = jnp.where(power == 1, x, jnp.where(below, y_lo, y_hi))
  yp = jnp.where(power == 1, 1.0, jnp.where(below, yp_lo, yp_hi))

  saturated = (jnp.abs(x_raw) >= 1) | (x <= 0)
  y_sat = jnp.where(jnp.abs(x_raw) >= 1, 1.0, 0.0)

  imp = jnp.where(saturated, d0 + y_sat * (dmax - d0), d0 + y * (dmax - d0))
  impp = jnp.where(
      saturated, 0.0,
      yp * sgn * (dmax - d0) / jnp.maximum(width, math.MINVAL),
  )
  imp_flat = 0.5 * (d0 + dmax)
  return jnp.where(flat, imp_flat, imp), jnp.where(flat, 0.0, impp)


def _kbip(m: Model, solref: jax.Array, solimp: jax.Array, imp: jax.Array,
          impp: jax.Array, is_friction: np.ndarray):
  """Stiffness/damping per row (ref ``mj_makeImpedance``:1494)."""
  ref0, ref1 = solref[:, 0], solref[:, 1]
  if not (m.opt.disableflags & DisableBit.REFSAFE):
    ref0 = jnp.where(ref0 > 0, jnp.maximum(ref0, 2 * m.opt.timestep), ref0)

  dmax = jnp.clip(solimp[:, 1], _MINIMP, _MAXIMP)
  k_std = 1.0 / jnp.maximum(
      math.MINVAL, dmax**2 * ref0**2 * ref1**2
  )
  k_direct = -ref0 / jnp.maximum(math.MINVAL, dmax**2)
  k = jnp.where(ref0 > 0, k_std, k_direct)
  k = jnp.where(jnp.asarray(is_friction), 0.0, k)

  b_std = 2.0 / jnp.maximum(math.MINVAL, dmax * ref0)
  b_direct = -ref1 / jnp.maximum(math.MINVAL, dmax)
  b = jnp.where(ref1 > 0, b_std, b_direct)

  return jnp.stack([k, b, imp, impp], axis=1)


def make_constraint(m: Model, d: Data) -> Data:
  """Builds all constraint rows (analog ``mj_makeConstraint``:2005)."""
  lay = row_layout(m)
  dtype = d.qpos.dtype
  nv = m.nv

  if lay.nefc == 0:
    z = jnp.zeros(0, dtype=dtype)
    return d.replace(
        ne=0, nf=0, nl=0, nefc=0,
        efc_J=jnp.zeros((0, nv), dtype=dtype), efc_pos=z, efc_margin=z,
        efc_frictionloss=z, efc_D=z, efc_R=z, efc_aref=z, efc_force=z,
        efc_active=jnp.zeros(0, dtype=bool), efc_KBIP=jnp.zeros((0, 4),
                                                               dtype=dtype),
        efc_type=lay.efc_type, efc_id=lay.efc_id,
    )

  J_rows, pos_rows, margin_rows, floss_rows = [], [], [], []
  active_rows, solref_rows, solimp_rows, diag_rows = [], [], [], []
  zero = jnp.zeros((), dtype=dtype)

  # --- equality rows ---
  if lay.ne:
    for i in range(m.neq):
      Ji, pi, acti = _eq_rows(m, d, i)
      rows = Ji.shape[0]
      J_rows.append(Ji)
      pos_rows.append(pi)
      margin_rows.append(jnp.zeros(rows, dtype=dtype))
      floss_rows.append(jnp.zeros(rows, dtype=dtype))
      active_rows.append(jnp.tile(acti, (rows,)))
      solref_rows.append(jnp.tile(m.eq_solref[i], (rows, 1)))
      solimp_rows.append(jnp.tile(m.eq_solimp[i], (rows, 1)))
      diag_rows.append(_eq_diag_approx(m, i))

  # --- dof + tendon friction rows ---
  if lay.nf:
    fdofs = np.nonzero(m.dof_frictionloss_nz)[0]
    if fdofs.size:
      eye = jnp.zeros((len(fdofs), nv), dtype=dtype)
      eye = eye.at[np.arange(len(fdofs)), fdofs].set(1.0)
      J_rows.append(eye)
      pos_rows.append(jnp.zeros(len(fdofs), dtype=dtype))
      margin_rows.append(jnp.zeros(len(fdofs), dtype=dtype))
      floss_rows.append(m.dof_frictionloss[fdofs])
      active_rows.append(jnp.ones(len(fdofs), dtype=bool))
      solref_rows.append(m.dof_solref[fdofs])
      solimp_rows.append(m.dof_solimp[fdofs])
      diag_rows.append(m.dof_invweight0[fdofs])
    ftens = np.nonzero(m.tendon_frictionloss_nz)[0]
    if ftens.size:
      J_rows.append(d.ten_J[ftens])
      pos_rows.append(jnp.zeros(len(ftens), dtype=dtype))
      margin_rows.append(jnp.zeros(len(ftens), dtype=dtype))
      floss_rows.append(m.tendon_frictionloss[ftens])
      active_rows.append(jnp.ones(len(ftens), dtype=bool))
      solref_rows.append(m.tendon_solref_fri[ftens])
      solimp_rows.append(m.tendon_solimp_fri[ftens])
      diag_rows.append(m.tendon_invweight0[ftens])

  # --- joint + tendon limit rows (vectorized; order restored to the
  # reference's joint-id interleaving via a static permutation) ---
  if lay.nl:
    limited = np.nonzero(m.jnt_limited)[0]
    jt = m.jnt_type[limited]
    sj = limited[np.isin(jt, (JointType.HINGE, JointType.SLIDE))]
    bj = limited[jt == JointType.BALL]

    blocks = []  # (joint_id_key, J, pos, margin, act, solref, solimp, diag)
    if sj.size:
      ns = len(sj)
      padr, vadr = m.jnt_qposadr[sj], m.jnt_dofadr[sj]
      value = d.qpos[padr]
      margin = m.jnt_margin[sj]
      dist = jnp.stack(
          [value - m.jnt_range[sj, 0], m.jnt_range[sj, 1] - value], axis=1
      )
      act = dist < margin[:, None]
      signs = jnp.asarray([1.0, -1.0], dtype=dtype)
      Js = jnp.zeros((ns, 2, nv), dtype=dtype)
      Js = Js.at[np.arange(ns)[:, None], np.arange(2)[None, :],
                 vadr[:, None]].set(signs[None, :] * act)
      key = np.repeat(sj, 2)
      blocks.append((
          key, Js.reshape(2 * ns, nv), dist.reshape(-1),
          jnp.repeat(margin, 2), act.reshape(-1),
          jnp.repeat(m.jnt_solref[sj], 2, axis=0),
          jnp.repeat(m.jnt_solimp[sj], 2, axis=0),
          jnp.repeat(m.dof_invweight0[vadr], 2),
      ))

    if bj.size:
      nb = len(bj)
      qidx = m.jnt_qposadr[bj][:, None] + np.arange(4)[None, :]
      vadr = m.jnt_dofadr[bj]
      quat = math.normalize_quat(d.qpos[qidx])
      aa = math.quat_sub(
          quat, jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype=dtype), (nb, 1))
      )
      angle = math.norm_safe(aa, axis=1)
      axis = aa / angle[:, None]
      margin = m.jnt_margin[bj]
      dist = jnp.max(m.jnt_range[bj], axis=1) - angle
      act = dist < margin
      Jb = jnp.zeros((nb, nv), dtype=dtype)
      Jb = Jb.at[np.arange(nb)[:, None],
                 vadr[:, None] + np.arange(3)[None, :]].set(
                     -axis * act[:, None])
      blocks.append((
          bj, Jb, dist, margin, act, m.jnt_solref[bj], m.jnt_solimp[bj],
          m.dof_invweight0[vadr],
      ))

    if blocks:
      keys = np.concatenate([b[0] for b in blocks])
      perm = np.argsort(keys, kind="stable")
      J_rows.append(jnp.concatenate([b[1] for b in blocks])[perm])
      pos_rows.append(jnp.concatenate([b[2] for b in blocks])[perm])
      margin_rows.append(jnp.concatenate([b[3] for b in blocks])[perm])
      floss_rows.append(jnp.zeros(len(keys), dtype=dtype))
      active_rows.append(jnp.concatenate([b[4] for b in blocks])[perm])
      solref_rows.append(jnp.concatenate([b[5] for b in blocks])[perm])
      solimp_rows.append(jnp.concatenate([b[6] for b in blocks])[perm])
      diag_rows.append(jnp.concatenate([b[7] for b in blocks])[perm])

    # tendon limits (two sides each; ref :925-960)
    tl = np.nonzero(m.tendon_limited)[0]
    if tl.size:
      nt = len(tl)
      margin = m.tendon_margin[tl]
      length = d.ten_length[tl]
      dist = jnp.stack(
          [length - m.tendon_range[tl, 0], m.tendon_range[tl, 1] - length],
          axis=1,
      )
      act = dist < margin[:, None]
      signs = jnp.asarray([1.0, -1.0], dtype=dtype)
      Jt = (
          d.ten_J[tl][:, None, :] * signs[None, :, None]
          * act[:, :, None]
      )
      J_rows.append(Jt.reshape(2 * nt, nv))
      pos_rows.append(dist.reshape(-1))
      margin_rows.append(jnp.repeat(margin, 2))
      floss_rows.append(jnp.zeros(2 * nt, dtype=dtype))
      active_rows.append(act.reshape(-1))
      solref_rows.append(jnp.repeat(m.tendon_solref_lim[tl], 2, axis=0))
      solimp_rows.append(jnp.repeat(m.tendon_solimp_lim[tl], 2, axis=0))
      diag_rows.append(jnp.repeat(m.tendon_invweight0[tl], 2))

  njoint_rows = lay.ne + lay.nf + lay.nl
  if njoint_rows:
    efc_J = jnp.concatenate(J_rows, axis=0)
    efc_pos = jnp.concatenate(pos_rows)
    efc_margin = jnp.concatenate(margin_rows)
    efc_floss = jnp.concatenate(floss_rows)
    efc_active = jnp.concatenate(active_rows)
    solref = jnp.concatenate(solref_rows, axis=0)
    solimp = jnp.concatenate(solimp_rows, axis=0)
    diag = jnp.concatenate(diag_rows)
  else:
    efc_J = jnp.zeros((0, nv), dtype=dtype)
    efc_pos = efc_margin = efc_floss = jnp.zeros(0, dtype=dtype)
    efc_active = jnp.zeros(0, dtype=bool)
    solref = jnp.zeros((0, 2), dtype=dtype)
    solimp = jnp.zeros((0, 5), dtype=dtype)
    diag = jnp.zeros(0, dtype=dtype)

  # impedance position: connect/weld blocks share the norm of their
  # residual vector (ref getposdim, engine_core_constraint.c:1392)
  imp_pos = efc_pos
  row = 0
  for i in range(m.neq) if lay.ne else []:
    etype = EqType(m.eq_type[i])
    nrows = (len(_flex_eq_edges(m, int(m.eq_obj1id[i])))
             if etype == EqType.FLEX else _EQ_ROWS[etype])
    if etype in (EqType.CONNECT, EqType.WELD):
      blk = math.norm_safe(
          jax.lax.dynamic_slice(efc_pos, (row,), (nrows,))
      )
      imp_pos = jax.lax.dynamic_update_slice(
          imp_pos, jnp.tile(blk, (nrows,)), (row,)
      )
    row += nrows

  imp, impp = _impedance(solimp, imp_pos, efc_margin)
  is_friction = np.isin(
      lay.efc_type[:njoint_rows],
      (ConstraintType.FRICTION_DOF, ConstraintType.FRICTION_TENDON),
  )
  kbip = _kbip(m, solref, solimp, imp, impp, is_friction)

  r = jnp.maximum(math.MINVAL, (1 - imp) * diag / imp)
  dvec = jnp.where(efc_active, 1.0 / r, 0.0)

  # --- contact rows (pyramidal; ref mj_instantiateContact:964) ---
  if lay.ncon_rows:
    cJ, cpos, cmargin, cactive, ckbip, cr, cd = _contact_rows(m, d)
    efc_J = jnp.concatenate([efc_J, cJ], axis=0)
    efc_pos = jnp.concatenate([efc_pos, cpos])
    efc_margin = jnp.concatenate([efc_margin, cmargin])
    efc_floss = jnp.concatenate(
        [efc_floss, jnp.zeros(lay.ncon_rows, dtype=dtype)]
    )
    efc_active = jnp.concatenate([efc_active, cactive])
    kbip = jnp.concatenate([kbip, ckbip], axis=0)
    r = jnp.concatenate([r, cr])
    dvec = jnp.concatenate([dvec, cd])

  return d.replace(
      ne=lay.ne, nf=lay.nf, nl=lay.nl, nefc=lay.nefc,
      efc_J=efc_J * efc_active[:, None].astype(dtype),
      efc_pos=efc_pos,
      efc_margin=efc_margin,
      efc_frictionloss=efc_floss,
      efc_D=dvec,
      efc_R=r,
      efc_aref=jnp.zeros(lay.nefc, dtype=dtype),
      efc_force=jnp.zeros(lay.nefc, dtype=dtype),
      efc_active=efc_active,
      efc_KBIP=kbip,
      efc_type=lay.efc_type,
      efc_id=lay.efc_id,
  )


def _eq_anchor(m: Model, d: Data, i: int, which: int):
  """World anchor point + body id for one side of a connect/weld element."""
  etype = EqType(m.eq_type[i])
  data = m.eq_data[i]
  oid = int((m.eq_obj1id, m.eq_obj2id)[which][i])
  if int(m.eq_objtype[i]) == ObjType.SITE:
    return int(m.site_bodyid[oid]), d.site_xpos[oid]
  if etype == EqType.CONNECT:
    anchor = data[0:3] if which == 0 else data[3:6]
  else:  # WELD
    anchor = data[3:6] if which == 0 else data[0:3]
  return oid, d.xmat[oid] @ anchor + d.xpos[oid]


def _eq_acc_bias(m: Model, d: Data, lay: RowLayout) -> jax.Array:
  """Velocity-product acceleration bias for connect/weld rows.

  The installed oracle subtracts the anchor-point acceleration bias
  (J-dot q-dot, via ``mj_jacDot``) from aref for connect and weld
  equality rows; rotational weld rows use the quaternion-product
  derivative of the orientation residual.
  """
  dtype = d.qpos.dtype
  bias = jnp.zeros(lay.nefc, dtype=dtype)
  if not lay.ne:
    return bias

  row = 0
  for i in range(m.neq):
    etype = EqType(m.eq_type[i])
    if etype == EqType.FLEX:
      # flex edge rows carry no Jdot-qdot correction (ref: aref for flex
      # equality uses the plain Baumgarte reference, engine_core_constraint)
      row += len(_flex_eq_edges(m, int(m.eq_obj1id[i])))
      continue
    nrows = _EQ_ROWS[etype]
    if etype not in (EqType.CONNECT, EqType.WELD):
      row += nrows
      continue

    b1, p1 = _eq_anchor(m, d, i, 0)
    b2, p2 = _eq_anchor(m, d, i, 1)
    jp1d, jr1d = support.jac_dot(m, d, p1, b1)
    jp2d, jr2d = support.jac_dot(m, d, p2, b2)
    bias_t = (jp1d - jp2d).T @ d.qvel
    bias = bias.at[row : row + 3].set(bias_t)

    if etype == EqType.WELD:
      # d/dt of the rotation residual Jacobian, contracted with qvel:
      # r = ts * vec(conj(q2) * Q),  Q = q0 * relpose (or site quats)
      data = m.eq_data[i]
      ts = data[10]
      o1, o2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
      if int(m.eq_objtype[i]) == ObjType.SITE:
        quat = math.quat_mul(d.xquat[b1], m.site_quat[o1])
        q2 = math.quat_mul(d.xquat[b2], m.site_quat[o2])
      else:
        quat = math.quat_mul(d.xquat[b1], data[6:10])
        q2 = d.xquat[b2]
      q2c = math.quat_conj(q2)

      _, jacr1 = support.jac(m, d, p1, b1)
      _, jacr2 = support.jac(m, d, p2, b2)
      wd = (jacr1 - jacr2).T @ d.qvel        # relative angular velocity
      wd_dot = (jr1d - jr2d).T @ d.qvel      # its bias rate
      w1, w2 = d.cvel[b1, :3], d.cvel[b2, :3]

      pq = lambda w: jnp.concatenate([jnp.zeros(1, dtype=dtype), w])
      term = 0.5 * (
          0.5 * math.quat_mul(
              math.quat_mul(math.quat_mul(q2c, pq(-w2)), pq(wd)), quat
          )
          + math.quat_mul(math.quat_mul(q2c, pq(wd_dot)), quat)
          + 0.5 * math.quat_mul(
              math.quat_mul(math.quat_mul(q2c, pq(wd)), pq(w1)), quat
          )
      )
      bias = bias.at[row + 3 : row + 6].set(ts * term[1:4])

    row += nrows

  return bias


def _is_elliptic(m: Model) -> bool:
  from mujoco_inversedynamicstest_tpu.models.types import ConeType

  return m.opt.cone == ConeType.ELLIPTIC


def _contact_row_map(m: Model, clay):
  """Static per-efc-contact-row tables: (slot, axis k, sign).

  Pyramidal: one (k, ±1) pair per friction axis (k=1..dim-1).
  Elliptic: one row per cone dimension, k = row index (0 = normal).
  Frictionless: one normal row with k=0, sign=0.
  """
  elliptic = _is_elliptic(m)
  slot_idx, k_idx, sign_np = [], [], []
  for slot, condim in enumerate(clay.dim):
    if condim == 1:
      slot_idx.append(slot)
      k_idx.append(0)
      sign_np.append(0.0)
    elif elliptic:
      for j in range(condim):
        slot_idx.append(slot)
        k_idx.append(j)
        sign_np.append(0.0)
    else:
      for k in range(1, condim):
        for s in (1.0, -1.0):
          slot_idx.append(slot)
          k_idx.append(k)
          sign_np.append(s)
  return (np.array(slot_idx, np.int32), np.array(k_idx, np.int32),
          np.array(sign_np))


def _contact_rows(m: Model, d: Data):
  """Builds contact rows from the static-shape contact set.

  (ref ``mj_instantiateContact``:964, contact ``mj_diagApprox``:1240,
  R adjustments in ``mj_makeImpedance``:1560: pyramidal common
  Rpy = 2 mu_reg^2 R0; elliptic R1 = R0/impratio, Rj mu_j^2 = const).
  Returns (J, pos, margin, active, KBIP, R, D) for the contact row block.
  """
  from mujoco_inversedynamicstest_tpu.ops import collision

  clay = collision.contact_layout(m)
  con = d.contact
  dtype = d.qpos.dtype
  ncon = clay.ncon
  elliptic = _is_elliptic(m)

  # geom identities are runtime Contact data (slots may be top-k selected)
  b1 = jnp.asarray(m.geom_bodyid)[con.geom1]
  b2 = jnp.asarray(m.geom_bodyid)[con.geom2]

  slot_idx, k_idx, sign_np = _contact_row_map(m, clay)
  sign = jnp.asarray(sign_np, dtype=dtype)
  nrows = len(slot_idx)

  # per-row world wrench (w_t translation dir, w_r rotation dir)
  frame = con.frame[slot_idx]            # (nrows, 3, 3)
  n_dir = frame[:, 0]

  if elliptic:
    # row k: translation axis for k<3, rotation axis for k>=3
    is_t = k_idx < 3
    t_row = np.where(is_t, k_idx, 0)
    r_row = np.where(is_t, 0, k_idx - 3)
    w_t = frame[np.arange(nrows), t_row] * jnp.asarray(
        is_t, dtype=dtype)[:, None]
    w_r = frame[np.arange(nrows), r_row] * jnp.asarray(
        ~is_t, dtype=dtype)[:, None]
  else:
    # row = J_normal + sign*mu_k*J_axis(k); axes 1,2 tangential, 3..5 rot
    is_tan = (k_idx >= 1) & (k_idx <= 2)
    tan_row = np.where(is_tan, np.maximum(k_idx, 1), 1)
    rot_row = np.where(k_idx >= 3, k_idx - 3, 0)
    mu_row = con.friction[slot_idx, np.maximum(k_idx - 1, 0)]
    axis_t = frame[np.arange(nrows), tan_row] * jnp.asarray(
        is_tan, dtype=dtype)[:, None]
    axis_r = frame[np.arange(nrows), rot_row] * jnp.asarray(
        k_idx >= 3, dtype=dtype)[:, None]
    w_t = n_dir + sign[:, None] * mu_row[:, None] * axis_t
    w_r = sign[:, None] * mu_row[:, None] * axis_r

  # per-side 6D contraction vectors u = [(p - com_side) x w_t + w_r ; w_t]
  # so that row_J[v] = mask2*cdof_v.u2 - mask1*cdof_v.u1  (one MXU matmul
  # per side instead of per-contact Jacobian tensors)
  p_row = con.pos[slot_idx]
  com = d.subtree_com[m.body_rootid]
  bmask = jnp.asarray(m.tree.body_dof_mask)
  invw = jnp.asarray(m.body_invweight0)

  if con.bary_w is not None:
    # flex element contacts: each side is up to 4 (body, weight) pairs
    # (mj_elemBodyWeight inverse-distance weights; plain geom slots carry
    # a single unit-weight body) — both the Jacobian and the diag approx
    # sum weighted per-body terms (ref engine_core_constraint.c:1018-1068
    # and mj_diagApprox flex branch)
    def side_rows_bary(side):
      total = jnp.zeros((nrows, d.cdof.shape[0]), dtype)
      for kk in range(con.bary_body.shape[2]):
        b = con.bary_body[slot_idx, side, kk]
        w = con.bary_w[slot_idx, side, kk]
        off = p_row - com[b]
        u = jnp.concatenate([jnp.cross(off, w_t) + w_r, w_t], axis=1)
        r_k = u @ d.cdof.T
        total = total + w[:, None] * jnp.where(bmask[b], r_k, 0.0)
      return total

    rows_J = side_rows_bary(1) - side_rows_bary(0)
    tran = jnp.sum(
        con.bary_w * invw[con.bary_body, 0], axis=(1, 2))   # (ncon,)
    rot = jnp.sum(con.bary_w * invw[con.bary_body, 1], axis=(1, 2))
  else:
    def side_rows(bids):
      off = p_row - com[bids[slot_idx]]
      u = jnp.concatenate([jnp.cross(off, w_t) + w_r, w_t], axis=1)
      return u @ d.cdof.T                # (nrows, nv)

    mask1 = bmask[b1[slot_idx]]
    mask2 = bmask[b2[slot_idx]]
    rows_J = jnp.where(mask2, side_rows(b2), 0.0) - jnp.where(
        mask1, side_rows(b1), 0.0
    )

    # diag approx (ref :1300-1306); jnp view — b1/b2 are traced indices
    # and model leaves are host numpy (io.py:_jx)
    tran = invw[b1, 0] + invw[b2, 0]     # (ncon,)
    rot = invw[b1, 1] + invw[b2, 1]

  # shared per-contact impedance at pos = dist
  imp, impp = _impedance(con.solimp, con.dist, con.includemargin)
  kbip_con = _kbip(
      m, con.solref, con.solimp, imp, impp,
      np.zeros(ncon, dtype=bool),
  )                                      # (ncon, 4)

  active_con = con.dist < con.includemargin
  if elliptic:
    # elliptic: pos/margin only on the normal row (ref :1118-1125)
    rows_pos = jnp.where(jnp.asarray(k_idx == 0), con.dist[slot_idx], 0.0)
    rows_margin = jnp.where(
        jnp.asarray(k_idx == 0), con.includemargin[slot_idx], 0.0)
  else:
    # pyramidal: every row carries the contact dist (ref :1098-1100)
    rows_pos = con.dist[slot_idx]
    rows_margin = con.includemargin[slot_idx]
  rows_active = active_con[slot_idx]
  mu0 = con.friction[:, 0]

  if elliptic:
    # per-row diagApprox: tran for translational, rot for rotational rows
    da_row = jnp.where(jnp.asarray(k_idx < 3), tran[slot_idx],
                       rot[slot_idx])
    r_raw = jnp.maximum(math.MINVAL, (1 - imp[slot_idx]) * da_row
                        / imp[slot_idx])
    # R0 per slot (normal rows are k==0)
    r0 = jnp.maximum(math.MINVAL, (1 - imp) * tran / imp)
    r1 = r0 / jnp.maximum(math.MINVAL, m.opt.impratio)
    fr_row = con.friction[slot_idx, np.maximum(k_idx - 1, 0)]
    r_fric = r1[slot_idx] * (mu0[slot_idx] ** 2) / jnp.maximum(
        math.MINVAL, fr_row**2)
    rows_r = jnp.where(jnp.asarray(k_idx == 0), r_raw, r_fric)
    del r_raw

    # KBIP: friction rows K=0; B from solreffriction when set
    srf = con.solreffriction[slot_idx]
    has_srf = jnp.any(srf != 0, axis=1)
    is_fric_row = k_idx > 0
    kbip_fric = _kbip(
        m,
        jnp.where(has_srf[:, None], srf, con.solref[slot_idx]),
        con.solimp[slot_idx], imp[slot_idx], impp[slot_idx],
        np.ones(nrows, dtype=bool),
    )
    rows_kbip = jnp.where(
        jnp.asarray(is_fric_row)[:, None], kbip_fric, kbip_con[slot_idx]
    )
  else:
    mu_row = con.friction[slot_idx, np.maximum(k_idx - 1, 0)]
    base_rot = jnp.where(jnp.asarray(k_idx >= 3), rot[slot_idx],
                         tran[slot_idx])
    da_row = tran[slot_idx] + mu_row**2 * base_rot
    del da_row  # pyramidal rows all use the common Rpy below

    da0 = jnp.where(
        jnp.asarray(clay.dim == 1), tran, tran + mu0**2 * tran
    )
    r0 = jnp.maximum(math.MINVAL, (1 - imp) * da0 / imp)
    mu_reg = mu0 / jnp.sqrt(m.opt.impratio)
    r_py = 2.0 * mu_reg**2 * r0
    is_normal = k_idx == 0
    rows_r = jnp.where(
        jnp.asarray(is_normal), r0[slot_idx], r_py[slot_idx]
    )
    rows_kbip = kbip_con[slot_idx]

  rows_d = jnp.where(rows_active, 1.0 / rows_r, 0.0)
  rows_J = rows_J * rows_active[:, None].astype(dtype)

  return (rows_J, rows_pos, rows_margin, rows_active, rows_kbip, rows_r,
          rows_d)


class ConeTables(NamedTuple):
  """Static gather tables for elliptic cone contacts (slots with dim>1)."""
  nes: int               # number of elliptic contact slots
  slot: np.ndarray       # (nes,) contact slot index
  rows: np.ndarray       # (nes, 6) efc row index per cone dim (0-padded)
  rmask: np.ndarray      # (nes, 6) bool valid rows
  dim: np.ndarray        # (nes,)


def cone_tables(m: Model) -> ConeTables:
  """Builds the elliptic cone gather tables (empty for pyramidal)."""
  from mujoco_inversedynamicstest_tpu.ops import collision

  if not _is_elliptic(m):
    return ConeTables(0, np.zeros(0, np.int32), np.zeros((0, 6), np.int32),
                      np.zeros((0, 6), bool), np.zeros(0, np.int32))
  clay = collision.contact_layout(m)
  lay = row_layout(m)
  base = lay.ne + lay.nf + lay.nl
  slots, rows, rmask, dims = [], [], [], []
  for slot, condim in enumerate(clay.dim):
    if condim == 1:
      continue
    adr = base + int(clay.efc_address[slot])
    # pad with nefc: out-of-bounds scatter indices are dropped by XLA,
    # gathers are masked by rmask
    r = [adr + j for j in range(condim)] + [lay.nefc] * (6 - condim)
    msk = [True] * condim + [False] * (6 - condim)
    slots.append(slot)
    rows.append(r)
    rmask.append(msk)
    dims.append(condim)
  if not slots:
    return ConeTables(0, np.zeros(0, np.int32), np.zeros((0, 6), np.int32),
                      np.zeros((0, 6), bool), np.zeros(0, np.int32))
  return ConeTables(
      nes=len(slots), slot=np.array(slots, np.int32),
      rows=np.array(rows, np.int32), rmask=np.array(rmask, bool),
      dim=np.array(dims, np.int32),
  )


def cone_quantities(m: Model, d: Data, ct: ConeTables, jar: jax.Array):
  """Per-elliptic-slot cone coordinates at ``jar``.

  Returns (U (nes,6) dual-cone coords, N, T, Dm, mu, coef) following the
  elliptic branch of ``mj_constraintUpdate`` (ref
  ``engine_core_constraint.c:2460-2530``): U0 = jar0*mu, Uj = jarj*mu_j,
  N = U0, T = |U[1:]|, Dm = D0/(mu^2 (1+mu^2)).
  """
  con = d.contact
  dtype = jar.dtype
  mu = con.friction[ct.slot, 0] / jnp.sqrt(
      jnp.maximum(math.MINVAL, m.opt.impratio))
  # coef per cone dim: [mu, friction_0.., 0-pad]
  fr = con.friction[ct.slot]                       # (nes, 5)
  coef = jnp.concatenate([mu[:, None], fr], axis=1)  # (nes, 6)
  coef = coef * jnp.asarray(ct.rmask, dtype=dtype)

  jar_rows = jar[ct.rows] * jnp.asarray(ct.rmask, dtype=dtype)
  U = jar_rows * coef
  N = U[:, 0]
  T2 = jnp.sum(U[:, 1:] ** 2, axis=1)
  T = jnp.sqrt(jnp.maximum(T2, math.MINVAL**2))
  D0 = d.efc_D[ct.rows[:, 0]]
  Dm = D0 / jnp.maximum(math.MINVAL, mu * mu * (1 + mu * mu))
  return U, N, T, T2, Dm, mu, coef


def cone_zones(N, T, T2, mu):
  """Top/bottom/middle zone masks (ref :2470-2490)."""
  no_t = T2 <= math.MINVAL**2
  top = (N >= mu * T) | (no_t & (N >= 0))
  bottom = ((mu * N + T <= 0) & ~top) | (no_t & (N < 0))
  middle = ~top & ~bottom
  return top, bottom, middle


def cone_hessian(ct: ConeTables, U, N, T, Dm, mu, coef, middle):
  """Per-slot dim x dim cone Hessian blocks (6x6 padded, zero unless
  middle zone) — ref ``mj_constraintUpdate`` flg_coneHessian branch."""
  nes = ct.nes
  dtype = U.dtype
  if nes == 0:
    return jnp.zeros((0, 6, 6), dtype=dtype)
  eye_t = np.zeros((6, 6))
  eye_t[range(1, 6), range(1, 6)] = 1.0

  Tsafe = jnp.maximum(T, math.MINVAL)
  H = jnp.zeros((nes, 6, 6), dtype=dtype)
  H = H.at[:, 0, 0].set(1.0)
  scl1 = -mu / Tsafe
  H = H.at[:, 0, 1:].set(scl1[:, None] * U[:, 1:])
  H = H.at[:, 1:, 0].set(scl1[:, None] * U[:, 1:])
  scl2 = mu * N / Tsafe**3
  H = H.at[:, 1:, 1:].add(
      scl2[:, None, None] * U[:, 1:, None] * U[:, None, 1:])
  scl3 = mu * mu - mu * N / Tsafe
  H = H + scl3[:, None, None] * jnp.asarray(eye_t, dtype=dtype)[None]
  # scale by Dm * coef_k * coef_j
  H = H * (Dm[:, None, None] * coef[:, :, None] * coef[:, None, :])
  return H * middle[:, None, None].astype(dtype)


def forces_cost(m: Model, d: Data, jar: jax.Array):
  """Shared constraint force/cost/state update at ``jar = J qacc - aref``.

  Implements all zones of ``mj_constraintUpdate`` (ref
  ``engine_core_constraint.c:2387-2560``): equality quadratic, friction
  linear/quadratic bands, inequality (limits + pyramidal/frictionless
  contacts), and the elliptic cone top/bottom/middle zones.

  Returns (force, cost, quad_mask, cone_middle) where quad_mask flags rows
  whose ½ D jar² term is active (drives the Newton Hessian diagonal) and
  cone_middle flags elliptic slots in the cone zone (drives the cone
  Hessian blocks).
  """
  ne, nf = d.ne, d.nf
  D, R, floss = d.efc_D, d.efc_R, d.efc_frictionloss
  ct = cone_tables(m)

  idx = np.arange(d.nefc)
  is_eq = jnp.asarray(idx < ne)
  is_fri = jnp.asarray((idx >= ne) & (idx < ne + nf))
  is_ell_row = np.zeros(d.nefc, bool)
  if ct.nes:
    is_ell_row[ct.rows[ct.rmask]] = True
  is_ell = jnp.asarray(is_ell_row)

  rf = R * floss
  lin_neg = is_fri & (jar <= -rf)
  lin_pos = is_fri & (jar >= rf)
  quad = is_eq | (is_fri & ~lin_neg & ~lin_pos) | (
      ~is_eq & ~is_fri & ~is_ell & (jar < 0)
  )

  force = jnp.where(quad, -D * jar, 0.0)
  force = jnp.where(lin_neg, floss, force)
  force = jnp.where(lin_pos, -floss, force)

  cost = 0.5 * jnp.sum(jnp.where(quad, D * jar * jar, 0.0))
  rf2 = 0.5 * R * floss * floss
  cost += jnp.sum(jnp.where(lin_neg, -rf2 - floss * jar, 0.0))
  cost += jnp.sum(jnp.where(lin_pos, -rf2 + floss * jar, 0.0))

  cone_middle = jnp.zeros(ct.nes, dtype=bool)
  if ct.nes:
    U, N, T, T2, Dm, mu, coef = cone_quantities(m, d, ct, jar)
    top, bottom, middle = cone_zones(N, T, T2, mu)
    cone_middle = middle

    # bottom zone: per-row quadratic (flag rows quad, default force kept)
    brow = jnp.zeros(d.nefc, dtype=bool)
    brow = brow.at[ct.rows].set(
        bottom[:, None] & jnp.asarray(ct.rmask))
    quad = quad | brow
    jar_rows = jar[ct.rows] * jnp.asarray(ct.rmask, jar.dtype)
    D_rows = D[ct.rows]
    cost += 0.5 * jnp.sum(
        jnp.where(bottom[:, None], D_rows * jar_rows**2, 0.0))

    # bottom force = -D jar on the cone rows; middle force per cone formula
    NmT = N - mu * T
    f0 = -Dm * NmT * mu
    Tsafe = jnp.maximum(T, math.MINVAL)
    f_mid = jnp.concatenate([
        f0[:, None],
        (-f0 / Tsafe)[:, None] * U[:, 1:] * coef[:, 1:],
    ], axis=1)                                     # (nes, 6)
    f_bot = -D_rows * jar_rows
    f_cone = jnp.where(middle[:, None], f_mid,
                       jnp.where(bottom[:, None], f_bot, 0.0))
    f_cone = f_cone * jnp.asarray(ct.rmask, jar.dtype)
    force = force.at[ct.rows].set(f_cone)

    cost += jnp.sum(jnp.where(middle, 0.5 * Dm * NmT * NmT, 0.0))

  force = force * d.efc_active
  return force, cost, quad, cone_middle


def contact_forces_frame(m: Model, d: Data) -> jax.Array:
  """Per-contact-slot force in the contact frame, (ncon, 6).

  Analog of ``mj_contactForce`` (ref ``engine_support.c:1459``), fully
  vectorized over slots: pyramidal rows recombine as normal = sum(f),
  tangent_k = mu_k (f_{2k} - f_{2k+1}); elliptic rows are the force
  components directly.
  """
  from mujoco_inversedynamicstest_tpu.ops import collision

  clay = collision.contact_layout(m)
  lay = row_layout(m)
  dtype = d.qpos.dtype
  ncon = clay.ncon
  if ncon == 0:
    return jnp.zeros((0, 6), dtype=dtype)

  base = lay.ne + lay.nf + lay.nl
  slot_idx, k_idx, sign_np = _contact_row_map(m, clay)
  f_rows = d.efc_force[base + np.arange(len(slot_idx))]
  out = jnp.zeros((ncon, 6), dtype=dtype)

  if _is_elliptic(m):
    return out.at[(slot_idx, k_idx)].add(f_rows)

  # pyramidal: all rows contribute to the normal; friction rows add
  # sign * mu_k into component k
  out = out.at[(slot_idx, np.zeros_like(k_idx))].add(f_rows)
  fric = np.nonzero(k_idx >= 1)[0]
  if fric.size:
    mu_row = d.contact.friction[slot_idx[fric], k_idx[fric] - 1]
    out = out.at[(slot_idx[fric], k_idx[fric])].add(
        jnp.asarray(sign_np[fric], dtype) * mu_row * f_rows[fric])
  return out


def reference_constraint(m: Model, d: Data) -> Data:
  """aref = -B*vel - K*imp*(pos - margin) - bias (ref :2362)."""
  if d.nefc == 0:
    return d
  lay = row_layout(m)
  vel = d.efc_J @ d.qvel
  k, b, imp = d.efc_KBIP[:, 0], d.efc_KBIP[:, 1], d.efc_KBIP[:, 2]
  bias = _eq_acc_bias(m, d, lay)
  aref = -b * vel - k * imp * (d.efc_pos - d.efc_margin) - bias
  return d.replace(efc_aref=aref * d.efc_active)


def constraint_update(m: Model, d: Data, jar: jax.Array,
                      with_cost: bool = False):
  """State-dependent force update (ref ``mj_constraintUpdate``:2556).

  Given jar = J qacc - aref, computes efc_force, qfrc_constraint and
  (optionally) the constraint cost.  All zones, both friction cones.
  """
  force, cost, _, _ = forces_cost(m, d, jar)
  qfrc = d.efc_J.T @ force
  d = d.replace(efc_force=force, qfrc_constraint=qfrc)
  return d, (cost if with_cost else None)
