"""Support operations: Jacobians, force application, state integration.

Analogs of the reference's ``src/engine/engine_support.c`` utilities
(``mj_jac``:389, ``mj_applyFT``:1194, ``mj_xfrcAccumulate``:1254,
``mj_integratePos``:1518, ``mj_differentiatePos``:1483) — re-derived as
dense vectorized ops: the per-body dof chain walks become a static
``(nbody, nv)`` ancestor mask and the Jacobian products become masked
matvecs/matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    JointType,
    Model,
    StateFlag,
)
from mujoco_inversedynamicstest_tpu.ops import math


def jac(m: Model, d: Data, point: jax.Array, body: int):
  """Point Jacobian for a world-frame ``point`` attached to ``body``.

  Returns ``(jacp, jacr)``, each ``(nv, 3)``.  Analog of ``mj_jac``
  (reference ``engine_support.c:389``): for dofs in the body's ancestor
  chain, ``jacp_i = cdof_lin_i + cdof_ang_i x (point - subtree_com_root)``,
  ``jacr_i = cdof_ang_i``; zero elsewhere.  ``body`` may be a traced int
  array; the ancestor mask is then gathered dynamically.
  """
  mask = jnp.asarray(m.tree.body_dof_mask)[body].astype(point.dtype)  # (nv,)
  offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[body]]
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  jacp = (lin + jnp.cross(ang, jnp.broadcast_to(offset, ang.shape)))
  return jacp * mask[:, None], ang * mask[:, None]


def jac_all_bodies(m: Model, d: Data, points: jax.Array):
  """Batched point Jacobians for one point per body -> (nbody, nv, 3) x2."""
  mask = jnp.asarray(m.tree.body_dof_mask).astype(points.dtype)  # (nbody, nv)
  offset = points[:, None, :] - d.subtree_com[m.body_rootid][:, None, :]
  ang = d.cdof[None, :, :3]
  lin = d.cdof[None, :, 3:]
  jacp = (lin + jnp.cross(ang, offset)) * mask[..., None]
  jacr = ang * mask[..., None]
  return jacp, jacr


def _quat_dof_mask(m: Model) -> np.ndarray:
  """Static mask of rotational dofs belonging to ball/free-rotation joints."""
  jt = m.jnt_type[m.dof_jntid]
  dof_off = np.arange(m.nv) - m.jnt_dofadr[m.dof_jntid]
  return (jt == JointType.BALL) | (
      (jt == JointType.FREE) & (dof_off >= 3)
  )


def jac_dot(m: Model, d: Data, point: jax.Array, body: int):
  """Time-derivative of the point Jacobian for a *body-fixed* point.

  Analog of ``mj_jacDot`` (reference ``engine_support.c:810``; the
  installed oracle's variant, reverse-engineered to machine precision):
  per-dof ``cdof_dot`` — except quaternion (ball / free-rotation) dofs,
  which use ``cvel x_m cdof`` with the carrying body's full velocity —
  plus, in the translation rows, the moving-point term
  ``cdof_ang x v_point``.
  """
  mask = jnp.asarray(m.tree.body_dof_mask)[body].astype(point.dtype)
  offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[body]]

  quat_dof = jnp.asarray(_quat_dof_mask(m))[:, None]
  cdd = jnp.where(
      quat_dof,
      math.motion_cross(d.cvel[m.dof_bodyid], d.cdof),
      d.cdof_dot,
  )
  ang, lin = cdd[:, :3], cdd[:, 3:]

  # velocity of the body-fixed point
  cv = d.cvel[body]
  v_point = cv[3:] + jnp.cross(cv[:3], offset)

  jacp_dot = (
      lin
      + jnp.cross(ang, jnp.broadcast_to(offset, ang.shape))
      + jnp.cross(d.cdof[:, :3], jnp.broadcast_to(v_point, ang.shape))
  )
  return jacp_dot * mask[:, None], ang * mask[:, None]


def apply_ft(m: Model, d: Data, force: jax.Array, torque: jax.Array,
             point: jax.Array, body: int) -> jax.Array:
  """Generalized force from a Cartesian force/torque at a body point.

  Analog of ``mj_applyFT`` (reference ``engine_support.c:1194``); returns
  the (nv,) contribution ``jacp^T f + jacr^T t``.
  """
  jacp, jacr = jac(m, d, point, body)
  return jacp @ force + jacr @ torque


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Projects all ``xfrc_applied`` body wrenches into joint space.

  Analog of ``mj_xfrcAccumulate`` (reference ``engine_support.c:1254``,
  exposed as MJAPI by the fork for its inverse-dynamics test,
  ``src/inverse/inverse_test.cpp:73``).  Computed for all bodies at once:
  (nbody, nv, 3) Jacobians contracted against (nbody, 3) wrenches.
  """
  jacp, jacr = jac_all_bodies(m, d, d.xipos)
  qfrc = jnp.einsum("bvc,bc->v", jacp, d.xfrc_applied[:, :3])
  qfrc += jnp.einsum("bvc,bc->v", jacr, d.xfrc_applied[:, 3:])
  return qfrc


def _joint_groups(m: Model):
  """Static index tables grouping joints by integration behavior."""
  jt = m.jnt_type
  scalar = np.nonzero((jt == JointType.HINGE) | (jt == JointType.SLIDE))[0]
  ball = np.nonzero(jt == JointType.BALL)[0]
  free = np.nonzero(jt == JointType.FREE)[0]
  return scalar, ball, free


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
  """Integrates qpos by qvel*dt, quaternion-aware.

  Analog of ``mj_integratePos`` (reference ``engine_support.c:1518``).
  """
  scalar, ball, free = _joint_groups(m)

  if scalar.size:
    padr = m.jnt_qposadr[scalar]
    vadr = m.jnt_dofadr[scalar]
    qpos = qpos.at[padr].add(dt * qvel[vadr])

  for jids, p_off, v_off in ((ball, 0, 0), (free, 3, 3)):
    if not jids.size:
      continue
    padr = m.jnt_qposadr[jids] + p_off
    vadr = m.jnt_dofadr[jids] + v_off
    pidx = padr[:, None] + np.arange(4)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    qpos = qpos.at[pidx].set(
        math.quat_integrate(qpos[pidx], qvel[vidx], dt)
    )

  if free.size:
    padr = m.jnt_qposadr[free]
    vadr = m.jnt_dofadr[free]
    pidx = padr[:, None] + np.arange(3)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    qpos = qpos.at[pidx].add(dt * qvel[vidx])

  return qpos


def differentiate_pos(m: Model, qpos1: jax.Array, qpos2: jax.Array,
                      dt) -> jax.Array:
  """Finite-differences two qpos vectors into a velocity: (q2 - q1) / dt.

  Analog of ``mj_differentiatePos`` (reference ``engine_support.c:1483``);
  quaternion segments use the local-frame log map.
  """
  scalar, ball, free = _joint_groups(m)
  nv = m.nv
  qvel = jnp.zeros(nv, dtype=qpos1.dtype)

  if scalar.size:
    padr = m.jnt_qposadr[scalar]
    vadr = m.jnt_dofadr[scalar]
    qvel = qvel.at[vadr].set((qpos2[padr] - qpos1[padr]) / dt)

  for jids, p_off, v_off in ((ball, 0, 0), (free, 3, 3)):
    if not jids.size:
      continue
    padr = m.jnt_qposadr[jids] + p_off
    vadr = m.jnt_dofadr[jids] + v_off
    pidx = padr[:, None] + np.arange(4)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    qvel = qvel.at[vidx].set(
        math.quat_sub(qpos2[pidx], qpos1[pidx]) / dt
    )

  if free.size:
    padr = m.jnt_qposadr[free]
    vadr = m.jnt_dofadr[free]
    pidx = padr[:, None] + np.arange(3)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    qvel = qvel.at[vidx].set((qpos2[pidx] - qpos1[pidx]) / dt)

  return qvel


def full_m(m: Model, d: Data) -> jax.Array:
  """Dense mass matrix (already dense in this framework)."""
  return d.qM


def object_velocity(m: Model, d: Data, bodyid, point: jax.Array,
                    flg_local: bool = False):
  """6D velocity [ang, lin] of a body-fixed point in world coordinates.

  Analog of ``mj_objectVelocity`` (reference ``engine_support.c:1265``).
  """
  cvel = d.cvel[bodyid]
  offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[bodyid]]
  vel = math.transform_motion(cvel, offset)
  return vel


# ---------------------------------------------------------------------------
# state vector API (checkpoint/rollout interface)
# ---------------------------------------------------------------------------

# (flag, Data field, size expression) in the reference's canonical order
# (ref engine_support.c:106-141 mj_stateSize/mj_getState/mj_setState)
_STATE_FIELDS = (
    (StateFlag.TIME, "time", lambda m: 1, None),
    (StateFlag.QPOS, "qpos", lambda m: m.nq, None),
    (StateFlag.QVEL, "qvel", lambda m: m.nv, None),
    (StateFlag.ACT, "act", lambda m: m.na, None),
    (StateFlag.WARMSTART, "qacc_warmstart", lambda m: m.nv, None),
    (StateFlag.CTRL, "ctrl", lambda m: m.nu, None),
    (StateFlag.QFRC_APPLIED, "qfrc_applied", lambda m: m.nv, None),
    (StateFlag.XFRC_APPLIED, "xfrc_applied", lambda m: 6 * m.nbody,
     (-1, 6)),
    (StateFlag.EQ_ACTIVE, "eq_active", lambda m: m.neq, None),
    (StateFlag.MOCAP_POS, "mocap_pos", lambda m: 3 * m.nmocap, (-1, 3)),
    (StateFlag.MOCAP_QUAT, "mocap_quat", lambda m: 4 * m.nmocap, (-1, 4)),
)


def state_size(m: Model, spec: int) -> int:
  """Size of a state vector (analog of ``mj_stateSize``,
  ref ``engine_support.c:157``)."""
  return sum(sz(m) for flag, _, sz, _ in _STATE_FIELDS if spec & flag)


def get_state(m: Model, d: Data, spec: int = StateFlag.FULLPHYSICS):
  """Flattened state vector for the given component spec (analog of
  ``mj_getState``, ref ``engine_support.c:176``)."""
  parts = []
  for flag, field, sz, _ in _STATE_FIELDS:
    if spec & flag:
      val = getattr(d, field)
      val = jnp.atleast_1d(jnp.asarray(val, dtype=d.qpos.dtype))
      parts.append(val.reshape(-1))
      assert parts[-1].shape[0] == sz(m), field
  return jnp.concatenate(parts) if parts else jnp.zeros(
      0, dtype=d.qpos.dtype
  )


def set_state(m: Model, d: Data, state: jax.Array,
              spec: int = StateFlag.FULLPHYSICS) -> Data:
  """Writes a flattened state vector into ``d`` (analog of
  ``mj_setState``, ref ``engine_support.c:208``)."""
  updates = {}
  adr = 0
  for flag, field, sz, reshape in _STATE_FIELDS:
    if not spec & flag:
      continue
    n = sz(m)
    chunk = state[adr:adr + n]
    adr += n
    cur = getattr(d, field)
    if field == "time":
      updates[field] = chunk[0]
    elif field == "eq_active":
      updates[field] = (
          (chunk > 0.5) if cur.dtype == jnp.bool_ else chunk.astype(cur.dtype)
      )
    elif reshape is not None:
      updates[field] = chunk.reshape(reshape).astype(cur.dtype)
    else:
      updates[field] = chunk.astype(cur.dtype)
  return d.replace(**updates)
