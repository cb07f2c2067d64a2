"""Quaternion and spatial algebra primitives.

All functions operate on the trailing axis and broadcast over arbitrary
leading batch axes, so they compose with ``vmap``/``shard_map`` without
per-element wrappers.  Semantics follow the reference engine's spatial-math
utilities (reference ``src/engine/engine_util_spatial.c``: ``mju_crossMotion``
:385, ``mju_crossForce``:401, ``mju_mulInertVec``:452) and quaternion
conventions (w, x, y, z Hamilton product).

Spatial (Plücker) 6-vector layout matches the reference: motion vectors are
``[angular(3), linear(3)]``; force vectors are ``[torque(3), force(3)]``.
Compact body inertias ("cinert") are 10-vectors
``[Ixx, Iyy, Izz, Ixy, Ixz, Iyz, h0, h1, h2, m]`` with ``h = m * com_offset``
(reference ``src/engine/engine_core_smooth.c:183`` ``mj_comPos``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches mjMINVAL (reference include/mujoco/mjmodel.h).
MINVAL = 1e-15


def norm_safe(x: jax.Array, axis: int = -1, keepdims: bool = False):
  """L2 norm with a gradient-safe floor at zero."""
  sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
  # sqrt has an infinite gradient at 0; clamp the argument instead.
  return jnp.sqrt(jnp.maximum(sq, MINVAL * MINVAL))


def normalize(x: jax.Array, axis: int = -1):
  """Normalizes along ``axis``; returns x unchanged in direction for ~0."""
  n = norm_safe(x, axis=axis, keepdims=True)
  return x / n


def normalize_quat(q: jax.Array):
  """Normalizes a quaternion; degenerate inputs become the identity."""
  n = norm_safe(q, keepdims=True)
  unit = jnp.zeros_like(q).at[..., 0].set(1.0)
  return jnp.where(n < MINVAL, unit, q / n)


def quat_mul(u: jax.Array, v: jax.Array):
  """Hamilton product of quaternions (w, x, y, z)."""
  uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
      [
          uw * vw - ux * vx - uy * vy - uz * vz,
          uw * vx + ux * vw + uy * vz - uz * vy,
          uw * vy - ux * vz + uy * vw + uz * vx,
          uw * vz + ux * vy - uy * vx + uz * vw,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array):
  """Conjugate (= inverse for unit quaternions)."""
  return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(vec: jax.Array, quat: jax.Array):
  """Rotates ``vec`` by ``quat`` (active rotation, world = R(q) local)."""
  w = quat[..., 0:1]
  u = quat[..., 1:4]
  # v' = v + 2w (u × v) + 2 u × (u × v)
  uxv = jnp.cross(u, vec)
  return vec + 2.0 * (w * uxv + jnp.cross(u, uxv))


def rotate_inv(vec: jax.Array, quat: jax.Array):
  """Rotates ``vec`` by the inverse of ``quat``."""
  return rotate(vec, quat_conj(quat))


def quat_to_mat(q: jax.Array):
  """Unit quaternion -> 3x3 rotation matrix (trailing axes (..., 3, 3))."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
      [
          1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
          2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
          2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
      ],
      axis=-1,
  )
  return m.reshape(m.shape[:-1] + (3, 3))


def mat_to_quat(mat: jax.Array):
  """3x3 rotation matrix -> unit quaternion (w, x, y, z).

  Branchless variant of the standard Shepperd method: computes all four
  candidate quaternions and selects the numerically best by the largest
  diagonal combination.
  """
  m00, m01, m02 = mat[..., 0, 0], mat[..., 0, 1], mat[..., 0, 2]
  m10, m11, m12 = mat[..., 1, 0], mat[..., 1, 1], mat[..., 1, 2]
  m20, m21, m22 = mat[..., 2, 0], mat[..., 2, 1], mat[..., 2, 2]
  tr = m00 + m11 + m22

  def _case(a, b, c, d):
    return jnp.stack([a, b, c, d], axis=-1)

  # candidates scaled by 4*component
  qw = _case(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
  qx = _case(m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20)
  qy = _case(m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21)
  qz = _case(m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22)

  scores = jnp.stack(
      [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
       1.0 - m00 - m11 + m22],
      axis=-1,
  )
  best = jnp.argmax(scores, axis=-1)
  cands = jnp.stack([qw, qx, qy, qz], axis=-2)
  q = jnp.take_along_axis(
      cands, best[..., None, None].astype(jnp.int32), axis=-2
  )[..., 0, :]
  q = normalize_quat(q)
  # canonical sign: w >= 0
  return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def axis_angle_quat(axis: jax.Array, angle: jax.Array):
  """Quaternion for rotation of ``angle`` about (unit) ``axis``."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
  )


def _small_angle_eps(dtype):
  """Angle² threshold below which Taylor branches take over.

  Chosen so the Taylor truncation error sits below machine eps while the
  exact branch's AD chain (which produces 1/angle³-scale intermediates in
  higher-order derivatives) never sees a denormal-scale angle — required
  for finite f32 Hessians of pose costs (iLQR quadratization)."""
  return 1e-8 if dtype == jnp.float32 else 1e-16


def quat_exp(vel: jax.Array):
  """Exponential map: 3-vector rotation ``vel`` -> quaternion.

  Branchless with a sanitized-input Taylor guard: the ``sqrt`` only ever
  sees angle² >= eps, so all orders of AD stay finite at zero rotation
  (the double-``where`` pattern).
  """
  dtype = vel.dtype
  s2 = jnp.sum(vel * vel, axis=-1, keepdims=True)
  small = s2 < _small_angle_eps(dtype)
  angle = jnp.sqrt(jnp.where(small, 1.0, s2))
  # sin(a/2)/a and cos(a/2), Taylor through zero
  sinc_h = jnp.where(small, 0.5 - s2 / 48.0, jnp.sin(angle / 2) / angle)
  cos_h = jnp.where(small, 1.0 - s2 / 8.0, jnp.cos(angle / 2))
  return jnp.concatenate([cos_h, vel * sinc_h], axis=-1)


def quat_integrate(quat: jax.Array, vel: jax.Array, dt):
  """Integrates a quaternion by local angular velocity ``vel`` over ``dt``.

  Mirrors ``mju_quatIntegrate`` (reference
  ``src/engine/engine_util_spatial.c``): res = quat * exp(vel*dt) with the
  rotation expressed in the local (joint/child) frame.
  """
  return normalize_quat(quat_mul(quat, quat_exp(vel * dt)))


def quat_sub(qa: jax.Array, qb: jax.Array):
  """Velocity that takes ``qb`` to ``qa`` in unit time (local frame).

  Mirrors ``mju_subQuat`` (reference ``src/engine/engine_util_spatial.c``):
  returns the rotation 3-vector of qb^{-1} * qa.
  """
  qdif = quat_mul(quat_conj(qb), qa)
  qdif = qdif * jnp.where(qdif[..., 0:1] < 0, -1.0, 1.0)  # shortest arc
  v = qdif[..., 1:4]
  w = qdif[..., 0]
  s2 = jnp.sum(v * v, axis=-1)
  # rotvec = v * k with k = 2*atan2(s, w)/s; near s=0 use the Taylor
  # expansion k = 2/w - 2*s^2/(3*w^3).  The sqrt argument is sanitized so
  # the exact branch's AD chain never sees a denormal-scale s — keeps all
  # orders of derivatives finite at zero rotation in f32 (the iLQR cost
  # Hessian path) as well as the jvp used by transition_ad.
  small = s2 < _small_angle_eps(qdif.dtype)
  s = jnp.sqrt(jnp.where(small, 1.0, s2))
  k_exact = 2.0 * jnp.arctan2(s, w) / s
  k_taylor = 2.0 / w - 2.0 * s2 / (3.0 * w**3)
  k = jnp.where(small, k_taylor, k_exact)
  return v * k[..., None]


# ---------------------------------------------------------------------------
# Spatial (Plücker) algebra.  Motion v = [w, u]; force f = [t, f].
# ---------------------------------------------------------------------------


def motion_cross(vel: jax.Array, v: jax.Array):
  """Spatial cross product of motion vectors: vel ×m v.

  (reference ``engine_util_spatial.c:385`` ``mju_crossMotion``)
  """
  w, u = vel[..., :3], vel[..., 3:]
  vw, vu = v[..., :3], v[..., 3:]
  ang = jnp.cross(w, vw)
  lin = jnp.cross(w, vu) + jnp.cross(u, vw)
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(vel: jax.Array, f: jax.Array):
  """Spatial cross product applied to a force vector: vel ×f f.

  (reference ``engine_util_spatial.c:401`` ``mju_crossForce``)
  """
  w, u = vel[..., :3], vel[..., 3:]
  ft, fl = f[..., :3], f[..., 3:]
  ang = jnp.cross(w, ft) + jnp.cross(u, fl)
  lin = jnp.cross(w, fl)
  return jnp.concatenate([ang, lin], axis=-1)


def inert_mul(ci: jax.Array, v: jax.Array):
  """Compact spatial inertia (10,) times motion vector (6,) -> force (6,).

  ``ci = [Ixx, Iyy, Izz, Ixy, Ixz, Iyz, h0, h1, h2, m]``
  (reference ``engine_util_spatial.c:452`` ``mju_mulInertVec``):
    ang = I @ w + h × u
    lin = m * u - h × w
  """
  w, u = v[..., :3], v[..., 3:]
  h = ci[..., 6:9]
  m = ci[..., 9:10]
  ixx, iyy, izz = ci[..., 0], ci[..., 1], ci[..., 2]
  ixy, ixz, iyz = ci[..., 3], ci[..., 4], ci[..., 5]
  iw = jnp.stack(
      [
          ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
          ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
          ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
      ],
      axis=-1,
  )
  ang = iw + jnp.cross(h, u)
  lin = m * u - jnp.cross(h, w)
  return jnp.concatenate([ang, lin], axis=-1)


def transform_motion(v: jax.Array, offset: jax.Array):
  """Translates a motion vector by ``offset`` (new origin = old + offset)."""
  w, u = v[..., :3], v[..., 3:]
  return jnp.concatenate([w, u - jnp.cross(offset, w)], axis=-1)


def transform_force(f: jax.Array, offset: jax.Array):
  """Re-expresses a (force, torque) pair at a point offset by ``offset``.

  Matches the reference convention used in ``mj_rnePostConstraint``
  (reference ``engine_core_smooth.c:2027``): torque -= offset × force,
  with spatial layout [torque, force].
  """
  t, frc = f[..., :3], f[..., 3:]
  return jnp.concatenate([t - jnp.cross(offset, frc), frc], axis=-1)


def local_to_global(parent_pos, parent_quat, pos, quat):
  """Composes a local frame (pos, quat) into its parent frame.

  Returns (world_pos, world_mat).
  """
  wpos = parent_pos + rotate(pos, parent_quat)
  wquat = quat_mul(parent_quat, quat)
  return wpos, quat_to_mat(wquat)
