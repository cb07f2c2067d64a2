"""Support-function convex collision: direction-descent CCD.

TPU-native replacement for the reference's iterative CCD backends
(``src/engine/engine_collision_convex.c``: libccd MPR at :833, native
GJK+EPA ``engine_collision_gjk.c`` behind ``mjc_CCDIteration``:792).
Those algorithms carry data-dependent loops and polytope bookkeeping
that map poorly onto XLA; this module reformulates the same quantity —
the signed separation of two convex support sets — as a fixed-budget
minimization over contact directions:

    h(u) = max_{x in A} u.x  +  max_{y in B} (-u).y  + pad

is the support function of the Minkowski difference ``A (-) B`` (plus a
shell padding).  Its minimum over the unit sphere is ``-distance`` when
the sets are separated and ``+penetration depth`` when they overlap —
the exact value EPA extracts from its polytope — so

    contact dist = -min_{|u|=1} h(u),     contact normal = argmin u

in one formulation for both regimes.  The minimization runs as a
projected subgradient descent with a geometric angle schedule from a
few feature-aligned seeds, best iterate kept: fixed trip count, no
branches, fully ``vmap``-able over contact pairs and batch lanes.

Witness points come from the supports at the optimum: ``x* = supp_A
(u*)``, ``y* = supp_B(-u*)``; the contact position is their midpoint,
matching the native-CCD convention (``engine_collision_convex.c:817``:
``pos = 0.5 (x1 + x2)``, ``frame = x1 - x2`` normalized — which for
smooth geoms equals the surface normal at the witness, the same
quantity ``mjc_fixNormal`` :1469 restores on the legacy MPR path).

Like the reference's default configuration (``mjENBL_MULTICCD`` off,
``mjc_Convex`` :914 => ``max_contacts = 1``), each convex pair yields
ONE contact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import GeomType
from mujoco_inversedynamicstest_tpu.ops import math

_BIG = 1e10


def _dot(a, b):
  """Elementwise dot.  Under ``vmap`` a ``jnp.dot`` lowers to a batched
  ``dot_general`` which TPUs execute on the MXU at bfloat16 default
  precision — measured 1.5% error on contact depths.  An explicit
  multiply+sum stays on the VPU at full float32."""
  return jnp.sum(a * b, axis=-1)


def _mtv(mat, v):
  """mat.T @ v without dot_general (see ``_dot``)."""
  return jnp.sum(mat * v[:, None], axis=0)


def _mv(mat, v):
  """mat @ v without dot_general (see ``_dot``)."""
  return jnp.sum(mat * v[None, :], axis=1)



# --------------------------------------------------------------------------
# analytic support functions
# --------------------------------------------------------------------------


def geom_support_fn(gtype, p, mat, size):
  """World-frame support function of an analytic convex geom.

  Returns ``supp(u) -> point``: the farthest point of the geom along
  world direction ``u`` (the quadric supports the reference's CCD
  backends evaluate, ``mjccd_support`` engine_collision_convex.c:501).
  """
  gtype = int(gtype)
  if gtype == int(GeomType.CYLINDER):
    a = mat[:, 2]
    r, hl = size[0], size[1]

    def supp(u):
      ca = _dot(u, a)
      perp = u - ca * a
      lp = jnp.linalg.norm(perp)
      rad = jnp.where(lp > 1e-9, r * perp / jnp.maximum(lp, math.MINVAL),
                      jnp.zeros_like(perp))
      return p + jnp.sign(ca) * hl * a + rad
  elif gtype == int(GeomType.ELLIPSOID):

    def supp(u):
      ul = _mtv(mat, u)
      w = size * ul
      lw = jnp.maximum(jnp.linalg.norm(w), math.MINVAL)
      return p + _mv(mat, size * w / lw)
  elif gtype == int(GeomType.SPHERE):

    def supp(u):
      return p + size[0] * u
  elif gtype == int(GeomType.CAPSULE):
    a = mat[:, 2]
    r, hl = size[0], size[1]

    def supp(u):
      return p + jnp.sign(_dot(u, a)) * hl * a + r * u
  elif gtype == int(GeomType.BOX):

    def supp(u):
      ul = _mtv(mat, u)
      return p + _mv(mat, jnp.sign(ul) * size)
  else:
    raise NotImplementedError(f"support fn for geom type {gtype}")
  return supp


def hull_support_fn(vert):
  """Support of a convex vertex cloud (mesh hull): one MXU matvec."""

  def supp(u):
    return vert[jnp.argmax(jnp.sum(vert * u, axis=-1))]

  return supp


# --------------------------------------------------------------------------
# direction descent
# --------------------------------------------------------------------------


def support_descent(supp_a, supp_b, seeds, pad: float = 0.0,
                    iters: int = 18, theta0: float = 0.5):
  """Signed separation of two convex support sets by direction descent.

  Every seed runs the full schedule; the global best over all seeds and
  iterates wins.  Returns ``(dist, nrm, wa)``: contact distance
  (negative = penetrating), the optimal direction (A -> B contact
  normal), and A's witness point along it."""

  def h_of(u):
    return _dot(u, supp_a(u) - supp_b(-u)) + pad

  def descend(u0):
    def body(carry, theta):
      u, best_h, best_u = carry
      w = supp_a(u) - supp_b(-u)
      g = w - _dot(w, u) * u
      gn = jnp.linalg.norm(g)
      unew = math.normalize(u - (theta / jnp.maximum(gn, math.MINVAL)) * g)
      hnew = h_of(unew)
      better = hnew < best_h
      return (unew, jnp.where(better, hnew, best_h),
              jnp.where(better, unew, best_u)), None

    thetas = theta0 * (0.7 ** jnp.arange(iters, dtype=u0.dtype))
    h0 = h_of(u0)
    (_, best_h, best_u), _ = jax.lax.scan(body, (u0, h0, u0), thetas)
    return best_h, best_u

  hs, us = jax.vmap(descend)(seeds)
  k = jnp.argmin(hs)
  u_star = us[k]
  return -hs[k], u_star, supp_a(u_star)


def support_descent_staged(supp_a, supp_b, seeds, pad: float = 0.0,
                           coarse: int = 5, fine: int = 14):
  """Two-stage variant for wide fan-outs: a short coarse descent from
  every seed picks the winning basin; a single fine descent refines it.
  ~3x fewer support evaluations than running the full schedule from
  every seed — the hot-path configuration for geom-geom narrowphase."""

  def h_of(u):
    return _dot(u, supp_a(u) - supp_b(-u)) + pad

  def descend(u0, iters, theta0, decay):
    def body(carry, theta):
      u, best_h, best_u = carry
      w = supp_a(u) - supp_b(-u)
      g = w - _dot(w, u) * u
      gn = jnp.linalg.norm(g)
      unew = math.normalize(u - (theta / jnp.maximum(gn, math.MINVAL)) * g)
      hnew = h_of(unew)
      better = hnew < best_h
      return (unew, jnp.where(better, hnew, best_h),
              jnp.where(better, unew, best_u)), None

    thetas = theta0 * (decay ** jnp.arange(iters, dtype=u0.dtype))
    (_, best_h, best_u), _ = jax.lax.scan(body, (u0, h_of(u0), u0), thetas)
    return best_h, best_u

  hs, us = jax.vmap(lambda u0: descend(u0, coarse, 0.4, 0.55))(seeds)
  k = jnp.argmin(hs)
  h1, u1 = descend(us[k], fine, 0.12, 0.62)
  better = h1 < hs[k]
  best_h = jnp.where(better, h1, hs[k])
  u_star = jnp.where(better, u1, us[k])
  return -best_h, u_star, supp_a(u_star)


# --------------------------------------------------------------------------
# smooth-surface normal restoration (mjc_fixNormal analog)
# --------------------------------------------------------------------------


def ellipsoid_normal(pos, size, nrm0, dtype):
  """Surface normal of an ellipsoid at/near local point ``pos`` — the
  ``mjc_fixNormal`` ellipsoid branch (engine_collision_convex.c:1363,
  1418): ray-projection SQP for interior points, diagonal-QCQP Newton
  on lambda for exterior ones.  Fixed trip counts, vmappable."""
  s2inv = 1.0 / (size * size)
  c = jnp.sum(pos * pos * s2inv) - 1.0
  inside = c <= 0

  def in_body(nrm, _):
    a = jnp.sum(nrm * nrm * s2inv)
    b = jnp.sum(pos * nrm * s2inv)
    det = jnp.maximum(b * b - a * c, 0.0)
    x = (-b + jnp.sqrt(det)) / jnp.maximum(a, math.MINVAL)
    pnt = pos + x * nrm
    newn = math.normalize(pnt * s2inv)
    ok = (det >= math.MINVAL) & (a >= math.MINVAL) & (x >= 0)
    return jnp.where(ok, newn, nrm), None

  n_in, _ = jax.lax.scan(in_body, math.normalize(nrm0), None, length=30)

  s2 = size * size
  ps2 = pos * pos * s2

  def out_body(la, _):
    r = 1.0 / (s2 + la)
    val = jnp.sum(ps2 * r * r) - 1.0
    deriv = -2.0 * jnp.sum(ps2 * r * r * r)
    delta = -val / jnp.minimum(deriv, -math.MINVAL)
    return jnp.where(val >= 1e-6, la + delta, la), None

  la, _ = jax.lax.scan(out_body, jnp.zeros((), dtype), None, length=30)
  n_out = math.normalize(pos / (s2 + la))
  return jnp.where(inside, n_in, n_out)


def fix_normal_smooth(gtype, p, mat, size, pos, nrm):
  """Snap a CCD contact normal to the analytic surface normal of a
  smooth geom at the contact point (``mjc_fixNormal``,
  engine_collision_convex.c:1467) — the step that gives the C engine
  its radial round-wall normals in cloth-pocket scenes.

  ``nrm`` is oriented away from the geom (geom -> other); returns the
  fixed normal in the same orientation."""
  pl = _mtv(mat, pos - p)
  nl = _mtv(mat, nrm)
  gtype = int(gtype)
  if gtype == int(GeomType.CYLINDER):
    r, hl = size[0], size[1]
    dst1 = jnp.abs(hl - jnp.abs(pl[2]))
    dst2 = jnp.abs(r - jnp.linalg.norm(pl[:2]))
    keep = (jnp.abs(pl[2]) > 0.95 * hl) | (dst1 < 0.25 * dst2)
    radial = math.normalize(jnp.array([pl[0], pl[1], 0.0 * pl[2]]))
    fixed = jnp.where(keep, nl, radial)
  elif gtype == int(GeomType.ELLIPSOID):
    fixed = ellipsoid_normal(pl, size, nl, pos.dtype)
  else:
    return nrm
  return _mv(mat, fixed)
