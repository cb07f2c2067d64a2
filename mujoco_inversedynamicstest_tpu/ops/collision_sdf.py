"""Cylinder/ellipsoid narrowphase via signed-distance optimization.

The reference routes these pairs through libccd MPR / native GJK
(``src/engine/engine_collision_convex.c``) — iterative CCD with
data-dependent exits, which maps poorly onto XLA.  The TPU-native design
follows the published MuJoCo SDF-collision formulation (also used by MJX's
``collision_sdf.py``, the implementation to beat): the contact point
minimizes the *clearance* function

    phi(x) = f1(x) + f2(x) + |max(f1(x), f2(x))|

whose minimizer lies on the mid-surface between the two shapes; then
``dist = f1(x*) + f2(x*)`` and the normal is ``grad f1 - grad f2``.  The
minimization is a fixed-budget gradient descent with a geometric-grid
line search — fully branchless, vmappable, and exactly reproducible.

Analytic fast paths are used where closed forms exist (sphere-cylinder,
plane-ellipsoid), which is both faster and more accurate than descending.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.ops import math

_BIG = 1e10


# --------------------------------------------------------------------------
# local-frame signed distance functions
# --------------------------------------------------------------------------


def sdf_sphere(x, size):
  return math.norm_safe(x) - size[0]


def sdf_capsule(x, size):
  z = jnp.clip(x[2], -size[1], size[1])
  return math.norm_safe(x - jnp.array([0.0, 0.0, 1.0], x.dtype) * z) - size[0]


def sdf_cylinder(x, size):
  """Exact cylinder SDF (2-D rounded-box construction, safe norms)."""
  a = jnp.stack([math.norm_safe(x[:2]) - size[0], jnp.abs(x[2]) - size[1]])
  outside = jnp.maximum(a, 0.0)
  return math.norm_safe(outside) + jnp.minimum(jnp.max(a), 0.0)


def sdf_ellipsoid(x, size):
  """First-order scaled-space approximation (exact on the surface)."""
  k0 = math.norm_safe(x / size)
  k1 = math.norm_safe(x / (size * size))
  return k0 * (k0 - 1.0) / jnp.maximum(k1, math.MINVAL)


def sdf_box(x, size):
  """Exact box SDF."""
  q = jnp.abs(x) - size
  outside = jnp.maximum(q, 0.0)
  return math.norm_safe(outside) + jnp.minimum(jnp.max(q), 0.0)


_SDF = {
    2: sdf_sphere,     # GeomType.SPHERE
    3: sdf_capsule,    # GeomType.CAPSULE
    4: sdf_ellipsoid,  # GeomType.ELLIPSOID
    5: sdf_cylinder,   # GeomType.CYLINDER
    6: sdf_box,        # GeomType.BOX
}


# --------------------------------------------------------------------------
# clearance optimization
# --------------------------------------------------------------------------


def _descend(phi, x0, niter: int = 8, n_ls: int = 10):
  """Fixed-budget gradient descent with geometric line search.

  The iteration loop is UNROLLED (not ``lax.scan``): each step's work is
  a handful of tiny fused elementwise ops, and a 12-step scan forces 12
  serial kernel launches per contact pair — measured 89% of the whole
  humanoid100 step (the descent groups cost ~255 of 287 ms of collision
  at batch 64).  Unrolling lets XLA fuse the entire descent into a few
  launches; graph size stays modest (niter * ~n_ls ops)."""
  alphas = jnp.geomspace(1e-4, 2.0, n_ls).astype(x0.dtype)

  x = x0
  for _ in range(niter):
    g = jax.grad(phi)(x)
    cands = x[None] - alphas[:, None] * g[None]
    vals = jax.vmap(phi)(cands)
    k = jnp.argmin(vals)
    better = vals[k] < phi(x)
    x = jnp.where(better, cands[k], x)
  return x


def _sdf_pair_kernel(t1: int, t2: int, inits):
  """Builds a narrowphase fn minimizing the clearance from each init.

  ``inits(p1, m1, s1, p2, m2, s2) -> (k, 3)`` supplies the world-frame
  starting points (k = slot count).
  """
  f1_local = _SDF[t1]
  f2_local = _SDF[t2]

  def fn(p1, m1, s1, p2, m2, s2, margin):
    def f1(xw):
      return f1_local(m1.T @ (xw - p1), s1)

    def f2(xw):
      return f2_local(m2.T @ (xw - p2), s2)

    def phi(xw):
      a, b = f1(xw), f2(xw)
      return a + b + jnp.abs(jnp.maximum(a, b))

    def one(x0):
      x = _descend(phi, x0)
      dist = f1(x) + f2(x)
      n = jax.grad(f1)(x) - jax.grad(f2)(x)
      n = math.normalize(n)
      return jnp.where(dist <= margin, dist, _BIG), x, n

    x0s = inits(p1, m1, s1, p2, m2, s2)
    dist, pos, nrm = jax.vmap(one)(x0s)
    z = jnp.zeros_like(pos)
    return dist, pos, nrm, z

  return fn


# --------------------------------------------------------------------------
# analytic fast paths
# --------------------------------------------------------------------------


def plane_ellipsoid(p1, m1, s1, p2, m2, s2, margin):
  """Support point of the ellipsoid along the plane normal (exact)."""
  n = m1[:, 2]
  n_l = m2.T @ n                       # normal in ellipsoid frame
  sp_l = -(s2 * s2 * n_l) / jnp.maximum(
      math.norm_safe(s2 * n_l), math.MINVAL)
  sp = m2 @ sp_l + p2                  # deepest point on the ellipsoid
  dist = jnp.dot(sp - p1, n)
  pos = sp - 0.5 * dist * n
  z = jnp.zeros(3, dtype=p1.dtype)
  return (jnp.where(dist <= margin, dist, _BIG)[None], pos[None], n[None],
          z[None])


def sphere_cylinder(p1, m1, s1, p2, m2, s2, margin):
  """Closest point on the cylinder to the sphere center (exact)."""
  r_s = s1[0]
  x = m2.T @ (p1 - p2)                 # sphere center in cylinder frame
  rad = math.norm_safe(x[:2])
  rdir = jnp.where(rad > math.MINVAL, x[:2] / rad,
                   jnp.array([1.0, 0.0], x.dtype))

  # outside closest point: clamp radius/height
  q = jnp.concatenate([rdir * jnp.minimum(rad, s2[0]),
                       jnp.clip(x[2:3], -s2[1], s2[1])])
  inside = (rad <= s2[0]) & (jnp.abs(x[2]) <= s2[1])

  # inside: project to the nearest of side wall / end cap
  d_side = s2[0] - rad
  d_cap = s2[1] - jnp.abs(x[2])
  q_side = jnp.concatenate([rdir * s2[0], x[2:3]])
  q_cap = jnp.concatenate([x[:2], jnp.sign(x[2:3]) * s2[1]])
  q_in = jnp.where(d_side < d_cap, q_side, q_cap)
  q = jnp.where(inside, q_in, q)

  delta = x - q
  dn = math.norm_safe(delta)
  n_l = jnp.where(inside, -delta / dn, delta / dn)
  dist = jnp.where(inside, -dn, dn) - r_s
  nrm = -(m2 @ n_l)                    # 1 -> 2 direction
  pos = 0.5 * ((p1 + nrm * r_s) + (m2 @ q + p2))
  z = jnp.zeros(3, dtype=p1.dtype)
  return (jnp.where(dist <= margin, dist, _BIG)[None], pos[None], nrm[None],
          z[None])


# --------------------------------------------------------------------------
# support-descent narrowphase (ops/ccd.py) — the hot-path kernels
# --------------------------------------------------------------------------


def _feature_seeds(t: int, mat, dc):
  """Feature-aligned descent seeds for one geom: its cap/face normals
  and (for round geoms) the radial direction, signed toward ``dc``.
  Degenerate seeds (axis exactly perpendicular to dc, or dc along the
  axis for the radial seed) fall back to ``dc`` so every seed is a
  valid unit direction."""

  def signed(a):
    return a * jnp.where(jnp.sum(a * dc) >= 0, 1.0, -1.0)

  s = []
  if t in (3, 5):                        # capsule, cylinder
    a = mat[:, 2]
    s.append(signed(a))
    radial = dc - jnp.sum(dc * a) * a
    rn = jnp.linalg.norm(radial)
    s.append(jnp.where(rn > 1e-9, radial / jnp.maximum(rn, math.MINVAL),
                       dc))
  elif t in (4, 6):                      # ellipsoid, box
    for i in range(3):
      s.append(signed(mat[:, i]))
  return s


def _support_pair_kernel(t1: int, t2: int):
  """Single-slot convex narrowphase by support direction descent.

  Replaces the clearance-SDF gradient descent (still available above as
  ``_sdf_pair_kernel``) on the humanoid100 hot path: ~5x fewer
  function evaluations per pair, and exactly the reference's default
  contact count — native GJK+EPA emits ONE contact per convex pair
  when ``mjENBL_MULTICCD`` is off (``mjc_Convex``,
  engine_collision_convex.c:914).  dist/pos/normal follow the
  native-CCD witness convention (``mjc_CCDIteration``:792)."""
  from mujoco_inversedynamicstest_tpu.ops import ccd

  def fn(p1, m1, s1, p2, m2, s2, margin):
    supp1 = ccd.geom_support_fn(t1, p1, m1, s1)
    supp2 = ccd.geom_support_fn(t2, p2, m2, s2)
    dc = math.normalize(p2 - p1)
    seeds = jnp.stack([dc] + _feature_seeds(t1, m1, dc)
                      + _feature_seeds(t2, m2, dc))
    dist, u, wa = ccd.support_descent_staged(supp1, supp2, seeds)
    wb = supp2(-u)
    pos = 0.5 * (wa + wb)
    z = jnp.zeros(3, dtype=p1.dtype)
    return (jnp.where(dist <= margin, dist, _BIG)[None], pos[None],
            u[None], z[None])

  return fn


# GeomType values: PLANE=0, SPHERE=2, CAPSULE=3, ELLIPSOID=4, CYLINDER=5,
# BOX=6.  (cylinder-box and ellipsoid-box pairs exceed the MJX capability
# table — the reference routes them through CCD.)
SDF_NARROWPHASE = {
    (0, 4): plane_ellipsoid,
    (2, 4): _support_pair_kernel(2, 4),
    (2, 5): sphere_cylinder,
    (3, 4): _support_pair_kernel(3, 4),
    (3, 5): _support_pair_kernel(3, 5),
    (4, 4): _support_pair_kernel(4, 4),
    (4, 5): _support_pair_kernel(4, 5),
    (4, 6): _support_pair_kernel(4, 6),
    (5, 5): _support_pair_kernel(5, 5),
    (5, 6): _support_pair_kernel(5, 6),
}

SDF_SLOTS = {
    (0, 4): 1,
    (2, 4): 1,
    (2, 5): 1,
    (3, 4): 1,
    (3, 5): 1,
    (4, 4): 1,
    (4, 5): 1,
    (4, 6): 1,
    (5, 5): 1,
    (5, 6): 1,
}


# --------------------------------------------------------------------------
# SDF plugin geoms (mjGEOM_SDF; ref engine_collision_sdf.c:660 mjc_SDF)
# --------------------------------------------------------------------------

# descent inits per pair: the reference seeds `opt.sdf_initpoints` Halton
# points in the AABB intersection (mjc_SDF:754); here a static Halton set
# scaled into the runtime world-AABB intersection
_SDF_PLUGIN_NINIT = 12
_SDF_PLUGIN_NSLOT = 4


def _halton(n: int, base: int):
  out = []
  for i in range(1, n + 1):
    f, r, x = 1.0, 0.0, i
    while x > 0:
      f /= base
      r += f * (x % base)
      x //= base
    out.append(r)
  return out


def _halton_unit(n: int):
  import numpy as np

  return np.stack([_halton(n, 2), _halton(n, 3), _halton(n, 5)], axis=1)


def sdf_plane(x, size):
  return x[2]


def make_plugin_narrowphase(m, grp):
  """Narrowphase for pairs whose second geom is an SDF plugin geom.

  TPU re-design of ``mjc_SDF`` (ref engine_collision_sdf.c:660): static
  Halton inits in the runtime AABB intersection, fixed-budget clearance
  descent, midsurface contact extraction (normal = normalize(∇f1)−
  normalize(∇f2), the mjSDFTYPE_MIDSURFACE gradient, :233-242), then a
  masked distinct-top-k instead of the reference's dynamic dedup loop.
  Contacts gate on penetration (dist<=0) exactly like ``addContact``
  (:338 — SDF contacts ignore margin).  Contact depth is ``f1+f2`` (the
  surface-to-surface gap along the normal); the reference reports the
  intersection objective ``max(f1,f2)`` instead (:777), i.e. ~half the
  depth for symmetric overlap — ours is the physically-consistent choice
  and matches this module's primitive-pair kernels.
  """
  import numpy as np

  from mujoco_inversedynamicstest_tpu.models.types import GeomType

  t1 = GeomType(grp.types[0])
  g2s = grp.geom2

  def inst_of(g):
    return m.plugin_hooks[int(m.geom_plugin_np[g])]

  inst2 = inst_of(int(g2s[0]))
  for g in g2s:
    if inst_of(int(g)) is not inst2:
      raise NotImplementedError(
          "SDF pair group spans multiple plugin instances; expected "
          "grouping by dataid")

  # mesh recentering (undoTransformation, engine_collision_sdf.c:289):
  # sdf-local = R_mesh @ (R_geom^T (x - p_geom)) + p_mesh
  def np_quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])

  def recenter_of(g):
    did = int(m.geom_dataid[g])
    if did >= 0 and m.mesh_pos_np is not None:
      return (np.asarray(m.mesh_pos_np[did], np.float64),
              np_quat_mat(np.asarray(m.mesh_quat_np[did], np.float64)))
    return np.zeros(3), np.eye(3)

  pm2, rm2 = recenter_of(int(g2s[0]))

  sdf1_inst = None
  if t1 == GeomType.SDF:
    sdf1_inst = inst_of(int(grp.geom1[0]))
    pm1, rm1 = recenter_of(int(grp.geom1[0]))
  elif t1 == GeomType.PLANE:
    f1_local = sdf_plane
  else:
    f1_local = _SDF[int(t1)]

  units = _halton_unit(_SDF_PLUGIN_NINIT)
  aabb1 = np.asarray(m.geom_aabb_np[int(grp.geom1[0])])
  aabb2 = np.asarray(m.geom_aabb_np[int(g2s[0])])

  def fn(p1, m1, s1, p2, m2, s2, margin):
    dtype = p1.dtype

    def f2(xw):
      xl = jnp.asarray(rm2, dtype) @ (m2.T @ (xw - p2)) + jnp.asarray(
          pm2, dtype)
      return inst2.sdf(xl)

    if sdf1_inst is not None:
      def f1(xw):
        xl = jnp.asarray(rm1, dtype) @ (m1.T @ (xw - p1)) + jnp.asarray(
            pm1, dtype)
        return sdf1_inst.sdf(xl)
    else:
      def f1(xw):
        return f1_local(m1.T @ (xw - p1), s1)

    def phi(xw):
      a, b = f1(xw), f2(xw)
      return a + b + jnp.abs(jnp.maximum(a, b))

    # world AABB intersection (mjc_SDF:691-721, here in world frame)
    def world_box(p, r, ab):
      c = p + r @ jnp.asarray(ab[:3], dtype)
      half = jnp.abs(r) @ jnp.asarray(ab[3:], dtype)
      return c - half, c + half

    lo1, hi1 = world_box(p1, m1, aabb1)
    lo2, hi2 = world_box(p2, m2, aabb2)
    lo = jnp.maximum(lo1, lo2)
    hi = jnp.minimum(hi1, hi2)
    overlap = jnp.all(hi >= lo)
    width = jnp.maximum(hi - lo, 0.0)
    inits = lo[None] + jnp.asarray(units, dtype) * width[None]

    def one(x0):
      x = _descend(phi, x0, niter=12, n_ls=12)
      dist = f1(x) + f2(x)
      g1v = math.normalize(jax.grad(f1)(x))
      g2v = math.normalize(jax.grad(f2)(x))
      n = math.normalize(g1v - g2v)
      return dist, x, n

    dists, poss, nrms = jax.vmap(one)(inits)
    valid = (dists <= 0.0) & overlap

    # distinct top-k: deepest first; drop candidates that converged to a
    # point already kept (the reference's isknown dedup, :324)
    order = jnp.argsort(jnp.where(valid, dists, _BIG))
    dists, poss, nrms = dists[order], poss[order], nrms[order]
    valid = valid[order]
    scale = jnp.maximum(jnp.max(width), 1e-6)
    close = (jnp.linalg.norm(poss[:, None] - poss[None, :], axis=-1)
             < 1e-4 * scale)
    earlier = jnp.tril(jnp.ones_like(close), k=-1)
    dup = jnp.any(close & earlier & valid[None, :], axis=1)
    valid = valid & ~dup

    k = _SDF_PLUGIN_NSLOT
    keep = jnp.nonzero(valid, size=k, fill_value=_SDF_PLUGIN_NINIT - 1)[0]
    out_d = jnp.where(valid[keep], dists[keep], _BIG)
    z = jnp.zeros((k, 3), dtype=dtype)
    return out_d, poss[keep], nrms[keep], z

  return fn


SDF_PLUGIN_SLOTS = _SDF_PLUGIN_NSLOT
