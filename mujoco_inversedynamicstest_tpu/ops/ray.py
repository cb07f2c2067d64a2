"""Ray casting against primitive geoms — branchless, batched JAX.

Capability parity with the reference's ray module (reference
``src/engine/engine_ray.c``: ``ray_quad``:105, ``ray_plane``:191,
``ray_sphere``:222, ``ray_capsule``:238, ``ray_ellipsoid``:305,
``ray_cylinder``:327, ``ray_box``:387, ``ray_eliminate``, ``mj_ray``:1145;
used by the rangefinder sensor ``engine_sensor.c:266-273`` and viewer
picking).

TPU-first design: geoms are grouped by type at trace time; each group's
intersections run as one vmapped branchless kernel; the result is a masked
min-reduction.  "No hit" is the sentinel −1, carried as +inf internally so
the reduction is a plain ``argmin``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import Data, GeomType, Model

_MINVAL = 1e-15
_INF = jnp.inf


def _ray_map(pos, mat, pnt, vec):
  """Express the ray in a geom's local frame."""
  lpnt = mat.T @ (pnt - pos)
  lvec = mat.T @ vec
  return lpnt, lvec


def _ray_quad(a, b, c):
  """Smallest non-negative root of ``a x² + 2 b x + c = 0`` else +inf."""
  det = b * b - a * c
  ok = det >= _MINVAL
  sdet = jnp.sqrt(jnp.maximum(det, 0.0))
  sa = jnp.where(jnp.abs(a) < _MINVAL, 1.0, a)
  x0 = (-b - sdet) / sa
  x1 = (-b + sdet) / sa
  x = jnp.where(x0 >= 0, x0, jnp.where(x1 >= 0, x1, _INF))
  return jnp.where(ok, x, _INF), jnp.where(ok, x0, _INF), jnp.where(
      ok, x1, _INF)


def _ray_plane(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  facing = lvec[2] <= -_MINVAL
  x = -lpnt[2] / jnp.where(facing, lvec[2], -1.0)
  p0 = lpnt[0] + x * lvec[0]
  p1 = lpnt[1] + x * lvec[1]
  inside = ((size[0] <= 0) | (jnp.abs(p0) <= size[0])) & (
      (size[1] <= 0) | (jnp.abs(p1) <= size[1]))
  return jnp.where(facing & (x >= 0) & inside, x, _INF)


def _ray_sphere_raw(pos, r2, pnt, vec):
  dif = pnt - pos
  a = jnp.dot(vec, vec)
  b = jnp.dot(vec, dif)
  c = jnp.dot(dif, dif) - r2
  x, _, _ = _ray_quad(a, b, c)
  return x


def _ray_sphere(pos, mat, size, pnt, vec):
  return _ray_sphere_raw(pos, size[0] * size[0], pnt, vec)


def _ray_capsule(pos, mat, size, pnt, vec):
  bound = _ray_sphere_raw(pos, (size[0] + size[1]) ** 2, pnt, vec)
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)

  # cylinder round side between the flat caps
  a2 = lvec[0] ** 2 + lvec[1] ** 2
  b2 = lvec[0] * lpnt[0] + lvec[1] * lpnt[1]
  c2 = lpnt[0] ** 2 + lpnt[1] ** 2 - size[0] ** 2
  sol, _, _ = _ray_quad(a2, b2, c2)
  zed = lpnt[2] + sol * lvec[2]
  x = jnp.where(jnp.isfinite(sol) & (jnp.abs(zed) <= size[1]), sol, _INF)

  a = jnp.dot(lvec, lvec)
  for sign in (1.0, -1.0):
    ldif = lpnt - jnp.array([0.0, 0.0, sign * 1.0], lpnt.dtype) * size[1]
    b = jnp.dot(lvec, ldif)
    c = jnp.dot(ldif, ldif) - size[0] ** 2
    _, x0, x1 = _ray_quad(a, b, c)
    for cand in (x0, x1):
      z = lpnt[2] + cand * lvec[2]
      on_cap = jnp.where(sign > 0, z >= size[1], z <= -size[1])
      x = jnp.where(jnp.isfinite(cand) & (cand >= 0) & on_cap,
                    jnp.minimum(x, cand), x)

  return jnp.where(jnp.isfinite(bound), x, _INF)


def _ray_ellipsoid(pos, mat, size, pnt, vec):
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  s = 1.0 / (size * size)
  a = jnp.sum(s * lvec * lvec)
  b = jnp.sum(s * lvec * lpnt)
  c = jnp.sum(s * lpnt * lpnt) - 1.0
  x, _, _ = _ray_quad(a, b, c)
  return x


def _ray_cylinder(pos, mat, size, pnt, vec):
  bound = _ray_sphere_raw(pos, size[0] ** 2 + size[1] ** 2, pnt, vec)
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)

  x = jnp.asarray(_INF, dtype=pnt.dtype)
  # flat end disks
  safe_vz = jnp.where(jnp.abs(lvec[2]) > _MINVAL, lvec[2], 1.0)
  for sign in (-1.0, 1.0):
    sol = (sign * size[1] - lpnt[2]) / safe_vz
    p0 = lpnt[0] + sol * lvec[0]
    p1 = lpnt[1] + sol * lvec[1]
    ok = ((jnp.abs(lvec[2]) > _MINVAL) & (sol >= 0)
          & (p0 * p0 + p1 * p1 <= size[0] ** 2))
    x = jnp.where(ok, jnp.minimum(x, sol), x)

  # round side
  a = lvec[0] ** 2 + lvec[1] ** 2
  b = lvec[0] * lpnt[0] + lvec[1] * lpnt[1]
  c = lpnt[0] ** 2 + lpnt[1] ** 2 - size[0] ** 2
  sol, _, _ = _ray_quad(a, b, c)
  zed = lpnt[2] + sol * lvec[2]
  x = jnp.where(jnp.isfinite(sol) & (jnp.abs(zed) <= size[1]),
                jnp.minimum(x, sol), x)

  return jnp.where(jnp.isfinite(bound), x, _INF)


def _ray_box(pos, mat, size, pnt, vec):
  bound = _ray_sphere_raw(pos, jnp.sum(size * size), pnt, vec)
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)

  iface = ((1, 2), (0, 2), (0, 1))
  x = jnp.asarray(_INF, dtype=pnt.dtype)
  for i in range(3):
    safe_v = jnp.where(jnp.abs(lvec[i]) > _MINVAL, lvec[i], 1.0)
    for sign in (-1.0, 1.0):
      sol = (sign * size[i] - lpnt[i]) / safe_v
      j, k = iface[i]
      p0 = lpnt[j] + sol * lvec[j]
      p1 = lpnt[k] + sol * lvec[k]
      ok = ((jnp.abs(lvec[i]) > _MINVAL) & (sol >= 0)
            & (jnp.abs(p0) <= size[j]) & (jnp.abs(p1) <= size[k]))
      x = jnp.where(ok, jnp.minimum(x, sol), x)

  return jnp.where(jnp.isfinite(bound), x, _INF)


def _ray_triangles(tv, lpnt, lvec):
  """Batched Möller–Trumbore ray-triangle; tv is (T, 3, 3) local verts.

  Returns the per-triangle hit parameter (+inf where missed).  Same
  surface query as the reference's ``ray_triangle`` (ref engine_ray.c:35)
  in its barycentric form — evaluated for ALL triangles at once (the TPU
  replacement for the BVH walk of ``mju_rayTree``)."""
  eps = jnp.asarray(1e-12, lpnt.dtype)
  v0, v1, v2 = tv[:, 0], tv[:, 1], tv[:, 2]
  e1 = v1 - v0
  e2 = v2 - v0
  h = jnp.cross(jnp.broadcast_to(lvec, e2.shape), e2)
  a = jnp.einsum("td,td->t", e1, h)
  f = 1.0 / jnp.where(jnp.abs(a) < eps, 1.0, a)
  s = lpnt - v0
  u = f * jnp.einsum("td,td->t", s, h)
  q = jnp.cross(s, e1)
  v = f * (q @ lvec)
  t = f * jnp.einsum("td,td->t", e2, q)
  ok = ((jnp.abs(a) >= eps) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
        & (t >= 0))
  return jnp.where(ok, t, _INF)


def _ray_mesh(tv_const, pos, mat, size, pnt, vec):
  """Ray vs one mesh geom (analog ``mj_rayMesh``, ref engine_ray.c:800).

  ``tv_const`` is the static (T, 3, 3) canonical-frame triangle table of
  the geom's mesh (full surface, not the collision hull)."""
  bound = _ray_box(pos, mat, size, pnt, vec)
  lpnt, lvec = _ray_map(pos, mat, pnt, vec)
  tv = jnp.asarray(tv_const, dtype=pnt.dtype)
  x = jnp.min(_ray_triangles(tv, lpnt, lvec))
  return jnp.where(jnp.isfinite(bound), x, _INF)


_RAY_FUNC = {
    GeomType.PLANE: _ray_plane,
    GeomType.SPHERE: _ray_sphere,
    GeomType.CAPSULE: _ray_capsule,
    GeomType.ELLIPSOID: _ray_ellipsoid,
    GeomType.CYLINDER: _ray_cylinder,
    GeomType.BOX: _ray_box,
}


def ray_geom(pos, mat, size, pnt, vec, geomtype) -> jax.Array:
  """Ray-geom distance (+inf if no hit); analog ``mju_rayGeom`` (ref :818)."""
  return _RAY_FUNC[GeomType(int(geomtype))](pos, mat, size, pnt, vec)


def ray(m: Model, d: Data, pnt: jax.Array, vec: jax.Array,
        geomgroup: Optional[np.ndarray] = None, flg_static: bool = True,
        bodyexclude: int = -1) -> Tuple[jax.Array, jax.Array]:
  """Nearest geom hit by a world-space ray (analog ``mj_ray``, ref :1145).

  Returns ``(dist, geomid)`` with ``dist = −1`` / ``geomid = −1`` when
  nothing is hit.  Exclusion masks (body, static, group, invisibility) are
  static model metadata, so excluded geoms cost nothing at runtime.
  """
  dtype = d.qpos.dtype
  pnt = jnp.asarray(pnt, dtype=dtype)
  vec = jnp.asarray(vec, dtype=dtype)

  include = m.geom_visible.copy()
  include &= m.geom_bodyid != bodyexclude
  if not flg_static:
    include &= m.body_weldid[m.geom_bodyid] != 0
  if geomgroup is not None:
    grp = np.clip(m.geom_group, 0, len(geomgroup) - 1)
    include &= np.asarray(geomgroup, dtype=bool)[grp]

  candidates = np.nonzero(include)[0]
  if candidates.size == 0:
    return jnp.asarray(-1.0, dtype=dtype), jnp.asarray(-1, dtype=jnp.int32)

  dists, ids = [], []
  for t in sorted(set(int(m.geom_type[g]) for g in candidates)):
    gids = candidates[m.geom_type[candidates] == t]
    if GeomType(t) == GeomType.MESH:
      # per-geom topology: one masked-min triangle sweep per mesh geom
      for g in gids:
        did = int(m.geom_dataid[g])
        if not m.mesh_tris:
          raise NotImplementedError(
              "ray vs MESH requires mesh_tris (built when the model has a "
              "rangefinder; rebuild via put_model)")
        dists.append(_ray_mesh(
            m.mesh_tris[did], d.geom_xpos[g], d.geom_xmat[g],
            m.geom_size[g], pnt, vec)[None])
        ids.append(np.array([g]))
      continue
    if GeomType(t) == GeomType.HFIELD:
      from mujoco_inversedynamicstest_tpu.ops import hfield as hfield_mod

      for g in gids:
        dists.append(hfield_mod.ray_hfield(m, d, int(g), pnt, vec)[None])
        ids.append(np.array([g]))
      continue
    if GeomType(t) not in _RAY_FUNC:
      raise NotImplementedError(f"ray vs geom type {GeomType(t).name}")
    fn = _RAY_FUNC[GeomType(t)]
    dist = jax.vmap(fn, in_axes=(0, 0, 0, None, None))(
        d.geom_xpos[gids], d.geom_xmat[gids], m.geom_size[gids], pnt, vec)
    dists.append(dist)
    ids.append(gids)

  dist = jnp.concatenate(dists)
  ids = jnp.asarray(np.concatenate(ids), dtype=jnp.int32)
  best = jnp.argmin(dist)
  best_dist = dist[best]
  hit = jnp.isfinite(best_dist)
  return (jnp.where(hit, best_dist, -1.0),
          jnp.where(hit, ids[best], -1).astype(jnp.int32))


# ---------------------------------------------------------------------------
# flex and skin rays (viewer picking surface; ref mju_rayFlex
# engine_ray.c:848, mju_raySkin :1026)
# ---------------------------------------------------------------------------


def _ray_tris(tris, pnt, vec):
  """Batched Möller-Trumbore: (T, 3, 3) triangles -> (T,) ray params
  (+inf on miss).  The reference projects onto a normal-plane basis
  (ray_triangle, engine_ray.c:132); the intersections are identical."""
  eps = 1e-12
  v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
  e1 = v1 - v0
  e2 = v2 - v0
  h = jnp.cross(vec[None], e2)
  a = jnp.einsum("tc,tc->t", e1, h)
  f = 1.0 / jnp.where(jnp.abs(a) < eps, jnp.inf, a)
  s = pnt[None] - v0
  u = f * jnp.einsum("tc,tc->t", s, h)
  q = jnp.cross(s, e1)
  v = f * jnp.einsum("c,tc->t", vec, q)
  t = f * jnp.einsum("tc,tc->t", e2, q)
  ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= 0) & jnp.isfinite(t)
  return jnp.where(ok, t, jnp.inf)


def ray_flex(m: Model, d: Data, flexid: int, pnt, vec,
             flg_vert: bool = False, flg_edge: bool = False,
             flg_face: bool = True, flg_skin: bool = True,
             flex_layer: int = 0):
  """Nearest flex intersection + nearest vertex id (``mju_rayFlex``
  analog, ref ``engine_ray.c:848``).

  Element faces intersect as flat triangles (dim-2: the element; dim-3:
  the four tet faces, outer layer only under ``flg_skin``, else the
  ``flex_layer`` slice); edges as capsules; vertices as spheres — the
  reference's exact surface set per flag combination.  Returns
  ``(dist, vertid)`` with ``dist = -1`` on miss.
  """
  dtype = d.qpos.dtype
  pnt = jnp.asarray(pnt, dtype=dtype)
  vec = jnp.asarray(vec, dtype=dtype)
  f = int(flexid)
  dim = int(m.flex_dim[f])
  va, vn = int(m.flex_vertadr[f]), int(m.flex_vertnum[f])
  verts = d.flexvert_xpos[va:va + vn]
  radius = m.flex_radius[f]

  dists, vids = [], []

  # ref branch structure (engine_ray.c:907-948): edges are checked when
  # rendered OR under skin mode (the rounded boundary); vertices only
  # when edges are not; faces whenever rendered or skinned
  use_edges = flg_edge or (dim > 1 and flg_skin)
  if use_edges and m.nflexedge:
    ea, en = int(m.flex_edgeadr[f]), int(m.flex_edgenum[f])
    edge = np.asarray(m.flex_edge)[ea:ea + en] - va    # local ids
    v1 = verts[edge[:, 0]]
    v2 = verts[edge[:, 1]]

    def one_edge(a, b):
      mid = 0.5 * (a + b)
      dif = b - a
      ln = jnp.linalg.norm(dif)
      axis = dif / jnp.maximum(ln, 1e-12)
      mat = _mat_z(axis, dtype)
      size = jnp.stack([radius, 0.5 * ln, radius])
      return ray_geom(mid, mat, size, pnt, vec, int(GeomType.CAPSULE))

    de = jax.vmap(one_edge)(v1, v2)
    de = jnp.where(jnp.isfinite(de) & (de >= 0), de, jnp.inf)
    hit_pt = pnt[None] + vec[None] * de[:, None]
    near = jnp.where(
        jnp.linalg.norm(v1 - hit_pt, axis=1)
        < jnp.linalg.norm(v2 - hit_pt, axis=1),
        edge[:, 0], edge[:, 1])
    dists.append(de)
    vids.append(near)
  elif flg_vert and not (dim > 1 and flg_skin):
    def one_vert(v):
      mat = jnp.eye(3, dtype=dtype)
      size = jnp.stack([radius, radius, radius])
      return ray_geom(v, mat, size, pnt, vec, int(GeomType.SPHERE))

    dv = jax.vmap(one_vert)(verts)
    dv = jnp.where(jnp.isfinite(dv) & (dv >= 0), dv, jnp.inf)
    dists.append(dv)
    vids.append(jnp.arange(vn))

  if dim > 1 and (flg_face or flg_skin):
    ea, en = int(m.flex_elemadr[f]), int(m.flex_elemnum[f])
    elem = np.asarray(m.flex_elem)[ea:ea + en, :dim + 1] - va
    layer = np.asarray(m.flex_elemlayer_np)[ea:ea + en]
    if dim == 3:
      keep = (layer == 0) if flg_skin else (layer == flex_layer)
      elem = elem[keep]
      tri_ids = np.concatenate([
          elem[:, [0, 1, 2]], elem[:, [0, 1, 3]],
          elem[:, [0, 2, 3]], elem[:, [1, 2, 3]]], axis=0)
    else:
      tri_ids = elem
    if len(tri_ids):
      tris = verts[tri_ids]                           # (T, 3, 3)
      dt = _ray_tris(tris, pnt, vec)
      hit_pt = pnt[None] + vec[None] * dt[:, None]
      vd = jnp.linalg.norm(tris - hit_pt[:, None], axis=2)  # (T, 3)
      near = jnp.asarray(tri_ids)[jnp.arange(len(tri_ids)),
                                  jnp.argmin(vd, axis=1)]
      dists.append(dt)
      vids.append(near)

  if not dists:
    return jnp.asarray(-1.0, dtype), jnp.asarray(-1, jnp.int32)
  dist = jnp.concatenate(dists)
  vid = jnp.concatenate([jnp.asarray(v, jnp.int32) for v in vids])
  best = jnp.argmin(dist)
  hit = jnp.isfinite(dist[best])
  return (jnp.where(hit, dist[best], -1.0),
          jnp.where(hit, vid[best], -1).astype(jnp.int32))


def _mat_z(axis, dtype):
  """Rotation matrix whose z-column is ``axis`` (mju_quatZ2Vec analog)."""
  z = axis
  up = jnp.where(jnp.abs(z[2]) < 0.9,
                 jnp.asarray([0.0, 0.0, 1.0], dtype),
                 jnp.asarray([1.0, 0.0, 0.0], dtype))
  x = jnp.cross(up, z)
  x = x / jnp.maximum(jnp.linalg.norm(x), 1e-12)
  y = jnp.cross(z, x)
  return jnp.stack([x, y, z], axis=1)


def ray_skin(face: np.ndarray, vert, pnt, vec):
  """Nearest skin intersection + nearest vertex id (``mju_raySkin``
  analog, ref ``engine_ray.c:1026``): a masked-min triangle sweep over
  the skin mesh.  ``face`` is (nface, 3) static topology; ``vert`` is the
  (nvert, 3) posed skin vertices (runtime)."""
  vert = jnp.asarray(vert)
  pnt = jnp.asarray(pnt, vert.dtype)
  vec = jnp.asarray(vec, vert.dtype)
  tris = vert[np.asarray(face)]
  dt = _ray_tris(tris, pnt, vec)
  best = jnp.argmin(dt)
  hit = jnp.isfinite(dt[best])
  hit_pt = pnt + vec * dt[best]
  corners = tris[best]
  near = jnp.asarray(np.asarray(face))[best][
      jnp.argmin(jnp.linalg.norm(corners - hit_pt[None], axis=1))]
  return (jnp.where(hit, dt[best], -1.0),
          jnp.where(hit, near, -1).astype(jnp.int32))
