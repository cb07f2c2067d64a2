"""Host-side mesh -> voxel SDF (the SdfLib octree analog).

The reference's ``mujoco.sdf.sdflib`` plugin (``plugin/sdf/sdflib.cc``)
wraps the SdfLib library: an octree signed-distance field built from a
triangle mesh at plugin-init time, queried by the SDF collider.  The
TPU-native equivalent is a dense voxel grid built once on the host with
numpy (load-time, like the octree build) and sampled on device by
trilinear interpolation — a gather + lerp kernel that vmaps cleanly,
where an octree traversal would be branch soup.

Outside the grid box the distance is composed exactly like the C
plugin's ``boxProjection`` (sdflib.cc:34): the query point projects into
the box and the Euclidean excess adds to the boundary sample.

Sign convention: negative inside.  The sign field comes from a voxel
flood fill from the grid corner (robust for watertight meshes at grid
resolution); voxels within a surface shell get their sign from the
nearest triangle's outward normal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class SdfGrid(NamedTuple):
  """A dense signed-distance voxel grid (host-built, device-sampled)."""
  values: np.ndarray   # (nx, ny, nz) signed distances at voxel centers
  lo: np.ndarray       # (3,) world position of voxel (0,0,0) center
  spacing: np.ndarray  # (3,) voxel pitch
  # box used by the outside-projection composition (center, halfsize)
  box_center: np.ndarray
  box_half: np.ndarray


def _point_tri_dist(p, a, b, c):
  """Distance + closest point from points (n,3) to one triangle."""
  ab, ac, ap = b - a, c - a, p - a
  d1 = ap @ ab
  d2 = ap @ ac
  bp = p - b
  d3 = bp @ ab
  d4 = bp @ ac
  cp = p - c
  d5 = cp @ ab
  d6 = cp @ ac
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2
  denom = np.maximum(va + vb + vc, 1e-30)
  v = np.clip(vb / denom, 0.0, 1.0)
  w = np.clip(vc / denom, 0.0, 1.0)
  # keep the face candidate INSIDE the triangle (v+w <= 1): a plane
  # point beyond edge bc would under-report the distance; the true
  # closest for those regions is the bc edge candidate below
  s = np.maximum(v + w, 1.0)
  v, w = v / s, w / s
  q = a + v[:, None] * ab + w[:, None] * ac          # face region
  # edge/vertex regions
  t_ab = np.clip(d1 / np.maximum(ab @ ab, 1e-30), 0, 1)
  t_ac = np.clip(d2 / np.maximum(ac @ ac, 1e-30), 0, 1)
  bc = c - b
  t_bc = np.clip(bp @ bc / np.maximum(bc @ bc, 1e-30), 0, 1)
  cands = np.stack([
      q,
      a + t_ab[:, None] * ab,
      a + t_ac[:, None] * ac,
      b + t_bc[:, None] * bc,
  ])                                                  # (4, n, 3)
  d2s = np.sum((cands - p[None]) ** 2, axis=2)
  k = np.argmin(d2s, axis=0)
  best = cands[k, np.arange(len(p))]
  return np.sqrt(d2s[k, np.arange(len(p))]), best


def mesh_sdf_grid(verts: np.ndarray, faces: np.ndarray, res: int = 48,
                  margin_frac: float = 0.12) -> SdfGrid:
  """Builds the signed voxel grid of a triangle mesh (host, numpy)."""
  from scipy.spatial import cKDTree

  verts = np.asarray(verts, np.float64).reshape(-1, 3)
  faces = np.asarray(faces, np.int64).reshape(-1, 3)
  lo0, hi0 = verts.min(0), verts.max(0)
  pad = margin_frac * float((hi0 - lo0).max())
  lo, hi = lo0 - pad, hi0 + pad
  shape = np.full(3, int(res))
  spacing = (hi - lo) / (shape - 1)
  xs = [lo[i] + spacing[i] * np.arange(shape[i]) for i in range(3)]
  gx, gy, gz = np.meshgrid(*xs, indexing="ij")
  pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

  # nearest-face candidates from a centroid KD-tree (octree-build analog)
  tri = verts[faces]                                  # (F, 3, 3)
  centroids = tri.mean(axis=1)
  tree = cKDTree(centroids)
  tri_rad = np.linalg.norm(tri - centroids[:, None], axis=2).max(axis=1)
  kq = min(16, len(faces))
  _, cand = tree.query(pts, k=kq, workers=-1)
  cand = np.atleast_2d(cand.reshape(len(pts), -1))

  dist = np.full(len(pts), np.inf)
  closest = np.zeros((len(pts), 3))
  closest_face = np.zeros(len(pts), np.int64)
  # evaluate candidate faces grouped by face id (vectorized per face)
  order = np.argsort(cand, axis=None)
  flat_faces = cand.ravel()[order]
  flat_pts = np.repeat(np.arange(len(pts)), kq)[order]
  bounds = np.searchsorted(flat_faces,
                           np.arange(len(faces) + 1))
  for fidx in np.unique(flat_faces):
    sl = slice(bounds[fidx], bounds[fidx + 1])
    pid = flat_pts[sl]
    dd, qq = _point_tri_dist(pts[pid], tri[fidx, 0], tri[fidx, 1],
                             tri[fidx, 2])
    better = dd < dist[pid]
    upd = pid[better]
    dist[upd] = dd[better]
    closest[upd] = qq[better]
    closest_face[upd] = fidx

  # sign: flood fill from the corner through non-shell voxels; shell
  # voxels (within a voxel diagonal of the surface) sign by the nearest
  # face's outward normal
  from scipy import ndimage

  diag = float(np.linalg.norm(spacing))
  shell = (dist < diag).reshape(shape)
  outside_seed = np.zeros(tuple(shape), bool)
  outside_seed[0, 0, 0] = True
  outside = ndimage.binary_propagation(outside_seed, mask=~shell)
  inside = (~outside & ~shell).reshape(-1)

  fnrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
  fnrm /= np.maximum(np.linalg.norm(fnrm, axis=1, keepdims=True), 1e-30)
  shell_flat = shell.reshape(-1)
  side = np.einsum("nc,nc->n", pts - closest, fnrm[closest_face])
  sign = np.where(shell_flat, np.where(side < 0, -1.0, 1.0),
                  np.where(inside, -1.0, 1.0))

  values = (sign * dist).reshape(tuple(shape))
  return SdfGrid(
      values=values.astype(np.float64),
      lo=lo, spacing=spacing,
      box_center=0.5 * (lo + hi), box_half=0.5 * (hi - lo),
  )


def sample_grid(grid_values, lo, spacing, box_center, box_half, x):
  """Trilinear SDF sample at local point ``x`` (traceable, device).

  Outside the grid box: the point projects into the box and the
  Euclidean excess adds to the boundary sample — the C plugin's
  ``boxProjection`` composition (sdflib.cc:34,121)."""
  r = x - box_center
  q = jnp.abs(r) - box_half
  excess = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2) + 1e-30)
  excess = jnp.where(jnp.all(q <= 0), 0.0, excess)
  xin = box_center + jnp.clip(r, -box_half, box_half)

  u = (xin - lo) / spacing
  i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                jnp.asarray(grid_values.shape) - 2)
  f = u - i0
  ix, iy, iz = i0[0], i0[1], i0[2]

  def v(dx, dy, dz):
    return grid_values[ix + dx, iy + dy, iz + dz]

  c00 = v(0, 0, 0) * (1 - f[0]) + v(1, 0, 0) * f[0]
  c10 = v(0, 1, 0) * (1 - f[0]) + v(1, 1, 0) * f[0]
  c01 = v(0, 0, 1) * (1 - f[0]) + v(1, 0, 1) * f[0]
  c11 = v(0, 1, 1) * (1 - f[0]) + v(1, 1, 1) * f[0]
  c0 = c00 * (1 - f[1]) + c10 * f[1]
  c1 = c01 * (1 - f[1]) + c11 * f[1]
  return c0 * (1 - f[2]) + c1 * f[2] + excess
