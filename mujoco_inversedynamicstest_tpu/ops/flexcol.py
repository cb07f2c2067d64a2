"""Flex element-level collision: external narrowphase + internal contacts.

Capability analog of the reference's flex collision driver
(``src/engine/engine_collision_driver.c``):

* **external geom:element narrowphase** (``mj_collideGeomElem``:412/2100+)
  — every rigid partner class collides against the flex *elements*
  (rounded capsule segments for dim-1, rounded triangles for dim-2,
  rounded tets for dim-3) instead of the vertex-sphere approximation:
  sphere/capsule via exact rounded-simplex closest points, boxes via
  thin-shell/volumetric SAT manifolds, mesh hulls and smooth partners
  (cylinder/ellipsoid) via support direction descent (``ops/ccd.py``)
  with the ``mjc_fixNormal`` smooth-surface normal restoration.
  Plane:flex stays vertex-based — that IS the reference's behavior
  (``mj_collidePlaneFlex``:405; for trilinear flexes, which carry no
  vertex geoms, the same contacts run at runtime vertex positions).
* **self-collision** (``mj_collideElems``:469): static non-adjacent
  element-pair candidates, runtime top-k bounding budget (the
  static-shape analog of the SAP/BVH midphase), element-element
  support-descent narrowphase with margin 0.
* **internal contacts** (``mj_collideFlexInternal``:1726): the compiler's
  predefined element-vertex pairs (``flex_evpair``) collide each vertex
  sphere against its non-adjacent element, and dim-3 flexes add the
  within-tet face-vertex anti-collapse contacts (``planeVertex``:1694,
  condim 1, activation depth 2*radius).  Both are static pair lists —
  ideal for the static-shape engine — so default-MJCF flex models
  (``internal="true"``) now load and simulate.

Element-side contact Jacobians distribute over the element's vertex
bodies with L2-normalized inverse-distance weights, exactly the
reference's ``mj_elemBodyWeight`` (``engine_core_constraint.c:171-205``);
the weights ride in ``Contact.bary_body``/``bary_w`` and are consumed by
``constraint._contact_rows`` and the diag approximation
(``mj_diagApprox`` flex branch, ``:1240+``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    GeomType,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math

_BIG = 1e10

# tet faces (local vertex ids) + the opposite vertex, in the reference's
# order (mj_collideFlexInternal:1761-1783)
_TET_FACES = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]], np.int32)
_TET_OPP = np.array([3, 1, 2, 0], np.int32)

# partner geom types handled at element level (others keep vertex spheres)
_ELEM_PARTNER_TYPES = (
    int(GeomType.SPHERE), int(GeomType.CAPSULE), int(GeomType.BOX),
    int(GeomType.CYLINDER), int(GeomType.ELLIPSOID), int(GeomType.MESH))
# smooth (faceless) convex partners: thin-shell support-function contact,
# dim-2 cloth only (cables/tets keep vertex spheres for these)
_SMOOTH_PARTNER_TYPES = (int(GeomType.CYLINDER), int(GeomType.ELLIPSOID))


class ElemGroup(NamedTuple):
  """A static batch of same-kind flex-element contact pairs."""
  kind: str              # 'geom_elem' | 'evpair' | 'tetface'
  flexid: int
  gtype: int             # partner geom type (geom_elem), else -1
  pair_geom: np.ndarray  # (npair,) partner geom id / global vertex id
  pair_elem: np.ndarray  # (npair,) global element id
  face: Optional[np.ndarray]  # (npair, 3) local face ids (tetface)
  condim: int
  nslot: int             # slots per pair (always 1)
  npair_run: int
  meshid: int = -1       # mesh data id (MESH partners; one group per mesh)



def bary_width(m: Model) -> int:
  """Per-side (body, weight) slots in Contact.bary_*: 4 for vertex-dof
  flexes (element corners), 8 when the model has trilinear flexes (all
  8 node bodies receive weight; ref mj_vertBodyWeight,
  engine_core_constraint.c:1061)."""
  if m.flex_interp_np is not None and np.any(m.flex_interp_np):
    return 8
  return 4


def _flexgeom_base(m: Model) -> int:
  idx = np.nonzero(np.asarray(m.geom_flexid) >= 0)[0]
  return int(idx[0]) if idx.size else -1


def vertex_geom(m: Model, vglobal) -> np.ndarray:
  """Geom id of a flex vertex's appended sphere geom."""
  return _flexgeom_base(m) + np.asarray(vglobal)


def uses_elem_narrowphase(m: Model, f: int, gtype: int) -> bool:
  """True when (partner geom type, flex) pairs collide at element level
  (and their vertex-sphere pairs must be excluded from the generic
  path)."""
  if int(gtype) in _SMOOTH_PARTNER_TYPES:
    return int(m.flex_dim[f]) == 2
  return (int(m.flex_dim[f]) >= 1 and int(gtype) in _ELEM_PARTNER_TYPES)


def build_elem_groups(m: Model) -> Tuple[ElemGroup, ...]:
  """Enumerates the static element-contact pair groups of a model."""
  if not m.nflex:
    return ()
  groups = []
  gtypes = np.asarray(m.geom_type)
  gflex = np.asarray(m.geom_flexid)
  gbody = np.asarray(m.geom_bodyid)
  contype = np.asarray(m.geom_contype)
  conaff = np.asarray(m.geom_conaffinity)
  vertbody = np.asarray(m.flex_vertbodyid)

  for f in range(m.nflex):
    dim = int(m.flex_dim[f])
    ea, en = int(m.flex_elemadr[f]), int(m.flex_elemnum[f])
    elems = np.arange(ea, ea + en, dtype=np.int32)
    elem_verts = np.asarray(m.flex_elem)[elems, :dim + 1]  # global ids
    fct, fca = int(m.flex_contype[f]), int(m.flex_conaffinity[f])

    # --- external geom:element groups ---
    if fct | fca:
      for t in _ELEM_PARTNER_TYPES:
        if dim < 1:
          continue
        if t in _SMOOTH_PARTNER_TYPES and dim != 2:
          continue
        cand = np.nonzero(
            (gtypes == t) & (gflex < 0)
            & (((contype & fca) | (np.left_shift(conaff, 0) & 0) |
                (fct & conaff)) != 0))[0]
        if not cand.size:
          continue
        # mesh partners: one group per distinct mesh (static hull verts)
        if t == int(GeomType.MESH):
          dataid = np.asarray(m.geom_dataid)[cand]
          subsets = [(int(mid), cand[dataid == mid])
                     for mid in np.unique(dataid)]
        else:
          subsets = [(-1, cand)]
        for meshid, csub in subsets:
          pg, pe = [], []
          for g in csub:
            b = int(gbody[g])
            # ref mj_collideGeomElem: skip elements sharing a body with
            # the geom (static: vertbodyid is compile-time data)
            share = np.any(vertbody[elem_verts] == b, axis=1)
            keep = elems[~share]
            pg.append(np.full(len(keep), g, np.int32))
            pe.append(keep)
          pair_geom = np.concatenate(pg) if pg else np.zeros(0, np.int32)
          if not pair_geom.size:
            continue
          pair_elem = np.concatenate(pe)
          npair_run = len(pair_geom)
          if m.max_geom_pairs > 0:
            npair_run = min(npair_run, m.max_geom_pairs)
          groups.append(ElemGroup(
              kind="geom_elem", flexid=f, gtype=t,
              pair_geom=pair_geom, pair_elem=pair_elem, face=None,
              condim=_mix_condim_flex(m, int(pair_geom[0]), f),
              nslot=(4 if t == int(GeomType.BOX)
                     else 2 if t == int(GeomType.CAPSULE) else 1),
              npair_run=npair_run,
              meshid=meshid,
          ))

    # --- plane : interp-flex vertices (mj_collidePlaneFlex analog,
    # engine_collision_driver.c:405; interp flexes carry no vertex geoms
    # so the vertex-sphere pairs live here, at runtime positions) ---
    if (m.flex_interp_np is not None and m.flex_interp_np[f]
        and (fct | fca)):
      planes = np.nonzero(
          (gtypes == int(GeomType.PLANE)) & (gflex < 0)
          & (((contype & fca) | (fct & conaff)) != 0))[0]
      if planes.size:
        va, vn = int(m.flex_vertadr[f]), int(m.flex_vertnum[f])
        verts = np.arange(va, va + vn, dtype=np.int32)
        groups.append(ElemGroup(
            kind="plane_vert", flexid=f, gtype=int(GeomType.PLANE),
            pair_geom=np.repeat(planes, vn).astype(np.int32),
            pair_elem=np.tile(verts, len(planes)).astype(np.int32),
            face=None,
            condim=_mix_condim_flex(m, int(planes[0]), f),
            nslot=1, npair_run=len(planes) * vn,
        ))

    # --- self-collision element pairs (mj_collideElems,
    # engine_collision_driver.c:469; margin forced to 0 for f1==f2) ---
    selfc = (m.flex_selfcollide_np is not None
             and int(m.flex_selfcollide_np[f]) != 0)
    if selfc and en > 1 and (fct & fca):
      vb = vertbody[np.asarray(m.flex_elem)[elems, :dim + 1]]
      se1, se2 = np.triu_indices(en, k=1)
      # skip pairs with vertices on a shared body (ref :476-485) — this
      # IS the adjacent-element exclusion for non-rigid flexes
      share = (vb[se1][:, :, None] == vb[se2][:, None, :]).any(axis=(1, 2))
      se1, se2 = se1[~share], se2[~share]
      if se1.size:
        npair_run = len(se1)
        # runtime budget: every candidate pair is ranked by bounding
        # distance each step and the nearest k narrowphased (the static
        # analog of the reference's SAP/BVH midphase — all mjFLEXSELF
        # modes are midphase variants of the same narrowphase)
        budget = (m.max_geom_pairs if m.max_geom_pairs > 0
                  else max(4 * en, 64))
        npair_run = min(npair_run, budget)
        groups.append(ElemGroup(
            kind="selfpair", flexid=f, gtype=-1,
            pair_geom=(se1 + ea).astype(np.int32),
            pair_elem=(se2 + ea).astype(np.int32), face=None,
            condim=int(m.flex_condim[f]), nslot=1, npair_run=npair_run,
        ))

    # --- internal contacts ---
    if (m.flex_internal_np is not None and m.flex_internal_np[f]
        and not m.flex_rigid[f] and (fct & fca)):
      # predefined element-vertex pairs (mj_collideFlexInternal:1730)
      eva, evn = int(m.flex_evpairadr_np[f]), int(m.flex_evpairnum_np[f])
      if evn:
        ev = np.asarray(m.flex_evpair_np)[eva:eva + evn]  # (evn, 2) local
        groups.append(ElemGroup(
            kind="evpair", flexid=f, gtype=-1,
            pair_geom=(ev[:, 1] + int(m.flex_vertadr[f])).astype(np.int32),
            pair_elem=(ev[:, 0] + ea).astype(np.int32), face=None,
            condim=int(m.flex_condim[f]), nslot=1, npair_run=evn,
        ))
      # within-tet face-vertex (dim 3 only; condim forced to 1, :1753)
      if dim == 3 and en:
        pair_elem = np.repeat(elems, 4)
        faces = np.tile(_TET_FACES, (en, 1))
        opp = np.tile(_TET_OPP, en)
        opp_global = np.asarray(m.flex_elem)[pair_elem, opp]
        groups.append(ElemGroup(
            kind="tetface", flexid=f, gtype=-1,
            pair_geom=opp_global.astype(np.int32),
            pair_elem=pair_elem.astype(np.int32), face=faces,
            condim=1, nslot=1, npair_run=len(pair_elem),
        ))
  return tuple(groups)


def _mix_condim_flex(m: Model, g: int, f: int) -> int:
  p1, p2 = int(m.geom_priority[g]), int(m.flex_priority[f])
  c1, c2 = int(m.geom_condim[g]), int(m.flex_condim[f])
  if p1 > p2:
    return c1
  if p2 > p1:
    return c2
  return max(c1, c2)


def elem_pair_params(m: Model, grp: ElemGroup):
  """(margin, includemargin, friction5, solref, solreffriction, solimp)
  per pair — the ``mj_contactParam(g, -1, -1, f)`` mixing for external
  pairs, pure flex parameters (margin/gap 0) for internal ones."""
  f = grp.flexid
  npair = len(grp.pair_geom)
  dtype = m.geom_margin.dtype

  if grp.kind not in ("geom_elem", "plane_vert"):
    fri3 = jnp.broadcast_to(m.flex_friction[f], (npair, 3))
    friction5 = fri3[:, [0, 0, 1, 2, 2]]
    solref = jnp.broadcast_to(m.flex_solref[f], (npair, 2))
    solimp = jnp.broadcast_to(m.flex_solimp[f], (npair, 5))
    zero = jnp.zeros(npair, dtype=dtype)
    return (zero, zero, friction5, solref,
            jnp.zeros((npair, 2), dtype=dtype), solimp)

  g = grp.pair_geom
  p1 = m.geom_priority[g]
  p2 = np.full(npair, int(m.flex_priority[f]))
  solmix1 = m.geom_solmix[g]
  solmix2 = jnp.broadcast_to(m.flex_solmix[f], (npair,))
  mix = jnp.where(
      (solmix1 >= math.MINVAL) & (solmix2 >= math.MINVAL),
      solmix1 / jnp.maximum(solmix1 + solmix2, math.MINVAL),
      jnp.where((solmix1 < math.MINVAL) & (solmix2 < math.MINVAL), 0.5,
                jnp.where(solmix1 < math.MINVAL, 0.0, 1.0)))
  mix = jnp.where(jnp.asarray(p1 > p2), 1.0, mix)
  mix = jnp.where(jnp.asarray(p1 < p2), 0.0, mix)
  use1 = jnp.asarray(p1 > p2)
  use2 = jnp.asarray(p1 < p2)

  sr1 = m.geom_solref[g]
  sr2 = jnp.broadcast_to(m.flex_solref[f], (npair, 2))
  both_std = (sr1[:, 0] > 0) & (sr2[:, 0] > 0)
  solref_mixed = jnp.where(
      both_std[:, None], mix[:, None] * sr1 + (1 - mix[:, None]) * sr2,
      jnp.minimum(sr1, sr2))
  solref = jnp.where(use1[:, None], sr1,
                     jnp.where(use2[:, None], sr2, solref_mixed))

  si1 = m.geom_solimp[g]
  si2 = jnp.broadcast_to(m.flex_solimp[f], (npair, 5))
  solimp = jnp.where(
      use1[:, None], si1,
      jnp.where(use2[:, None], si2,
                mix[:, None] * si1 + (1 - mix[:, None]) * si2))

  f1 = m.geom_friction[g]
  f2 = jnp.broadcast_to(m.flex_friction[f], (npair, 3))
  fri3 = jnp.where(use1[:, None], f1,
                   jnp.where(use2[:, None], f2, jnp.maximum(f1, f2)))
  friction5 = fri3[:, [0, 0, 1, 2, 2]]

  gap = jnp.maximum(m.geom_gap[g], m.flex_gap[f])
  margin = jnp.maximum(m.geom_margin[g], m.flex_margin[f])
  return (margin, margin - gap, friction5, solref,
          jnp.zeros((npair, 2), dtype=dtype), solimp)


# ---------------------------------------------------------------------------
# geometry kernels (world frame)
# ---------------------------------------------------------------------------


def _closest_pt_tri(p, a, b, c):
  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc

  return cc._closest_pt_tri(p, a, b, c)


def _sphere_simplex(m, S, rs, verts, rt, dim):
  """Closest point on a (rounded) simplex to a sphere center.

  Returns (dist, pos, nrm) with the reference's conventions
  (``mjraw_SphereTriangle``:538: unsigned closest-point distance, normal
  sphere -> element, pos on the segment between the surfaces)."""
  if dim == 1:
    a, b = verts[0], verts[1]
    ab = b - a
    t = jnp.clip(jnp.dot(S - a, ab)
                 / jnp.maximum(jnp.dot(ab, ab), math.MINVAL), 0.0, 1.0)
    X = a + t * ab
  elif dim == 2:
    X = _closest_pt_tri(S, verts[0], verts[1], verts[2])
  else:
    # tetrahedron: nearest of the four face triangles; inside -> nearest
    # face plane (outward) — the CCD-free rounded-tet analog
    cands = []
    for face in _TET_FACES:
      cands.append(_closest_pt_tri(S, verts[face[0]], verts[face[1]],
                                   verts[face[2]]))
    Xs = jnp.stack(cands)
    dists = jnp.linalg.norm(Xs - S[None], axis=1)
    k = jnp.argmin(dists)
    X = Xs[k]
    # inside test: S on the inner side of all faces
    centroid = jnp.mean(verts, axis=0)
    inside = jnp.asarray(True)
    for face in _TET_FACES:
      n = jnp.cross(verts[face[1]] - verts[face[0]],
                    verts[face[2]] - verts[face[0]])
      n = n * jnp.sign(jnp.dot(n, verts[face[0]] - centroid))  # outward
      inside = inside & (jnp.dot(S - verts[face[0]], n) <= 0)
    u = X - S
    lu = jnp.maximum(jnp.linalg.norm(u), math.MINVAL)
    nrm = jnp.where(inside, -u / lu, u / lu)
    dist = jnp.where(inside, -lu, lu) - rs - rt
    pos = S + nrm * (rs + dist * 0.5)
    return dist, pos, nrm

  u = X - S
  lu = jnp.maximum(jnp.linalg.norm(u), math.MINVAL)
  nrm = u / lu
  dist = lu - rs - rt
  pos = S + nrm * (rs + dist * 0.5)
  return dist, pos, nrm


def _capsule_simplex(m, p, axis, hl, rc, verts, rt, dim):
  """Capsule (segment + rc) vs rounded element: exact segment-simplex
  closest points (the ``mjc_ConvexElem`` cases, CCD-free).

  Emits TWO contact slots: a capsule lying along an element needs a
  couple to rest stably, and the reference's multi-point CCD produces
  exactly such pairs.  Candidates: both endpoints vs the simplex + the
  segment vs every simplex edge; the two deepest *distinct* candidates
  win (the duplicate-suppressed analog of the reference's manifold)."""
  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc

  e1 = p + axis * hl
  e2 = p - axis * hl
  if dim == 1:
    a, b = verts[0], verts[1]
    c1, c2 = cc._closest_seg_seg(e1, e2 - e1, a, b - a)
    qa = a + jnp.clip(
        jnp.dot(e1 - a, b - a)
        / jnp.maximum(jnp.dot(b - a, b - a), math.MINVAL), 0.0, 1.0
    ) * (b - a)
    qb = a + jnp.clip(
        jnp.dot(e2 - a, b - a)
        / jnp.maximum(jnp.dot(b - a, b - a), math.MINVAL), 0.0, 1.0
    ) * (b - a)
    cands = [(c1, c2), (e1, qa), (e2, qb)]
  else:
    qa = _closest_pt_tri(e1, verts[0], verts[1], verts[2])
    qb = _closest_pt_tri(e2, verts[0], verts[1], verts[2])
    cands = [(e1, qa), (e2, qb)]
    for i in range(3):
      pe, qe = verts[i], verts[(i + 1) % 3]
      c1, c2 = cc._closest_seg_seg(e1, e2 - e1, pe, qe - pe)
      cands.append((c1, c2))
  ps = jnp.stack([c[0] for c in cands])
  qs = jnp.stack([c[1] for c in cands])
  lus = jnp.maximum(jnp.linalg.norm(qs - ps, axis=1), math.MINVAL)
  nrms = (qs - ps) / lus[:, None]
  dists = lus - rc - rt
  poss = ps + nrms * (rc + dists[:, None] * 0.5)

  k1 = jnp.argmin(dists)
  # second slot: deepest candidate spatially distinct from the first
  sep = jnp.linalg.norm(poss - poss[k1][None], axis=1)
  distinct = sep > jnp.maximum(0.1 * (rc + rt), 1e-9)
  masked = jnp.where(distinct, dists, _BIG)
  k2 = jnp.argmin(masked)
  d2 = masked[k2]
  return (jnp.stack([dists[k1], d2]),
          jnp.stack([poss[k1], poss[k2]]),
          jnp.stack([nrms[k1], nrms[k2]]))


# static topology of the element hulls (triangle = two-sided flat hull)
_TRI_FACES = np.array([[0, 1, 2], [0, 2, 1]], np.int64)
_TRI_EDGES = np.array([[0, 1], [1, 2], [0, 2]], np.int64)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int64)
# for each tet edge, the two entries of _TET_FACES containing both verts
_TET_EDGE_FACES = np.array([
    [f for f in range(4) if set(e) <= set(_TET_FACES[f])]
    for e in _TET_EDGES], np.int64)


def _simplex_spec(nv, faces, edges):
  from mujoco_inversedynamicstest_tpu.ops.hull import HullSpec

  return HullSpec(
      vert=np.zeros((nv, 3)), face=faces,
      face_nvert=np.full(len(faces), 3, np.int64),
      face_normal=np.zeros((len(faces), 3)), tri=faces, edge=edges,
      edge_face_normal=np.zeros((len(edges), 2, 3)))


_TRI_SPEC = _simplex_spec(3, _TRI_FACES, _TRI_EDGES)
_TET_SPEC = _simplex_spec(4, np.asarray(_TET_FACES, np.int64), _TET_EDGES)


def _simplex_hull(verts, dim):
  """WorldHull of a flex element with *runtime* vertex positions.

  ``hull_world`` poses a static local hull; flex vertices move freely,
  so face normals / edge frames are computed from the world vertices
  directly.  A triangle is a flat two-sided hull whose edge Gauss arcs
  are degenerate (antipodal adjacent normals) — edge-edge SAT axes are
  therefore pruned for dim-2 elements and contacts are face-generated,
  which matches the face-biased local solutions the reference's MPR
  (``mjc_ConvexElem``) returns for cloth-like elements."""
  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc

  if dim == 2:
    n = math.normalize(jnp.cross(verts[1] - verts[0], verts[2] - verts[0]))
    face_normal = jnp.stack([n, -n])
    spec, edge = _TRI_SPEC, _TRI_EDGES
    efn1 = jnp.broadcast_to(n, (3, 3))
    efn2 = jnp.broadcast_to(-n, (3, 3))
  else:
    centroid = jnp.mean(verts, axis=0)
    ns = []
    for face in _TET_FACES:
      nf = math.normalize(jnp.cross(verts[face[1]] - verts[face[0]],
                                    verts[face[2]] - verts[face[0]]))
      s = jnp.sign(jnp.dot(nf, verts[face[0]] - centroid))
      ns.append(nf * jnp.where(s == 0, 1.0, s))
    face_normal = jnp.stack(ns)
    spec, edge = _TET_SPEC, _TET_EDGES
    efn1 = face_normal[_TET_EDGE_FACES[:, 0]]
    efn2 = face_normal[_TET_EDGE_FACES[:, 1]]
  e0, e1 = edge[:, 0], edge[:, 1]
  return cc.WorldHull(
      spec=spec, vert=verts, face_normal=face_normal,
      edge_dir=verts[e1] - verts[e0], edge_p0=verts[e0],
      edge_fn1=efn1, edge_fn2=efn2, center=jnp.mean(verts, axis=0))


def _box_simplex(m, p, mat, size, verts, rt, dim, band):
  """Box vs rounded element: thin-shell SAT (dim 2), volumetric SAT
  (dim 3), SDF descent (dim 1).

  dim 2 — the case that needs care.  A cloth triangle is a *two-sided
  thin shell*: its contact surfaces are the midplane offset by ±rt, and
  a box face that crosses the midplane by more than rt tunnels through
  (force-free), exactly like the reference's GJK/EPA on the sphere-swept
  triangle, whose minimum exit flips to the far surface past the
  midplane.  Verified against the C engine on a box resting in a cloth
  hammock: C's depths equal ``|max face separation| - rt`` and its
  contact normals equal the max-separation *element* face normal (or
  the negated box face normal when a box face wins) — NOT the global
  MTV of raw hulls, which over-reports depth ~15x there (tri planes
  extrapolate through the box corner) and rests the box ~2 cm high.
  Manifold: the winning face's polygon-intersection candidates, scored
  two-sided (``score_fn=|d|-rt``) so tunneled candidates don't crowd
  out load-bearing ones.

  dim 3: tets are volumetric; the standard box-box SAT manifold
  (``hulls_sat_manifold``) applies, widened by rt.

  dim 1 (cables): a segment cannot slice a face; cheap barycentric SDF
  descent (closest/deepest point), single slot padded to 4.

  Returns (dist, pos, nrm) of shape (4,), (4,3), (4,3); empty slots
  carry dist=+BIG."""
  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc
  from mujoco_inversedynamicstest_tpu.ops.collision_sdf import sdf_box

  if dim == 2:
    ha = cc.hull_world(cc.BOX_HULL, p, mat, size)
    hb = _simplex_hull(verts, 2)
    sep_fa = cc._face_separations(ha, hb.vert)            # (6,)
    sep_fb = cc._face_separations(hb, ha.vert)            # (2,)
    best_fa = jnp.argmax(sep_fa)
    best_fb = jnp.argmax(sep_fb)
    use_a = sep_fa[best_fa] >= sep_fb[best_fb]

    n_a = ha.face_normal[best_fa]
    n_b = hb.face_normal[best_fb]
    two_sided = lambda dd: jnp.abs(dd) - rt
    inc_b = jnp.argmin(hb.face_normal @ n_a)
    d_af, p_af = cc._face_face_manifold(
        ha, best_fa, hb, inc_b, band + rt, 4, score_fn=two_sided)
    inc_a = jnp.argmin(ha.face_normal @ n_b)
    d_bf, p_bf = cc._face_face_manifold(
        hb, best_fb, ha, inc_a, band + rt, 4, score_fn=two_sided)

    d_raw = jnp.where(use_a, d_af, d_bf)
    pos = jnp.where(use_a, p_af, p_bf)
    # contact normal (empirically matched to the C engine's GJK witness
    # frames on the hammock scene, incl. the rest height to 2 mm):
    # the winning element face normal on a tri win, the negated box face
    # normal on a box-face win — continuous at ties
    nrm = jnp.where(use_a, -n_a, n_b)
    valid = d_raw < _BIG / 2
    dist = jnp.where(valid, two_sided(d_raw), d_raw)
    nrm = jnp.tile(nrm[None], (4, 1))
    return dist, pos, nrm

  if dim == 3:
    ha = cc.hull_world(cc.BOX_HULL, p, mat, size)
    hb = _simplex_hull(verts, 3)
    dist, pos, nrm, _ = cc.hulls_sat_manifold(ha, hb, band + rt)
    valid = dist < _BIG / 2
    dist = jnp.where(valid, dist - rt, dist)
    pos = jnp.where(valid[:, None], pos - nrm * (rt * 0.5), pos)
    return dist, pos, nrm

  # dim 1: minimize the box SDF over the segment (barycentric descent)
  nv = dim + 1
  vl = (verts - p) @ mat                  # simplex in box frame (nv, 3)
  phi = lambda w: sdf_box(w @ vl, size)
  eye = jnp.eye(nv, dtype=verts.dtype)
  w0s = jnp.concatenate(
      [eye, jnp.full((1, nv), 1.0 / nv, verts.dtype)], axis=0)
  alphas = jnp.geomspace(1e-3, 1.0, 8).astype(verts.dtype)

  def descend(w):
    for _ in range(8):
      g = jax.grad(phi)(w)
      g = g - jnp.mean(g)               # tangent to the sum(w)=1 plane
      cands = jnp.maximum(w[None] - alphas[:, None] * g[None], 0.0)
      cands = cands / jnp.maximum(
          cands.sum(-1, keepdims=True), math.MINVAL)
      vals = jax.vmap(phi)(cands)
      k = jnp.argmin(vals)
      w = jnp.where(vals[k] < phi(w), cands[k], w)
    return w

  ws = jax.vmap(descend)(w0s)
  vals = jax.vmap(phi)(ws)
  w = ws[jnp.argmin(vals)]
  x = w @ vl
  draw = sdf_box(x, size)
  nl = math.normalize(jax.grad(sdf_box)(x, size))
  nrm1 = mat @ nl                         # world, box -> element
  dist1 = draw - rt
  xw = mat @ x + p
  pos1 = xw - nrm1 * draw + nrm1 * (dist1 * 0.5)
  pad = jnp.full(3, _BIG, dist1.dtype)
  dist = jnp.concatenate([dist1[None], pad])
  pos = jnp.concatenate([pos1[None], jnp.zeros((3, 3), pos1.dtype)])
  nrm = jnp.concatenate([nrm1[None], jnp.zeros((3, 3), nrm1.dtype)])
  return dist, pos, nrm


# support-function machinery shared with the geom-geom CCD narrowphase
from mujoco_inversedynamicstest_tpu.ops.ccd import (  # noqa: E402
    fix_normal_smooth,
    geom_support_fn,
    support_descent,
)


def _smooth_simplex_thin(m, p, mat, size, verts, rt, gtype):
  """Smooth convex partner (cylinder/ellipsoid) vs dim-2 rounded
  triangle via support direction descent (``support_descent``).

  The shell is the closed convex set ``triangle + B(rt)``; the descent
  recovers exactly what the reference's GJK/EPA reports for these pairs
  (``mjc_ConvexElem``, engine_collision_convex.c:1621): face contacts
  when the partner rests on the sheet, *lateral* exits when the cloth
  pockets around the partner (verified against C on the resting
  cylinder: C's normals there are horizontal), and force-free tunneling
  once the partner crosses the midplane by more than rt (the minimal
  exit flips to the far surface).  Single slot; normal geom->element."""
  supp = geom_support_fn(gtype, p, mat, size)
  n0 = math.normalize(jnp.cross(verts[1] - verts[0], verts[2] - verts[0]))
  centroid = jnp.mean(verts, axis=0)
  dc = math.normalize(centroid - p)
  seeds = jnp.stack([
      n0, -n0, dc,
      math.normalize(dc + 0.5 * n0), math.normalize(dc - 0.5 * n0),
  ])

  def supp_tri(u):
    # mul+sum, not @: vmapped dots hit the MXU at bf16 (see ops/ccd._dot)
    return verts[jnp.argmax(jnp.sum(verts * u, axis=-1))]

  dist, nrm, wa = support_descent(supp, supp_tri, seeds, pad=rt)
  q = _closest_pt_tri(wa, verts[0], verts[1], verts[2])
  pos = 0.5 * (wa + q - rt * nrm)
  # snap to the partner's analytic surface normal at pos (mjc_fixNormal)
  nrm = fix_normal_smooth(gtype, p, mat, size, pos, nrm)
  return dist, pos, nrm


def _closest_pt_simplex(x, verts, dim: int):
  """Closest point on a 1/2/3-simplex (segment/triangle/tet surface)."""
  if dim == 1:
    a, b = verts[0], verts[1]
    ab = b - a
    t = jnp.clip(jnp.sum((x - a) * ab)
                 / jnp.maximum(jnp.sum(ab * ab), math.MINVAL), 0.0, 1.0)
    return a + t * ab
  if dim == 2:
    return _closest_pt_tri(x, verts[0], verts[1], verts[2])
  cands = [
      _closest_pt_tri(x, verts[f[0]], verts[f[1]], verts[f[2]])
      for f in _TET_FACES
  ]
  xs = jnp.stack(cands)
  return xs[jnp.argmin(jnp.linalg.norm(xs - x[None], axis=1))]


def _mesh_simplex(m, p, mat, vlocal, verts, rt, dim):
  """Mesh hull vs rounded flex element via support direction descent.

  The reference collides mesh geoms against elements through CCD
  (``mj_collideGeomElem`` -> ``mjc_ConvexElem``,
  engine_collision_driver.c:412); here the mesh's convex-hull support
  (one masked matvec over its padded vertex cloud) pairs with the
  element-simplex support in ``ccd.support_descent``.  Closes the last
  rigid-partner vertex-sphere fallback.  Single slot; normal
  geom -> element (native-CCD witness convention)."""
  from mujoco_inversedynamicstest_tpu.ops import ccd

  wv = p + jnp.einsum('vj,ij->vi', vlocal, mat,
                      precision=jax.lax.Precision.HIGHEST)
  supp_m = ccd.hull_support_fn(wv)

  def supp_e(u):
    return verts[jnp.argmax(jnp.sum(verts * u, axis=-1))]

  centroid = jnp.mean(verts, axis=0)
  dc = math.normalize(centroid - p)
  seeds = [dc]
  if dim == 2:
    n0 = math.normalize(jnp.cross(verts[1] - verts[0],
                                  verts[2] - verts[0]))
    seeds += [n0, -n0, math.normalize(dc + 0.5 * n0),
              math.normalize(dc - 0.5 * n0)]
  elif dim == 3:
    for face in _TET_FACES:
      nf = math.normalize(jnp.cross(verts[face[1]] - verts[face[0]],
                                    verts[face[2]] - verts[face[0]]))
      s = jnp.sign(jnp.sum(nf * (verts[face[0]] - centroid)))
      # inward (partner -> element) face normal seed
      seeds.append(-nf * jnp.where(s == 0, 1.0, s))
  else:
    a = math.normalize(verts[1] - verts[0])
    perp = dc - jnp.sum(dc * a) * a
    pn = jnp.linalg.norm(perp)
    seeds.append(jnp.where(pn > 1e-9,
                           perp / jnp.maximum(pn, math.MINVAL), dc))

  dist, u, wa = ccd.support_descent(supp_m, supp_e, jnp.stack(seeds),
                                    pad=rt)
  q = _closest_pt_simplex(wa, verts, dim)
  pos = 0.5 * (wa + q - rt * u)
  return dist, pos, u


def _elem_elem(v1, v2, rt, dim):
  """Rounded element vs rounded element of the same flex (self-collision
  narrowphase; ref ``mj_collideElems`` -> ``mjraw_CapsuleCapsule`` for
  cables, ``mjc_ConvexElem`` CCD otherwise).  Single slot; normal
  elem1 -> elem2."""
  from mujoco_inversedynamicstest_tpu.ops import ccd
  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc

  if dim == 1:
    c1, c2 = cc._closest_seg_seg(v1[0], v1[1] - v1[0], v2[0], v2[1] - v2[0])
    delta = c2 - c1
    lu = jnp.maximum(jnp.linalg.norm(delta), math.MINVAL)
    u = delta / lu
    return lu - 2.0 * rt, 0.5 * (c1 + c2), u

  def supp1(u):
    return v1[jnp.argmax(jnp.sum(v1 * u, axis=-1))]

  def supp2(u):
    return v2[jnp.argmax(jnp.sum(v2 * u, axis=-1))]

  c1 = jnp.mean(v1, axis=0)
  c2 = jnp.mean(v2, axis=0)
  dc = math.normalize(c2 - c1)
  seeds = [dc]
  if dim == 2:
    ssign = lambda x: jnp.where(x >= 0, 1.0, -1.0)  # never 0 (valid seed)
    n1 = math.normalize(jnp.cross(v1[1] - v1[0], v1[2] - v1[0]))
    n2 = math.normalize(jnp.cross(v2[1] - v2[0], v2[2] - v2[0]))
    seeds += [n1 * ssign(jnp.sum(n1 * dc)),
              n2 * ssign(jnp.sum(n2 * dc)),
              -n1 * ssign(jnp.sum(n1 * dc))]
  else:
    for face in _TET_FACES:
      nf = math.normalize(jnp.cross(v1[face[1]] - v1[face[0]],
                                    v1[face[2]] - v1[face[0]]))
      s = jnp.sign(jnp.sum(nf * (v1[face[0]] - c1)))
      seeds.append(nf * jnp.where(s == 0, 1.0, s))
  dist, u, wa = ccd.support_descent(supp1, supp2, jnp.stack(seeds),
                                    pad=2.0 * rt)
  q = _closest_pt_simplex(wa, v2, dim)
  pos = 0.5 * (wa + q)
  return dist, pos, u


def _bary_weights(pos, verts, nvert: int, exclude_local: int = -1):
  """Normalized inverse-distance element weights at the contact point
  (``mj_elemBodyWeight``, engine_core_constraint.c:171-205).

  Weights sum to 1 (partition of unity) — the installed oracle's
  behavior, verified numerically against its diag approximation; the
  3.3.1 source's ``mju_normalize`` call reads as L2 but the shipped
  engine's contact D matches the L1 normalization exactly."""
  w = []
  for i in range(nvert):
    if i == exclude_local:
      continue
    dist = jnp.linalg.norm(pos - verts[i])
    w.append(1.0 / jnp.maximum(math.MINVAL, dist))
  w = jnp.stack(w)
  w = w / jnp.maximum(jnp.sum(w), math.MINVAL)
  return w  # (nvert - excluded,)


def run_elem_group(m: Model, d: Data, grp: ElemGroup):
  """Narrowphases one element group.

  Returns (dist, pos, nrm, geom1, geom2, bary_body, bary_w, sel) with
  leading dim ``npair_run`` (one slot per pair): bary_* are (n, 2, 4);
  ``sel`` are the selected pair indices (for gathering pair params)."""
  f = grp.flexid
  dim = int(m.flex_dim[f])
  dtype = d.qpos.dtype
  radius = m.flex_radius[f]

  if grp.kind == "plane_vert":
    # plane vs interp-flex vertex spheres at runtime positions
    g = grp.pair_geom                                   # plane geom ids
    v = grp.pair_elem                                   # global vert ids
    n = len(g)
    n0 = d.geom_xmat[g][:, :, 2]
    p0 = d.geom_xpos[g]
    vx = d.flexvert_xpos[v]
    dist = jnp.einsum("pc,pc->p", vx - p0, n0) - radius
    pos = vx - n0 * (radius + dist[:, None] * 0.5)
    nrm = n0                                            # plane -> flex

    bw_pv = bary_width(m)
    na, nn = int(m.flex_nodeadr_np[f]), int(m.flex_nodenum_np[f])
    w_tbl = np.asarray(m.flex_interp_w[f])
    va = int(m.flex_vertadr[f])
    node_w = jnp.asarray(w_tbl[v - va], dtype)          # (n, nn) static
    node_bodies = np.asarray(m.flex_nodebodyid_np[na:na + nn], np.int32)
    bary_body = jnp.zeros((n, 2, bw_pv), jnp.int32)
    bary_w = jnp.zeros((n, 2, bw_pv), dtype)
    bary_body = bary_body.at[:, 0, 0].set(
        jnp.asarray(np.asarray(m.geom_bodyid)[g], jnp.int32))
    bary_w = bary_w.at[:, 0, 0].set(1.0)
    bary_body = bary_body.at[:, 1, :nn].set(
        jnp.broadcast_to(jnp.asarray(node_bodies), (n, nn)))
    bary_w = bary_w.at[:, 1, :nn].set(node_w)
    return (dist, pos, nrm, jnp.asarray(g, jnp.int32),
            jnp.full(n, -1, jnp.int32), bary_body, bary_w,
            jnp.arange(n))

  elem_verts_np = np.asarray(m.flex_elem)[grp.pair_elem, :dim + 1]
  vertbody = np.asarray(m.flex_vertbodyid)
  vgeom_base = _flexgeom_base(m)

  pair_geom = grp.pair_geom
  pair_elem_verts = elem_verts_np
  npair_run = grp.npair_run
  bw_ = bary_width(m)

  if grp.kind == "geom_elem":
    gpos_all = d.geom_xpos[pair_geom]
    everts_all = d.flexvert_xpos[pair_elem_verts]      # (np, dim+1, 3)
    if npair_run < len(pair_geom):
      centroid = jnp.mean(everts_all, axis=1)
      erad = jnp.max(jnp.linalg.norm(everts_all - centroid[:, None],
                                     axis=2), axis=1) + radius
      bdist = (jnp.linalg.norm(gpos_all - centroid, axis=1)
               - m.geom_rbound[pair_geom] - erad)
      _, sel = jax.lax.top_k(-bdist, npair_run)
      sel_np = None
    else:
      sel = jnp.arange(len(pair_geom))
      sel_np = np.arange(len(pair_geom))

    g = jnp.asarray(pair_geom)[sel]
    everts = everts_all[sel]
    gpos = d.geom_xpos[g]
    gmat = d.geom_xmat[g]
    gsize = jnp.asarray(m.geom_size)[g]
    ev_ids = jnp.asarray(pair_elem_verts)[sel]         # (n, dim+1)

    if grp.gtype == int(GeomType.SPHERE):
      fn = lambda gp, gm, gs, ev: _sphere_simplex(
          m, gp, gs[0], ev, radius, dim)
      dist, pos, nrm = jax.vmap(fn)(gpos, gmat, gsize, everts)
      nslot = 1
    elif grp.gtype == int(GeomType.BOX):
      band = float(max(np.asarray(m.geom_margin)[grp.pair_geom].max(),
                       float(np.asarray(m.flex_margin)[f])))
      fn = lambda gp, gm, gs, ev: _box_simplex(
          m, gp, gm, gs, ev, radius, dim, band)
      dist, pos, nrm = jax.vmap(fn)(gpos, gmat, gsize, everts)
      nslot = 4
    elif grp.gtype in _SMOOTH_PARTNER_TYPES:
      fn = lambda gp, gm, gs, ev: _smooth_simplex_thin(
          m, gp, gm, gs, ev, radius, grp.gtype)
      dist, pos, nrm = jax.vmap(fn)(gpos, gmat, gsize, everts)
      nslot = 1
    elif grp.gtype == int(GeomType.MESH):
      vlocal = jnp.asarray(m.mesh_hull[grp.meshid].vert, dtype)
      fn = lambda gp, gm, gs, ev: _mesh_simplex(
          m, gp, gm, vlocal, ev, radius, dim)
      dist, pos, nrm = jax.vmap(fn)(gpos, gmat, gsize, everts)
      nslot = 1
    else:  # CAPSULE: 2 slots per pair (see _capsule_simplex)
      fn = lambda gp, gm, gs, ev: _capsule_simplex(
          m, gp, gm[:, 2], gs[1], gs[0], ev, radius, dim)
      dist, pos, nrm = jax.vmap(fn)(gpos, gmat, gsize, everts)
      nslot = 2
    assert nslot == grp.nslot

    # flatten (n, nslot, ...) -> (n*nslot, ...); per-slot weights at the
    # slot's own contact point
    if nslot > 1:
      dist = dist.reshape(-1)
      pos = pos.reshape(-1, 3)
      nrm = nrm.reshape(-1, 3)
      everts_s = jnp.repeat(everts, nslot, axis=0)
      ev_ids_s = jnp.repeat(ev_ids, nslot, axis=0)
      g_s = jnp.repeat(g, nslot)
      # adjacent elements sharing an edge emit the *same* closest point
      # when the capsule's nearest feature lies on that edge; suppress
      # exact duplicates (they would double the contact force)
      close = (jnp.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
               < 1e-9)
      earlier = jnp.tril(jnp.ones_like(close), k=-1)
      dup = jnp.any(close & earlier, axis=1)
      dist = jnp.where(dup, _BIG, dist)
    else:
      everts_s, ev_ids_s, g_s = everts, ev_ids, g
    ntot = npair_run * nslot

    bw_elem = jax.vmap(
        lambda p_, ev: _bary_weights(p_, ev, dim + 1))(pos, everts_s)
    nb = dim + 1
    bary_body = jnp.zeros((ntot, 2, bw_), jnp.int32)
    bary_w = jnp.zeros((ntot, 2, bw_), dtype)
    bary_body = bary_body.at[:, 0, 0].set(
        jnp.asarray(m.geom_bodyid)[g_s])
    bary_w = bary_w.at[:, 0, 0].set(1.0)
    interp = bool(m.flex_interp_np is not None and m.flex_interp_np[f])
    if interp:
      # trilinear: element-vertex weights chain through the static
      # interpolation matrix onto the 8 node bodies (mj_vertBodyWeight,
      # engine_core_constraint.c:1061)
      na, nn = int(m.flex_nodeadr_np[f]), int(m.flex_nodenum_np[f])
      w_tbl = jnp.asarray(m.flex_interp_w[f], dtype)   # (nv_f, nn)
      va = int(m.flex_vertadr[f])
      w_rows = w_tbl[ev_ids_s - va]                    # (ntot, nb, nn)
      node_w = jnp.einsum("tv,tvn->tn", bw_elem, w_rows)
      node_bodies = jnp.asarray(
          m.flex_nodebodyid_np[na:na + nn], jnp.int32)
      bary_body = bary_body.at[:, 1, :nn].set(
          jnp.broadcast_to(node_bodies, (ntot, nn)))
      bary_w = bary_w.at[:, 1, :nn].set(node_w)
      geom2 = jnp.full(ntot, -1, jnp.int32)            # no vertex geoms
    else:
      bary_body = bary_body.at[:, 1, :nb].set(
          jnp.asarray(vertbody)[ev_ids_s])
      bary_w = bary_w.at[:, 1, :nb].set(bw_elem)
      geom2 = (vgeom_base + ev_ids_s[:, 0]).astype(jnp.int32)

    geom1 = g_s.astype(jnp.int32)
    return dist, pos, nrm, geom1, geom2, bary_body, bary_w, sel

  if grp.kind == "selfpair":
    # element-element self-collision: pair_geom/pair_elem are both
    # global element ids
    ev1_np = np.asarray(m.flex_elem)[grp.pair_geom, :dim + 1]
    ev2_np = pair_elem_verts
    v1_all = d.flexvert_xpos[ev1_np]                   # (np, dim+1, 3)
    v2_all = d.flexvert_xpos[ev2_np]
    if npair_run < len(grp.pair_geom):
      c1 = jnp.mean(v1_all, axis=1)
      c2 = jnp.mean(v2_all, axis=1)
      r1 = jnp.max(jnp.linalg.norm(v1_all - c1[:, None], axis=2), axis=1)
      r2 = jnp.max(jnp.linalg.norm(v2_all - c2[:, None], axis=2), axis=1)
      bdist = jnp.linalg.norm(c1 - c2, axis=1) - r1 - r2 - 2.0 * radius
      _, sel = jax.lax.top_k(-bdist, npair_run)
    else:
      sel = jnp.arange(len(grp.pair_geom))
    v1 = v1_all[sel]
    v2 = v2_all[sel]
    ev1 = jnp.asarray(ev1_np)[sel]
    ev2 = jnp.asarray(ev2_np)[sel]

    fn = lambda a, b: _elem_elem(a, b, radius, dim)
    dist, pos, nrm = jax.vmap(fn)(v1, v2)

    nb = dim + 1
    bw1 = jax.vmap(lambda p_, vv: _bary_weights(p_, vv, nb))(pos, v1)
    bw2 = jax.vmap(lambda p_, vv: _bary_weights(p_, vv, nb))(pos, v2)
    n = npair_run
    bary_body = jnp.zeros((n, 2, bw_), jnp.int32)
    bary_w = jnp.zeros((n, 2, bw_), dtype)
    vb = jnp.asarray(vertbody)
    bary_body = bary_body.at[:, 0, :nb].set(vb[ev1])
    bary_w = bary_w.at[:, 0, :nb].set(bw1)
    bary_body = bary_body.at[:, 1, :nb].set(vb[ev2])
    bary_w = bary_w.at[:, 1, :nb].set(bw2)

    geom1 = (vgeom_base + ev1[:, 0]).astype(jnp.int32)
    geom2 = (vgeom_base + ev2[:, 0]).astype(jnp.int32)
    return dist, pos, nrm, geom1, geom2, bary_body, bary_w, sel

  if grp.kind == "evpair":
    vglob = pair_geom                                   # global vertex ids
    S = d.flexvert_xpos[vglob]
    everts = d.flexvert_xpos[pair_elem_verts]
    fn = lambda s, ev: _sphere_simplex(m, s, radius, ev, radius, dim)
    dist, pos, nrm = jax.vmap(fn)(S, everts)

    # exclude v from the element weights if present (static per pair)
    excl = np.full(len(vglob), -1, np.int32)
    for k in range(dim + 1):
      excl = np.where(pair_elem_verts[:, k] == vglob, k, excl)

    def weights(p_, ev, exc):
      ws = []
      for e_loc in range(-1, dim + 1):
        w = _bary_weights(p_, ev, dim + 1, exclude_local=e_loc)
        w = jnp.concatenate([w, jnp.zeros(4 - w.shape[0], w.dtype)])
        ws.append(w)
      return jnp.stack(ws)[exc + 1]

    bw_elem = jax.vmap(weights)(pos, everts, jnp.asarray(excl))
    bary_body = jnp.zeros((len(vglob), 2, bw_), jnp.int32)
    bary_w = jnp.zeros((len(vglob), 2, bw_), dtype)
    bary_body = bary_body.at[:, 0, 0].set(jnp.asarray(vertbody)[vglob])
    bary_w = bary_w.at[:, 0, 0].set(1.0)
    # element bodies with excluded slot's body compacted out (static)
    body_rows = []
    for i in range(len(vglob)):
      vs = [v for k, v in enumerate(pair_elem_verts[i])
            if k != excl[i]]
      row = [vertbody[v] for v in vs] + [0] * (4 - len(vs))
      body_rows.append(row)
    bary_body = bary_body.at[:, 1, :].set(
        jnp.asarray(np.asarray(body_rows, np.int32)))
    bary_w = bary_w.at[:, 1, :].set(bw_elem)

    geom1 = jnp.asarray(vgeom_base + vglob, jnp.int32)
    geom2 = jnp.asarray(vgeom_base + pair_elem_verts[:, 0], jnp.int32)
    return (dist, pos, nrm, geom1, geom2, bary_body, bary_w,
            jnp.arange(len(vglob)))

  # tetface (planeVertex, engine_collision_driver.c:1694)
  face_verts = np.take_along_axis(
      pair_elem_verts, grp.face, axis=1)                # (np, 3) global
  vglob = pair_geom                                     # opposite vertex
  t = d.flexvert_xpos[face_verts]                       # (np, 3, 3)
  v = d.flexvert_xpos[vglob]

  e1 = t[:, 1] - t[:, 0]
  e2 = t[:, 2] - t[:, 0]
  ev = v - t[:, 0]
  nrm_f = jnp.cross(e1, e2)
  nrm_f = nrm_f / jnp.maximum(
      jnp.linalg.norm(nrm_f, axis=1, keepdims=True), math.MINVAL)
  dst = jnp.einsum("pc,pc->p", ev, nrm_f)
  dist = -dst - 2.0 * radius
  # beyond the activation band: report far (the reference skips the pair)
  dist = jnp.where(dst <= -2.0 * radius, _BIG, dist)
  nrm = -nrm_f
  pos = v - nrm_f * (0.5 * dst[:, None])

  bw_face = jax.vmap(lambda p_, tv: _bary_weights(p_, tv, 3))(pos, t)
  n = len(vglob)
  bary_body = jnp.zeros((n, 2, bw_), jnp.int32)
  bary_w = jnp.zeros((n, 2, bw_), dtype)
  bary_body = bary_body.at[:, 0, :3].set(jnp.asarray(vertbody)[face_verts])
  bary_w = bary_w.at[:, 0, :3].set(bw_face)
  bary_body = bary_body.at[:, 1, 0].set(jnp.asarray(vertbody)[vglob])
  bary_w = bary_w.at[:, 1, 0].set(1.0)

  geom1 = jnp.asarray(vgeom_base + face_verts[:, 0], jnp.int32)
  geom2 = jnp.asarray(vgeom_base + vglob, jnp.int32)
  return (dist, pos, nrm, geom1, geom2, bary_body, bary_w,
          jnp.arange(len(vglob)))
