"""Collision detection: static pair table + vectorized narrowphase.

Analog of the reference collision driver and primitive narrowphase
(``src/engine/engine_collision_driver.c``: ``mj_collision``:265, parameter
mixing ``mj_contactParam``:1289, ``mj_setContact``:1387;
``src/engine/engine_collision_primitive.c``: ``mjraw_PlaneSphere``:28,
``mjc_PlaneCapsule``:65, ``mjc_PlaneBox``:200, ``mjraw_SphereSphere``:249,
``mjraw_SphereCapsule``:296, ``mjraw_CapsuleCapsule``:398;
``engine_collision_box.c``: ``mjraw_SphereBox``:39).

TPU-first re-design: the candidate pair set is enumerated *statically* at
trace time from contype/conaffinity masks, body-pair filters, explicit
``<pair>`` and ``<exclude>`` elements (the reference's dynamic broadphase
culls the same set at runtime; with static shapes, culling is expressed by
the per-contact activity mask instead).  Pairs are grouped by geom-type
signature and each group runs one vmapped narrowphase kernel.  Every
contact slot exists every step; ``dist >= includemargin`` marks it
inactive (the reference's ``exclude``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Contact,
    Data,
    DisableBit,
    GeomType,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math

# contact slots per supported (type1, type2) pair
_PAIR_SLOTS = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
    # convex narrowphase (ops/collision_convex.py)
    (GeomType.PLANE, GeomType.MESH): 4,
    (GeomType.SPHERE, GeomType.MESH): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.CAPSULE, GeomType.MESH): 2,
    (GeomType.BOX, GeomType.BOX): 4,
    (GeomType.BOX, GeomType.MESH): 4,
    (GeomType.MESH, GeomType.MESH): 4,
}

# cylinder/ellipsoid pairs via SDF optimization (ops/collision_sdf.py)
from mujoco_inversedynamicstest_tpu.ops.collision_sdf import (  # noqa: E402
    SDF_NARROWPHASE as _SDF_NARROWPHASE,
    SDF_SLOTS as _SDF_SLOTS,
)

_PAIR_SLOTS.update({(GeomType(a), GeomType(b)): v
                    for (a, b), v in _SDF_SLOTS.items()})

# height-field terrain pairs (ops/hfield.py)
from mujoco_inversedynamicstest_tpu.ops.hfield import (  # noqa: E402
    HFIELD_SLOTS as _HFIELD_SLOTS,
)

_PAIR_SLOTS.update(_HFIELD_SLOTS)

# SDF plugin geom pairs (ops/collision_sdf.py make_plugin_narrowphase;
# ref mjc_SDF, engine_collision_sdf.c:660)
from mujoco_inversedynamicstest_tpu.ops.collision_sdf import (  # noqa: E402
    SDF_PLUGIN_SLOTS as _SDF_PLUGIN_SLOTS,
)

_PAIR_SLOTS.update({
    (GeomType.PLANE, GeomType.SDF): _SDF_PLUGIN_SLOTS,
    (GeomType.SPHERE, GeomType.SDF): _SDF_PLUGIN_SLOTS,
    (GeomType.CAPSULE, GeomType.SDF): _SDF_PLUGIN_SLOTS,
    (GeomType.BOX, GeomType.SDF): _SDF_PLUGIN_SLOTS,
    (GeomType.SDF, GeomType.SDF): _SDF_PLUGIN_SLOTS,
})

# pairs whose kernels need hull topology (grouped per distinct mesh pair)
_CONVEX_KEYS = {
    (GeomType.PLANE, GeomType.MESH),
    (GeomType.SPHERE, GeomType.MESH),
    (GeomType.CAPSULE, GeomType.BOX),
    (GeomType.CAPSULE, GeomType.MESH),
    (GeomType.BOX, GeomType.BOX),
    (GeomType.BOX, GeomType.MESH),
    (GeomType.MESH, GeomType.MESH),
}


class PairGroup(NamedTuple):
  """A batch of same-type geom pairs (static)."""
  types: Tuple[int, int]
  geom1: np.ndarray      # (npair,)
  geom2: np.ndarray      # (npair,)
  ipair: np.ndarray      # (npair,) index into m.pair_* or -1
  nslot: int
  # mesh data ids (-1 for non-mesh geoms); part of the group key so every
  # group shares one static hull topology
  did1: int = -1
  did2: int = -1
  # shared condim of the group's pairs (part of the group key: uniform
  # condim keeps the efc row layout static under top-k pair pruning)
  condim: int = 3
  # runtime pair budget: number of pairs actually narrowphased (top-k by
  # bounding-sphere distance); == len(geom1) when uncapped
  npair_run: int = -1


class ContactLayout(NamedTuple):
  """Static contact-slot layout for a model.

  ``dim``/``efc_address`` describe the *reduced* slot set (after the
  optional ``max_contact_points`` per-condim top-k); geom identities are
  runtime data in ``Contact.geom1/geom2``, never static tables.
  """
  groups: Tuple[PairGroup, ...]
  ncon: int
  geom1: np.ndarray      # (ncon,) -1 sentinels (kept for shape/compat)
  geom2: np.ndarray
  dim: np.ndarray        # condim per (reduced) slot
  efc_address: np.ndarray
  # full (pre-reduction) slot count and per-slot condim
  ncon_full: int = 0
  full_dim: np.ndarray = None
  # per condim value: (condim, full-slot indices, kept count)
  reduce_groups: Tuple = ()
  # flex element-contact groups (ops/flexcol.py), appended after the
  # geom-pair slots; has_bary marks that Contact carries bary fields
  elem_groups: Tuple = ()
  has_bary: bool = False


def _mix_condim(m: Model, g1: int, g2: int) -> int:
  p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
  if p1 > p2:
    return int(m.geom_condim[g1])
  if p2 > p1:
    return int(m.geom_condim[g2])
  return int(max(m.geom_condim[g1], m.geom_condim[g2]))


def contact_layout(m: Model) -> ContactLayout:
  """Enumerates the static candidate pair set and contact slots."""
  if m.opt.disableflags & (DisableBit.CONTACT | DisableBit.CONSTRAINT):
    return ContactLayout(
        groups=(), ncon=0,
        geom1=np.zeros(0, np.int32), geom2=np.zeros(0, np.int32),
        dim=np.zeros(0, np.int32), efc_address=np.zeros(0, np.int32),
    )

  raw = []  # (g1, g2, ipair, condim)
  # explicit <pair> elements take their own parameters
  for k in range(len(m.pair_geom1)):
    raw.append((int(m.pair_geom1[k]), int(m.pair_geom2[k]), k,
                int(m.pair_dim[k])))

  # auto-generated pairs: fully vectorized candidate masking (the
  # reference's dynamic broadphase filters, applied statically; scales to
  # humanoid100-class geom counts without a python double loop)
  ng = m.ngeom
  if ng > 1:
    tri1, tri2 = np.triu_indices(ng, k=1)
    b1 = m.geom_bodyid[tri1]
    b2 = m.geom_bodyid[tri2]
    w1 = m.body_weldid[b1]
    w2 = m.body_weldid[b2]
    keep = (b1 != b2) & (w1 != w2)

    if len(m.exclude_signature):
      sig = (w1.astype(np.int64) << 16) | w2
      gis = (w2.astype(np.int64) << 16) | w1
      excl = np.asarray(m.exclude_signature, np.int64)
      keep &= ~np.isin(sig, excl) & ~np.isin(gis, excl)

    if not (m.opt.disableflags & DisableBit.FILTERPARENT):
      pw1 = m.body_weldid[m.body_parentid[w1]]
      pw2 = m.body_weldid[m.body_parentid[w2]]
      parent_child = ((w1 == pw2) & (w1 != 0)) | ((w2 == pw1) & (w2 != 0))
      keep &= ~parent_child

    keep &= ((m.geom_contype[tri1] & m.geom_conaffinity[tri2])
             | (m.geom_contype[tri2] & m.geom_conaffinity[tri1])) != 0

    # same-flex vertex-vertex pairs: self-collision is not simulated
    # (put_model validates selfcollide="none"; ref mj_collideFlexSAP)
    if m.geom_flexid is not None and np.any(m.geom_flexid >= 0):
      f1 = m.geom_flexid[tri1]
      f2 = m.geom_flexid[tri2]
      keep &= ~((f1 >= 0) & (f1 == f2))

      # vertex pairs superseded by element-level narrowphase: sphere and
      # capsule partners of dim>=1 flexes collide against the *elements*
      # (ops/flexcol.py; ref mj_collideGeomElem) — their vertex-sphere
      # pairs would double-count the same surface
      from mujoco_inversedynamicstest_tpu.ops import flexcol

      t1a = m.geom_type[tri1]
      t2a = m.geom_type[tri2]
      fdim = np.asarray(m.flex_dim)
      one_flex = (f1 >= 0) != (f2 >= 0)
      partner_t = np.where(f1 >= 0, t2a, t1a)
      flex_dim_of = np.where(
          f1 >= 0, fdim[np.maximum(f1, 0)], fdim[np.maximum(f2, 0)])
      elem_level = (np.isin(partner_t, flexcol._ELEM_PARTNER_TYPES)
                    & (flex_dim_of >= 1))
      # smooth partners (cylinder/ellipsoid) collide at element level on
      # dim-2 cloth only — their dim-1/3 vertex-sphere pairs must stay
      # (flexcol.uses_elem_narrowphase, vectorized)
      smooth = np.isin(partner_t, flexcol._SMOOTH_PARTNER_TYPES)
      elem_level &= ~smooth | (flex_dim_of == 2)
      drop = one_flex & elem_level
      keep &= ~drop

    if len(m.pair_geom1):
      ex1 = np.concatenate([m.pair_geom1, m.pair_geom2]).astype(np.int64)
      ex2 = np.concatenate([m.pair_geom2, m.pair_geom1]).astype(np.int64)
      pair_sig = tri1.astype(np.int64) * ng + tri2
      keep &= ~np.isin(pair_sig, ex1 * ng + ex2)

    # condim mixing (priority override, else max) — vectorized
    p1 = m.geom_priority[tri1]
    p2 = m.geom_priority[tri2]
    cd = np.where(p1 > p2, m.geom_condim[tri1],
                  np.where(p2 > p1, m.geom_condim[tri2],
                           np.maximum(m.geom_condim[tri1],
                                      m.geom_condim[tri2])))
    for g1, g2, c in zip(tri1[keep], tri2[keep], cd[keep]):
      raw.append((int(g1), int(g2), -1, int(c)))

  # canonical order: smaller geom type first
  ordered = []
  for g1, g2, ip, condim in raw:
    if m.geom_type[g1] > m.geom_type[g2]:
      g1, g2 = g2, g1
    key = (int(m.geom_type[g1]), int(m.geom_type[g2]))
    if key not in _PAIR_SLOTS:
      raise NotImplementedError(
          f"collision pair {GeomType(key[0]).name}-{GeomType(key[1]).name} "
          "not yet supported"
      )
    # hull-kernel groups are keyed per distinct mesh pair so each group has
    # one static hull topology (cf. MJX FunctionKey data ids,
    # reference mjx/mujoco/mjx/_src/collision_driver.py:192)
    if key in _CONVEX_KEYS:
      did1 = int(m.geom_dataid[g1]) if m.geom_type[g1] == GeomType.MESH else -1
      did2 = int(m.geom_dataid[g2]) if m.geom_type[g2] == GeomType.MESH else -1
    elif GeomType(key[0]) == GeomType.HFIELD:
      # hfield grids are per-geom static data, like hulls
      did1 = int(m.geom_dataid[g1])
      did2 = int(m.geom_dataid[g2]) if m.geom_type[g2] == GeomType.MESH else -1
    elif GeomType(key[1]) == GeomType.SDF:
      # SDF plugin geoms carry per-geom static data (plugin instance +
      # mesh recentering + aabb): group per geom id
      did1 = int(g1) if m.geom_type[g1] == GeomType.SDF else -1
      did2 = int(g2)
    else:
      did1 = did2 = -1
    ordered.append((key, did1, did2, g1, g2, ip, condim))

  # group by (type signature, mesh ids, condim); per-group runtime pair
  # budget from max_geom_pairs (MJX <numeric> convention, reference
  # mjx/mujoco/mjx/_src/collision_driver.py:336-372)
  groups = []
  slot_g1, slot_g2, slot_dim = [], [], []
  by_key = {}
  for key, did1, did2, g1, g2, ip, condim in ordered:
    by_key.setdefault((key, did1, did2, condim), []).append((g1, g2, ip))
  for key, did1, did2, condim in sorted(by_key):
    entries = by_key[(key, did1, did2, condim)]
    nslot = _PAIR_SLOTS[key]
    npair_run = len(entries)
    if m.max_geom_pairs > 0:
      npair_run = min(npair_run, m.max_geom_pairs)
    groups.append(PairGroup(
        types=key,
        geom1=np.array([e[0] for e in entries], np.int32),
        geom2=np.array([e[1] for e in entries], np.int32),
        ipair=np.array([e[2] for e in entries], np.int32),
        nslot=nslot,
        did1=did1,
        did2=did2,
        condim=condim,
        npair_run=npair_run,
    ))
    for _ in range(npair_run):
      slot_g1 += [-1] * nslot       # geom ids are runtime Contact fields
      slot_g2 += [-1] * nslot
      slot_dim += [condim] * nslot

  # flex element-contact groups (external narrowphase + internal pairs;
  # ops/flexcol.py) append their slots after the geom-pair slots
  from mujoco_inversedynamicstest_tpu.ops import flexcol

  elem_groups = flexcol.build_elem_groups(m) if m.nflex else ()
  for eg in elem_groups:
    slot_dim += [eg.condim] * (eg.npair_run * eg.nslot)

  from mujoco_inversedynamicstest_tpu.models.types import ConeType

  elliptic = m.opt.cone == ConeType.ELLIPTIC
  full_dim = np.array(slot_dim, np.int32)

  # optional per-condim slot budget (max_contact_points, MJX convention):
  # the reduced layout keeps the top-k nearest slots of each condim value
  reduce_groups = []
  dim_list = []
  if m.max_contact_points > 0 and len(full_dim):
    for c in sorted(set(full_dim.tolist())):
      idx = np.nonzero(full_dim == c)[0]
      keep = min(len(idx), m.max_contact_points)
      reduce_groups.append((int(c), idx.astype(np.int32), keep))
      dim_list += [c] * keep
    dim = np.array(dim_list, np.int32)
  else:
    dim = full_dim

  efc_address = np.zeros(len(dim), np.int32)
  adr = 0
  for i, c in enumerate(dim):
    efc_address[i] = adr
    adr += 1 if c == 1 else (c if elliptic else 2 * (c - 1))

  return ContactLayout(
      groups=tuple(groups),
      ncon=len(dim),
      geom1=np.full(len(dim), -1, np.int32),
      geom2=np.full(len(dim), -1, np.int32),
      dim=dim,
      efc_address=efc_address,
      ncon_full=len(full_dim),
      full_dim=full_dim,
      reduce_groups=tuple(reduce_groups),
      elem_groups=elem_groups,
      has_bary=bool(elem_groups),
  )


def _bary_w_of(m: Model) -> int:
  from mujoco_inversedynamicstest_tpu.ops import flexcol

  return flexcol.bary_width(m)


def ncon_rows(m: Model) -> int:
  """Total contact efc rows implied by the contact layout + cone type."""
  from mujoco_inversedynamicstest_tpu.models.types import ConeType

  lay = contact_layout(m)
  elliptic = m.opt.cone == ConeType.ELLIPTIC
  return int(sum(
      1 if c == 1 else (c if elliptic else 2 * (c - 1)) for c in lay.dim
  ))


def geom_distance(m: Model, d: Data, g1: int, g2: int, distmax):
  """Smallest distance between two geoms + the connecting segment.

  Analog of ``mj_geomDistance`` (ref ``engine_support.c:1407``): runs the
  pair's narrowphase with margin = distmax; returns (dist, fromto(6,)).
  """
  dtype = d.qpos.dtype
  flip = int(m.geom_type[g1]) > int(m.geom_type[g2])
  a, b = (g2, g1) if flip else (g1, g2)
  key = (GeomType(int(m.geom_type[a])), GeomType(int(m.geom_type[b])))
  if key not in _PAIR_SLOTS:
    # loud guard: silently returning (distmax, zeros) would make a
    # GEOMDIST/GEOMNORMAL/GEOMFROMTO sensor report "no contact" forever
    raise NotImplementedError(
        f"geom_distance: unsupported geom pair {key[0].name}-{key[1].name}")

  did = lambda g: (int(m.geom_dataid[g])
                   if m.geom_type[g] == GeomType.MESH else -1)
  grp = PairGroup(
      types=key, geom1=np.array([a], np.int32), geom2=np.array([b], np.int32),
      ipair=np.array([-1], np.int32), nslot=_PAIR_SLOTS[key],
      did1=did(a), did2=did(b),
  )
  fn = _group_narrowphase(m, grp)
  dist, pos, nrm, _ = fn(
      d.geom_xpos[a], d.geom_xmat[a], m.geom_size[a],
      d.geom_xpos[b], d.geom_xmat[b], m.geom_size[b],
      jnp.asarray(distmax, dtype),
  )
  k = jnp.argmin(dist)
  dmin = dist[k]
  found = dmin < distmax
  # normal points geom1 -> geom2 (flip back if we swapped)
  n = nrm[k] * (-1.0 if flip else 1.0)
  fromto = jnp.concatenate([
      pos[k] - n * (dmin * 0.5), pos[k] + n * (dmin * 0.5)])
  return (jnp.where(found, dmin, distmax),
          jnp.where(found, fromto, jnp.zeros(6, dtype)))


def make_frame(normal: jax.Array, yhint: jax.Array) -> jax.Array:
  """Completes a contact frame from its normal (ref ``mju_makeFrame``,
  engine_util_spatial.c:526).  Rows are [normal, tan1, tan2]."""
  n = math.normalize(normal)
  have_hint = math.norm_safe(yhint) >= 0.5
  y_default = jnp.where(
      (jnp.abs(n[..., 1:2]) < 0.5),
      jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
      jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
  )
  y = jnp.where(have_hint[..., None], yhint, y_default)
  y = y - n * jnp.sum(n * y, axis=-1, keepdims=True)
  y = math.normalize(y)
  z = jnp.cross(n, y)
  return jnp.stack([n, y, z], axis=-2)


# ---------------------------------------------------------------------------
# Narrowphase kernels.  Each takes (pos1, mat1, size1, pos2, mat2, size2,
# margin) for ONE pair and returns (dist, pos, normal, yhint) arrays with a
# fixed slot count; empty slots have dist = +large.
# ---------------------------------------------------------------------------

_BIG = 1e10


def _plane_sphere_raw(pn, nrm, ps, r):
  dist = jnp.dot(ps - pn, nrm) - r
  pos = ps - nrm * (r + 0.5 * dist)
  return dist, pos


def _plane_sphere(p1, m1, s1, p2, m2, s2, margin):
  nrm = m1[:, 2]
  dist, pos = _plane_sphere_raw(p1, nrm, p2, s2[0])
  z = jnp.zeros(3, dtype=p1.dtype)
  return dist[None], pos[None], nrm[None], z[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2, margin):
  nrm = m1[:, 2]
  axis = m2[:, 2]
  seg = axis * s2[1]
  d1, c1 = _plane_sphere_raw(p1, nrm, p2 + seg, s2[0])
  d2, c2 = _plane_sphere_raw(p1, nrm, p2 - seg, s2[0])
  dist = jnp.stack([d1, d2])
  pos = jnp.stack([c1, c2])
  n = jnp.stack([nrm, nrm])
  yhint = jnp.stack([axis, axis])
  return dist, pos, n, yhint


def _plane_box(p1, m1, s1, p2, m2, s2, margin):
  nrm = m1[:, 2]
  dist0 = jnp.dot(p2 - p1, nrm)
  # all 8 corners; keep the 4 with the smallest plane distance among those
  # pointing down (ref mjc_PlaneBox:200 keeps <= 4 bottom corners)
  signs = jnp.asarray(
      [[(1.0 if i & 1 else -1.0), (1.0 if i & 2 else -1.0),
        (1.0 if i & 4 else -1.0)] for i in range(8)], dtype=p1.dtype
  )
  corners_local = signs * s2[None, :]
  corners = corners_local @ m2.T                   # (8, 3) rel. to center
  ldist = corners @ nrm                             # (8,)
  cdist = dist0 + ldist
  valid = (ldist <= 0) & (cdist <= margin)
  score = jnp.where(valid, cdist, _BIG)
  _, idx = jax.lax.top_k(-score, 4)
  dist = jnp.where(valid[idx], cdist[idx], _BIG)
  pos = corners[idx] + p2[None] - nrm[None] * (dist[:, None] * 0.5)
  n = jnp.tile(nrm[None], (4, 1))
  z = jnp.zeros((4, 3), dtype=p1.dtype)
  return dist, pos, n, z


def _plane_cylinder(p1, m1, s1, p2, m2, s2, margin):
  """Plane-cylinder: rim point, opposite rim point, two side points.

  Branchless analog of ``mjc_PlaneCylinder`` (reference
  ``engine_collision_primitive.c:95``): up to 4 contacts — nearest rim
  point, the axially opposite rim point, and a flanking triangle pair —
  each gated by its own margin test plus the reference's early-exit on the
  first point.
  """
  dtype = p1.dtype
  nrm = m1[:, 2]
  axis = m2[:, 2]
  prjaxis = jnp.dot(nrm, axis)
  # axis points towards the plane
  axis = jnp.where(prjaxis > 0, -axis, axis)
  prjaxis = -jnp.abs(prjaxis)

  dist0 = jnp.dot(p2 - p1, nrm)

  # radial direction: -normal with the axis component removed
  vec = axis * prjaxis - nrm
  len_sqr = jnp.dot(vec, vec)
  vec_disk = m2[:, 0] * s2[0]  # disk parallel to plane: any radial dir
  scl = s2[0] / jnp.sqrt(jnp.maximum(len_sqr, 1e-30))
  vec = jnp.where(len_sqr >= 1e-24, vec * scl, vec_disk)

  prjvec = jnp.dot(vec, nrm)
  haxis = axis * s2[1]
  prjaxis_h = prjaxis * s2[1]

  d1 = dist0 + prjaxis_h + prjvec          # nearest rim point
  d2 = dist0 - prjaxis_h + prjvec          # opposite rim point
  prjvec1 = -prjvec * 0.5
  d34 = dist0 + prjaxis_h + prjvec1        # flanking pair (shared depth)

  pos1 = p2 + vec + haxis - nrm * (d1 * 0.5)
  pos2 = p2 + vec - haxis - nrm * (d2 * 0.5)
  side = jnp.cross(vec, axis)
  side = side / jnp.maximum(jnp.linalg.norm(side), 1e-15)
  side = side * (s2[0] * jnp.sqrt(3.0) / 2)
  base34 = p2 + haxis - vec * 0.5 - nrm * (d34 * 0.5)
  pos3 = base34 + side
  pos4 = base34 - side

  gate1 = d1 <= margin                      # reference early-exit
  dist = jnp.stack([
      jnp.where(gate1, d1, _BIG),
      jnp.where(gate1 & (d2 <= margin), d2, _BIG),
      jnp.where(gate1 & (d34 <= margin), d34, _BIG),
      jnp.where(gate1 & (d34 <= margin), d34, _BIG),
  ])
  pos = jnp.stack([pos1, pos2, pos3, pos4])
  n = jnp.tile(nrm[None], (4, 1))
  z = jnp.zeros((4, 3), dtype=dtype)
  return dist, pos, n, z


def _sphere_sphere_raw(p1, r1, p2, r2, fallback_n):
  dif = p2 - p1
  length = math.norm_safe(dif)
  dist = length - r1 - r2
  n = jnp.where(length < math.MINVAL, fallback_n, dif / length)
  pos = p1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _sphere_sphere(p1, m1, s1, p2, m2, s2, margin):
  fb = math.normalize(jnp.cross(m1[:, 2], m2[:, 2]))
  dist, pos, n = _sphere_sphere_raw(p1, s1[0], p2, s2[0], fb)
  z = jnp.zeros(3, dtype=p1.dtype)
  return dist[None], pos[None], n[None], z[None]


def _sphere_capsule(p1, m1, s1, p2, m2, s2, margin):
  axis = m2[:, 2]
  x = jnp.clip(jnp.dot(axis, p1 - p2), -s2[1], s2[1])
  near = p2 + axis * x
  fb = math.normalize(jnp.cross(m1[:, 2], axis))
  dist, pos, n = _sphere_sphere_raw(p1, s1[0], near, s2[0], fb)
  z = jnp.zeros(3, dtype=p1.dtype)
  return dist[None], pos[None], n[None], z[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2, margin):
  """Closest points between the two segments (generic, non-parallel path
  of ref ``mjraw_CapsuleCapsule``:398; exactly-parallel capsules yield the
  single deepest contact rather than the reference's two)."""
  a1 = m1[:, 2] * s1[1]
  a2 = m2[:, 2] * s2[1]
  dif = p1 - p2
  ma = jnp.dot(a1, a1)
  mb = -jnp.dot(a1, a2)
  mc = jnp.dot(a2, a2)
  u = -jnp.dot(a1, dif)
  v = jnp.dot(a2, dif)
  det = ma * mc - mb * mb
  det_safe = jnp.where(jnp.abs(det) < math.MINVAL, 1.0, det)

  x1 = (mc * u - mb * v) / det_safe
  x2 = (ma * v - mb * u) / det_safe
  # clip cascade (ref :420-433)
  x2 = jnp.where(x1 > 1, (v - mb) / mc, jnp.where(x1 < -1, (v + mb) / mc,
                                                  x2))
  x1 = jnp.clip(x1, -1, 1)
  x1 = jnp.where(
      x2 > 1, jnp.clip((u - mb) / ma, -1, 1),
      jnp.where(x2 < -1, jnp.clip((u + mb) / ma, -1, 1), x1),
  )
  x2 = jnp.clip(x2, -1, 1)

  # parallel fallback: endpoint of capsule 1
  par = jnp.abs(det) < math.MINVAL
  x1 = jnp.where(par, 1.0, x1)
  x2 = jnp.where(par, jnp.clip((v - mb) / mc, -1, 1), x2)

  q1 = p1 + a1 * x1
  q2 = p2 + a2 * x2
  fb = math.normalize(jnp.cross(m1[:, 2], m2[:, 2]))
  dist, pos, n = _sphere_sphere_raw(q1, s1[0], q2, s2[0], fb)
  z = jnp.zeros(3, dtype=p1.dtype)
  return dist[None], pos[None], n[None], z[None]


def _sphere_box(p1, m1, s1, p2, m2, s2, margin):
  """ref ``mjraw_SphereBox`` (engine_collision_box.c:39)."""
  center = m2.T @ (p1 - p2)
  clamped = jnp.clip(center, -s2, s2)
  tmp = clamped - center
  d_out = math.norm_safe(tmp)

  # outside branch
  n_out_local = tmp / d_out
  deepest = center + n_out_local * s1[0]
  pos_out = 0.5 * (clamped + deepest)
  dist_out = d_out - s1[0]

  # inside branch: nearest face
  face_dists = jnp.concatenate([s2 - center, s2 + center])  # +x,+y,+z,-x,-y,-z
  k = jnp.argmin(face_dists)
  closest = face_dists[k]
  sign = jnp.where(k < 3, 1.0, -1.0)
  axis = jnp.eye(3, dtype=p1.dtype)[k % 3] * sign
  pos_in = center + axis * ((s1[0] - closest) / 2)
  dist_in = -closest - s1[0]

  inside = d_out <= math.MINVAL
  dist = jnp.where(inside, dist_in, dist_out)
  pos_local = jnp.where(inside, pos_in, pos_out)
  n_local = jnp.where(inside, axis, n_out_local)
  pos = m2 @ pos_local + p2
  n = m2 @ n_local
  z = jnp.zeros(3, dtype=p1.dtype)
  return dist[None], pos[None], n[None], z[None]


_NARROWPHASE: dict = {
    (GeomType.PLANE, GeomType.SPHERE): _plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): _plane_capsule,
    (GeomType.PLANE, GeomType.BOX): _plane_box,
    (GeomType.PLANE, GeomType.CYLINDER): _plane_cylinder,
    (GeomType.SPHERE, GeomType.SPHERE): _sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): _sphere_capsule,
    (GeomType.SPHERE, GeomType.BOX): _sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): _capsule_capsule,
}


def _group_narrowphase(m: Model, grp: PairGroup) -> Callable:
  """Resolves the narrowphase kernel for a pair group, building hull-aware
  closures for convex keys (ops/collision_convex.py)."""
  if grp.types in _NARROWPHASE:
    return _NARROWPHASE[grp.types]
  key_int = (int(grp.types[0]), int(grp.types[1]))
  if key_int in _SDF_NARROWPHASE:
    return _SDF_NARROWPHASE[key_int]
  if GeomType(grp.types[1]) == GeomType.SDF:
    from mujoco_inversedynamicstest_tpu.ops import collision_sdf as csdf

    return csdf.make_plugin_narrowphase(m, grp)
  if GeomType(grp.types[0]) == GeomType.HFIELD:
    from mujoco_inversedynamicstest_tpu.ops import hfield as hfield_mod

    return hfield_mod.make_narrowphase(m, grp)

  from mujoco_inversedynamicstest_tpu.ops import collision_convex as cc

  t1, t2 = grp.types

  def hull_of(did, t):
    return (cc.BOX_HULL, True) if t == GeomType.BOX else (
        m.mesh_hull[did], False)

  if t1 == GeomType.PLANE:
    return cc.make_plane_convex(*hull_of(grp.did2, t2))
  if t1 == GeomType.SPHERE:
    return cc.make_sphere_convex(*hull_of(grp.did2, t2))
  if t1 == GeomType.CAPSULE:
    return cc.make_capsule_convex(*hull_of(grp.did2, t2))
  s1, b1 = hull_of(grp.did1, t1)
  s2, b2 = hull_of(grp.did2, t2)
  return cc.make_convex_convex(s1, b1, s2, b2)


def _pair_params(m: Model, grp: PairGroup):
  """Mixed contact parameters for a pair group (ref ``mj_contactParam``).

  Returns (margin, includemargin, friction5, solref, solreffriction,
  solimp), each batched over the group's pairs.
  """
  g1, g2 = grp.geom1, grp.geom2
  dtype = m.geom_margin.dtype
  npair = len(g1)

  is_pair = grp.ipair >= 0
  ip = np.where(is_pair, grp.ipair, 0)

  # --- auto mixing ---
  p1 = m.geom_priority[g1]
  p2 = m.geom_priority[g2]
  solmix1, solmix2 = m.geom_solmix[g1], m.geom_solmix[g2]
  mix = jnp.where(
      (solmix1 >= math.MINVAL) & (solmix2 >= math.MINVAL),
      solmix1 / jnp.maximum(solmix1 + solmix2, math.MINVAL),
      jnp.where(
          (solmix1 < math.MINVAL) & (solmix2 < math.MINVAL), 0.5,
          jnp.where(solmix1 < math.MINVAL, 0.0, 1.0),
      ),
  )
  mix = jnp.where(jnp.asarray(p1 > p2), 1.0, mix)
  mix = jnp.where(jnp.asarray(p1 < p2), 0.0, mix)
  use1 = jnp.asarray(p1 > p2)
  use2 = jnp.asarray(p1 < p2)
  same = ~(use1 | use2)

  sr1, sr2 = m.geom_solref[g1], m.geom_solref[g2]
  both_std = (sr1[:, 0] > 0) & (sr2[:, 0] > 0)
  solref_mixed = jnp.where(
      both_std[:, None],
      mix[:, None] * sr1 + (1 - mix[:, None]) * sr2,
      jnp.minimum(sr1, sr2),
  )
  solref = jnp.where(use1[:, None], sr1,
                     jnp.where(use2[:, None], sr2, solref_mixed))

  si1, si2 = m.geom_solimp[g1], m.geom_solimp[g2]
  solimp = jnp.where(
      use1[:, None], si1,
      jnp.where(use2[:, None], si2,
                mix[:, None] * si1 + (1 - mix[:, None]) * si2),
  )

  f1, f2 = m.geom_friction[g1], m.geom_friction[g2]
  fri3 = jnp.where(use1[:, None], f1,
                   jnp.where(use2[:, None], f2, jnp.maximum(f1, f2)))
  friction5 = fri3[:, [0, 0, 1, 2, 2]]

  gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])

  # --- explicit pair overrides ---
  if np.any(is_pair):
    sel = jnp.asarray(is_pair)
    margin = jnp.where(sel, m.pair_margin[ip], margin)
    gap = jnp.where(sel, m.pair_gap[ip], gap)
    friction5 = jnp.where(sel[:, None], m.pair_friction[ip], friction5)
    solref = jnp.where(sel[:, None], m.pair_solref[ip], solref)
    solimp = jnp.where(sel[:, None], m.pair_solimp[ip], solimp)
    solreffriction = jnp.where(
        sel[:, None], m.pair_solreffriction[ip],
        jnp.zeros((npair, 2), dtype=dtype),
    )
  else:
    solreffriction = jnp.zeros((npair, 2), dtype=dtype)

  return margin, margin - gap, friction5, solref, solreffriction, solimp


def collision(m: Model, d: Data) -> Data:
  """Runs all narrowphase groups, fills the static-shape contact set.

  Budgeting (the TPU analog of the reference's SAP+BVH broadphase,
  ``mj_collision`` engine_collision_driver.c:265, and of MJX's
  ``max_geom_pairs``/``max_contact_points`` top-k):
  * per group, only the ``npair_run`` nearest candidate pairs (by
    bounding-sphere distance) are narrowphased when capped;
  * afterwards, an optional per-condim top-k keeps the nearest slots.
  """
  lay = contact_layout(m)
  dtype = d.qpos.dtype

  if lay.ncon == 0:
    return d.replace(contact=_empty_contact(m, dtype))

  dists, poss, frames, incmargins, margins = [], [], [], [], []
  frictions, solrefs, solreffrictions, solimps = [], [], [], []
  geom1s, geom2s = [], []

  for grp in lay.groups:
    fn = _group_narrowphase(m, grp)
    margin, incmargin, fri, sr, srf, si = _pair_params(m, grp)
    g1, g2 = grp.geom1, grp.geom2

    if grp.npair_run < len(grp.geom1):
      # broadphase: top-k nearest pairs by bounding-sphere distance
      # (planes use the signed plane distance; ref mj_broadphase
      # filterSphere semantics)
      p1 = d.geom_xpos[g1]
      p2 = d.geom_xpos[g2]
      if grp.types[0] == GeomType.PLANE:
        n = d.geom_xmat[g1][:, :, 2]
        bdist = jnp.einsum("pi,pi->p", p2 - p1, n) - m.geom_rbound[g2]
      elif grp.types[0] == GeomType.HFIELD:
        # terrain bounding sphere from the static hfield extents (the
        # compiled geom_rbound is 0 for hfields, like planes)
        s = m.hfield_size[grp.did1]
        rb1 = float(np.sqrt(s[0] ** 2 + s[1] ** 2
                            + max(s[2], s[3]) ** 2))
        bdist = (jnp.linalg.norm(p2 - p1, axis=1)
                 - rb1 - m.geom_rbound[g2])
      else:
        bdist = (jnp.linalg.norm(p2 - p1, axis=1)
                 - m.geom_rbound[g1] - m.geom_rbound[g2])
      _, sel = jax.lax.top_k(-(bdist - margin), grp.npair_run)
      g1 = jnp.asarray(g1)[sel]
      g2 = jnp.asarray(g2)[sel]
      margin, incmargin = margin[sel], incmargin[sel]
      fri, sr, srf, si = fri[sel], sr[sel], srf[sel], si[sel]

    gsize = jnp.asarray(m.geom_size)  # g1/g2 may be traced (top-k sel)
    dist, pos, nrm, yhint = jax.vmap(fn)(
        d.geom_xpos[g1], d.geom_xmat[g1], gsize[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], gsize[g2],
        margin,
    )
    k = grp.nslot
    frame = jax.vmap(jax.vmap(make_frame))(nrm, yhint)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    dists.append(dist.reshape(-1))
    poss.append(pos.reshape(-1, 3))
    frames.append(frame.reshape(-1, 3, 3))
    incmargins.append(rep(incmargin))
    margins.append(rep(margin))
    frictions.append(rep(fri))
    solrefs.append(rep(sr))
    solreffrictions.append(rep(srf))
    solimps.append(rep(si))
    geom1s.append(rep(jnp.asarray(g1)))
    geom2s.append(rep(jnp.asarray(g2)))

  # flex element-contact groups (ops/flexcol.py): one slot per pair, with
  # element-side body/weight sets riding along
  bary_bodies, bary_ws = [], []
  if lay.has_bary:
    from mujoco_inversedynamicstest_tpu.ops import flexcol

    # plain geom slots: side bodies = (geom_bodyid, 1-weight)
    n_geom_slots = sum(x.shape[0] for x in dists)
    if n_geom_slots:
      gb = jnp.asarray(m.geom_bodyid)
      g1cat = jnp.concatenate(geom1s)
      g2cat = jnp.concatenate(geom2s)
      bwid = flexcol.bary_width(m)
      bb = jnp.zeros((n_geom_slots, 2, bwid), jnp.int32)
      bw = jnp.zeros((n_geom_slots, 2, bwid), dtype)
      bb = bb.at[:, 0, 0].set(gb[g1cat])
      bb = bb.at[:, 1, 0].set(gb[g2cat])
      bw = bw.at[:, 0, 0].set(1.0).at[:, 1, 0].set(1.0)
      bary_bodies.append(bb)
      bary_ws.append(bw)

    for eg in lay.elem_groups:
      margin, incmargin, fri, sr, srf, si = flexcol.elem_pair_params(m, eg)
      dist, pos, nrm, g1e, g2e, bb, bw, sel = flexcol.run_elem_group(
          m, d, eg)
      frame = jax.vmap(make_frame)(nrm, jnp.zeros_like(nrm))
      repe = lambda x: jnp.repeat(x, eg.nslot, axis=0)
      dists.append(dist)
      poss.append(pos)
      frames.append(frame)
      incmargins.append(repe(incmargin[sel]))
      margins.append(repe(margin[sel]))
      frictions.append(repe(fri[sel]))
      solrefs.append(repe(sr[sel]))
      solreffrictions.append(repe(srf[sel]))
      solimps.append(repe(si[sel]))
      geom1s.append(g1e)
      geom2s.append(g2e)
      bary_bodies.append(bb)
      bary_ws.append(bw)

  contact = Contact(
      dist=jnp.concatenate(dists),
      pos=jnp.concatenate(poss),
      frame=jnp.concatenate(frames),
      includemargin=jnp.concatenate(incmargins),
      margin=jnp.concatenate(margins),
      friction=jnp.concatenate(frictions),
      solref=jnp.concatenate(solrefs),
      solreffriction=jnp.concatenate(solreffrictions),
      solimp=jnp.concatenate(solimps),
      geom1=jnp.concatenate(geom1s).astype(jnp.int32),
      geom2=jnp.concatenate(geom2s).astype(jnp.int32),
      efc_address=lay.efc_address,
      dim=lay.dim,
      bary_body=(jnp.concatenate(bary_bodies) if lay.has_bary else None),
      bary_w=(jnp.concatenate(bary_ws) if lay.has_bary else None),
  )

  # per-condim slot budget: keep the nearest max_contact_points slots
  if lay.reduce_groups:
    sels = []
    for c, idx, keep in lay.reduce_groups:
      if keep == len(idx):
        sels.append(jnp.asarray(idx))
      else:
        score = contact.dist[idx] - contact.includemargin[idx]
        _, topk = jax.lax.top_k(-score, keep)
        sels.append(jnp.asarray(idx)[topk])
    sel = jnp.concatenate(sels)
    contact = Contact(
        dist=contact.dist[sel], pos=contact.pos[sel],
        frame=contact.frame[sel],
        includemargin=contact.includemargin[sel],
        margin=contact.margin[sel], friction=contact.friction[sel],
        solref=contact.solref[sel],
        solreffriction=contact.solreffriction[sel],
        solimp=contact.solimp[sel], geom1=contact.geom1[sel],
        geom2=contact.geom2[sel],
        efc_address=lay.efc_address, dim=lay.dim,
        bary_body=(contact.bary_body[sel] if lay.has_bary else None),
        bary_w=(contact.bary_w[sel] if lay.has_bary else None),
    )

  return d.replace(contact=contact)


def _empty_contact(m: Model, dtype) -> Contact:
  z = lambda *s: jnp.zeros(s, dtype=dtype)
  return Contact(
      dist=z(0), pos=z(0, 3), frame=z(0, 3, 3), includemargin=z(0),
      margin=z(0),
      friction=z(0, 5), solref=z(0, 2), solreffriction=z(0, 2),
      solimp=z(0, 5), geom1=jnp.zeros(0, jnp.int32),
      geom2=jnp.zeros(0, jnp.int32),
      efc_address=np.zeros(0, np.int32), dim=np.zeros(0, np.int32),
  )


def alloc_contact(m: Model, dtype) -> Contact:
  """Zero-filled contact set with the model's static layout (for
  ``make_data``: keeps the Data pytree structure stable across steps).

  Host numpy leaves — make_data ships the whole Data in one transfer."""
  lay = contact_layout(m)
  n = lay.ncon
  npdt = np.dtype(dtype)
  z = lambda *s: np.zeros(s, dtype=npdt)
  return Contact(
      dist=np.full((n,), _BIG, dtype=npdt), pos=z(n, 3),
      frame=np.tile(np.eye(3, dtype=npdt), (n, 1, 1)),
      includemargin=z(n), margin=z(n), friction=z(n, 5), solref=z(n, 2),
      solreffriction=z(n, 2), solimp=z(n, 5),
      geom1=np.zeros(n, np.int32), geom2=np.zeros(n, np.int32),
      efc_address=lay.efc_address, dim=lay.dim,
      bary_body=(np.zeros((n, 2, _bary_w_of(m)), np.int32)
                 if lay.has_bary else None),
      bary_w=(np.zeros((n, 2, _bary_w_of(m)), npdt)
              if lay.has_bary else None),
  )
