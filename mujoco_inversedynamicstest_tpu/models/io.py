"""Host-side model pipeline: MJCF -> compiled ``Model`` pytree.

Strategy (SURVEY.md §7 step 2): MJCF parsing and compilation are delegated to
the reference's own battle-tested compiler via the ``mujoco`` pip package
(reference ``src/user/user_model.cc:3938`` ``mjCModel::Compile``); this module
converts the resulting ``mujoco.MjModel`` into our TPU-native flat-SoA
pytree and precomputes the static tree-level metadata that drives level-wise
vectorized kinematics/dynamics.

The conversion is the single host<->framework interop point, mirroring MJX's
``put_model`` (reference ``mjx/mujoco/mjx/_src/io.py``) but with our own
layout: dense mass matrix, level-wise tree tables, branchless joint selects.
"""

from __future__ import annotations

import os

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    BiasType,
    ConeType,
    Data,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    JointType,
    Model,
    ObjType,
    Option,
    SensorType,
    SolverType,
    TreeLayout,
    TrnType,
)


def default_dtype():
  return jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32


def _np(x) -> np.ndarray:
  return np.array(x)


def _jx(x, dtype) -> np.ndarray:
  """Numeric model leaf: HOST numpy, not a device array.

  Model leaves are closure constants of every jitted step — as device
  arrays, MLIR lowering must fetch each one back from the device to embed
  it (~1s per constant through a remote-TPU tunnel; measured 56s of a 62s
  humanoid step trace).  As numpy they embed zero-copy, and XLA stages
  them to the device with the executable exactly as before.
  """
  return np.asarray(np.array(x), dtype=np.dtype(dtype))


def build_tree_layout(
    body_parentid: np.ndarray,
    body_jntnum: np.ndarray,
    dof_parentid: np.ndarray,
    body_dofadr: np.ndarray = None,
    body_dofnum: np.ndarray = None,
) -> TreeLayout:
  """Computes level-wise tree tables from parent-id arrays.

  Bodies at equal depth are mutually independent given their parents, so each
  level is one fully-vectorized update; levels are unrolled at trace time.
  The dof ancestor mask encodes the mass-matrix sparsity pattern implied by
  ``dof_parentid`` chains (reference ``src/engine/engine_core_smooth.c:1353``
  ``mj_crb``: M[i,j] nonzero iff j is an ancestor-or-self of i).
  """
  nbody = len(body_parentid)
  nv = len(dof_parentid)

  depth = np.zeros(nbody, dtype=np.int32)
  for i in range(1, nbody):
    depth[i] = depth[body_parentid[i]] + 1
  max_depth = int(depth.max()) if nbody > 1 else 0

  body_levels = tuple(
      np.nonzero(depth == lvl)[0].astype(np.int32)
      for lvl in range(1, max_depth + 1)
  )
  level_max_jnts = tuple(
      int(body_jntnum[lvl_bodies].max()) if len(lvl_bodies) else 0
      for lvl_bodies in body_levels
  )

  # dof tree depth + ancestor chains
  dof_depth = np.zeros(nv, dtype=np.int32)
  ancestors = []
  for i in range(nv):
    chain = []
    j = i
    while j != -1:
      chain.append(j)
      j = dof_parentid[j]
    dof_depth[i] = len(chain) - 1
    ancestors.append(chain)  # [i, parent, grandparent, ... root]

  max_dof_depth = int(dof_depth.max()) + 1 if nv else 0
  dof_levels = tuple(
      np.nonzero(dof_depth == lvl)[0].astype(np.int32)
      for lvl in range(max_dof_depth)
  )

  ancestor_mask = np.zeros((nv, nv), dtype=bool)
  for i, chain in enumerate(ancestors):
    ancestor_mask[i, chain] = True

  dof_ancestors = np.full((nv, max_dof_depth), -1, dtype=np.int32)
  for i, chain in enumerate(ancestors):
    dof_ancestors[i, : len(chain)] = chain

  # dof j moves body b iff j belongs to b or one of its ancestors
  body_dof_mask = np.zeros((nbody, nv), dtype=bool)
  if body_dofadr is not None:
    for b in range(nbody):
      a = b
      while a != 0:
        adr, num = body_dofadr[a], body_dofnum[a]
        body_dof_mask[b, adr : adr + num] = True
        a = body_parentid[a]

  return TreeLayout(
      body_dof_mask=body_dof_mask,
      body_levels=body_levels,
      level_max_jnts=level_max_jnts,
      ancestor_mask=ancestor_mask,
      dof_levels=dof_levels,
      dof_ancestors=dof_ancestors,
  )


def _geom_visible(mjm) -> np.ndarray:
  """Effective visibility (α > 0) per geom, resolving material overrides.

  Mirrors the invisibility exclusions of ``ray_eliminate`` (reference
  ``src/engine/engine_ray.c``).
  """
  if not mjm.ngeom:
    return np.zeros(0, dtype=bool)
  own = _np(mjm.geom_rgba)[:, 3] > 0
  matid = _np(mjm.geom_matid)
  if getattr(mjm, "nmat", 0):
    mat_alpha = _np(mjm.mat_rgba)[np.maximum(matid, 0), 3] > 0
    return np.where(matid >= 0, mat_alpha, own)
  return own


def put_option(mj_opt, dtype) -> Option:
  scal = lambda v: np.asarray(v, dtype=np.dtype(dtype))
  return Option(
      timestep=scal(mj_opt.timestep),
      gravity=_jx(mj_opt.gravity, dtype),
      wind=_jx(mj_opt.wind, dtype),
      magnetic=_jx(mj_opt.magnetic, dtype),
      density=scal(mj_opt.density),
      viscosity=scal(mj_opt.viscosity),
      impratio=scal(mj_opt.impratio),
      tolerance=scal(mj_opt.tolerance),
      ls_tolerance=scal(mj_opt.ls_tolerance),
      noslip_tolerance=scal(mj_opt.noslip_tolerance),
      integrator=int(mj_opt.integrator),
      cone=int(mj_opt.cone),
      solver=int(mj_opt.solver),
      iterations=int(mj_opt.iterations),
      ls_iterations=int(mj_opt.ls_iterations),
      noslip_iterations=int(mj_opt.noslip_iterations),
      disableflags=int(mj_opt.disableflags),
      enableflags=int(mj_opt.enableflags),
  )


def _custom_numeric(mjm, name: str, default: int = -1) -> int:
  """Reads an MJX-convention ``<numeric>`` custom (max_contact_points /
  max_geom_pairs, reference ``mjx/mujoco/mjx/_src/collision_driver.py:336``).
  """
  import mujoco

  for i in range(mjm.nnumeric):
    n = mujoco.mj_id2name(mjm, mujoco.mjtObj.mjOBJ_NUMERIC, i)
    if n == name:
      return int(mjm.numeric_data[mjm.numeric_adr[i]])
  return default


def _build_mesh_hulls(mjm):
  """Convex hull topology per mesh (only when a mesh can collide)."""
  if mjm.nmesh == 0:
    return ()
  from mujoco_inversedynamicstest_tpu.ops import hull as hull_mod

  needed = False
  for g in range(mjm.ngeom):
    if mjm.geom_type[g] == 7 and (  # mjGEOM_MESH
        mjm.geom_contype[g] or mjm.geom_conaffinity[g]):
      needed = True
  for k in range(mjm.npair):
    if 7 in (mjm.geom_type[mjm.pair_geom1[k]],
             mjm.geom_type[mjm.pair_geom2[k]]):
      needed = True
  if not needed:
    return ()
  return hull_mod.mesh_hulls(mjm)


def _build_plugins(mjm, dtype):
  """Engine plugin instances via the registry (mjpPlugin analog)."""
  if not getattr(mjm, "nplugin", 0):
    return ()
  from mujoco_inversedynamicstest_tpu.plugins import build_instances

  return build_instances(mjm, dtype)


def _build_mesh_tris(mjm):
  """Full-surface triangle vertices per mesh, for ray casting.

  Ray-mesh needs the true (possibly concave) surface; built only when a
  rangefinder sensor exists (the one consumer).  Mesh canonical frame ==
  geom frame (the compiler folds mesh_pos/quat into geom_pos/quat).
  """
  if mjm.nmesh == 0:
    return ()
  if not any(mjm.sensor_type[i] == int(SensorType.RANGEFINDER)
             for i in range(mjm.nsensor)):
    return ()
  tris = []
  for i in range(mjm.nmesh):
    va, fa = int(mjm.mesh_vertadr[i]), int(mjm.mesh_faceadr[i])
    fn = int(mjm.mesh_facenum[i])
    face = np.array(mjm.mesh_face[fa:fa + fn], dtype=np.int64)
    vert = np.array(mjm.mesh_vert).reshape(-1, 3)
    tris.append(np.ascontiguousarray(vert[va + face]))  # (T, 3, 3)
  return tuple(tris)


# sensor types the sensor pipeline implements (ops/sensor.py); anything
# else must fail at put_model, not at trace time
_SUPPORTED_SENSORS = frozenset({
    SensorType.JOINTPOS, SensorType.TENDONPOS, SensorType.ACTUATORPOS,
    SensorType.BALLQUAT, SensorType.MAGNETOMETER, SensorType.FRAMEPOS,
    SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS,
    SensorType.FRAMEQUAT, SensorType.SUBTREECOM, SensorType.JOINTLIMITPOS,
    SensorType.TENDONLIMITPOS, SensorType.E_POTENTIAL, SensorType.E_KINETIC,
    SensorType.CLOCK, SensorType.JOINTVEL, SensorType.TENDONVEL,
    SensorType.ACTUATORVEL, SensorType.BALLANGVEL, SensorType.VELOCIMETER,
    SensorType.GYRO, SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL,
    SensorType.SUBTREELINVEL, SensorType.SUBTREEANGMOM,
    SensorType.JOINTLIMITVEL, SensorType.TENDONLIMITVEL,
    SensorType.ACTUATORFRC, SensorType.JOINTACTFRC,
    SensorType.ACCELEROMETER, SensorType.FORCE, SensorType.TORQUE,
    SensorType.FRAMELINACC, SensorType.FRAMEANGACC,
    SensorType.JOINTLIMITFRC, SensorType.TENDONLIMITFRC,
    SensorType.TOUCH, SensorType.RANGEFINDER, SensorType.CAMPROJECTION,
    SensorType.GEOMDIST, SensorType.GEOMNORMAL, SensorType.GEOMFROMTO,
})


def _put_flex(mjm, dtype) -> dict:
  """Flex (deformable) model fields, with local vert/edge indices rebased
  to global and the triangular per-element stiffness unpacked into a dense
  metric tensor (ref ``engine_passive.c:239-252``)."""
  nflex = int(getattr(mjm, "nflex", 0))
  if not nflex:
    return {}
  nvert, nedge, nelem = int(mjm.nflexvert), int(mjm.nflexedge), int(
      mjm.nflexelem)
  dim = _np(mjm.flex_dim)
  vertadr, edgeadr = _np(mjm.flex_vertadr), _np(mjm.flex_edgeadr)
  elemadr, elemnum = _np(mjm.flex_elemadr), _np(mjm.flex_elemnum)

  # edges: local vert index -> global
  edge = _np(mjm.flex_edge).reshape(nedge, 2).copy()
  vertflexid = np.zeros(nvert, dtype=np.int32)
  for f in range(nflex):
    edge[edgeadr[f]:edgeadr[f] + mjm.flex_edgenum[f]] += vertadr[f]
    vertflexid[vertadr[f]:vertadr[f] + mjm.flex_vertnum[f]] = f

  # elements: ragged (dim+1) vert lists and edge-per-element lists, padded
  nvpe = int(dim.max()) + 1                      # verts per element (max)
  nepe = {1: 1, 2: 3, 3: 6}[int(dim.max())]      # edges per element (max)
  elem = np.full((nelem, nvpe), -1, dtype=np.int32)
  elemedge = np.full((nelem, nepe), -1, dtype=np.int32)
  flat_elem = _np(mjm.flex_elem)
  flat_ee = _np(getattr(mjm, "flex_elemedge", np.zeros(0)))
  for f in range(nflex):
    dvpe, depe = dim[f] + 1, {1: 1, 2: 3, 3: 6}[int(dim[f])]
    base = _np(mjm.flex_elemdataadr)[f]
    eebase = _np(mjm.flex_elemedgeadr)[f]
    for e in range(elemnum[f]):
      elem[elemadr[f] + e, :dvpe] = (
          flat_elem[base + e * dvpe:base + (e + 1) * dvpe] + vertadr[f])
      if flat_ee.size:
        elemedge[elemadr[f] + e, :depe] = (
            flat_ee[eebase + e * depe:eebase + (e + 1) * depe] + edgeadr[f])

  # dense metric from triangular flex_stiffness (21 floats/element; empty
  # when the model has no flex elasticity).  For trilinear (interp)
  # flexes the same buffer holds the (3N, 3N) nodal stretch-frame matrix
  # instead (``mj_passive`` reads it at ``21*elemadr``,
  # engine_passive.c:147) — extracted separately, element metric zero.
  interp = _np(getattr(mjm, "flex_interp", np.zeros(nflex, np.int64)))
  stiff = _np(mjm.flex_stiffness)
  metric = np.zeros((nelem, nepe, nepe))
  nodal_stiff = []
  if interp.any():
    nodenum = _np(mjm.flex_nodenum)
    for f in range(nflex):
      if not interp[f]:
        nodal_stiff.append(np.zeros((0, 0)))
        continue
      n3 = 3 * int(nodenum[f])
      base = 21 * int(elemadr[f])
      nodal_stiff.append(stiff[base:base + n3 * n3].reshape(n3, n3))
  else:
    stiff = (stiff.reshape(nelem, 21) if stiff.size
             else np.zeros((nelem, 21)))
    for f in range(nflex):
      if dim[f] == 1 or mjm.flex_rigid[f]:
        continue
      depe = {1: 1, 2: 3, 3: 6}[int(dim[f])]
      r, c = np.triu_indices(depe)
      sl = slice(elemadr[f], elemadr[f] + elemnum[f])
      metric[sl, r, c] = stiff[sl, :len(r)]
      metric[sl, c, r] = stiff[sl, :len(r)]

  # trilinear interpolation weights: W[v, j] = prod over axes of
  # (coord or 1-coord) selected by node index bits (mj_flex,
  # engine_core_smooth.c:496: bit0 -> z, bit1 -> y, bit2 -> x)
  interp_w = []
  if interp.any():
    vert0 = _np(mjm.flex_vert0).reshape(nvert, 3)
    nodenum = _np(mjm.flex_nodenum)
    for f in range(nflex):
      if not interp[f]:
        interp_w.append(np.zeros((0, 0)))
        continue
      nn = int(nodenum[f])
      co = vert0[vertadr[f]:vertadr[f] + mjm.flex_vertnum[f]]
      j = np.arange(nn)
      wz = np.where(j & 1, co[:, 2:3], 1 - co[:, 2:3])
      wy = np.where(j & 2, co[:, 1:2], 1 - co[:, 1:2])
      wx = np.where(j & 4, co[:, 0:1], 1 - co[:, 0:1])
      interp_w.append(wx * wy * wz)

  return dict(
      flex_interp_np=interp,
      flex_nodeadr_np=_np(getattr(mjm, "flex_nodeadr", np.zeros(nflex))),
      flex_nodenum_np=_np(getattr(mjm, "flex_nodenum", np.zeros(nflex))),
      flex_nodebodyid_np=_np(getattr(mjm, "flex_nodebodyid", np.zeros(0))),
      flex_interp_w=tuple(interp_w),
      flex_node0=_jx(getattr(mjm, "flex_node0", np.zeros((0, 3))), dtype),
      flex_stiffness_nodal=tuple(_jx(k, dtype) for k in nodal_stiff),
      has_flex_nodal_elasticity=bool(
          any(np.abs(k).max() > 0 for k in nodal_stiff if k.size)),
      flex_vert=_jx(mjm.flex_vert, dtype),
      flexedge_length0=_jx(mjm.flexedge_length0, dtype),
      flexedge_invweight0=_jx(mjm.flexedge_invweight0, dtype),
      flex_edgestiffness=_jx(mjm.flex_edgestiffness, dtype),
      flex_edgedamping=_jx(mjm.flex_edgedamping, dtype),
      flex_damping=_jx(mjm.flex_damping, dtype),
      flex_metric=_jx(metric, dtype),
      flex_radius=_jx(mjm.flex_radius, dtype),
      flex_friction=_jx(mjm.flex_friction, dtype),
      flex_solref=_jx(mjm.flex_solref, dtype),
      flex_solimp=_jx(mjm.flex_solimp, dtype),
      flex_margin=_jx(mjm.flex_margin, dtype),
      flex_gap=_jx(mjm.flex_gap, dtype),
      flex_solmix=_jx(mjm.flex_solmix, dtype),
      flex_vertbodyid=_np(mjm.flex_vertbodyid),
      flex_vertadr=vertadr,
      flex_vertnum=_np(mjm.flex_vertnum),
      flex_edgeadr=edgeadr,
      flex_edgenum=_np(mjm.flex_edgenum),
      flex_edge=edge,
      flexedge_rigid=_np(mjm.flexedge_rigid).astype(bool),
      flex_elem=elem,
      flex_elemedge=elemedge,
      flex_elemadr=elemadr,
      flex_elemnum=elemnum,
      flex_dim=dim,
      flex_centered=_np(mjm.flex_centered).astype(bool),
      flex_rigid=_np(mjm.flex_rigid).astype(bool),
      flex_edgeequality=_np(mjm.flex_edgeequality).astype(bool),
      flex_contype=_np(mjm.flex_contype),
      flex_conaffinity=_np(mjm.flex_conaffinity),
      flex_condim=_np(mjm.flex_condim),
      flex_priority=_np(mjm.flex_priority),
      flex_vertflexid=vertflexid,
      flex_elemlayer_np=_np(mjm.flex_elemlayer),
      flex_internal_np=_np(mjm.flex_internal).astype(bool),
      flex_selfcollide_np=_np(mjm.flex_selfcollide),
      flex_evpair_np=(_np(mjm.flex_evpair).reshape(-1, 2)
                      if int(getattr(mjm, "nflexevpair", 0))
                      else np.zeros((0, 2), np.int32)),
      flex_evpairadr_np=_np(mjm.flex_evpairadr),
      flex_evpairnum_np=_np(mjm.flex_evpairnum),
      has_flex_elasticity=bool(np.any(np.abs(metric) > 0)),
      has_flex_edge_sd=bool(
          np.any(_np(mjm.flex_edgestiffness) > 0)
          | np.any(_np(mjm.flex_edgedamping) > 0)),
  )


def validate_model(mjm, _user_sensor_ok: bool = False) -> None:
  """Raises NotImplementedError for any feature this engine cannot
  simulate faithfully — at load time, never silently.

  The feature-parity enforcement point, mirroring MJX's put_model device
  guards (reference ``mjx/mujoco/mjx/_src/io.py:47-153``): a model either
  loads and simulates with reference semantics, or refuses to load.
  ``_user_sensor_ok``: set by put_model when a user_sensor_fn is supplied.
  """
  import mujoco

  def bad(msg):
    raise NotImplementedError(f"unsupported by the TPU engine: {msg}")

  for jt in _np(mjm.jnt_type):
    JointType(jt)  # raises on unsupported joint types

  if mjm.opt.enableflags & EnableBit.OVERRIDE:
    bad("contact override (o_margin/o_solref/o_solimp, flag override)")

  any_interp = any(mjm.flex_interp[f] for f in range(getattr(mjm, "nflex", 0)))
  for f in range(getattr(mjm, "nflex", 0)):
    # trilinear nodal interpolation is supported for the configurations
    # the flexcomp generator emits (user_flexcomp.cc dof="trilinear"):
    # centered 8-node flexes, no internal/self contacts, all flexes
    # interp or none (mixed models would need split vertex-geom maps)
    if mjm.flex_interp[f]:
      if mjm.flex_interp[f] != 1 or int(mjm.flex_nodenum[f]) != 8:
        bad("flex interpolation order beyond trilinear (8 nodes)")
      if not mjm.flex_centered[f]:
        bad("non-centered trilinear flex nodes")
      if mjm.flex_internal[f]:
        bad("internal contacts on a trilinear flex")
      if mjm.flex_selfcollide[f] not in (0,):
        bad("self-collision on a trilinear flex")
    elif any_interp:
      bad("mixed trilinear and vertex-dof flexes in one model")
    # flex self-collision: simulated as a static element-pair budget
    # (ops/flexcol.py 'selfpair' groups; ref mj_collideElems,
    # engine_collision_driver.c:469) — all mjFLEXSELF midphase modes map
    # to the same runtime top-k candidate set (midphase choice is a CPU
    # performance knob, not a semantics change)
    # flex internal contacts (element-vertex evpairs + dim-3 within-tet
    # faces) are simulated at element level (ops/flexcol.py; ref
    # mj_collideFlexInternal, engine_collision_driver.c:1726) — the
    # MJCF default internal="true" loads unedited
  if getattr(mjm, "nplugin", 0):
    # resolvable through the plugin registry (build_instances raises for
    # unknown names); actually built in put_model
    from mujoco_inversedynamicstest_tpu.plugins import registry as _preg

    for i in range(int(mjm.nplugin)):
      name = _preg.plugin_name_at_slot(int(mjm.plugin[i]))
      if name not in _preg.registered_plugins():
        bad(f"engine plugin '{name}'")

  for i in range(mjm.nsensor):
    try:
      t = SensorType(mjm.sensor_type[i])
    except ValueError:
      t = None
    if t == SensorType.PLUGIN:
      # instance registration is checked above; whether the registered
      # port implements the sensor hook is checked after build_instances
      # in put_model (the plugin objects don't exist yet here)
      continue
    if t == SensorType.USER:
      if not _user_sensor_ok:
        bad("USER sensor without a user_sensor_fn (pass a traceable "
            "(m, d, sensor_id) -> (dim,) callback to put_model — the "
            "mjcb_sensor analog)")
      continue
    if t is None or t not in _SUPPORTED_SENSORS:
      name = mujoco.mjtSensor(mjm.sensor_type[i]).name
      bad(f"sensor type {name}")
    if t in (SensorType.GEOMDIST, SensorType.GEOMNORMAL,
             SensorType.GEOMFROMTO):
      # every geom pair the sensor can query must have a supported
      # narrowphase — otherwise geom_distance would raise at trace time
      from mujoco_inversedynamicstest_tpu.ops.collision import _PAIR_SLOTS

      def geom_set(ot, oi):
        if ot == int(ObjType.BODY):
          return range(int(mjm.body_geomadr[oi]),
                       int(mjm.body_geomadr[oi]) + int(mjm.body_geomnum[oi]))
        return [int(oi)]

      for g1 in geom_set(mjm.sensor_objtype[i], mjm.sensor_objid[i]):
        for g2 in geom_set(mjm.sensor_reftype[i], mjm.sensor_refid[i]):
          t1, t2 = sorted((int(mjm.geom_type[g1]), int(mjm.geom_type[g2])))
          if (GeomType(t1), GeomType(t2)) not in _PAIR_SLOTS:
            bad(f"geomdist sensor over unsupported geom pair "
                f"{GeomType(t1).name}-{GeomType(t2).name}")
    if t in (SensorType.FRAMEPOS, SensorType.FRAMEQUAT,
             SensorType.FRAMEXAXIS, SensorType.FRAMEYAXIS,
             SensorType.FRAMEZAXIS, SensorType.FRAMELINVEL,
             SensorType.FRAMEANGVEL, SensorType.FRAMELINACC,
             SensorType.FRAMEANGACC):
      for ot in (mjm.sensor_objtype[i], max(mjm.sensor_reftype[i], 0)):
        if ot not in (int(ObjType.UNKNOWN), int(ObjType.BODY),
                      int(ObjType.XBODY), int(ObjType.GEOM),
                      int(ObjType.SITE), int(ObjType.CAMERA)):
          bad(f"frame sensor attached to objtype {ot}")

  for i in range(mjm.neq):
    # DISTANCE was removed from the reference in MuJoCo 2.2.2 (its own
    # reader throws, xml_native_reader.cc:2011) — n/a by design
    if mjm.eq_type[i] not in (int(EqType.CONNECT), int(EqType.WELD),
                              int(EqType.JOINT), int(EqType.TENDON),
                              int(EqType.FLEX)):
      bad(f"equality constraint type {mujoco.mjtEq(mjm.eq_type[i]).name}")

  for i in range(mjm.nu):
    tt = mjm.actuator_trntype[i]
    if tt not in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT),
                  int(TrnType.TENDON), int(TrnType.SITE),
                  int(TrnType.SLIDERCRANK), int(TrnType.BODY)):
      bad(f"actuator transmission {mujoco.mjtTrn(tt).name}")
    if mjm.actuator_dyntype[i] not in (
        int(DynType.NONE), int(DynType.INTEGRATOR), int(DynType.FILTER),
        int(DynType.FILTEREXACT), int(DynType.MUSCLE)):
      bad(f"actuator dyntype {mujoco.mjtDyn(mjm.actuator_dyntype[i]).name}")
    if mjm.actuator_gaintype[i] not in (
        int(GainType.FIXED), int(GainType.AFFINE), int(GainType.MUSCLE)):
      bad(f"actuator gaintype "
          f"{mujoco.mjtGain(mjm.actuator_gaintype[i]).name}")
    if mjm.actuator_biastype[i] not in (
        int(BiasType.NONE), int(BiasType.AFFINE), int(BiasType.MUSCLE)):
      bad(f"actuator biastype "
          f"{mujoco.mjtBias(mjm.actuator_biastype[i]).name}")



def put_model(mjm, dtype=None, _keep_source: bool = True,
              user_sensor_fn=None) -> Model:
  """Converts a ``mujoco.MjModel`` into the TPU-native ``Model`` pytree.

  ``user_sensor_fn``: traceable ``(m, d, sensor_id) -> (dim,)`` callback
  evaluated for each ``mjSENS_USER`` sensor at its declared needstage —
  the ``mjcb_sensor`` analog (ref ``engine_callback.c``).
  """
  dtype = dtype or default_dtype()

  validate_model(mjm, _user_sensor_ok=user_sensor_fn is not None)

  tree = build_tree_layout(
      _np(mjm.body_parentid), _np(mjm.body_jntnum), _np(mjm.dof_parentid),
      _np(mjm.body_dofadr), _np(mjm.body_dofnum),
  )

  m = Model(
      nq=int(mjm.nq),
      nv=int(mjm.nv),
      nu=int(mjm.nu),
      na=int(mjm.na),
      nbody=int(mjm.nbody),
      njnt=int(mjm.njnt),
      ngeom=int(mjm.ngeom),
      nsite=int(mjm.nsite),
      ncam=int(mjm.ncam),
      nmocap=int(mjm.nmocap),
      neq=int(mjm.neq),
      ntendon=int(mjm.ntendon),
      nwrap=int(mjm.nwrap),
      nsensor=int(mjm.nsensor),
      nsensordata=int(mjm.nsensordata),
      nflexvert=int(getattr(mjm, "nflexvert", 0)),
      nflex=int(getattr(mjm, "nflex", 0)),
      nflexedge=int(getattr(mjm, "nflexedge", 0)),
      nflexelem=int(getattr(mjm, "nflexelem", 0)),
      **_put_flex(mjm, dtype),
      nmesh=int(mjm.nmesh),
      opt=put_option(mjm.opt, dtype),
      tree=tree,
      body_pos=_jx(mjm.body_pos, dtype),
      body_quat=_jx(mjm.body_quat, dtype),
      body_ipos=_jx(mjm.body_ipos, dtype),
      body_iquat=_jx(mjm.body_iquat, dtype),
      body_mass=_jx(mjm.body_mass, dtype),
      body_subtreemass=_jx(mjm.body_subtreemass, dtype),
      body_inertia=_jx(mjm.body_inertia, dtype),
      body_gravcomp=_jx(mjm.body_gravcomp, dtype),
      body_invweight0=_jx(mjm.body_invweight0, dtype),
      body_parentid=_np(mjm.body_parentid),
      body_rootid=_np(mjm.body_rootid),
      body_weldid=_np(mjm.body_weldid),
      body_jntadr=_np(mjm.body_jntadr),
      body_jntnum=_np(mjm.body_jntnum),
      body_dofadr=_np(mjm.body_dofadr),
      body_dofnum=_np(mjm.body_dofnum),
      body_geomadr=_np(mjm.body_geomadr),
      body_geomnum=_np(mjm.body_geomnum),
      body_mocapid=_np(mjm.body_mocapid),
      jnt_pos=_jx(mjm.jnt_pos, dtype),
      jnt_axis=_jx(mjm.jnt_axis, dtype),
      jnt_stiffness=_jx(mjm.jnt_stiffness, dtype),
      jnt_range=_jx(mjm.jnt_range, dtype),
      jnt_actfrcrange=_jx(mjm.jnt_actfrcrange, dtype),
      jnt_margin=_jx(mjm.jnt_margin, dtype),
      jnt_solref=_jx(mjm.jnt_solref, dtype),
      jnt_solimp=_jx(mjm.jnt_solimp, dtype),
      jnt_type=_np(mjm.jnt_type),
      jnt_qposadr=_np(mjm.jnt_qposadr),
      jnt_dofadr=_np(mjm.jnt_dofadr),
      jnt_bodyid=_np(mjm.jnt_bodyid),
      jnt_limited=_np(mjm.jnt_limited),
      jnt_actfrclimited=_np(mjm.jnt_actfrclimited),
      jnt_actgravcomp=_np(mjm.jnt_actgravcomp),
      dof_armature=_jx(mjm.dof_armature, dtype),
      dof_damping=_jx(mjm.dof_damping, dtype),
      dof_invweight0=_jx(mjm.dof_invweight0, dtype),
      dof_frictionloss=_jx(mjm.dof_frictionloss, dtype),
      dof_solref=_jx(mjm.dof_solref, dtype),
      dof_solimp=_jx(mjm.dof_solimp, dtype),
      dof_M0=_jx(mjm.dof_M0, dtype),
      dof_bodyid=_np(mjm.dof_bodyid),
      dof_jntid=_np(mjm.dof_jntid),
      dof_parentid=_np(mjm.dof_parentid),
      geom_pos=_jx(mjm.geom_pos, dtype),
      geom_quat=_jx(mjm.geom_quat, dtype),
      geom_size=_jx(mjm.geom_size, dtype),
      geom_friction=_jx(mjm.geom_friction, dtype),
      geom_margin=_jx(mjm.geom_margin, dtype),
      geom_gap=_jx(mjm.geom_gap, dtype),
      geom_solref=_jx(mjm.geom_solref, dtype),
      geom_solimp=_jx(mjm.geom_solimp, dtype),
      geom_solmix=_jx(mjm.geom_solmix, dtype),
      geom_rbound=_jx(mjm.geom_rbound, dtype),
      geom_rbound_np=_np(mjm.geom_rbound),
      geom_plugin_np=_np(getattr(mjm, "geom_plugin",
                                 np.full(int(mjm.ngeom), -1))),
      geom_aabb_np=_np(mjm.geom_aabb).reshape(-1, 6),
      mesh_pos_np=(_np(mjm.mesh_pos).reshape(-1, 3)
                   if int(mjm.nmesh) else None),
      mesh_quat_np=(_np(mjm.mesh_quat).reshape(-1, 4)
                    if int(mjm.nmesh) else None),
      geom_fluid=_jx(mjm.geom_fluid, dtype),
      geom_fluid_active=_np(mjm.geom_fluid)[:, 0] > 0,
      geom_type=_np(mjm.geom_type),
      geom_dataid=_np(mjm.geom_dataid),
      geom_bodyid=_np(mjm.geom_bodyid),
      geom_group=_np(mjm.geom_group),
      geom_visible=_geom_visible(mjm),
      geom_contype=_np(mjm.geom_contype),
      geom_conaffinity=_np(mjm.geom_conaffinity),
      geom_condim=_np(mjm.geom_condim),
      geom_priority=_np(mjm.geom_priority),
      geom_flexid=np.full(int(mjm.ngeom), -1, np.int32),
      site_pos=_jx(mjm.site_pos, dtype),
      site_quat=_jx(mjm.site_quat, dtype),
      site_size=_jx(mjm.site_size, dtype),
      site_bodyid=_np(mjm.site_bodyid),
      site_type=_np(mjm.site_type),
      cam_pos=_jx(mjm.cam_pos, dtype),
      cam_quat=_jx(mjm.cam_quat, dtype),
      cam_mat0=_jx(mjm.cam_mat0, dtype).reshape(-1, 3, 3),
      cam_pos0=_jx(mjm.cam_pos0, dtype),
      cam_poscom0=_jx(mjm.cam_poscom0, dtype),
      cam_fovy=_jx(mjm.cam_fovy, dtype),
      cam_intrinsic=_jx(mjm.cam_intrinsic, dtype),
      cam_sensorsize=_jx(mjm.cam_sensorsize, dtype),
      cam_bodyid=_np(mjm.cam_bodyid),
      cam_targetbodyid=_np(mjm.cam_targetbodyid),
      cam_mode=_np(mjm.cam_mode),
      cam_resolution=_np(mjm.cam_resolution),
      actuator_gear=_jx(mjm.actuator_gear, dtype),
      actuator_ctrlrange=_jx(mjm.actuator_ctrlrange, dtype),
      actuator_forcerange=_jx(mjm.actuator_forcerange, dtype),
      actuator_actrange=_jx(mjm.actuator_actrange, dtype),
      actuator_gainprm=_jx(mjm.actuator_gainprm, dtype),
      actuator_biasprm=_jx(mjm.actuator_biasprm, dtype),
      actuator_dynprm=_jx(mjm.actuator_dynprm, dtype),
      actuator_cranklength=_jx(mjm.actuator_cranklength, dtype),
      actuator_length0=_jx(mjm.actuator_length0, dtype),
      actuator_lengthrange=_jx(mjm.actuator_lengthrange, dtype),
      actuator_acc0=_jx(mjm.actuator_acc0, dtype),
      actuator_trntype=_np(mjm.actuator_trntype),
      actuator_dyntype=_np(mjm.actuator_dyntype),
      actuator_gaintype=_np(mjm.actuator_gaintype),
      actuator_biastype=_np(mjm.actuator_biastype),
      actuator_trnid=_np(mjm.actuator_trnid),
      actuator_actadr=_np(mjm.actuator_actadr),
      actuator_actnum=_np(mjm.actuator_actnum),
      actuator_ctrllimited=_np(mjm.actuator_ctrllimited),
      actuator_forcelimited=_np(mjm.actuator_forcelimited),
      actuator_actlimited=_np(mjm.actuator_actlimited),
      actuator_actearly=_np(mjm.actuator_actearly),
      eq_data=_jx(mjm.eq_data, dtype),
      eq_solref=_jx(mjm.eq_solref, dtype),
      eq_solimp=_jx(mjm.eq_solimp, dtype),
      eq_type=_np(mjm.eq_type),
      eq_obj1id=_np(mjm.eq_obj1id),
      eq_obj2id=_np(mjm.eq_obj2id),
      eq_objtype=_np(mjm.eq_objtype),
      eq_active0=_np(mjm.eq_active0),
      tendon_stiffness=_jx(mjm.tendon_stiffness, dtype),
      tendon_damping=_jx(mjm.tendon_damping, dtype),
      tendon_frictionloss=_jx(mjm.tendon_frictionloss, dtype),
      tendon_lengthspring=_jx(mjm.tendon_lengthspring, dtype),
      tendon_length0=_jx(mjm.tendon_length0, dtype),
      tendon_invweight0=_jx(mjm.tendon_invweight0, dtype),
      tendon_range=_jx(mjm.tendon_range, dtype),
      tendon_margin=_jx(mjm.tendon_margin, dtype),
      tendon_solref_lim=_jx(mjm.tendon_solref_lim, dtype),
      tendon_solimp_lim=_jx(mjm.tendon_solimp_lim, dtype),
      tendon_solref_fri=_jx(mjm.tendon_solref_fri, dtype),
      tendon_solimp_fri=_jx(mjm.tendon_solimp_fri, dtype),
      wrap_prm=_jx(mjm.wrap_prm, dtype),
      tendon_adr=_np(mjm.tendon_adr),
      tendon_num=_np(mjm.tendon_num),
      tendon_limited=_np(mjm.tendon_limited),
      wrap_type=_np(mjm.wrap_type),
      wrap_objid=_np(mjm.wrap_objid),
      wrap_prm_np=_np(mjm.wrap_prm),
      sensor_cutoff=_jx(mjm.sensor_cutoff, dtype),
      sensor_type=_np(mjm.sensor_type),
      sensor_datatype=_np(mjm.sensor_datatype),
      sensor_objtype=_np(mjm.sensor_objtype),
      sensor_objid=_np(mjm.sensor_objid),
      sensor_reftype=_np(mjm.sensor_reftype),
      sensor_refid=_np(mjm.sensor_refid),
      sensor_adr=_np(mjm.sensor_adr),
      sensor_dim=_np(mjm.sensor_dim),
      sensor_needstage=_np(mjm.sensor_needstage),
      sensor_plugin=_np(getattr(mjm, "sensor_plugin",
                                np.full(int(mjm.nsensor), -1))),
      user_sensor_fn=user_sensor_fn,
      qpos0=_jx(mjm.qpos0, dtype),
      qpos_spring=_jx(mjm.qpos_spring, dtype),
      stat_meaninertia=np.asarray(mjm.stat.meaninertia,
                                  dtype=np.dtype(dtype)),
      pair_dim=_np(mjm.pair_dim),
      pair_geom1=_np(mjm.pair_geom1),
      pair_geom2=_np(mjm.pair_geom2),
      pair_solref=_jx(mjm.pair_solref, dtype),
      pair_solreffriction=_jx(mjm.pair_solreffriction, dtype),
      pair_solimp=_jx(mjm.pair_solimp, dtype),
      pair_margin=_jx(mjm.pair_margin, dtype),
      pair_gap=_jx(mjm.pair_gap, dtype),
      pair_friction=_jx(mjm.pair_friction, dtype),
      exclude_signature=_np(mjm.exclude_signature),
      mesh_hull=_build_mesh_hulls(mjm),
      mesh_tris=_build_mesh_tris(mjm),
      plugin_hooks=_build_plugins(mjm, dtype),
      nhfield=int(getattr(mjm, "nhfield", 0)),
      hfield_nrow=_np(mjm.hfield_nrow) if getattr(mjm, "nhfield", 0) else None,
      hfield_ncol=_np(mjm.hfield_ncol) if getattr(mjm, "nhfield", 0) else None,
      hfield_size=_np(mjm.hfield_size) if getattr(mjm, "nhfield", 0) else None,
      hfield_data=tuple(
          np.array(mjm.hfield_data[
              int(mjm.hfield_adr[h]):
              int(mjm.hfield_adr[h])
              + int(mjm.hfield_nrow[h]) * int(mjm.hfield_ncol[h])],
              dtype=np.float64).reshape(
                  int(mjm.hfield_nrow[h]), int(mjm.hfield_ncol[h]))
          for h in range(int(getattr(mjm, "nhfield", 0)))),
      max_contact_points=_custom_numeric(mjm, "max_contact_points"),
      max_geom_pairs=_custom_numeric(mjm, "max_geom_pairs"),
      has_dof_damping=bool(np.any(_np(mjm.dof_damping) > 0)),
      has_fluid=bool(
          mjm.opt.density > 0 or mjm.opt.viscosity > 0
          or np.any(np.asarray(mjm.opt.wind) != 0)
      ),
      dof_frictionloss_nz=_np(mjm.dof_frictionloss) > 0,
      tendon_frictionloss_nz=_np(mjm.tendon_frictionloss) > 0,
      _source=mjm if _keep_source else None,
  )

  if m.nflex:
    m = _append_flex_geoms(m, mjm, dtype)

  # PLUGIN sensors must resolve to a port that implements the sensor hook
  from mujoco_inversedynamicstest_tpu.plugins.registry import PluginInstance

  for i in range(m.nsensor):
    if m.sensor_type[i] == int(SensorType.PLUGIN):
      inst = m.plugin_hooks[int(m.sensor_plugin[i])]
      if type(inst).sensor is PluginInstance.sensor:
        raise NotImplementedError(
            f"unsupported by the TPU engine: sensor plugin '{inst.name}' "
            "(port does not implement the sensor hook)")

  # SDF geoms must resolve to a port exposing a distance function
  for g in range(m.ngeom):
    if m.geom_type[g] == int(GeomType.SDF):
      pid = int(m.geom_plugin_np[g])
      if pid < 0 or not hasattr(m.plugin_hooks[pid], "sdf"):
        name = m.plugin_hooks[pid].name if pid >= 0 else "<none>"
        raise NotImplementedError(
            f"unsupported by the TPU engine: SDF geom backed by plugin "
            f"'{name}' (port does not expose an sdf distance function)")

  # unsupported geom-pair signatures must also fail at load, not at trace
  from mujoco_inversedynamicstest_tpu.ops.collision import contact_layout

  contact_layout(m)
  return m


def _append_flex_geoms(m: Model, mjm, dtype) -> Model:
  """Appends one virtual SPHERE collision geom per flex vertex.

  TPU-first re-design of flex collision: the reference narrowphases flex
  *elements* (triangles/tetrahedra inflated by flex_radius) against geoms
  through a dynamic BVH midphase (``mj_collideFlexSAP``,
  ``engine_collision_driver.c:458``).  Here each vertex becomes a static
  sphere geom of radius ``flex_radius`` attached to the vertex body at the
  vertex's body-local coordinates — the whole existing static-shape
  collision pipeline (pair table, broadphase top-k, sphere narrowphase,
  contact rows, budgeting) then applies unchanged.  For the dense vertex
  grids flexcomp produces, the union of vertex spheres closely tracks the
  inflated element surface; contact positions differ from the reference's
  element-interior contacts (documented approximation).  Same-flex
  vertex-vertex pairs are excluded (selfcollide="none" is the supported
  and validated mode).
  """
  # trilinear flexes have no vertex bodies (flex_vertbodyid = -1);
  # their collision runs entirely through runtime element groups
  # (ops/flexcol.py geom_elem + plane_vert kinds) — no vertex geoms
  if m.flex_interp_np is not None and np.all(m.flex_interp_np != 0):
    return m

  nvert = m.nflexvert
  vflex = m.flex_vertflexid
  contype = m.flex_contype[vflex]
  conaff = m.flex_conaffinity[vflex]

  # sphere/capsule/box partners collide at element level (ops/flexcol.py)
  # with no concave gaps, cylinder/ellipsoid partners at element level on
  # dim-2 cloth; other combinations (mesh partners, cylinder/ellipsoid vs
  # cables/tets) keep the vertex-sphere approximation, which leaves gaps
  # between adjacent spheres where the reference's element narrowphase
  # (mjc_ConvexElem) would contact.  Surface the remaining failure mode
  # at load.
  import warnings

  from mujoco_inversedynamicstest_tpu.ops import flexcol

  gtype_np = np.asarray(mjm.geom_type)
  for f in range(int(mjm.nflex)):
    if not (mjm.flex_contype[f] & mjm.flex_conaffinity[f]):
      continue
    if int(mjm.flex_dim[f]) < 1:
      continue
    covered = [int(GeomType.PLANE)] + [
        t for t in flexcol._ELEM_PARTNER_TYPES
        if flexcol.uses_elem_narrowphase(m, f, t)]
    if not bool(np.any(~np.isin(gtype_np, covered))):
      continue
    ea, en = int(mjm.flex_edgeadr[f]), int(mjm.flex_edgenum[f])
    if en == 0:
      continue
    max_edge = float(np.max(mjm.flexedge_length0[ea:ea + en]))
    gap = max_edge / 2.0 - float(mjm.flex_radius[f])
    if gap > 0:
      warnings.warn(
          f"flex {f}: partner geom types outside the element-level set "
          f"use vertex-sphere collision, leaving up to {gap:.4g} m "
          f"concave gaps (edge {max_edge:.4g} m, radius "
          f"{float(mjm.flex_radius[f]):.4g} m); sphere/capsule/box/mesh "
          "(all dims) and cylinder/ellipsoid (dim-2) partners collide "
          "at element level and are unaffected",
          stacklevel=3)
  radius = np.asarray(m.flex_radius)[vflex]
  centered = m.flex_centered[vflex]
  local = np.where(centered[:, None], 0.0, np.asarray(m.flex_vert))

  cat = lambda a, b: np.concatenate(
      [np.asarray(a), np.asarray(b, dtype=np.asarray(a).dtype)])
  catn = np.concatenate
  size = np.zeros((nvert, 3))
  size[:, 0] = radius
  quat = np.tile(np.array([1.0, 0, 0, 0]), (nvert, 1))

  return m.replace(
      ngeom=m.ngeom + nvert,
      geom_pos=cat(m.geom_pos, local),
      geom_quat=cat(m.geom_quat, quat),
      geom_size=cat(m.geom_size, size),
      geom_friction=cat(m.geom_friction, np.asarray(m.flex_friction)[vflex]),
      geom_margin=cat(m.geom_margin, np.asarray(m.flex_margin)[vflex]),
      geom_gap=cat(m.geom_gap, np.asarray(m.flex_gap)[vflex]),
      geom_solref=cat(m.geom_solref, np.asarray(m.flex_solref)[vflex]),
      geom_solimp=cat(m.geom_solimp, np.asarray(m.flex_solimp)[vflex]),
      geom_solmix=cat(m.geom_solmix, np.asarray(m.flex_solmix)[vflex]),
      geom_rbound=cat(m.geom_rbound, radius),
      geom_rbound_np=catn([m.geom_rbound_np, radius]),
      geom_plugin_np=catn([m.geom_plugin_np,
                           np.full(nvert, -1, m.geom_plugin_np.dtype)]),
      geom_aabb_np=catn([
          m.geom_aabb_np,
          np.concatenate([np.zeros((nvert, 3)),
                          np.tile(radius[:, None], (1, 3))], axis=1)]),
      geom_fluid=cat(m.geom_fluid, np.zeros((nvert, 12))),
      geom_fluid_active=catn([m.geom_fluid_active, np.zeros(nvert, bool)]),
      geom_type=catn([m.geom_type,
                      np.full(nvert, int(GeomType.SPHERE), m.geom_type.dtype)]),
      geom_dataid=catn([m.geom_dataid,
                        np.full(nvert, -1, m.geom_dataid.dtype)]),
      geom_bodyid=catn([m.geom_bodyid,
                        m.flex_vertbodyid.astype(m.geom_bodyid.dtype)]),
      geom_group=catn([m.geom_group, np.zeros(nvert, m.geom_group.dtype)]),
      geom_visible=catn([m.geom_visible, np.zeros(nvert, bool)]),
      geom_contype=catn([m.geom_contype,
                         contype.astype(m.geom_contype.dtype)]),
      geom_conaffinity=catn([m.geom_conaffinity,
                             conaff.astype(m.geom_conaffinity.dtype)]),
      geom_condim=catn([m.geom_condim,
                        m.flex_condim[vflex].astype(m.geom_condim.dtype)]),
      geom_priority=catn([m.geom_priority,
                          m.flex_priority[vflex].astype(
                              m.geom_priority.dtype)]),
      geom_flexid=catn([m.geom_flexid, vflex.astype(np.int32)]),
  )


def load_model(path_or_xml: str, dtype=None) -> Model:
  """Loads an MJCF file or XML string directly into a ``Model``.

  Models referencing the ``mujoco.sdf.sdflib`` plugin (which the pip
  wheel does not ship) compile through the framework's host-side stub:
  the referenced mesh is pre-scanned and voxelized so the compiler's
  marching-cubes pass regenerates its geometry (plugins/sdflib.py).
  """
  import mujoco  # deferred: host-only dependency

  is_xml = path_or_xml.lstrip().startswith("<")
  xml_text = path_or_xml if is_xml else open(path_or_xml).read()
  base_dir = "." if is_xml else os.path.dirname(
      os.path.abspath(path_or_xml))
  grid = None
  if "mujoco.sdf.sdflib" in xml_text:
    from mujoco_inversedynamicstest_tpu.plugins import sdflib

    grid = sdflib.prescan_xml(xml_text, base_dir)

  def compile_():
    if is_xml:
      return mujoco.MjModel.from_xml_string(path_or_xml)
    return mujoco.MjModel.from_xml_path(path_or_xml)

  if grid is not None:
    from mujoco_inversedynamicstest_tpu.plugins import sdflib

    with sdflib.host_compile_grid(grid):
      mjm = compile_()
  else:
    mjm = compile_()
  return put_model(mjm, dtype=dtype)


def make_data(m: Model, dtype=None) -> Data:
  """Allocates a fresh ``Data`` pytree in the reset state.

  Analog of ``mj_makeData`` + ``mj_resetData`` (reference
  ``src/engine/engine_io.c:1403``): qpos = qpos0, everything else zero,
  with static shapes derived from the model.
  """
  from mujoco_inversedynamicstest_tpu.ops.collision import alloc_contact
  from mujoco_inversedynamicstest_tpu.ops.constraint import row_layout
  from mujoco_inversedynamicstest_tpu.ops import solver as solver_mod

  dtype = dtype or m.dtype
  # build on host, ship in ONE batched transfer: per-leaf device
  # allocations cost an RPC each through a remote-TPU tunnel (measured
  # 21 s for the ~70 leaves of the humanoid Data)
  npdt = np.dtype(dtype)
  z = lambda *shape: np.zeros(shape, dtype=npdt)
  lay = row_layout(m)

  nbody, nv, nq = m.nbody, m.nv, m.nq
  identity_quat = np.tile(
      np.asarray([1.0, 0.0, 0.0, 0.0], dtype=npdt), (nbody, 1)
  )

  data = Data(
      time=np.asarray(0.0, dtype=npdt),
      qpos=np.asarray(m.qpos0, dtype=npdt),
      qvel=z(nv),
      act=z(m.na),
      ctrl=z(m.nu),
      qfrc_applied=z(nv),
      xfrc_applied=z(nbody, 6),
      eq_active=np.asarray(m.eq_active0, dtype=bool)
      if m.neq else np.zeros((0,), dtype=bool),
      mocap_pos=z(m.nmocap, 3),
      mocap_quat=np.tile(
          np.asarray([1.0, 0.0, 0.0, 0.0], dtype=npdt), (m.nmocap, 1)
      ),
      qacc_warmstart=z(nv),
      xpos=z(nbody, 3),
      xquat=identity_quat,
      xmat=np.tile(np.eye(3, dtype=npdt), (nbody, 1, 1)),
      xipos=z(nbody, 3),
      ximat=np.tile(np.eye(3, dtype=npdt), (nbody, 1, 1)),
      xanchor=z(m.njnt, 3),
      xaxis=z(m.njnt, 3),
      geom_xpos=z(m.ngeom, 3),
      geom_xmat=np.tile(np.eye(3, dtype=npdt), (m.ngeom, 1, 1)),
      site_xpos=z(m.nsite, 3),
      site_xmat=np.tile(np.eye(3, dtype=npdt), (m.nsite, 1, 1)),
      cam_xpos=z(m.ncam, 3),
      cam_xmat=np.tile(np.eye(3, dtype=npdt), (m.ncam, 1, 1)),
      subtree_com=z(nbody, 3),
      cinert=z(nbody, 10),
      cdof=z(nv, 6),
      crb=z(nbody, 10),
      qM=z(nv, nv),
      qLD=z(nv, nv),
      ten_length=z(m.ntendon),
      ten_J=z(m.ntendon, nv),
      flexvert_xpos=z(m.nflexvert, 3),
      flexedge_length=z(m.nflexedge),
      flexedge_J=z(m.nflexedge, nv),
      flexedge_velocity=z(m.nflexedge),
      actuator_length=z(m.nu),
      actuator_moment=z(m.nu, nv),
      cvel=z(nbody, 6),
      cdof_dot=z(nv, 6),
      ten_velocity=z(m.ntendon),
      actuator_velocity=z(m.nu),
      qfrc_bias=z(nv),
      qfrc_spring=z(nv),
      qfrc_damper=z(nv),
      qfrc_gravcomp=z(nv),
      qfrc_fluid=z(nv),
      qfrc_passive=z(nv),
      act_dot=z(m.na),
      actuator_force=z(m.nu),
      qfrc_actuator=z(nv),
      qfrc_smooth=z(nv),
      qacc_smooth=z(nv),
      qfrc_constraint=z(nv),
      qacc=z(nv),
      qfrc_inverse=z(nv),
      contact=alloc_contact(m, dtype),
      ne=lay.ne,
      nf=lay.nf,
      nl=lay.nl,
      nefc=lay.nefc,
      efc_J=z(lay.nefc, nv),
      efc_pos=z(lay.nefc),
      efc_margin=z(lay.nefc),
      efc_frictionloss=z(lay.nefc),
      efc_D=z(lay.nefc),
      efc_R=z(lay.nefc),
      efc_aref=z(lay.nefc),
      efc_force=z(lay.nefc),
      efc_active=np.zeros((lay.nefc,), dtype=bool),
      efc_KBIP=z(lay.nefc, 4),
      efc_type=lay.efc_type,
      efc_id=lay.efc_id,
      cacc=z(nbody, 6),
      cfrc_int=z(nbody, 6),
      cfrc_ext=z(nbody, 6),
      sensordata=z(m.nsensordata),
      energy=z(2),
      solver_fwdinv=z(2),
      solver_niter=np.asarray(0, dtype=np.int32),
      solver_stat=z(solver_mod.stat_cap(m), 3),
      warning=np.zeros(2, dtype=np.int32),
  )
  return jax.device_put(data)


def put_data(m: Model, mjd, dtype=None) -> Data:
  """Copies the *input* state of a ``mujoco.MjData`` into a fresh ``Data``.

  Only the integration state (qpos, qvel, act, ctrl, applied forces, mocap,
  warmstart, time) is transferred — derived quantities are recomputed by
  ``forward``/``inverse`` on device.  Analog of the ``mjSTATE_INTEGRATION``
  state vector (reference ``src/engine/engine_support.c:176`` ``mj_getState``).
  """
  dtype = dtype or m.dtype
  d = make_data(m, dtype=dtype)
  j = lambda x: jnp.asarray(np.array(x), dtype=dtype)
  updates = dict(
      time=jnp.asarray(mjd.time, dtype=dtype),
      qpos=j(mjd.qpos),
      qvel=j(mjd.qvel),
      act=j(mjd.act),
      ctrl=j(mjd.ctrl),
      qacc=j(mjd.qacc),
      qfrc_applied=j(mjd.qfrc_applied),
      xfrc_applied=j(mjd.xfrc_applied),
      qacc_warmstart=j(mjd.qacc_warmstart),
  )
  if m.nmocap:
    updates.update(mocap_pos=j(mjd.mocap_pos), mocap_quat=j(mjd.mocap_quat))
  if m.neq:
    updates.update(eq_active=jnp.asarray(np.array(mjd.eq_active), dtype=bool))
  return d.replace(**updates)
