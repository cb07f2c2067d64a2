"""Model / Data pytree types for the TPU-native physics engine.

Design (TPU-first, not a port):

* ``Model`` is an immutable flat-SoA pytree compiled once on the host.  Float
  parameter arrays are pytree leaves (they may be batched/differentiated);
  integer layout tables (parent ids, joint types, address tables) are static
  aux-data so trace-time specialization can unroll tree levels and build
  branchless joint-type selects.  This mirrors the split between the
  reference's read-only ``mjModel`` (reference ``include/mujoco/mjmodel.h:592``)
  and its compile-time sparsity layout (``dof_Madr``/``dof_parentid``).

* ``Data`` is an immutable pytree holding the full per-step state + workspace,
  the analog of ``mjData`` (reference ``include/mujoco/mjdata.h``), with
  static shapes everywhere so a whole step is one XLA computation and
  batching is plain ``vmap``.

* The mass matrix ``qM`` is stored dense ``(nv, nv)``: on TPU the MXU wants
  dense tiles, and CRB assembly becomes one ``(nv,6)x(6,nv)`` matmul.  The
  sparse-LTDL representation used by the reference (``mj_factorM``, reference
  ``src/engine/engine_core_smooth.c:1470``) is reintroduced as an optimized
  kernel on top of this layout, not as the core data model.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Tuple

import jax
import numpy as np

from mujoco_inversedynamicstest_tpu.utils.pytree import pytree, static_field


class JointType(enum.IntEnum):
  """mjtJoint (reference include/mujoco/mjmodel.h)."""
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3

  def dof_width(self) -> int:
    return {0: 6, 1: 3, 2: 1, 3: 1}[self.value]

  def qpos_width(self) -> int:
    return {0: 7, 1: 4, 2: 1, 3: 1}[self.value]


class IntegratorType(enum.IntEnum):
  """mjtIntegrator."""
  EULER = 0
  RK4 = 1
  IMPLICIT = 2
  IMPLICITFAST = 3


class ConeType(enum.IntEnum):
  """mjtCone."""
  PYRAMIDAL = 0
  ELLIPTIC = 1


class SolverType(enum.IntEnum):
  """mjtSolver."""
  PGS = 0
  CG = 1
  NEWTON = 2


class GeomType(enum.IntEnum):
  """mjtGeom (collidable subset)."""
  PLANE = 0
  HFIELD = 1
  SPHERE = 2
  CAPSULE = 3
  ELLIPSOID = 4
  CYLINDER = 5
  BOX = 6
  MESH = 7
  SDF = 8


class TrnType(enum.IntEnum):
  """mjtTrn (actuator transmission)."""
  JOINT = 0
  JOINTINPARENT = 1
  SLIDERCRANK = 2
  TENDON = 3
  SITE = 4
  BODY = 5


class DynType(enum.IntEnum):
  """mjtDyn (activation dynamics)."""
  NONE = 0
  INTEGRATOR = 1
  FILTER = 2
  FILTEREXACT = 3
  MUSCLE = 4
  DCMOTOR = 5


class GainType(enum.IntEnum):
  """mjtGain."""
  FIXED = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3


class BiasType(enum.IntEnum):
  """mjtBias."""
  NONE = 0
  AFFINE = 1
  MUSCLE = 2
  DCMOTOR = 3


class EqType(enum.IntEnum):
  """mjtEq."""
  CONNECT = 0
  WELD = 1
  JOINT = 2
  TENDON = 3
  FLEX = 4
  DISTANCE = 7


class WrapType(enum.IntEnum):
  """mjtWrap (tendon wrap objects)."""
  NONE = 0
  JOINT = 1
  PULLEY = 2
  SITE = 3
  SPHERE = 4
  CYLINDER = 5


class SensorType(enum.IntEnum):
  """mjtSensor (supported subset; values match mujoco)."""
  TOUCH = 0
  ACCELEROMETER = 1
  VELOCIMETER = 2
  GYRO = 3
  FORCE = 4
  TORQUE = 5
  MAGNETOMETER = 6
  RANGEFINDER = 7
  CAMPROJECTION = 8
  JOINTPOS = 9
  JOINTVEL = 10
  TENDONPOS = 11
  TENDONVEL = 12
  ACTUATORPOS = 13
  ACTUATORVEL = 14
  ACTUATORFRC = 15
  JOINTACTFRC = 16
  BALLQUAT = 18
  BALLANGVEL = 19
  JOINTLIMITPOS = 20
  JOINTLIMITVEL = 21
  JOINTLIMITFRC = 22
  TENDONLIMITPOS = 23
  TENDONLIMITVEL = 24
  TENDONLIMITFRC = 25
  FRAMEPOS = 26
  FRAMEQUAT = 27
  FRAMEXAXIS = 28
  FRAMEYAXIS = 29
  FRAMEZAXIS = 30
  FRAMELINVEL = 31
  FRAMEANGVEL = 32
  FRAMELINACC = 33
  FRAMEANGACC = 34
  SUBTREECOM = 35
  SUBTREELINVEL = 36
  SUBTREEANGMOM = 37
  GEOMDIST = 39
  GEOMNORMAL = 40
  GEOMFROMTO = 41
  E_POTENTIAL = 43
  E_KINETIC = 44
  CLOCK = 45
  PLUGIN = 47
  USER = 48


class ConstraintType(enum.IntEnum):
  """mjtConstraint."""
  EQUALITY = 0
  FRICTION_DOF = 1
  FRICTION_TENDON = 2
  LIMIT_JOINT = 3
  LIMIT_TENDON = 4
  CONTACT_FRICTIONLESS = 5
  CONTACT_PYRAMIDAL = 6
  CONTACT_ELLIPTIC = 7


class ObjType(enum.IntEnum):
  """mjtObj (subset used by sensors/equality)."""
  UNKNOWN = 0
  BODY = 1
  XBODY = 2
  JOINT = 3
  GEOM = 5
  SITE = 6
  CAMERA = 7


class DisableBit(enum.IntFlag):
  """mjtDisableBit (installed-mujoco layout)."""
  CONSTRAINT = 1 << 0
  EQUALITY = 1 << 1
  FRICTIONLOSS = 1 << 2
  LIMIT = 1 << 3
  CONTACT = 1 << 4
  SPRING = 1 << 5
  DAMPER = 1 << 6
  GRAVITY = 1 << 7
  CLAMPCTRL = 1 << 8
  WARMSTART = 1 << 9
  FILTERPARENT = 1 << 10
  ACTUATION = 1 << 11
  REFSAFE = 1 << 12
  SENSOR = 1 << 13
  MIDPHASE = 1 << 14
  EULERDAMP = 1 << 15
  AUTORESET = 1 << 16
  NATIVECCD = 1 << 17
  ISLAND = 1 << 18


class EnableBit(enum.IntFlag):
  """mjtEnableBit."""
  OVERRIDE = 1 << 0
  ENERGY = 1 << 1
  FWDINV = 1 << 2
  INVDISCRETE = 1 << 3


class StateFlag(enum.IntFlag):
  """mjtState: state-vector component flags (ref ``mjdata.h:27-49``)."""
  TIME = 1 << 0
  QPOS = 1 << 1
  QVEL = 1 << 2
  ACT = 1 << 3
  WARMSTART = 1 << 4
  CTRL = 1 << 5
  QFRC_APPLIED = 1 << 6
  XFRC_APPLIED = 1 << 7
  EQ_ACTIVE = 1 << 8
  MOCAP_POS = 1 << 9
  MOCAP_QUAT = 1 << 10

  PHYSICS = QPOS | QVEL | ACT
  FULLPHYSICS = TIME | QPOS | QVEL | ACT
  USER = (CTRL | QFRC_APPLIED | XFRC_APPLIED | EQ_ACTIVE | MOCAP_POS
          | MOCAP_QUAT)
  INTEGRATION = FULLPHYSICS | USER | WARMSTART


@pytree
class Option:
  """Physics options: the analog of ``mjOption``.

  (reference ``include/mujoco/mjmodel.h:434-475``)  Scalar physical
  parameters are leaves (differentiable / overridable per batch element);
  discrete algorithm choices are static so jit specializes on them.
  """
  # --- leaves (jax scalars/arrays) ---
  timestep: jax.Array
  gravity: jax.Array          # (3,)
  wind: jax.Array             # (3,)
  magnetic: jax.Array         # (3,)
  density: jax.Array
  viscosity: jax.Array
  impratio: jax.Array
  tolerance: jax.Array
  ls_tolerance: jax.Array
  noslip_tolerance: jax.Array = None
  # --- static ---
  integrator: int = static_field(default=IntegratorType.EULER)
  cone: int = static_field(default=ConeType.PYRAMIDAL)
  solver: int = static_field(default=SolverType.NEWTON)
  iterations: int = static_field(default=100)
  ls_iterations: int = static_field(default=50)
  noslip_iterations: int = static_field(default=0)
  disableflags: int = static_field(default=0)
  enableflags: int = static_field(default=0)


@pytree
class TreeLayout:
  """Static kinematic-tree metadata precomputed at model build time.

  This replaces both the reference's runtime tree loops (reference
  ``src/engine/engine_core_smooth.c``) and MJX's type-signature scan
  machinery with *level-wise masked vectorization*: bodies at the same tree
  depth are processed together with gathers from parents; joint types are
  handled branchlessly with masked selects.  Everything here is host-side
  numpy and fixed at trace time.
  """
  # bodies grouped by depth, excluding the world body; tuple of int arrays.
  body_levels: Tuple[np.ndarray, ...] = static_field(default=())
  # per-level max number of joints on any body in the level.
  level_max_jnts: Tuple[int, ...] = static_field(default=())
  # dense (nv, nv) bool: entry [i, j] true iff dof j is dof i's
  # ancestor-or-self (the sparsity pattern of M; cf. dof_parentid chains,
  # reference src/engine/engine_core_smooth.c:1353 mj_crb).
  ancestor_mask: np.ndarray = static_field(default=None)
  # dofs grouped by depth in the dof tree (for level-wise LTDL factorization,
  # cf. reference mj_factorI, src/engine/engine_core_smooth.c:1483).
  dof_levels: Tuple[np.ndarray, ...] = static_field(default=())
  # per-dof ancestor dof lists padded to max depth, -1 padded, (nv, maxd).
  dof_ancestors: np.ndarray = static_field(default=None)
  # (nbody, nv) bool: dof j moves body b (j belongs to b or an ancestor).
  # This is the support mask for point Jacobians (cf. reference
  # src/engine/engine_support.c:389 mj_jac chain walk).
  body_dof_mask: np.ndarray = static_field(default=None)


@pytree
class Model:
  """Compiled model: immutable flat-SoA pytree (analog of ``mjModel``)."""

  # ------- sizes (static) -------
  nq: int = static_field(default=0)
  nv: int = static_field(default=0)
  nu: int = static_field(default=0)
  na: int = static_field(default=0)
  nbody: int = static_field(default=0)
  njnt: int = static_field(default=0)
  ngeom: int = static_field(default=0)
  nsite: int = static_field(default=0)
  ncam: int = static_field(default=0)
  nmocap: int = static_field(default=0)
  neq: int = static_field(default=0)
  ntendon: int = static_field(default=0)
  nwrap: int = static_field(default=0)
  nsensor: int = static_field(default=0)
  nsensordata: int = static_field(default=0)
  nflexvert: int = static_field(default=0)
  nflex: int = static_field(default=0)
  nflexedge: int = static_field(default=0)
  nflexelem: int = static_field(default=0)
  nmesh: int = static_field(default=0)

  # ------- options / tree layout (nested pytrees) -------
  opt: Option = None
  tree: TreeLayout = None

  # ------- body (leaves float, statics int) -------
  body_pos: jax.Array = None          # (nbody, 3)
  body_quat: jax.Array = None         # (nbody, 4)
  body_ipos: jax.Array = None         # (nbody, 3)
  body_iquat: jax.Array = None        # (nbody, 4)
  body_mass: jax.Array = None         # (nbody,)
  body_subtreemass: jax.Array = None  # (nbody,)
  body_inertia: jax.Array = None      # (nbody, 3)
  body_gravcomp: jax.Array = None     # (nbody,)
  body_invweight0: jax.Array = None   # (nbody, 2)
  body_parentid: np.ndarray = static_field(default=None)
  body_rootid: np.ndarray = static_field(default=None)
  body_weldid: np.ndarray = static_field(default=None)
  body_jntadr: np.ndarray = static_field(default=None)
  body_jntnum: np.ndarray = static_field(default=None)
  body_dofadr: np.ndarray = static_field(default=None)
  body_dofnum: np.ndarray = static_field(default=None)
  body_geomadr: np.ndarray = static_field(default=None)
  body_geomnum: np.ndarray = static_field(default=None)
  body_mocapid: np.ndarray = static_field(default=None)

  # ------- joints -------
  jnt_pos: jax.Array = None           # (njnt, 3)
  jnt_axis: jax.Array = None          # (njnt, 3)
  jnt_stiffness: jax.Array = None     # (njnt,)
  jnt_range: jax.Array = None         # (njnt, 2)
  jnt_actfrcrange: jax.Array = None   # (njnt, 2)
  jnt_margin: jax.Array = None        # (njnt,)
  jnt_solref: jax.Array = None        # (njnt, 2)
  jnt_solimp: jax.Array = None        # (njnt, 5)
  jnt_type: np.ndarray = static_field(default=None)
  jnt_qposadr: np.ndarray = static_field(default=None)
  jnt_dofadr: np.ndarray = static_field(default=None)
  jnt_bodyid: np.ndarray = static_field(default=None)
  jnt_limited: np.ndarray = static_field(default=None)
  jnt_actfrclimited: np.ndarray = static_field(default=None)
  jnt_actgravcomp: np.ndarray = static_field(default=None)

  # ------- dofs -------
  dof_armature: jax.Array = None      # (nv,)
  dof_damping: jax.Array = None       # (nv,)
  dof_invweight0: jax.Array = None    # (nv,)
  dof_frictionloss: jax.Array = None  # (nv,)
  dof_solref: jax.Array = None        # (nv, 2)
  dof_solimp: jax.Array = None        # (nv, 5)
  dof_M0: jax.Array = None            # (nv,)
  dof_bodyid: np.ndarray = static_field(default=None)
  dof_jntid: np.ndarray = static_field(default=None)
  dof_parentid: np.ndarray = static_field(default=None)

  # ------- geoms -------
  geom_pos: jax.Array = None          # (ngeom, 3)
  geom_quat: jax.Array = None         # (ngeom, 4)
  geom_size: jax.Array = None         # (ngeom, 3)
  geom_friction: jax.Array = None     # (ngeom, 3)
  geom_margin: jax.Array = None       # (ngeom,)
  geom_gap: jax.Array = None          # (ngeom,)
  geom_solref: jax.Array = None       # (ngeom, 2)
  geom_solimp: jax.Array = None       # (ngeom, 5)
  geom_solmix: jax.Array = None       # (ngeom,)
  geom_rbound: jax.Array = None       # (ngeom,)
  geom_fluid: jax.Array = None        # (ngeom, 12) ellipsoid-fluid coefs
  # static: geoms using the ellipsoid fluid model (geom_fluid[:,0] > 0)
  geom_fluid_active: np.ndarray = static_field(default=None)
  geom_type: np.ndarray = static_field(default=None)
  geom_dataid: np.ndarray = static_field(default=None)  # mesh id or -1
  geom_bodyid: np.ndarray = static_field(default=None)
  geom_group: np.ndarray = static_field(default=None)
  geom_visible: np.ndarray = static_field(default=None)  # rgba/material α>0
  geom_contype: np.ndarray = static_field(default=None)
  geom_conaffinity: np.ndarray = static_field(default=None)
  geom_condim: np.ndarray = static_field(default=None)
  geom_priority: np.ndarray = static_field(default=None)
  # flex id for virtual flex-vertex collision geoms appended past the
  # source model's ngeom; -1 for real geoms (see io._append_flex_geoms)
  geom_flexid: np.ndarray = static_field(default=None)

  # ------- sites -------
  site_pos: jax.Array = None          # (nsite, 3)
  site_quat: jax.Array = None         # (nsite, 4)
  site_size: jax.Array = None         # (nsite, 3)
  site_bodyid: np.ndarray = static_field(default=None)
  site_type: np.ndarray = static_field(default=None)

  # ------- cameras (mj_camlight + camera-projection sensor) -------
  cam_pos: jax.Array = None           # (ncam, 3)
  cam_quat: jax.Array = None          # (ncam, 4)
  cam_mat0: jax.Array = None          # (ncam, 3, 3)
  cam_pos0: jax.Array = None          # (ncam, 3)
  cam_poscom0: jax.Array = None       # (ncam, 3)
  cam_fovy: jax.Array = None          # (ncam,)
  cam_intrinsic: jax.Array = None     # (ncam, 4)
  cam_sensorsize: jax.Array = None    # (ncam, 2)
  cam_bodyid: np.ndarray = static_field(default=None)
  cam_targetbodyid: np.ndarray = static_field(default=None)
  cam_mode: np.ndarray = static_field(default=None)
  cam_resolution: np.ndarray = static_field(default=None)

  # ------- actuators -------
  actuator_gear: jax.Array = None        # (nu, 6)
  actuator_ctrlrange: jax.Array = None   # (nu, 2)
  actuator_forcerange: jax.Array = None  # (nu, 2)
  actuator_actrange: jax.Array = None    # (nu, 2)
  actuator_gainprm: jax.Array = None     # (nu, 10)
  actuator_biasprm: jax.Array = None     # (nu, 10)
  actuator_dynprm: jax.Array = None      # (nu, 10)
  actuator_cranklength: jax.Array = None  # (nu,)
  actuator_length0: jax.Array = None     # (nu,)
  actuator_lengthrange: jax.Array = None  # (nu, 2)
  actuator_acc0: jax.Array = None        # (nu,)
  actuator_trntype: np.ndarray = static_field(default=None)
  actuator_dyntype: np.ndarray = static_field(default=None)
  actuator_gaintype: np.ndarray = static_field(default=None)
  actuator_biastype: np.ndarray = static_field(default=None)
  actuator_trnid: np.ndarray = static_field(default=None)
  actuator_actadr: np.ndarray = static_field(default=None)
  actuator_actnum: np.ndarray = static_field(default=None)
  actuator_ctrllimited: np.ndarray = static_field(default=None)
  actuator_forcelimited: np.ndarray = static_field(default=None)
  actuator_actlimited: np.ndarray = static_field(default=None)
  actuator_actearly: np.ndarray = static_field(default=None)

  # ------- equality constraints -------
  eq_data: jax.Array = None           # (neq, 11)
  eq_solref: jax.Array = None         # (neq, 2)
  eq_solimp: jax.Array = None         # (neq, 5)
  eq_type: np.ndarray = static_field(default=None)
  eq_obj1id: np.ndarray = static_field(default=None)
  eq_obj2id: np.ndarray = static_field(default=None)
  eq_objtype: np.ndarray = static_field(default=None)
  eq_active0: np.ndarray = static_field(default=None)

  # ------- tendons -------
  tendon_stiffness: jax.Array = None     # (ntendon,)
  tendon_damping: jax.Array = None       # (ntendon,)
  tendon_frictionloss: jax.Array = None  # (ntendon,)
  tendon_lengthspring: jax.Array = None  # (ntendon, 2)
  tendon_length0: jax.Array = None       # (ntendon,)
  tendon_invweight0: jax.Array = None    # (ntendon,)
  tendon_range: jax.Array = None         # (ntendon, 2)
  tendon_margin: jax.Array = None        # (ntendon,)
  tendon_solref_lim: jax.Array = None    # (ntendon, 2)
  tendon_solimp_lim: jax.Array = None    # (ntendon, 5)
  tendon_solref_fri: jax.Array = None    # (ntendon, 2)
  tendon_solimp_fri: jax.Array = None    # (ntendon, 5)
  wrap_prm: jax.Array = None             # (nwrap,)
  tendon_adr: np.ndarray = static_field(default=None)
  tendon_num: np.ndarray = static_field(default=None)
  tendon_limited: np.ndarray = static_field(default=None)
  wrap_type: np.ndarray = static_field(default=None)
  wrap_objid: np.ndarray = static_field(default=None)
  wrap_prm_np: np.ndarray = static_field(default=None)  # host copy: sidesite
  # ids for geom wraps, pulley divisors, joint coefficients

  # ------- flex (deformables; ref mj_flex engine_core_smooth.c:442) -------
  flex_vert: jax.Array = None            # (nflexvert, 3) body-local coords
  flexedge_length0: jax.Array = None     # (nflexedge,)
  flexedge_invweight0: jax.Array = None  # (nflexedge,)
  flex_edgestiffness: jax.Array = None   # (nflex,)
  flex_edgedamping: jax.Array = None     # (nflex,)
  flex_damping: jax.Array = None         # (nflex,) Rayleigh damping coef
  # dense per-element metric tensor unpacked from the triangular
  # flex_stiffness storage (nflexelem, nedge_pe, nedge_pe); zero rows for
  # elements of flexes without elasticity
  flex_metric: jax.Array = None
  flex_radius: jax.Array = None          # (nflex,)
  flex_friction: jax.Array = None        # (nflex, 3)
  flex_solref: jax.Array = None          # (nflex, 2)
  flex_solimp: jax.Array = None          # (nflex, 5)
  flex_margin: jax.Array = None          # (nflex,)
  flex_gap: jax.Array = None             # (nflex,)
  flex_vertbodyid: np.ndarray = static_field(default=None)  # (nflexvert,)
  flex_vertadr: np.ndarray = static_field(default=None)     # (nflex,)
  flex_vertnum: np.ndarray = static_field(default=None)     # (nflex,)
  flex_edgeadr: np.ndarray = static_field(default=None)     # (nflex,)
  flex_edgenum: np.ndarray = static_field(default=None)     # (nflex,)
  flex_edge: np.ndarray = static_field(default=None)  # (nflexedge, 2) GLOBAL
  flexedge_rigid: np.ndarray = static_field(default=None)   # (nflexedge,)
  # (nflexelem, dim+1) GLOBAL vert ids and (nflexelem, nedge_pe) GLOBAL
  # edge ids (ragged dims padded with -1 when flexes of mixed dim coexist)
  flex_elem: np.ndarray = static_field(default=None)
  flex_elemedge: np.ndarray = static_field(default=None)
  flex_elemadr: np.ndarray = static_field(default=None)     # (nflex,)
  flex_elemnum: np.ndarray = static_field(default=None)     # (nflex,)
  flex_dim: np.ndarray = static_field(default=None)         # (nflex,)
  flex_centered: np.ndarray = static_field(default=None)    # (nflex,)
  flex_rigid: np.ndarray = static_field(default=None)       # (nflex,)
  flex_edgeequality: np.ndarray = static_field(default=None)  # (nflex,)
  flex_contype: np.ndarray = static_field(default=None)     # (nflex,)
  flex_conaffinity: np.ndarray = static_field(default=None)  # (nflex,)
  flex_condim: np.ndarray = static_field(default=None)      # (nflex,)
  flex_priority: np.ndarray = static_field(default=None)    # (nflex,)
  flex_solmix: jax.Array = None                             # (nflex,)
  flex_vertflexid: np.ndarray = static_field(default=None)  # (nflexvert,)
  # internal-contact tables (mj_collideFlexInternal, ref
  # engine_collision_driver.c:1726): per-flex internal flag + the
  # compiler's predefined element-vertex pair list
  flex_elemlayer_np: np.ndarray = static_field(default=None)  # (nflexelem,)
  flex_internal_np: np.ndarray = static_field(default=None)   # (nflex,)
  flex_selfcollide_np: np.ndarray = static_field(default=None)  # (nflex,)
  flex_evpair_np: np.ndarray = static_field(default=None)     # (nev, 2)
  flex_evpairadr_np: np.ndarray = static_field(default=None)  # (nflex,)
  flex_evpairnum_np: np.ndarray = static_field(default=None)  # (nflex,)
  has_flex_elasticity: bool = static_field(default=False)
  has_flex_edge_sd: bool = static_field(default=False)
  # trilinear nodal interpolation (flex_interp=1; ref mj_flex
  # engine_core_smooth.c:494): vertices are trilinear combinations of 8
  # node-body positions; flex_interp_w holds the static per-flex
  # (vertnum, nodenum) weight matrix from the unit-cube vertex coords
  flex_interp_np: np.ndarray = static_field(default=None)      # (nflex,)
  flex_nodeadr_np: np.ndarray = static_field(default=None)     # (nflex,)
  flex_nodenum_np: np.ndarray = static_field(default=None)     # (nflex,)
  flex_nodebodyid_np: np.ndarray = static_field(default=None)  # (nnode,)
  flex_interp_w: Tuple = static_field(default=())  # per flex np (nv_f, nn_f)
  flex_node0: jax.Array = None           # (nflexnode, 3) world rest pos
  # nodal stretch-frame stiffness (mj_passive interp branch,
  # engine_passive.c:125): per interp flex a (3N, 3N) matrix (negative
  # definite, rigid modes in the null space); () when no interp flex
  flex_stiffness_nodal: Tuple = ()
  has_flex_nodal_elasticity: bool = static_field(default=False)

  # ------- sensors -------
  sensor_cutoff: jax.Array = None     # (nsensor,)
  sensor_type: np.ndarray = static_field(default=None)
  sensor_datatype: np.ndarray = static_field(default=None)
  sensor_objtype: np.ndarray = static_field(default=None)
  sensor_objid: np.ndarray = static_field(default=None)
  sensor_reftype: np.ndarray = static_field(default=None)
  sensor_refid: np.ndarray = static_field(default=None)
  sensor_adr: np.ndarray = static_field(default=None)
  sensor_dim: np.ndarray = static_field(default=None)
  sensor_needstage: np.ndarray = static_field(default=None)

  # ------- keyframes / reference pose -------
  qpos0: jax.Array = None             # (nq,)
  qpos_spring: jax.Array = None       # (nq,)

  # ------- statistics (mjStatistic) -------
  stat_meaninertia: jax.Array = None  # scalar

  # ------- collision/static-shape budgeting (static) -------
  # explicit geom pair list from <pair> elements
  pair_dim: np.ndarray = static_field(default=None)
  pair_geom1: np.ndarray = static_field(default=None)
  pair_geom2: np.ndarray = static_field(default=None)
  pair_solref: jax.Array = None
  pair_solreffriction: jax.Array = None
  pair_solimp: jax.Array = None
  pair_margin: jax.Array = None
  pair_gap: jax.Array = None
  pair_friction: jax.Array = None
  exclude_signature: np.ndarray = static_field(default=None)
  # convex hull topology per mesh (ops/hull.HullSpec tuples; static)
  mesh_hull: Tuple = static_field(default=())
  # full (non-decimated) mesh triangle vertices per mesh, (T, 3, 3) float
  # arrays in the mesh canonical frame — ray casting needs the true
  # surface, not the convex hull (ref mj_rayMesh, engine_ray.c:800)
  mesh_tris: Tuple = static_field(default=())
  # height fields (ref mjModel hfield_*, mjmodel.h): per-hfield static
  # grids; heights are compile-time terrain data like hull topology, so
  # they bake into the collision/ray kernels as constants
  nhfield: int = static_field(default=0)
  hfield_nrow: np.ndarray = static_field(default=None)   # (nhfield,)
  hfield_ncol: np.ndarray = static_field(default=None)   # (nhfield,)
  hfield_size: np.ndarray = static_field(default=None)   # (nhfield, 4)
  hfield_data: Tuple = static_field(default=())          # per-hfield (nrow, ncol)
  # static host copy of geom_rbound for trace-time layout decisions
  # (hfield subgrid sizing); the jax leaf stays the runtime source
  geom_rbound_np: np.ndarray = static_field(default=None)
  # SDF plugin geom support (ref engine_collision_sdf.c): per-geom plugin
  # instance (mjModel.geom_plugin, -1 if none), geom-frame AABBs
  # (center+half, from the compiler's sdf_aabb), and the mesh recentering
  # poses needed to recover the SDF's own frame (undoTransformation,
  # engine_collision_sdf.c:289)
  geom_plugin_np: np.ndarray = static_field(default=None)   # (ngeom,)
  geom_aabb_np: np.ndarray = static_field(default=None)     # (ngeom, 6)
  mesh_pos_np: np.ndarray = static_field(default=None)      # (nmesh, 3)
  mesh_quat_np: np.ndarray = static_field(default=None)     # (nmesh, 4)
  # engine plugin instances (plugins/registry.py PluginInstance tuple):
  # traceable hook closures over static per-instance data — the mjpPlugin
  # analog (ref include/mujoco/mjplugin.h:77-135)
  plugin_hooks: Tuple = static_field(default=())
  # per-sensor plugin instance id (mjModel.sensor_plugin; -1 for
  # non-plugin sensors) — PLUGIN sensors dispatch to
  # plugin_hooks[sensor_plugin[i]].sensor(m, d, i)
  sensor_plugin: np.ndarray = static_field(default=None)
  # traceable user-sensor callback (m, d, sensor_id) -> (dim,): the
  # mjcb_sensor analog (ref engine_callback.c, mjSENS_USER) — passed to
  # put_model by the user, fired at the sensor's declared needstage
  user_sensor_fn: object = static_field(default=None)
  # contact budgeting (MJX-compatible <numeric> customs; -1 = unlimited,
  # ref mjx/mujoco/mjx/_src/collision_driver.py:336-372)
  max_contact_points: int = static_field(default=-1)
  max_geom_pairs: int = static_field(default=-1)

  # force the dense (nv, nv) Cholesky even for multi-mechanism scenes
  # (benchmark A/B switch for the blocked factorization, ops/smooth.py)
  force_dense_ltdl: bool = static_field(default=False)
  # trace-time specialization hints derived from the compiled model
  has_dof_damping: bool = static_field(default=False)
  has_fluid: bool = static_field(default=False)
  # static nonzero pattern of dof/tendon frictionloss (row budgeting)
  dof_frictionloss_nz: np.ndarray = static_field(default=None)
  tendon_frictionloss_nz: np.ndarray = static_field(default=None)

  # host-only handle to the source mujoco.MjModel (not traced, not hashed
  # into jit keys beyond identity) for interop/testing.
  _source: Any = static_field(default=None, repr=False)

  @property
  def dtype(self):
    return self.qpos0.dtype


@pytree
class Contact:
  """Static-shape contact set (analog of ``mjContact``).

  All arrays are padded to a trace-time capacity ``ncon``; invalid rows have
  ``dist > 0`` beyond margin and ``efc_address < 0`` semantics are replaced
  by an explicit boolean mask (TPU-first: masks, not dynamic counts).
  """
  dist: jax.Array = None       # (ncon,)
  pos: jax.Array = None        # (ncon, 3)
  frame: jax.Array = None      # (ncon, 3, 3) rows = [normal, tan1, tan2]
  includemargin: jax.Array = None  # (ncon,)
  margin: jax.Array = None     # (ncon,) detection margin (incl. gap)
  friction: jax.Array = None   # (ncon, 5)
  solref: jax.Array = None     # (ncon, 2)
  solreffriction: jax.Array = None  # (ncon, 2)
  solimp: jax.Array = None     # (ncon, 5)
  geom1: jax.Array = None      # (ncon,) int
  geom2: jax.Array = None      # (ncon,) int
  efc_address: np.ndarray = static_field(default=None)  # (ncon,) int
  dim: np.ndarray = static_field(default=None)          # (ncon,) int
  # flex element contacts: per-side body sets + L2-normalized
  # inverse-distance weights (mj_elemBodyWeight analog, ref
  # engine_core_constraint.c:171); None unless the model has flex
  # element/internal contact groups (plain geom slots then carry
  # (geom_bodyid, 1, 0, 0, 0) rows)
  bary_body: jax.Array = None  # (ncon, 2, 4) int32
  bary_w: jax.Array = None     # (ncon, 2, 4)


@pytree
class Data:
  """Per-step simulation state + workspace (analog of ``mjData``)."""

  # ------- inputs / integration state -------
  time: jax.Array = None
  qpos: jax.Array = None          # (nq,)
  qvel: jax.Array = None          # (nv,)
  act: jax.Array = None           # (na,)
  ctrl: jax.Array = None          # (nu,)
  qfrc_applied: jax.Array = None  # (nv,)
  xfrc_applied: jax.Array = None  # (nbody, 6)
  eq_active: jax.Array = None     # (neq,) bool
  mocap_pos: jax.Array = None     # (nmocap, 3)
  mocap_quat: jax.Array = None    # (nmocap, 4)
  qacc_warmstart: jax.Array = None  # (nv,)

  # ------- position stage outputs -------
  xpos: jax.Array = None          # (nbody, 3)
  xquat: jax.Array = None         # (nbody, 4)
  xmat: jax.Array = None          # (nbody, 3, 3)
  xipos: jax.Array = None         # (nbody, 3)
  ximat: jax.Array = None         # (nbody, 3, 3)
  xanchor: jax.Array = None       # (njnt, 3)
  xaxis: jax.Array = None         # (njnt, 3)
  geom_xpos: jax.Array = None     # (ngeom, 3)
  geom_xmat: jax.Array = None     # (ngeom, 3, 3)
  site_xpos: jax.Array = None     # (nsite, 3)
  site_xmat: jax.Array = None     # (nsite, 3, 3)
  cam_xpos: jax.Array = None      # (ncam, 3)
  cam_xmat: jax.Array = None      # (ncam, 3, 3)
  subtree_com: jax.Array = None   # (nbody, 3)
  cinert: jax.Array = None        # (nbody, 10)
  cdof: jax.Array = None          # (nv, 6)
  crb: jax.Array = None           # (nbody, 10)
  qM: jax.Array = None            # (nv, nv) dense
  qLD: jax.Array = None           # (nv, nv) dense Cholesky factor
  ten_length: jax.Array = None    # (ntendon,)
  ten_J: jax.Array = None         # (ntendon, nv)
  flexvert_xpos: jax.Array = None    # (nflexvert, 3)
  flexedge_length: jax.Array = None  # (nflexedge,)
  flexedge_J: jax.Array = None       # (nflexedge, nv)
  flexedge_velocity: jax.Array = None  # (nflexedge,)
  actuator_length: jax.Array = None   # (nu,)
  actuator_moment: jax.Array = None   # (nu, nv)

  # ------- velocity stage -------
  cvel: jax.Array = None          # (nbody, 6)
  cdof_dot: jax.Array = None      # (nv, 6)
  ten_velocity: jax.Array = None  # (ntendon,)
  actuator_velocity: jax.Array = None  # (nu,)
  qfrc_bias: jax.Array = None     # (nv,)
  qfrc_spring: jax.Array = None   # (nv,)
  qfrc_damper: jax.Array = None   # (nv,)
  qfrc_gravcomp: jax.Array = None  # (nv,)
  qfrc_fluid: jax.Array = None    # (nv,)
  qfrc_passive: jax.Array = None  # (nv,)

  # ------- actuation -------
  act_dot: jax.Array = None       # (na,)
  actuator_force: jax.Array = None  # (nu,)
  qfrc_actuator: jax.Array = None   # (nv,)

  # ------- acceleration stage -------
  qfrc_smooth: jax.Array = None   # (nv,)
  qacc_smooth: jax.Array = None   # (nv,)
  qfrc_constraint: jax.Array = None  # (nv,)
  qacc: jax.Array = None          # (nv,)
  qfrc_inverse: jax.Array = None  # (nv,)

  # ------- constraints (static shapes, counted at trace time) -------
  contact: Optional[Contact] = None
  ne: int = static_field(default=0)
  nf: int = static_field(default=0)
  nl: int = static_field(default=0)
  nefc: int = static_field(default=0)
  efc_J: jax.Array = None         # (nefc, nv)
  efc_pos: jax.Array = None       # (nefc,)
  efc_margin: jax.Array = None    # (nefc,)
  efc_frictionloss: jax.Array = None  # (nefc,)
  efc_D: jax.Array = None         # (nefc,)
  efc_R: jax.Array = None         # (nefc,)
  efc_aref: jax.Array = None      # (nefc,)
  efc_force: jax.Array = None     # (nefc,)
  efc_active: jax.Array = None    # (nefc,) bool mask of valid rows
  efc_KBIP: jax.Array = None      # (nefc, 4) stiffness/damping/imp/imp'
  efc_type: np.ndarray = static_field(default=None)  # (nefc,) ConstraintType
  efc_id: np.ndarray = static_field(default=None)    # (nefc,) source element

  # ------- post-constraint body quantities -------
  cacc: jax.Array = None          # (nbody, 6)
  cfrc_int: jax.Array = None      # (nbody, 6)
  cfrc_ext: jax.Array = None      # (nbody, 6)

  # ------- diagnostics / sensors / energy -------
  sensordata: jax.Array = None    # (nsensordata,)
  energy: jax.Array = None        # (2,) potential, kinetic
  solver_fwdinv: jax.Array = None  # (2,)
  solver_niter: jax.Array = None   # () int
  # per-iteration solver trace: (stat_cap, 3) columns = scaled improvement,
  # scaled gradient norm, accepted line-search slope (mjSolverStat analog)
  solver_stat: jax.Array = None
  # per-lane warning counters (mjWARN analog, mjdata.h:54):
  # [0] = bad qpos resets, [1] = bad qvel resets
  warning: jax.Array = None  # (2,) int32
