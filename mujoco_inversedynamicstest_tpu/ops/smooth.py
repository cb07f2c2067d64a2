"""Smooth (unconstrained) dynamics: FK, CoM frames, CRB, LTDL, RNE.

TPU-first design.  The reference implements these as sequential per-body C
loops (reference ``src/engine/engine_core_smooth.c``: ``mj_kinematics``:38,
``mj_comPos``:183, ``mj_crb``:1353, ``mj_factorM``:1470, ``mj_solveLD``:1629,
``mj_comVel``:1833, ``mj_rne``:1969); MJX vectorizes them with type-grouped
scans.  Here we use *level-wise masked vectorization*:

* bodies at equal tree depth are updated together with gathers from parents;
  the (static) level structure is unrolled at trace time;
* joint-type variation is handled branchlessly — all type candidates are
  computed and combined with trace-time-constant masks, which XLA folds;
* per-dof quantities (cdof, RNE projections) are computed as single dense
  ops over all ``nv`` dofs;
* the mass matrix is assembled dense with one ``(nv,6) @ (6,nv)`` matmul
  (MXU-shaped) and masked by the tree-ancestor sparsity pattern.

Everything broadcasts over leading batch axes only via ``vmap`` at the
caller; functions here take unbatched (m, d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    DisableBit,
    JointType,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math


def _gather_window(x: jax.Array, adr: np.ndarray, width: int) -> jax.Array:
  """Gathers static windows ``x[adr[i] : adr[i]+width]`` -> (B, width, ...).

  ``adr`` is host numpy, so indices are trace-time constants; out-of-range
  lanes are clipped (callers mask them out).
  """
  n = x.shape[0]
  idx = np.clip(adr[:, None] + np.arange(width)[None, :], 0, max(n - 1, 0))
  return x[idx]


def _masked_scatter(dst: jax.Array, idx: np.ndarray, values: jax.Array,
                    mask: jax.Array) -> jax.Array:
  """Writes ``values`` into ``dst[idx]`` where ``mask``; duplicate-safe.

  Invalid lanes of ``idx`` may be clipped duplicates of valid ones, so a
  plain ``.at[idx].set`` is order-dependent.  Adding a masked delta makes
  duplicates contribute exactly zero.
  """
  while mask.ndim < values.ndim:
    mask = mask[..., None]
  delta = jnp.where(mask, values - dst[idx], 0)
  return dst.at[idx].add(delta)


def _quat_adr(m: Model) -> np.ndarray:
  """qpos addresses of quaternion segments (ball + free joints)."""
  adrs = []
  for j in range(m.njnt):
    t = m.jnt_type[j]
    if t == JointType.BALL:
      adrs.append(m.jnt_qposadr[j])
    elif t == JointType.FREE:
      adrs.append(m.jnt_qposadr[j] + 3)
  return np.array(adrs, dtype=np.int32)


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics (analog of ``mj_kinematics``, ref :38).

  Computes xpos/xquat/xmat, joint anchors/axes, inertial and geom/site
  frames; normalizes quaternion segments of qpos in-place like the
  reference.
  """
  dtype = d.qpos.dtype
  qpos = d.qpos

  # normalize all quaternion segments of qpos up front (the reference does
  # it per-joint inside the tree loop; the result is identical).
  quat_adr = _quat_adr(m)
  if quat_adr.size:
    idx = quat_adr[:, None] + np.arange(4)[None, :]
    qpos = qpos.at[idx].set(math.normalize_quat(qpos[idx]))

  nb = m.nbody
  xpos = jnp.zeros((nb, 3), dtype=dtype)
  xquat = jnp.zeros((nb, 4), dtype=dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((m.njnt, 3), dtype=dtype)
  xaxis = jnp.zeros((m.njnt, 3), dtype=dtype)

  up = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)

  for lvl, bodies in enumerate(m.tree.body_levels):
    par = m.body_parentid[bodies]
    pos = xpos[par] + math.rotate(m.body_pos[bodies], xquat[par])
    quat = math.quat_mul(xquat[par], m.body_quat[bodies])

    for k in range(m.tree.level_max_jnts[lvl]):
      valid_np = k < m.body_jntnum[bodies]
      jids = np.where(valid_np, m.body_jntadr[bodies] + k, 0)
      jtype = m.jnt_type[jids]
      qadr = m.jnt_qposadr[jids]
      valid = jnp.asarray(valid_np)

      qwin = _gather_window(qpos, qadr, 7)        # (B, 7)
      q0win = _gather_window(m.qpos0, qadr, 7)    # (B, 7)
      jpos = m.jnt_pos[jids]
      jaxis = m.jnt_axis[jids]

      anchor_world = math.rotate(jpos, quat) + pos
      axis_world = math.rotate(jaxis, quat)

      is_free = jnp.asarray((jtype == JointType.FREE)[:, None])
      is_ball = jnp.asarray((jtype == JointType.BALL)[:, None])
      is_hinge = jnp.asarray((jtype == JointType.HINGE)[:, None])
      is_slide = jnp.asarray((jtype == JointType.SLIDE)[:, None])

      # --- free: pos/quat straight from qpos (already normalized) ---
      free_pos = qwin[:, 0:3]
      free_quat = math.normalize_quat(qwin[:, 3:7])

      # --- ball: rotate about (possibly off-center) anchor ---
      ball_quat = math.quat_mul(quat, math.normalize_quat(qwin[:, 0:4]))
      ball_pos = anchor_world - math.rotate(jpos, ball_quat)

      # --- hinge: axis-angle about anchor ---
      angle = qwin[:, 0] - q0win[:, 0]
      hinge_quat = math.quat_mul(quat, math.axis_angle_quat(jaxis, angle))
      hinge_pos = anchor_world - math.rotate(jpos, hinge_quat)

      # --- slide: translate along world axis ---
      slide_pos = pos + axis_world * (qwin[:, 0] - q0win[:, 0])[:, None]

      new_pos = (
          jnp.where(is_free, free_pos, 0)
          + jnp.where(is_ball, ball_pos, 0)
          + jnp.where(is_hinge, hinge_pos, 0)
          + jnp.where(is_slide, slide_pos, 0)
      )
      new_quat = (
          jnp.where(is_free, free_quat, 0)
          + jnp.where(is_ball, ball_quat, 0)
          + jnp.where(is_hinge, hinge_quat, 0)
          + jnp.where(is_slide, quat, 0)
      )
      anchor = jnp.where(is_free, free_pos, anchor_world)
      axis = jnp.where(is_free, up, axis_world)

      vmask = valid[:, None]
      pos = jnp.where(vmask, new_pos, pos)
      quat = jnp.where(vmask, new_quat, quat)
      xanchor = _masked_scatter(xanchor, jids, anchor, valid)
      xaxis = _masked_scatter(xaxis, jids, axis, valid)

    xpos = xpos.at[bodies].set(pos)
    xquat = xquat.at[bodies].set(quat)

  # mocap bodies override their kinematic pose
  if m.nmocap:
    mocap_bodies = np.nonzero(m.body_mocapid >= 0)[0]
    mocap_ids = m.body_mocapid[mocap_bodies]
    xpos = xpos.at[mocap_bodies].set(d.mocap_pos[mocap_ids])
    mquat = math.normalize_quat(d.mocap_quat[mocap_ids])
    xquat = xquat.at[mocap_bodies].set(mquat)

  xmat = math.quat_to_mat(xquat)
  xipos, ximat = math.local_to_global(xpos, xquat, m.body_ipos, m.body_iquat)

  d = d.replace(
      qpos=qpos, xpos=xpos, xquat=xquat, xmat=xmat,
      xanchor=xanchor, xaxis=xaxis, xipos=xipos, ximat=ximat,
  )

  if m.ngeom:
    geom_xpos, geom_xmat = math.local_to_global(
        xpos[m.geom_bodyid], xquat[m.geom_bodyid], m.geom_pos, m.geom_quat
    )
    d = d.replace(geom_xpos=geom_xpos, geom_xmat=geom_xmat)
  if m.nsite:
    site_xpos, site_xmat = math.local_to_global(
        xpos[m.site_bodyid], xquat[m.site_bodyid], m.site_pos, m.site_quat
    )
    d = d.replace(site_xpos=site_xpos, site_xmat=site_xmat)
  return d


def _tree_sum_up(m: Model, x: jax.Array) -> jax.Array:
  """Accumulates per-body quantities from leaves into ancestors.

  After this, ``x[i]`` holds the subtree sum rooted at body i (including the
  world row).  Level-wise: deepest level first, children scatter-add into
  parents.
  """
  x = jnp.asarray(x)  # may arrive as a host-numpy model leaf
  for bodies in reversed(m.tree.body_levels):
    x = x.at[m.body_parentid[bodies]].add(x[bodies])
  return x


def camlight(m: Model, d: Data) -> Data:
  """Camera poses per camera mode (analog ``mj_camlight``, ref
  ``engine_core_smooth.c:275``).  Lights are a rendering concern and are
  delegated to the host viewer (models/interop.py)."""
  if m.ncam == 0:
    return d
  dtype = d.qpos.dtype
  xpos_list, xmat_list = [], []
  up = jnp.asarray([0.0, 0.0, 1.0], dtype)
  for i in range(m.ncam):
    b = int(m.cam_bodyid[i])
    mode = int(m.cam_mode[i])
    tgt = int(m.cam_targetbodyid[i])
    pos = d.xpos[b] + d.xmat[b] @ m.cam_pos[i]
    mat = d.xmat[b] @ math.quat_to_mat(m.cam_quat[i])
    if mode in (1, 2):        # TRACK / TRACKCOM: fixed world orientation
      mat = m.cam_mat0[i]
      pos = jnp.where(
          mode == 1, d.xpos[b] + m.cam_pos0[i],
          d.subtree_com[b] + m.cam_poscom0[i])
    elif mode in (3, 4) and tgt >= 0:   # TARGETBODY(COM): look at target
      look = d.xpos[tgt] if mode == 3 else d.subtree_com[tgt]
      z = math.normalize(pos - look)    # -view direction
      x = math.normalize(jnp.cross(up, z))
      y = math.normalize(jnp.cross(z, x))
      mat = jnp.stack([x, y, z], axis=1)
    xpos_list.append(pos)
    xmat_list.append(mat)
  return d.replace(
      cam_xpos=jnp.stack(xpos_list), cam_xmat=jnp.stack(xmat_list))


def flex_vert_jacp(m: Model, d: Data, vert_xpos: jax.Array) -> jax.Array:
  """Point Jacobians of all flex vertices -> (nflexvert, nv, 3).

  Dense masked form of the per-vertex ``mj_jac`` chain walk (reference
  ``engine_support.c:389``): pinned vertices sit on bodies whose ancestor
  dof mask is empty, so their rows are exactly zero — no special casing.
  """
  vb = m.flex_vertbodyid
  mask = jnp.asarray(m.tree.body_dof_mask)[vb].astype(vert_xpos.dtype)
  offset = vert_xpos[:, None, :] - d.subtree_com[m.body_rootid[vb]][:, None, :]
  ang = d.cdof[None, :, :3]
  lin = d.cdof[None, :, 3:]
  return (lin + jnp.cross(ang, offset)) * mask[..., None]


def flex(m: Model, d: Data) -> Data:
  """Flex vertex positions, edge lengths and edge Jacobians.

  Analog of ``mj_flex`` (reference ``engine_core_smooth.c:442``),
  vectorized over all vertices/edges of all flexes at once instead of the
  reference's per-flex loops.  Element AABBs / dynamic BVH are not needed:
  collision here is static-shape narrowphase (ops/collision.py), not a
  midphase tree.  The edge Jacobian is the dense row
  ``u . (jacp(v2) - jacp(v1))`` with ``u`` the unit edge vector
  (ref :589-617).
  """
  if not m.nflex:
    return d
  vb = m.flex_vertbodyid
  centered = jnp.asarray(m.flex_centered[m.flex_vertflexid])[:, None]
  local = jnp.where(centered, jnp.zeros_like(m.flex_vert), m.flex_vert)
  xpos = d.xpos[jnp.maximum(vb, 0)] + jnp.einsum(
      "vij,vj->vi", d.xmat[jnp.maximum(vb, 0)], local)

  # trilinear interpolation (ref mj_flex engine_core_smooth.c:494):
  # vertices of interp flexes are static-weight combinations of their 8
  # node-body positions — one small matmul per flex
  if m.flex_interp_np is not None and np.any(m.flex_interp_np):
    for f in range(m.nflex):
      if not m.flex_interp_np[f]:
        continue
      na, nn = int(m.flex_nodeadr_np[f]), int(m.flex_nodenum_np[f])
      nodes = d.xpos[m.flex_nodebodyid_np[na:na + nn]]     # (nn, 3)
      w = jnp.asarray(m.flex_interp_w[f], xpos.dtype)      # (nv_f, nn)
      va, vn = int(m.flex_vertadr[f]), int(m.flex_vertnum[f])
      xpos = xpos.at[va:va + vn].set(w @ nodes)

  v1, v2 = m.flex_edge[:, 0], m.flex_edge[:, 1]
  vec = xpos[v2] - xpos[v1]
  length = math.norm_safe(vec, axis=1)
  d = d.replace(flexvert_xpos=xpos, flexedge_length=length)

  # skip the Jacobian when no edge can generate forces (ref :583-586);
  # interp flexes never carry edge forces (ref :577: rigid||interp skip)
  not_interp = (np.ones(m.nflex, bool) if m.flex_interp_np is None
                else (m.flex_interp_np == 0))
  needs_j = bool(
      np.any(m.flex_edgeequality & ~m.flex_rigid & not_interp)
  ) or m.has_flex_edge_sd or m.has_flex_elasticity
  if not needs_j:
    return d
  u = vec / length[:, None]
  jacp = flex_vert_jacp(m, d, xpos)
  J = jnp.einsum("ej,enj->en", u, jacp[v2] - jacp[v1])
  return d.replace(flexedge_J=J)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree CoM, CoM-frame inertias, and CoM-frame dof axes.

  Analog of ``mj_comPos`` (ref ``engine_core_smooth.c:183``): computes
  ``subtree_com``, the 10-compact ``cinert`` and per-dof ``cdof`` in the
  frame centered at each kinematic root's subtree CoM.
  """
  dtype = d.qpos.dtype
  mass = m.body_mass

  mass_pos = _tree_sum_up(m, d.xipos * mass[:, None])
  mass_sum = _tree_sum_up(m, mass)
  com = mass_pos / jnp.maximum(mass_sum, math.MINVAL)[:, None]
  subtree_com = jnp.where(
      (mass_sum < math.MINVAL)[:, None], d.xipos, com
  )

  # --- cinert: rotate diagonal body inertia into world, parallel-axis shift
  # to the root subtree CoM frame, pack as [triu(I), m*off, m].
  root_com = subtree_com[m.body_rootid]
  off = d.xipos - root_com
  R = d.ximat
  I_world = R * m.body_inertia[:, None, :] @ jnp.swapaxes(R, -1, -2)
  off2 = jnp.sum(off * off, axis=-1)
  # parallel axis: I += m (|off|^2 E - off off^T)
  shift = (
      off2[:, None, None] * jnp.eye(3, dtype=dtype)
      - off[:, :, None] * off[:, None, :]
  ) * mass[:, None, None]
  I_tot = I_world + shift
  cinert = jnp.concatenate(
      [
          I_tot[:, [0, 1, 2, 0, 0, 1], [0, 1, 2, 1, 2, 2]],
          off * mass[:, None],
          mass[:, None],
      ],
      axis=-1,
  )

  # --- cdof: all nv dofs at once, branchless over dof category.
  dof_jnt = m.dof_jntid
  dof_body = m.dof_bodyid
  jtype = m.jnt_type[dof_jnt]
  dof_off = np.arange(m.nv) - m.jnt_dofadr[dof_jnt]  # slot within joint

  anchor = d.xanchor[dof_jnt]
  offset = subtree_com[m.body_rootid[dof_body]] - anchor
  xaxis = d.xaxis[dof_jnt]
  xmat = d.xmat[dof_body]

  # rotational axis for free(3..5)/ball dofs: column of body xmat
  col = np.where(jtype == JointType.FREE, dof_off - 3, dof_off)
  col = np.clip(col, 0, 2)
  rot_axis = xmat[np.arange(m.nv), :, col]  # (nv, 3)

  is_free_trans = (jtype == JointType.FREE) & (dof_off < 3)
  is_free_rot = (jtype == JointType.FREE) & (dof_off >= 3)
  is_ball = jtype == JointType.BALL
  is_hinge = jtype == JointType.HINGE
  is_slide = jtype == JointType.SLIDE

  e_trans = jnp.asarray(np.eye(3)[np.clip(dof_off, 0, 2)], dtype=dtype)
  zeros3 = jnp.zeros((m.nv, 3), dtype=dtype)

  ang = (
      jnp.where(jnp.asarray(is_free_rot | is_ball)[:, None], rot_axis, 0)
      + jnp.where(jnp.asarray(is_hinge)[:, None], xaxis, 0)
  )
  lin_axis = jnp.where(
      jnp.asarray(is_free_rot | is_ball)[:, None], rot_axis, xaxis
  )
  lin = (
      jnp.where(jnp.asarray(is_free_trans)[:, None], e_trans, 0)
      + jnp.where(jnp.asarray(is_slide)[:, None], xaxis, 0)
      + jnp.where(
          jnp.asarray(is_free_rot | is_ball | is_hinge)[:, None],
          jnp.cross(lin_axis, offset),
          0,
      )
  )
  del zeros3
  cdof = jnp.concatenate([ang, lin], axis=-1)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def crb(m: Model, d: Data) -> Data:
  """Composite-rigid-body mass matrix, dense assembly.

  Analog of ``mj_crb`` (ref ``engine_core_smooth.c:1353``).  The backward
  inertia accumulation is level-wise; the matrix fill is one MXU matmul
  ``(nv,6) @ (6,nv)`` masked by the tree-ancestor sparsity pattern and
  symmetrized, instead of the reference's sparse row walk.
  """
  crb_body = _tree_sum_up(m, d.cinert)
  crb_body = crb_body.at[0].set(0.0)

  buf = math.inert_mul(crb_body[m.dof_bodyid], d.cdof)  # (nv, 6)
  full = buf @ d.cdof.T                                 # (nv, nv)
  mask = jnp.asarray(m.tree.ancestor_mask)
  lower = jnp.where(mask, full, 0.0)                    # j ancestor-of-self i
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)

  return d.replace(crb=crb_body, qM=qm)


def _dof_blocks(m: Model):
  """Independent dof blocks = root subtrees of the dof-parent forest.

  The joint-space inertia couples two dofs only when one is a tree
  ancestor of the other (the reference's ``dof_Madr`` sparsity), so M is
  block-diagonal across root subtrees.  Returns ``{size: (nblk,) start
  array}`` when every subtree's dofs are contiguous (MuJoCo's DFS dof
  ordering guarantees this) and there is more than one block; None
  otherwise (single mechanism -> plain dense path).
  """
  nv = m.nv
  par = np.asarray(m.dof_parentid)
  if nv < 2 or m.force_dense_ltdl:
    return None
  root = np.arange(nv)
  for k in range(nv):
    p = par[k]
    root[k] = root[p] if p >= 0 else k
  starts = np.nonzero(np.concatenate([[True], root[1:] != root[:-1]]))[0]
  if len(starts) < 2:
    return None
  # contiguity check: each block's dofs all map to the block's root
  sizes = np.diff(np.concatenate([starts, [nv]]))
  for s, sz in zip(starts, sizes):
    if not np.all(root[s:s + sz] == root[s]):
      return None  # non-contiguous subtree (defensive) -> dense
  groups = {}
  for s, sz in zip(starts, sizes):
    groups.setdefault(int(sz), []).append(int(s))
  return {sz: np.asarray(ss, np.int32) for sz, ss in groups.items()}


def factor_m(m: Model, d: Data) -> Data:
  """Factorizes qM (analog of ``mj_factorM`` ref :1470).

  The reference factors sparse LTDL in tree order; on TPU a dense batched
  Cholesky maps better: under ``vmap`` the factorization dispatches to the
  lane-batched Pallas kernel (``ops/linalg.py``) that keeps the whole
  factorization in VMEM with rollouts on vector lanes.

  Scenes with many independent mechanisms (humanoid100, object piles) use
  the *blocked* path instead — the dense-block-per-tree-supernode design:
  M is block-diagonal across root subtrees, so each same-size block group
  factors as one batched small Cholesky (O(sum b³) instead of O(nv³));
  the dense (nv, nv) qLD buffer just holds the factors block-wise.
  """
  from mujoco_inversedynamicstest_tpu.ops import linalg

  blocks = _dof_blocks(m)
  if blocks is None:
    return d.replace(qLD=linalg.chol_factor(d.qM))

  qld = jnp.zeros_like(d.qM)
  for sz, starts in sorted(blocks.items()):
    idx = starts[:, None] + np.arange(sz)[None]            # (nblk, sz)
    sub = d.qM[idx[:, :, None], idx[:, None, :]]           # (nblk, sz, sz)
    ch = jax.vmap(linalg.chol_factor)(sub)
    qld = qld.at[idx[:, :, None], idx[:, None, :]].set(ch)
  return d.replace(qLD=qld)


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """Solves M y = x using the factorization (analog ``mj_solveM`` ref :1713)."""
  from mujoco_inversedynamicstest_tpu.ops import linalg

  blocks = _dof_blocks(m)
  if blocks is None:
    return linalg.chol_solve(d.qLD, x)

  y = jnp.zeros_like(x)
  for sz, starts in sorted(blocks.items()):
    idx = starts[:, None] + np.arange(sz)[None]
    lsub = d.qLD[idx[:, :, None], idx[:, None, :]]
    sol = jax.vmap(linalg.chol_solve)(lsub, x[idx])  # (nblk, sz[, k])
    y = y.at[idx].set(sol)
  return y


def mul_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """Computes M @ x (analog of ``mj_mulM``, ref engine_support.c:966)."""
  return d.qM @ x


def com_vel(m: Model, d: Data) -> Data:
  """Body CoM-frame velocities and dof-axis rates.

  Analog of ``mj_comVel`` (ref ``engine_core_smooth.c:1833``).  Level-wise
  over bodies; within a body, joints are applied in slot order with the
  reference's exact update semantics:

  * hinge/slide: ``cdof_dot = v x cdof`` with v *before* this dof;
  * ball: all 3 dofs use v before the joint;
  * free: translation dofs contribute first (cdof_dot = 0), rotation dofs
    use v *after* the translation update.
  """
  dtype = d.qpos.dtype
  nb = m.nbody
  cvel = jnp.zeros((nb, 6), dtype=dtype)
  cdof_dot = jnp.zeros((m.nv, 6), dtype=dtype)
  qvel = d.qvel

  for lvl, bodies in enumerate(m.tree.body_levels):
    vel = cvel[m.body_parentid[bodies]]

    for k in range(m.tree.level_max_jnts[lvl]):
      valid_np = k < m.body_jntnum[bodies]
      jids = np.where(valid_np, m.body_jntadr[bodies] + k, 0)
      jtype = m.jnt_type[jids]
      dadr = m.jnt_dofadr[jids]
      width = np.array([6, 3, 1, 1])[jtype]

      win = np.clip(dadr[:, None] + np.arange(6)[None, :], 0, m.nv - 1)
      wmask_np = (np.arange(6)[None, :] < width[:, None]) & valid_np[:, None]
      wmask = jnp.asarray(wmask_np, dtype=dtype)

      cd = d.cdof[win]                      # (B, 6, 6)
      qv = qvel[win] * wmask                # (B, 6)

      is_free = (jtype == JointType.FREE)[:, None]

      # translation-first update for free joints
      trans_sel = jnp.asarray(
          is_free & (np.arange(6)[None, :] < 3), dtype=dtype
      )
      vel_mid = vel + jnp.einsum("bw,bwc->bc", qv * trans_sel, cd)

      # cdof_dot: cross(v, cdof) with the appropriate v per dof slot
      cdd_pre = math.motion_cross(vel[:, None, :], cd)
      cdd_mid = math.motion_cross(vel_mid[:, None, :], cd)
      free_rot = jnp.asarray(is_free & (np.arange(6)[None, :] >= 3))
      free_trans = jnp.asarray(is_free & (np.arange(6)[None, :] < 3))
      cdd = jnp.where(free_rot[..., None], cdd_mid, cdd_pre)
      cdd = jnp.where(free_trans[..., None], 0.0, cdd)

      cdof_dot = _masked_scatter(cdof_dot, win, cdd, jnp.asarray(wmask_np))
      vel = vel + jnp.einsum("bw,bwc->bc", qv, cd)

    cvel = cvel.at[bodies].set(vel)

  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def _tendon_segment(m: Model, d: Data, p0, b0: int, p1, b1: int):
  """Length + moment row of one straight tendon segment.

  ``d len/d q = dir^T (Jp(p1,b1) − Jp(p0,b0))`` with ``dir`` the unit segment
  direction (reference ``mj_tendon`` segment loop, engine_core_smooth.c:651).
  Bodies are static ints, so same-body segments fold to zero at trace time.
  """
  from mujoco_inversedynamicstest_tpu.ops import support

  dif = p1 - p0
  ln = jnp.linalg.norm(dif)
  if b0 == b1:
    return ln, jnp.zeros(m.nv, dtype=p0.dtype)
  vec = jnp.where(ln < 1e-15, jnp.array([1.0, 0.0, 0.0], dtype=p0.dtype),
                  dif / jnp.maximum(ln, 1e-15))
  jacp0, _ = support.jac(m, d, p0, b0)
  jacp1, _ = support.jac(m, d, p1, b1)
  return ln, (jacp1 - jacp0) @ vec


def _spatial_tendon(m: Model, d: Data, adr: int, num: int):
  """One spatial tendon: sites, sphere/cylinder wrap geoms, pulleys."""
  from mujoco_inversedynamicstest_tpu.models.types import WrapType
  from mujoco_inversedynamicstest_tpu.ops import wrap as wrap_mod

  dtype = d.qpos.dtype
  length = jnp.zeros((), dtype=dtype)
  row = jnp.zeros(m.nv, dtype=dtype)

  # split the wrap sequence into pulley-delimited branches, each with its
  # length divisor (reference engine_core_smooth.c: pulley handling)
  branches = []  # (divisor, [element ids])
  divisor, cur = 1.0, []
  for i in range(adr, adr + num):
    if m.wrap_type[i] == WrapType.PULLEY:
      if cur:
        branches.append((divisor, cur))
      divisor = max(float(m.wrap_prm_np[i]), 1e-15)
      cur = []
    else:
      cur.append(i)
  if cur:
    branches.append((divisor, cur))

  for divisor, elems in branches:
    # point list: sites pass through; wrap geoms expand to two tangent
    # points with a data-dependent arc — handled per site-geom-site triple
    j = 0
    while j < len(elems) - 1:
      i0 = elems[j]
      assert m.wrap_type[i0] == WrapType.SITE, "tendon path must alternate"
      s0 = m.wrap_objid[i0]
      b0 = int(m.site_bodyid[s0])
      p0 = d.site_xpos[s0]
      i1 = elems[j + 1]
      if m.wrap_type[i1] == WrapType.SITE:
        s1 = m.wrap_objid[i1]
        ln, jr = _tendon_segment(m, d, p0, b0, d.site_xpos[s1],
                                 int(m.site_bodyid[s1]))
        length += ln / divisor
        row += jr / divisor
        j += 1
      else:  # SPHERE or CYLINDER wrap between two sites
        gid = m.wrap_objid[i1]
        bg = int(m.geom_bodyid[gid])
        is_sphere = m.wrap_type[i1] == WrapType.SPHERE
        sid = int(round(float(m.wrap_prm_np[i1])))
        has_side = sid >= 0
        side = d.site_xpos[max(sid, 0)]
        i2 = elems[j + 2]
        assert m.wrap_type[i2] == WrapType.SITE, "wrap geom needs site after"
        s1 = m.wrap_objid[i2]
        b1 = int(m.site_bodyid[s1])
        p1 = d.site_xpos[s1]

        wlen, w0, w1 = wrap_mod.wrap(
            p0, p1, d.geom_xpos[gid], d.geom_xmat[gid], m.geom_size[gid, 0],
            side, jnp.asarray(has_side), bool(is_sphere))
        no_wrap = wlen < 0

        l_ss, j_ss = _tendon_segment(m, d, p0, b0, p1, b1)
        l_sg, j_sg = _tendon_segment(m, d, p0, b0, w0, bg)
        l_gs, j_gs = _tendon_segment(m, d, w1, bg, p1, b1)

        ln = jnp.where(no_wrap, l_ss, l_sg + jnp.maximum(wlen, 0.0) + l_gs)
        jr = jnp.where(no_wrap, j_ss, j_sg + j_gs)
        length += ln / divisor
        row += jr / divisor
        j += 2

  return length, row


def tendon(m: Model, d: Data) -> Data:
  """Tendon lengths and moment arms (analog ``mj_tendon``, ref :651).

  Fixed tendons (joint-coupling, wrap type JOINT) are a static linear map:
  ``len = sum_w prm_w qpos[jnt_w]``, ``J row = prm`` at the joint dofs.
  Spatial tendons thread straight segments through sites with
  sphere/cylinder wrapping (incl. sidesites and pulleys); the wrap geometry
  lives in ``ops/wrap.py``.  Tendons are few and heterogeneous, so they are
  unrolled at trace time; each one is a handful of fused vector ops.
  """
  from mujoco_inversedynamicstest_tpu.models.types import WrapType

  if not m.ntendon:
    return d

  dtype = d.qpos.dtype
  lengths = []
  rows = []
  for t in range(m.ntendon):
    adr, num = m.tendon_adr[t], m.tendon_num[t]
    wtypes = m.wrap_type[adr : adr + num]
    if np.all(wtypes == WrapType.JOINT):
      jids = m.wrap_objid[adr : adr + num]
      prm = m.wrap_prm[adr : adr + num]
      qadr = m.jnt_qposadr[jids]
      vadr = m.jnt_dofadr[jids]
      lengths.append(jnp.dot(prm, d.qpos[qadr]))
      row = jnp.zeros(m.nv, dtype=dtype).at[vadr].add(prm)
      rows.append(row)
    else:
      ln, row = _spatial_tendon(m, d, int(adr), int(num))
      lengths.append(ln)
      rows.append(row)

  return d.replace(
      ten_length=jnp.stack(lengths), ten_J=jnp.stack(rows)
  )


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment arms (dense (nu, nv) moment matrix).

  Analog of ``mj_transmission`` (reference ``engine_core_smooth.c:865``)
  for JOINT / JOINTINPARENT transmissions; tendon and site transmissions
  are filled in by the tendon module.  The reference stores moments
  sparsely; here the moment matrix is dense so actuation becomes two
  MXU matmuls.
  """
  from mujoco_inversedynamicstest_tpu.models.types import TrnType

  if not m.nu:
    return d

  dtype = d.qpos.dtype
  length = jnp.zeros(m.nu, dtype=dtype)
  moment = jnp.zeros((m.nu, m.nv), dtype=dtype)

  trntype = m.actuator_trntype
  trnid = m.actuator_trnid[:, 0]

  joint_like = np.isin(
      trntype, (TrnType.JOINT, TrnType.JOINTINPARENT)
  )
  # trnid indexes joints only for joint transmissions; clip others to 0
  jnt_of = m.jnt_type[np.where(joint_like, trnid, 0)]

  # --- scalar joints (hinge/slide): length = qpos * gear0, moment = gear0
  sel = np.nonzero(
      joint_like
      & np.isin(jnt_of, (JointType.HINGE, JointType.SLIDE))
  )[0]
  if sel.size:
    jid = trnid[sel]
    g0 = m.actuator_gear[sel, 0]
    length = length.at[sel].set(d.qpos[m.jnt_qposadr[jid]] * g0)
    moment = moment.at[sel, m.jnt_dofadr[jid]].set(g0)

  # --- ball joints: 3D rotational gear
  sel = np.nonzero(joint_like & (jnt_of == JointType.BALL))[0]
  if sel.size:
    jid = trnid[sel]
    qidx = m.jnt_qposadr[jid][:, None] + np.arange(4)[None, :]
    quat = math.normalize_quat(d.qpos[qidx])
    axis = math.quat_sub(quat, jnp.zeros_like(quat).at[:, 0].set(1.0))
    gear = m.actuator_gear[sel, 0:3]
    in_parent = jnp.asarray(
        (trntype[sel] == TrnType.JOINTINPARENT)[:, None]
    )
    gear_axis = jnp.where(in_parent, math.rotate_inv(gear, quat), gear)
    length = length.at[sel].set(jnp.sum(axis * gear_axis, axis=-1))
    vidx = m.jnt_dofadr[jid][:, None] + np.arange(3)[None, :]
    moment = moment.at[sel[:, None], vidx].set(gear_axis)

  # --- free joints: 6D wrench gear, zero length
  sel = np.nonzero(joint_like & (jnt_of == JointType.FREE))[0]
  if sel.size:
    jid = trnid[sel]
    qidx = m.jnt_qposadr[jid][:, None] + 3 + np.arange(4)[None, :]
    quat = math.normalize_quat(d.qpos[qidx])
    gear_rot = m.actuator_gear[sel, 3:6]
    in_parent = jnp.asarray(
        (trntype[sel] == TrnType.JOINTINPARENT)[:, None]
    )
    gear_axis = jnp.where(
        in_parent, math.rotate_inv(gear_rot, quat), gear_rot
    )
    vidx = m.jnt_dofadr[jid][:, None] + np.arange(6)[None, :]
    moment = moment.at[sel[:, None], vidx].set(
        jnp.concatenate([m.actuator_gear[sel, 0:3], gear_axis], axis=-1)
    )

  # --- tendon transmission: length/moment from the tendon module
  # (reference engine_core_smooth.c:865 mjTRN_TENDON branch)
  sel = np.nonzero(trntype == TrnType.TENDON)[0]
  if sel.size:
    tid = trnid[sel]
    g0 = m.actuator_gear[sel, 0]
    length = length.at[sel].set(d.ten_length[tid] * g0)
    moment = moment.at[sel].set(g0[:, None] * d.ten_J[tid])

  # --- site transmission: wrench gear applied at the site frame
  # (reference mjTRN_SITE, engine_core_smooth.c:1084: without refsite
  # length = 0, moment = gear·J_site; with refsite length/moment are the
  # site pose relative to the reference site, common-ancestor dof columns
  # cleared)
  sel = np.nonzero(trntype == TrnType.SITE)[0]
  if sel.size:
    from mujoco_inversedynamicstest_tpu.ops import support

    for i in sel:
      sid = trnid[i]
      refid = int(m.actuator_trnid[i, 1])
      bid = int(m.site_bodyid[sid])
      jacp, jacr = support.jac(m, d, d.site_xpos[sid], bid)

      if refid < 0:
        smat = d.site_xmat[sid]
        gear_t = smat @ m.actuator_gear[i, 0:3]
        gear_r = smat @ m.actuator_gear[i, 3:6]
        moment = moment.at[i].set(jacp @ gear_t + jacr @ gear_r)
        continue

      rbid = int(m.site_bodyid[refid])
      jacp_r, jacr_r = support.jac(m, d, d.site_xpos[refid], rbid)
      rmat = d.site_xmat[refid]

      # static: common ancestral dof chain of the two (weld) bodies
      ancestor_dofs = _common_ancestor_dofs(m, bid, rbid)
      col_mask = np.ones(m.nv)
      col_mask[ancestor_dofs] = 0.0
      cmask = jnp.asarray(col_mask, dtype=jacp.dtype)[:, None]

      li = jnp.zeros((), dtype=jacp.dtype)
      mi = jnp.zeros(m.nv, dtype=jacp.dtype)

      # zero gear components contribute exactly zero, so both the
      # translational and rotational terms run unconditionally
      gear_t = m.actuator_gear[i, 0:3]
      vec = rmat.T @ (d.site_xpos[sid] - d.site_xpos[refid])
      li = li + vec @ gear_t
      wrench_t = rmat @ gear_t
      mi = mi + ((jacp - jacp_r) * cmask) @ wrench_t

      gear_r = m.actuator_gear[i, 3:6]
      quat = math.quat_mul(m.site_quat[sid], d.xquat[bid])
      refquat = math.quat_mul(m.site_quat[refid], d.xquat[rbid])
      vec_r = math.quat_sub(quat, refquat)
      li = li + vec_r @ gear_r
      wrench_r = rmat @ gear_r
      mi = mi + ((jacr - jacr_r) * cmask) @ wrench_r

      length = length.at[i].set(li)
      moment = moment.at[i].set(mi)

  # --- slider-crank transmission (reference mjTRN_SLIDERCRANK:988)
  sel = np.nonzero(trntype == TrnType.SLIDERCRANK)[0]
  if sel.size:
    from mujoco_inversedynamicstest_tpu.ops import support

    for i in sel:
      sid = trnid[i]                     # crank site
      slid = int(m.actuator_trnid[i, 1])  # slider site
      rod = m.actuator_cranklength[i]
      axis = d.site_xmat[slid][:, 2]
      vec = d.site_xpos[sid] - d.site_xpos[slid]

      av = vec @ axis
      det = av * av + rod * rod - vec @ vec
      ok = det > 0
      sdet = jnp.sqrt(jnp.maximum(det, math.MINVAL))
      li = av - jnp.where(ok, sdet, 0.0)

      one_m = 1.0 - av / sdet
      dldv = jnp.where(ok, axis * one_m + vec / sdet, axis)
      dlda = jnp.where(ok, vec * one_m, vec)

      jacp_c, _ = support.jac(m, d, d.site_xpos[sid], int(m.site_bodyid[sid]))
      jacp_s, jacr_s = support.jac(
          m, d, d.site_xpos[slid], int(m.site_bodyid[slid]))
      jac_axis = jnp.cross(jacr_s, axis[None, :])       # (nv, 3)
      jac_vec = jacp_c - jacp_s

      g0 = m.actuator_gear[i, 0]
      length = length.at[i].set(li * g0)
      moment = moment.at[i].set((jac_axis @ dlda + jac_vec @ dldv) * g0)

  # --- body transmission (adhesion; reference mjTRN_BODY:1229): moment is
  # minus the average normal-direction Jacobian over the body's contacts
  # detected within margin
  sel = np.nonzero(trntype == TrnType.BODY)[0]
  if sel.size:
    from mujoco_inversedynamicstest_tpu.ops import collision as coll_mod

    clay = coll_mod.contact_layout(m)
    if clay.ncon:
      con = d.contact
      counted = con.dist < con.margin
      b1 = jnp.asarray(m.geom_bodyid)[con.geom1]
      b2 = jnp.asarray(m.geom_bodyid)[con.geom2]

      # normal-direction Jacobian per slot (the average of pyramid rows
      # equals J_normal exactly; elliptic row0 is J_normal)
      com = d.subtree_com[m.body_rootid]
      n_dir = con.frame[:, 0]
      bmask = jnp.asarray(m.tree.body_dof_mask)

      def side(bids):
        off = con.pos - com[bids]
        u = jnp.concatenate([jnp.cross(off, n_dir), n_dir], axis=1)
        return u @ d.cdof.T              # (ncon, nv)

      jn = jnp.where(bmask[b2], side(b2), 0.0) - jnp.where(
          bmask[b1], side(b1), 0.0)

      for i in sel:
        bid = int(m.actuator_trnid[i, 0])
        relevant = (b1 == bid) | (b2 == bid)
        cmask = (counted & relevant).astype(jn.dtype)
        counter = jnp.sum(cmask)
        mom = -(cmask @ jn) / jnp.maximum(1.0, counter)
        mom = jnp.where(counter > 0, mom, 0.0)
        moment = moment.at[i].set(mom)

  return d.replace(actuator_length=length, actuator_moment=moment)


def _common_ancestor_dofs(m: Model, b0: int, b1: int) -> np.ndarray:
  """Dofs of the common ancestral chain of two bodies (static).

  Mirrors the refsite common-dof search in ``mj_transmission``
  (engine_core_smooth.c:1109-1137): walk the dof tree up from each body's
  last dof until the chains meet; the meeting dof and all its ancestors
  are cleared from the difference Jacobian.
  """
  w0 = int(m.body_weldid[b0])
  w1 = int(m.body_weldid[b1])
  d0 = int(m.body_dofadr[w0] + m.body_dofnum[w0] - 1)
  d1 = int(m.body_dofadr[w1] + m.body_dofnum[w1] - 1)
  if d0 < 0 or d1 < 0 or m.body_dofnum[w0] == 0 or m.body_dofnum[w1] == 0:
    return np.zeros(0, np.int32)
  while d0 != d1:
    if d0 < d1:
      d1 = int(m.dof_parentid[d1])
    else:
      d0 = int(m.dof_parentid[d0])
    if d0 == -1 or d1 == -1:
      return np.zeros(0, np.int32)
  chain = []
  da = d0
  while da >= 0:
    chain.append(da)
    da = int(m.dof_parentid[da])
  return np.array(chain, np.int32)


def subtree_vel(m: Model, d: Data):
  """Subtree linear velocity and angular momentum.

  Analog of ``mj_subtreeVel`` (ref ``engine_core_smooth.c:1900``).
  Returns (subtree_linvel, subtree_angmom), each (nbody, 3).
  """
  dtype = d.qpos.dtype
  nb = m.nbody

  # body CoM-frame velocities at xipos
  off = d.xipos - d.subtree_com[m.body_rootid]
  ang = d.cvel[:, :3]
  lin = d.cvel[:, 3:] + jnp.cross(ang, off)

  # subtree linear momentum -> velocity
  linmom = _tree_sum_up(m, lin * m.body_mass[:, None])
  subtree_linvel = linmom / jnp.maximum(
      m.body_subtreemass, math.MINVAL
  )[:, None]

  # body angular momentum about own CoM (world frame)
  R = d.ximat
  iw = R * m.body_inertia[:, None, :] @ jnp.swapaxes(R, -1, -2)
  angmom_own = jnp.einsum("bij,bj->bi", iw, ang)

  # momentum wrt own subtree CoM + parent-shift terms, accumulated up.
  # The reference does this serially; level-wise both terms are summed
  # into the parent along with the child subtotal.
  dx_b = d.xipos - d.subtree_com
  dv_b = lin - subtree_linvel
  own_term = angmom_own + jnp.cross(dx_b, dv_b * m.body_mass[:, None])
  own_term = own_term.at[0].set(angmom_own[0])

  dx_p = d.subtree_com - d.subtree_com[m.body_parentid]
  dv_p = subtree_linvel - subtree_linvel[m.body_parentid]
  parent_term = jnp.cross(
      dx_p, dv_p * m.body_subtreemass[:, None]
  )

  angmom = own_term
  for bodies in reversed(m.tree.body_levels):
    par = m.body_parentid[bodies]
    angmom = angmom.at[par].add(angmom[bodies] + parent_term[bodies])

  return subtree_linvel, angmom


def rne_postconstraint(m: Model, d: Data) -> Data:
  """Body accelerations and interaction forces with complete dynamics.

  Analog of ``mj_rnePostConstraint`` (ref ``engine_core_smooth.c:2027``):
  computes ``cacc`` (including qacc), ``cfrc_ext`` (applied + contact
  wrenches) and ``cfrc_int`` (interaction forces accumulated up the tree).
  Used by acceleration-stage sensors (force/torque/accelerometer).
  """
  dtype = d.qpos.dtype
  nb = m.nbody

  # cfrc_ext from xfrc_applied, re-expressed at the body CoM frame
  offset = d.subtree_com[m.body_rootid] - d.xipos
  torque = d.xfrc_applied[:, 3:] - jnp.cross(offset, d.xfrc_applied[:, :3])
  cfrc_ext = jnp.concatenate([torque, d.xfrc_applied[:, :3]], axis=1)
  cfrc_ext = cfrc_ext.at[0].set(0.0)

  # add contact wrenches
  if d.contact is not None and d.contact.dist.shape[0]:
    from mujoco_inversedynamicstest_tpu.ops import collision as coll_mod
    from mujoco_inversedynamicstest_tpu.ops import constraint as con_mod

    clay = coll_mod.contact_layout(m)
    con = d.contact
    ncon = clay.ncon

    # contact force in contact frame (ref mj_contactForce,
    # engine_support.c:1459), vectorized over slots and cone-aware
    forces = con_mod.contact_forces_frame(m, d)

    # to world frame: frame rows are [n, t1, t2]
    f_world = jnp.einsum("cij,ci->cj", con.frame, forces[:, :3])
    t_world = jnp.einsum("cij,ci->cj", con.frame, forces[:, 3:])

    b1 = jnp.asarray(m.geom_bodyid)[con.geom1]
    b2 = jnp.asarray(m.geom_bodyid)[con.geom2]
    rootid = jnp.asarray(m.body_rootid)
    com1 = d.subtree_com[rootid[b1]]
    com2 = d.subtree_com[rootid[b2]]

    def wrench(com):
      off = com - con.pos
      t = t_world - jnp.cross(off, f_world)
      return jnp.concatenate([t, f_world], axis=1)

    active = (con.dist < con.includemargin)[:, None]
    w1 = -wrench(com1) * active
    w2 = wrench(com2) * active
    cfrc_ext = cfrc_ext.at[b1].add(jnp.where((b1 != 0)[:, None], w1, 0.0))
    cfrc_ext = cfrc_ext.at[b2].add(jnp.where((b2 != 0)[:, None], w2, 0.0))

  # forward pass: cacc with full qacc
  seg = jnp.asarray(m.dof_bodyid)
  contrib = d.cdof_dot * d.qvel[:, None] + d.cdof * d.qacc[:, None]
  body_contrib = jax.ops.segment_sum(contrib, seg, num_segments=nb)
  if m.opt.disableflags & DisableBit.GRAVITY:
    g = jnp.zeros(6, dtype=dtype)
  else:
    g = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)]
    )
  cacc = jnp.zeros((nb, 6), dtype=dtype).at[0].set(g)
  for bodies in m.tree.body_levels:
    cacc = cacc.at[bodies].set(
        cacc[m.body_parentid[bodies]] + body_contrib[bodies]
    )

  # cfrc_int = body inertial force - external force, accumulated up
  cfrc_body = math.inert_mul(d.cinert, cacc) + math.force_cross(
      d.cvel, math.inert_mul(d.cinert, d.cvel)
  )
  cfrc_int = cfrc_body - cfrc_ext
  cfrc_int = cfrc_int.at[0].set(0.0)
  cfrc_int = _tree_sum_up(m, cfrc_int).at[0].set(0.0)

  return d.replace(cacc=cacc, cfrc_int=cfrc_int, cfrc_ext=cfrc_ext)


def rne(m: Model, d: Data, flg_acc: bool = False) -> jax.Array:
  """Recursive Newton-Euler: C(qpos,qvel) [+ M qacc if flg_acc].

  Analog of ``mj_rne`` (ref ``engine_core_smooth.c:1969``).  The
  per-body dof sums have no intra-body ordering dependence, so they are
  computed as one segment-sum over dofs; the tree prefix/suffix passes are
  level-wise.
  Returns the generalized force vector (nv,).
  """
  dtype = d.qpos.dtype
  nb = m.nbody
  seg = jnp.asarray(m.dof_bodyid)

  # per-body velocity (and optionally acceleration) bias contributions
  contrib = d.cdof_dot * d.qvel[:, None]
  if flg_acc:
    contrib = contrib + d.cdof * d.qacc[:, None]
  body_contrib = jax.ops.segment_sum(contrib, seg, num_segments=nb)

  # world pseudo-acceleration = -gravity (unless disabled)
  if m.opt.disableflags & DisableBit.GRAVITY:
    g = jnp.zeros(6, dtype=dtype)
  else:
    g = jnp.concatenate(
        [jnp.zeros(3, dtype=dtype), -m.opt.gravity.astype(dtype)]
    )
  cacc = jnp.zeros((nb, 6), dtype=dtype).at[0].set(g)
  for bodies in m.tree.body_levels:
    cacc = cacc.at[bodies].set(
        cacc[m.body_parentid[bodies]] + body_contrib[bodies]
    )

  # body-local forces: I a + v x* (I v)
  cfrc = math.inert_mul(d.cinert, cacc) + math.force_cross(
      d.cvel, math.inert_mul(d.cinert, d.cvel)
  )
  cfrc = cfrc.at[0].set(0.0)
  cfrc = _tree_sum_up(m, cfrc)

  # project into joint space
  return jnp.sum(d.cdof * cfrc[seg], axis=-1)
