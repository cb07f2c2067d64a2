"""Passive forces: joint springs, dof dampers, gravity compensation, fluid.

Analog of ``mj_passive`` (reference ``src/engine/engine_passive.c:436``):
``qfrc_passive = qfrc_spring + qfrc_damper + qfrc_gravcomp + qfrc_fluid``
with per-component disable flags (installed-mujoco SPRING/DAMPER split).
Joint springs are computed branchlessly per joint group; gravity
compensation uses the dense all-body point-Jacobian contraction from
:mod:`support`.
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
from mujoco_inversedynamicstest_tpu.ops import math, support


def _spring(m: Model, d: Data) -> jax.Array:
  """Joint-level spring forces toward ``qpos_spring``."""
  qfrc = jnp.zeros(m.nv, dtype=d.qpos.dtype)
  jt = m.jnt_type

  scalar = np.nonzero((jt == JointType.HINGE) | (jt == JointType.SLIDE))[0]
  if scalar.size:
    padr = m.jnt_qposadr[scalar]
    vadr = m.jnt_dofadr[scalar]
    k = m.jnt_stiffness[scalar]
    qfrc = qfrc.at[vadr].add(-k * (d.qpos[padr] - m.qpos_spring[padr]))

  free = np.nonzero(jt == JointType.FREE)[0]
  if free.size:
    padr = m.jnt_qposadr[free]
    vadr = m.jnt_dofadr[free]
    k = m.jnt_stiffness[free]
    pidx = padr[:, None] + np.arange(3)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    qfrc = qfrc.at[vidx].add(
        -k[:, None] * (d.qpos[pidx] - m.qpos_spring[pidx])
    )

  # rotational springs (ball joints; rotational part of free joints)
  ball = np.nonzero(jt == JointType.BALL)[0]
  rot_jnts = [(ball, 0, 0)] + ([(free, 3, 3)] if free.size else [])
  for jids, p_off, v_off in rot_jnts:
    if not jids.size:
      continue
    padr = m.jnt_qposadr[jids] + p_off
    vadr = m.jnt_dofadr[jids] + v_off
    k = m.jnt_stiffness[jids]
    pidx = padr[:, None] + np.arange(4)[None, :]
    vidx = vadr[:, None] + np.arange(3)[None, :]
    quat = math.normalize_quat(d.qpos[pidx])
    dif = math.quat_sub(quat, m.qpos_spring[pidx])
    qfrc = qfrc.at[vidx].add(-k[:, None] * dif)

  return qfrc


def _geom_semiaxes(m: Model) -> jax.Array:
  """Equivalent ellipsoid semi-axes per geom (ref ``mju_geomSemiAxes``).

  Geom types are static; sizes stay traced leaves (branchless selects)."""
  size = m.geom_size
  t = m.geom_type
  rnd = jnp.asarray((t == 2) | (t == 3) | (t == 5))  # sphere/capsule/cyl
  s1 = jnp.where(rnd, size[:, 0], size[:, 1])
  s2 = jnp.where(jnp.asarray(t == 2), size[:, 0],
                 jnp.where(jnp.asarray(t == 3), size[:, 0] + size[:, 1],
                           size[:, 2]))
  s2 = jnp.where(jnp.asarray(t == 5), size[:, 1], s2)
  return jnp.stack([size[:, 0], s1, s2], axis=1)


def ellipsoid_fluid(m: Model, d: Data, geoms: np.ndarray) -> jax.Array:
  """Ellipsoid-model fluid forces for the given geoms (vectorized).

  Analog of ``mj_ellipsoidFluidModel``/``mj_addedMassForces``/
  ``mj_viscousForces`` (reference ``engine_passive.c:588-790``): added-mass
  coupling, Magnus and Kutta lift, blunt/slender/angular drag, and Stokes
  viscosity on the equivalent ellipsoid, per geom, applied at geom centers.
  """
  dtype = d.qpos.dtype
  g = geoms
  bodies = m.geom_bodyid[g]
  size = jnp.asarray(_geom_semiaxes(m), dtype)[g]      # (ng, 3)
  coefs = m.geom_fluid[g]                              # (ng, 12)
  (interact, c_blunt, c_slender, c_ang, c_kutta, c_magnus) = (
      coefs[:, 0], coefs[:, 1], coefs[:, 2], coefs[:, 3], coefs[:, 4],
      coefs[:, 5])
  v_mass = coefs[:, 6:9]
  v_inert = coefs[:, 9:12]
  rho = m.opt.density
  visc = m.opt.viscosity

  # 6D geom-frame velocity at the geom center, wind subtracted
  offset = d.geom_xpos[g] - d.subtree_com[m.body_rootid[bodies]]
  vel = jax.vmap(math.transform_motion)(d.cvel[bodies], offset)
  gmt = jnp.swapaxes(d.geom_xmat[g], -1, -2)
  ang = jnp.einsum("gij,gj->gi", gmt, vel[:, :3])
  lin = jnp.einsum("gij,gj->gi", gmt, vel[:, 3:])
  lin = lin - jnp.einsum("gij,j->gi", gmt, m.opt.wind)

  # --- added-mass forces (ref mj_addedMassForces:650) ---
  p_lin = rho * v_mass * lin
  p_ang = rho * v_inert * ang
  frc_ang = jnp.cross(p_lin, lin) + jnp.cross(p_ang, ang)
  frc_lin = jnp.cross(p_lin, ang)

  # --- viscous/lift/drag (ref mj_viscousForces:705) ---
  s0, s1, s2 = size[:, 0], size[:, 1], size[:, 2]
  volume = 4.0 / 3.0 * jnp.pi * s0 * s1 * s2
  d_max = jnp.max(size, axis=1)
  d_min = jnp.min(size, axis=1)
  d_mid = s0 + s1 + s2 - d_max - d_min
  a_max = jnp.pi * d_max * d_mid

  magnus = jnp.cross(ang, lin) * (c_magnus * rho * volume)[:, None]

  pow2 = lambda x: x * x
  pow4 = lambda x: pow2(x) * pow2(x)
  proj_denom = (pow4(s1 * s2) * pow2(lin[:, 0])
                + pow4(s2 * s0) * pow2(lin[:, 1])
                + pow4(s0 * s1) * pow2(lin[:, 2]))
  proj_num = (pow2(s1 * s2 * lin[:, 0]) + pow2(s2 * s0 * lin[:, 1])
              + pow2(s0 * s1 * lin[:, 2]))
  a_proj = jnp.pi * jnp.sqrt(
      proj_denom / jnp.maximum(math.MINVAL, proj_num))

  norm = jnp.stack([
      pow2(s1 * s2) * lin[:, 0],
      pow2(s2 * s0) * lin[:, 1],
      pow2(s0 * s1) * lin[:, 2],
  ], axis=1)
  lin_norm = jnp.linalg.norm(lin, axis=1)
  cos_alpha = proj_num / jnp.maximum(
      math.MINVAL, lin_norm * proj_denom)
  kutta_circ = jnp.cross(norm, lin) * (
      c_kutta * rho * cos_alpha * a_proj)[:, None]
  kutta = jnp.cross(kutta_circ, lin)

  eq_d = 2.0 / 3.0 * (s0 + s1 + s2)
  lin_visc_f = 3.0 * jnp.pi * eq_d
  lin_visc_t = jnp.pi * eq_d**3

  def max_moment(d0, d1, d2):
    return 8.0 / 15.0 * jnp.pi * d0 * pow4(jnp.maximum(d1, d2))

  i_max = 8.0 / 15.0 * jnp.pi * d_mid * pow4(d_max)
  II = jnp.stack([
      max_moment(s0, s1, s2), max_moment(s1, s2, s0), max_moment(s2, s0, s1)
  ], axis=1)
  mom_visc = ang * (c_ang[:, None] * II
                    + c_slender[:, None] * (i_max[:, None] - II))

  drag_lin = visc * lin_visc_f + rho * lin_norm * (
      a_proj * c_blunt + c_slender * (a_max - a_proj))
  drag_ang = visc * lin_visc_t + rho * jnp.linalg.norm(mom_visc, axis=1)

  frc_ang = frc_ang - drag_ang[:, None] * ang
  frc_lin = frc_lin + magnus + kutta - drag_lin[:, None] * lin

  # interaction coef scaling; massless parent bodies are skipped like the
  # reference's mj_fluid body loop (mass < MINVAL)
  scale = interact[:, None] * (m.body_mass[bodies] >= 1e-15)[:, None]
  frc_ang = frc_ang * scale
  frc_lin = frc_lin * scale

  # world frame, applied at geom centers: qfrc = sum_g mask_b (cdof @ u6)
  f_w = jnp.einsum("gij,gj->gi", d.geom_xmat[g], frc_lin)
  t_w = jnp.einsum("gij,gj->gi", d.geom_xmat[g], frc_ang)
  u = jnp.concatenate([jnp.cross(offset, f_w) + t_w, f_w], axis=1)
  rows = u @ d.cdof.T                                  # (ng, nv)
  bmask = jnp.asarray(m.tree.body_dof_mask)[bodies]
  return jnp.sum(jnp.where(bmask, rows, 0.0), axis=0).astype(dtype)


def fluid(m: Model, d: Data) -> jax.Array:
  """Inertia-box fluid forces: viscosity + quadratic lift/drag.

  Analog of ``mj_inertiaBoxFluidModel`` (reference
  ``engine_passive.c:527-583``): each body is approximated by the
  equivalent-inertia box; angular/linear viscous drag plus
  density-quadratic lift/drag act at the body CoM in the inertial frame,
  with wind subtracted.  Vectorized over all bodies — one fused batch of
  (nbody, ...) elementwise ops plus a single Jacobian contraction.
  """
  dtype = d.qpos.dtype

  # equivalent box from principal inertia (world body excluded via mass=0;
  # bodies owning an ellipsoid-fluid geom use the per-geom model instead,
  # ref mj_fluid, engine_passive.c:404-427)
  inert = m.body_inertia  # (nbody, 3)
  mass = jnp.maximum(m.body_mass, 1e-15)
  sum_roll = inert[:, [1, 0, 0]] + inert[:, [2, 2, 1]] - inert
  box = jnp.sqrt(jnp.maximum(sum_roll, 1e-15) / mass[:, None] * 6.0)
  use_box = np.ones(m.nbody, bool)
  for g in np.nonzero(m.geom_fluid_active)[0]:
    use_box[m.geom_bodyid[g]] = False
  box = box * ((m.body_mass > 0)[:, None] * jnp.asarray(use_box)[:, None])

  # 6D body velocity at xipos in the inertial frame, wind subtracted
  offset = d.xipos - d.subtree_com[m.body_rootid]
  vel = jax.vmap(math.transform_motion)(d.cvel, offset)  # world-aligned
  ximt = jnp.swapaxes(d.ximat, -1, -2)
  ang = jnp.einsum("bij,bj->bi", ximt, vel[:, :3])
  lin = jnp.einsum("bij,bj->bi", ximt, vel[:, 3:])
  lwind = jnp.einsum("bij,j->bi", ximt, m.opt.wind)
  lin = lin - lwind

  # angular/linear viscosity on the equivalent sphere
  diam = jnp.mean(box, axis=-1, keepdims=True)
  lfrc_ang = ang * (-jnp.pi * diam**3 * m.opt.viscosity)
  lfrc_lin = lin * (-3.0 * jnp.pi * diam * m.opt.viscosity)

  # quadratic lift/drag (density)
  scale_lin = jnp.stack(
      [box[:, 1] * box[:, 2], box[:, 0] * box[:, 2], box[:, 0] * box[:, 1]],
      axis=-1)
  scale_ang = jnp.stack([
      box[:, 0] * (box[:, 1] ** 4 + box[:, 2] ** 4),
      box[:, 1] * (box[:, 0] ** 4 + box[:, 2] ** 4),
      box[:, 2] * (box[:, 0] ** 4 + box[:, 1] ** 4),
  ], axis=-1)
  lfrc_lin = lfrc_lin - 0.5 * m.opt.density * scale_lin * jnp.abs(lin) * lin
  lfrc_ang = lfrc_ang - m.opt.density * scale_ang * jnp.abs(ang) * ang / 64.0

  # back to world frame, applied at each body CoM
  force = jnp.einsum("bij,bj->bi", d.ximat, lfrc_lin)
  torque = jnp.einsum("bij,bj->bi", d.ximat, lfrc_ang)
  jacp, jacr = support.jac_all_bodies(m, d, d.xipos)
  qfrc = jnp.einsum("bvc,bc->v", jacp, force)
  qfrc += jnp.einsum("bvc,bc->v", jacr, torque)
  return qfrc.astype(dtype)


# local edge -> element-vertex endpoint tables (ref engine_passive.c:39-40)
_ELEM_EDGES = {2: np.array([[1, 2], [2, 0], [0, 1]]),
               3: np.array([[0, 1], [1, 2], [2, 0], [2, 3], [0, 3], [1, 3]])}


def flex_elasticity(m: Model, d: Data) -> jax.Array:
  """Flex element elasticity + Rayleigh damping -> generalized force.

  Analog of the element loop in ``mj_passive`` (reference
  ``engine_passive.c:206-296``): per element, edge elongations (squared
  lengths, with the discrete Rayleigh term of Kharevych et al.) are
  contracted with the precomputed metric tensor and distributed to the
  vertices via the squared-length gradients.  Vectorized per flex over all
  of its elements; the per-vertex Cartesian forces are projected to dofs
  with the dense vertex Jacobian (pinned vertices project to zero).
  """
  from mujoco_inversedynamicstest_tpu.ops import smooth

  dtype = d.qpos.dtype
  fvert = jnp.zeros((m.nflexvert, 3), dtype=dtype)
  for f in range(m.nflex):
    dim = int(m.flex_dim[f])
    if dim == 1 or m.flex_rigid[f]:
      continue
    sl = slice(int(m.flex_elemadr[f]), int(m.flex_elemadr[f])
               + int(m.flex_elemnum[f]))
    # a zero metric contributes exactly zero force, so no per-flex gating
    # is needed (and none is possible under a traced model)
    metric = m.flex_metric[sl]
    ltab = _ELEM_EDGES[dim]
    nepe = len(ltab)
    vert_ids = m.flex_elem[sl, :dim + 1]        # (ne, dim+1) static
    edge_ids = m.flex_elemedge[sl, :nepe]       # (ne, nepe) static
    x = d.flexvert_xpos[vert_ids]               # (ne, dim+1, 3)
    grad0 = x[:, ltab[:, 0]] - x[:, ltab[:, 1]]  # gradient at endpoint 0
    L = d.flexedge_length[edge_ids]
    L0 = m.flexedge_length0[edge_ids]
    vel = d.flexedge_velocity[edge_ids]
    kD = m.flex_damping[f] / m.opt.timestep
    prev = L - vel * m.opt.timestep
    elong = L * L - L0 * L0 + (L * L - prev * prev) * kD
    coef = jnp.einsum("te,tef->tf", elong, metric[:, :nepe, :nepe])
    f0 = -coef[..., None] * grad0
    fvert = fvert.at[vert_ids[:, ltab[:, 0]].reshape(-1)].add(
        f0.reshape(-1, 3))
    fvert = fvert.at[vert_ids[:, ltab[:, 1]].reshape(-1)].add(
        -f0.reshape(-1, 3))
  jacp = smooth.flex_vert_jacp(m, d, d.flexvert_xpos)
  return jnp.einsum("vnj,vj->n", jacp, fvert)


def _mat2rot(mat, dtype, iters: int = 80):
  """Rotational part of a deformation gradient (``mju_mat2Rot``,
  reference ``engine_util_spatial.c:291``; Mueller et al. 2016) — fixed
  trip count, converged updates become no-ops."""
  cols_m = mat.T                                  # (3, 3): columns of mat

  def body(quat, _):
    rot = math.quat_to_mat(quat)
    cols_r = rot.T
    omega = jnp.sum(jnp.cross(cols_r, cols_m), axis=0)
    denom = jnp.abs(jnp.sum(cols_r * cols_m)) + math.MINVAL
    omega = omega / denom
    w = jnp.linalg.norm(omega)
    axis = omega / jnp.maximum(w, math.MINVAL)
    qrot = math.axis_angle_quat(axis, w)
    qn = math.normalize_quat(math.quat_mul(qrot, quat))
    return jnp.where(w < 1e-12, quat, qn), None

  q0 = jnp.array([1.0, 0, 0, 0], dtype)
  quat, _ = jax.lax.scan(body, q0, None, length=iters)
  return quat


def flex_nodal_elasticity(m: Model, d: Data):
  """Stretch-frame nodal elasticity of trilinear flexes.

  Analog of the interp branch of ``mj_passive`` (reference
  ``engine_passive.c:125-205``): node positions are re-centered, the
  rotation is fit from the trilinear deformation gradient at the cell
  center (``mju_defGradient`` + ``mju_mat2Rot``), displacements and
  velocities rotate into the stretch frame, forces come from one
  ``(3N, 3N)`` matvec with the precomputed nodal stiffness (negative
  definite; rigid modes in its null space), and rotate back.  Returns
  ``(qfrc_spring, qfrc_damper)`` contributions (centered nodes: direct
  dof accumulation, ref :194-196)."""
  dtype = d.qpos.dtype
  qfrc_s = jnp.zeros(m.nv, dtype)
  qfrc_d = jnp.zeros(m.nv, dtype)
  for f in range(m.nflex):
    if not m.flex_interp_np[f]:
      continue
    K = m.flex_stiffness_nodal[f]
    if K.size == 0:
      continue
    na, nn = int(m.flex_nodeadr_np[f]), int(m.flex_nodenum_np[f])
    bodies = m.flex_nodebodyid_np[na:na + nn]
    dof_idx = (np.asarray(m.body_dofadr)[bodies][:, None]
               + np.arange(3)[None, :])          # (nn, 3) static
    xpos = d.xpos[bodies]                        # centered nodes
    vel = d.qvel[dof_idx.reshape(-1)].reshape(nn, 3)
    com = jnp.mean(xpos, axis=0)
    xc = xpos - com

    # deformation gradient at p = (.5,.5,.5) (mju_defGradient, order 1):
    # the gradient of node idx is 0.25 * (+-1 per axis by the idx bits)
    j = np.arange(nn)
    sgn = np.stack([np.where(j & 4, 1.0, -1.0),
                    np.where(j & 2, 1.0, -1.0),
                    np.where(j & 1, 1.0, -1.0)], axis=1) * 0.25
    g = jnp.asarray(sgn, dtype)                  # (nn, 3)
    F = xc.T @ g                                 # (3, 3) rows=xyz of dofs

    quat = _mat2rot(F, dtype)
    qinv = math.quat_conj(quat)
    half = jnp.asarray([0.5, 0.5, 0.5], dtype)
    x_r = jax.vmap(lambda v: math.rotate(v, qinv))(xc) + half
    v_r = jax.vmap(lambda v: math.rotate(v, qinv))(vel)
    displ = (x_r - m.flex_node0[na:na + nn]).reshape(-1)
    frc = (K @ displ).reshape(nn, 3)
    dmp = (K @ v_r.reshape(-1)).reshape(nn, 3) * m.flex_damping[f]
    frc_w = jax.vmap(lambda v: math.rotate(v, quat))(frc)
    dmp_w = jax.vmap(lambda v: math.rotate(v, quat))(dmp)
    qfrc_s = qfrc_s.at[dof_idx.reshape(-1)].add(frc_w.reshape(-1))
    qfrc_d = qfrc_d.at[dof_idx.reshape(-1)].add(dmp_w.reshape(-1))
  return qfrc_s, qfrc_d


def flex_edge_springdamper(m: Model, d: Data):
  """Edge-level spring-damper forces (ref ``engine_passive.c:298-336``).

  Returns ``(qfrc_spring_contrib, qfrc_damper_contrib)``; rigid edges and
  rigid flexes contribute nothing.
  """
  edge_flex = np.repeat(np.arange(m.nflex), m.flex_edgenum)
  mask = jnp.asarray(
      (~m.flexedge_rigid) & (~m.flex_rigid[edge_flex]), dtype=d.qpos.dtype)
  k = m.flex_edgestiffness[edge_flex] * mask
  c = m.flex_edgedamping[edge_flex] * mask
  frc_spring = k * (m.flexedge_length0 - d.flexedge_length)
  frc_damper = -c * d.flexedge_velocity
  return d.flexedge_J.T @ frc_spring, d.flexedge_J.T @ frc_damper


def gravcomp(m: Model, d: Data) -> jax.Array:
  """Per-body gravity compensation mapped to joint space.

  Analog of ``mj_gravcomp`` (reference ``engine_passive.c:380``): force
  ``-gravity * mass * body_gravcomp`` applied at each body's CoM.
  """
  forces = (
      -m.opt.gravity[None, :]
      * (m.body_mass * m.body_gravcomp)[:, None]
  )
  jacp, _ = support.jac_all_bodies(m, d, d.xipos)
  return jnp.einsum("bvc,bc->v", jacp, forces)


def passive(m: Model, d: Data) -> Data:
  """All passive forces (reference ``mj_passive``, engine_passive.c:436)."""
  dtype = d.qpos.dtype
  zero = jnp.zeros(m.nv, dtype=dtype)
  flags = m.opt.disableflags

  qfrc_spring = zero
  if not (flags & DisableBit.SPRING):
    qfrc_spring = _spring(m, d)

  qfrc_damper = zero
  if not (flags & DisableBit.DAMPER):
    qfrc_damper = -m.dof_damping * d.qvel

  # tendon-level spring-dampers (deadband spring; ref engine_passive.c:337)
  if m.ntendon:
    length = d.ten_length
    lower = m.tendon_lengthspring[:, 0]
    upper = m.tendon_lengthspring[:, 1]
    frc_spring = m.tendon_stiffness * (
        jnp.where(length > upper, upper - length, 0.0)
        + jnp.where(length < lower, lower - length, 0.0)
    )
    frc_damper = -m.tendon_damping * d.ten_velocity
    if not (flags & DisableBit.SPRING):
      qfrc_spring = qfrc_spring + d.ten_J.T @ frc_spring
    if not (flags & DisableBit.DAMPER):
      qfrc_damper = qfrc_damper + d.ten_J.T @ frc_damper

  # flex passive forces: element elasticity (into spring, matching the
  # reference's qfrc_spring accounting) + edge-level spring-dampers
  if m.nflex:
    if m.has_flex_elasticity and not (flags & DisableBit.SPRING):
      qfrc_spring = qfrc_spring + flex_elasticity(m, d)
    if m.has_flex_nodal_elasticity:
      fs, fd = flex_nodal_elasticity(m, d)
      if not (flags & DisableBit.SPRING):
        qfrc_spring = qfrc_spring + fs
      if not (flags & DisableBit.DAMPER):
        qfrc_damper = qfrc_damper + fd
    if m.has_flex_edge_sd:
      fs, fd = flex_edge_springdamper(m, d)
      if not (flags & DisableBit.SPRING):
        qfrc_spring = qfrc_spring + fs
      if not (flags & DisableBit.DAMPER):
        qfrc_damper = qfrc_damper + fd

  qfrc_gravcomp = zero
  if not (flags & DisableBit.GRAVITY):
    qfrc_gravcomp = gravcomp(m, d)

  # fluid models, gated statically on model fluid parameters; bodies with
  # ellipsoid-fluid geoms use the per-geom ellipsoid model, the rest the
  # inertia-box model (ref mj_fluid, engine_passive.c:404)
  qfrc_fluid = zero
  if m.has_fluid:
    qfrc_fluid = fluid(m, d)
    ell = np.nonzero(m.geom_fluid_active)[0]
    if ell.size:
      qfrc_fluid = qfrc_fluid + ellipsoid_fluid(m, d, ell)

  qfrc_passive = qfrc_spring + qfrc_damper + qfrc_fluid

  # engine plugin hooks (mjPLUGIN_PASSIVE compute point; the reference
  # dispatches registered plugins inside mj_passive, engine_plugin.cc)
  for hook in m.plugin_hooks:
    contrib = hook.passive(m, d)
    if contrib is not None:
      qfrc_passive = qfrc_passive + contrib

  # gravcomp enters qfrc_passive only for joints not flagged actgravcomp
  # (those are added to qfrc_actuator instead; ref engine_passive.c:489).
  mask = np.ones(m.nv, dtype=bool)
  for j in range(m.njnt):
    if m.jnt_actgravcomp[j]:
      adr = m.jnt_dofadr[j]
      width = JointType(m.jnt_type[j]).dof_width()
      mask[adr : adr + width] = False
  qfrc_passive = qfrc_passive + jnp.where(
      jnp.asarray(mask), qfrc_gravcomp, 0.0
  )

  return d.replace(
      qfrc_spring=qfrc_spring,
      qfrc_damper=qfrc_damper,
      qfrc_gravcomp=qfrc_gravcomp,
      qfrc_fluid=qfrc_fluid,
      qfrc_passive=qfrc_passive,
  )
