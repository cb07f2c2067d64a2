"""Sensors and energy — analog of ``src/engine/engine_sensor.c``.

Stage entry points mirror ``mj_sensorPos``:222 / ``mj_sensorVel``:527 /
``mj_sensorAcc``:708, with energy (``mj_energyPos``:920 /
``mj_energyVel``:1011).  Sensors are evaluated with a static per-sensor
unrolled loop (types/ids/addresses are compile-time model data); cutoff
post-processing follows ``apply_cutoff`` (ref :40).

Covered: the full pos/vel/acc scalar + frame + subtree set, touch
(site-zone ray binning, ref :750), rangefinder (ref :266), camera
projection (ref :126), and geomdist/geomnormal/geomfromto via the
narrowphase-backed ``mj_geomDistance`` analog (ref :378).  PLUGIN sensors
dispatch to the registered port's sensor hook (plugins/registry.py);
USER sensors call the model's ``user_sensor_fn`` (the ``mjcb_sensor``
analog) — both at their declared needstage.
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
    ObjType,
    SensorType,
)
from mujoco_inversedynamicstest_tpu.ops import math, smooth

_STAGE_POS, _STAGE_VEL, _STAGE_ACC = 1, 2, 3


def _enabled(m: Model) -> bool:
  return m.nsensor > 0 and not (m.opt.disableflags & DisableBit.SENSOR)


def _frame_pos_mat(m: Model, d: Data, objtype: int, objid: int):
  """(pos, mat) of an object frame (ref ``get_xpos_xmat``, sensor.c:73)."""
  t = ObjType(objtype)
  if t == ObjType.XBODY:
    return d.xpos[objid], d.xmat[objid]
  if t == ObjType.BODY:
    return d.xipos[objid], d.ximat[objid]
  if t == ObjType.GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid]
  if t == ObjType.SITE:
    return d.site_xpos[objid], d.site_xmat[objid]
  if t == ObjType.CAMERA:
    return d.cam_xpos[objid], d.cam_xmat[objid]
  raise NotImplementedError(f"sensor object type {t}")


def _frame_quat(m: Model, d: Data, objtype: int, objid: int):
  """Global quaternion of an object (ref ``get_xquat``, sensor.c:102)."""
  t = ObjType(objtype)
  if t == ObjType.XBODY:
    return d.xquat[objid]
  if t == ObjType.BODY:
    return math.quat_mul(d.xquat[objid], m.body_iquat[objid])
  if t == ObjType.GEOM:
    return math.quat_mul(d.xquat[m.geom_bodyid[objid]], m.geom_quat[objid])
  if t == ObjType.SITE:
    return math.quat_mul(d.xquat[m.site_bodyid[objid]], m.site_quat[objid])
  if t == ObjType.CAMERA:
    # ref get_xquat (sensor.c:117): quaternion of the camera frame matrix
    return math.mat_to_quat(d.cam_xmat[objid])
  raise NotImplementedError(f"sensor object type {t}")


def _obj_body(m: Model, objtype: int, objid: int) -> int:
  t = ObjType(objtype)
  if t in (ObjType.BODY, ObjType.XBODY):
    return int(objid)
  if t == ObjType.GEOM:
    return int(m.geom_bodyid[objid])
  if t == ObjType.SITE:
    return int(m.site_bodyid[objid])
  if t == ObjType.CAMERA:
    return int(m.cam_bodyid[objid])
  raise NotImplementedError(f"sensor object type {t}")


def _spatial_at(m: Model, d: Data, spatial6, objtype: int, objid: int,
                local: bool):
  """Re-expresses a com-frame motion 6-vector at an object frame.

  (ref ``mj_objectVelocity``/``mj_objectAcceleration``,
  engine_support.c:1265/1317 — without the centripetal correction)
  """
  pos, mat = _frame_pos_mat(m, d, objtype, objid)
  body = _obj_body(m, objtype, objid)
  off = pos - d.subtree_com[m.body_rootid[body]]
  out = math.transform_motion(spatial6[body], off)
  if local:
    out = jnp.concatenate([mat.T @ out[:3], mat.T @ out[3:]])
  return out


def object_velocity(m: Model, d: Data, objtype: int, objid: int,
                    local: bool):
  return _spatial_at(m, d, d.cvel, objtype, objid, local)


def object_acceleration(m: Model, d: Data, objtype: int, objid: int,
                        local: bool):
  """(ref ``mj_objectAcceleration``:1317: translated cacc plus the
  centripetal term ``ang_vel x lin_vel``)."""
  vel = _spatial_at(m, d, d.cvel, objtype, objid, local)
  acc = _spatial_at(m, d, d.cacc, objtype, objid, local)
  corr = jnp.cross(vel[:3], vel[3:])
  return acc.at[3:].add(corr)


def _apply_cutoff(m: Model, sensordata: jax.Array, stage: int) -> jax.Array:
  for i in range(m.nsensor):
    if m.sensor_needstage[i] != stage:
      continue
    if m.sensor_type[i] == SensorType.GEOMFROMTO:
      continue  # ref apply_cutoff skips fromto segments (sensor.c:45)
    adr, dim = int(m.sensor_adr[i]), int(m.sensor_dim[i])
    cutoff = m.sensor_cutoff[i]
    seg = jax.lax.dynamic_slice(sensordata, (adr,), (dim,))
    if m.sensor_datatype[i] == 0:    # REAL: two-sided
      clipped = jnp.clip(seg, -cutoff, cutoff)
    elif m.sensor_datatype[i] == 1:  # POSITIVE: one-sided
      clipped = jnp.minimum(seg, cutoff)
    else:
      continue
    seg = jnp.where(cutoff > 0, clipped, seg)
    sensordata = jax.lax.dynamic_update_slice(sensordata, seg, (adr,))
  return sensordata


def _write(sd, adr, value):
  value = jnp.atleast_1d(value)
  return sd.at[adr : adr + value.shape[0]].set(value)


def sensor_pos(m: Model, d: Data) -> Data:
  """Position-stage sensors (ref ``mj_sensorPos``:222)."""
  if not _enabled(m):
    return d
  sd = d.sensordata
  S = SensorType

  for i in range(m.nsensor):
    if m.sensor_needstage[i] != _STAGE_POS:
      continue
    t = S(m.sensor_type[i])
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    refid = int(m.sensor_refid[i])
    reftype = int(m.sensor_reftype[i])
    adr = int(m.sensor_adr[i])

    if t == S.JOINTPOS:
      sd = _write(sd, adr, d.qpos[m.jnt_qposadr[objid]])
    elif t == S.TENDONPOS:
      sd = _write(sd, adr, d.ten_length[objid])
    elif t == S.ACTUATORPOS:
      sd = _write(sd, adr, d.actuator_length[objid])
    elif t == S.BALLQUAT:
      q = math.normalize_quat(
          d.qpos[m.jnt_qposadr[objid] + np.arange(4)]
      )
      sd = _write(sd, adr, q)
    elif t == S.MAGNETOMETER:
      sd = _write(sd, adr, d.site_xmat[objid].T @ m.opt.magnetic)
    elif t == S.FRAMEPOS:
      pos, _ = _frame_pos_mat(m, d, objtype, objid)
      if refid >= 0:
        rpos, rmat = _frame_pos_mat(m, d, reftype, refid)
        pos = rmat.T @ (pos - rpos)
      sd = _write(sd, adr, pos)
    elif t in (S.FRAMEXAXIS, S.FRAMEYAXIS, S.FRAMEZAXIS):
      _, mat = _frame_pos_mat(m, d, objtype, objid)
      axis = mat[:, int(t) - int(S.FRAMEXAXIS)]
      if refid >= 0:
        _, rmat = _frame_pos_mat(m, d, reftype, refid)
        axis = rmat.T @ axis
      sd = _write(sd, adr, axis)
    elif t == S.FRAMEQUAT:
      q = _frame_quat(m, d, objtype, objid)
      if refid >= 0:
        rq = _frame_quat(m, d, reftype, refid)
        q = math.quat_mul(math.quat_conj(rq), q)
      sd = _write(sd, adr, q)
    elif t == S.SUBTREECOM:
      sd = _write(sd, adr, d.subtree_com[objid])
    elif t in (S.JOINTLIMITPOS, S.TENDONLIMITPOS):
      sd = _write(sd, adr, _limit_row(m, d, t, objid, "posmargin"))
    elif t == S.E_POTENTIAL:
      sd = _write(sd, adr, energy_pos(m, d))
    elif t == S.E_KINETIC:
      # the oracle evaluates kinetic energy at whichever stage the
      # compiler assigned (qM is available after fwd_position)
      sd = _write(sd, adr, energy_vel(m, d))
    elif t == S.CLOCK:
      sd = _write(sd, adr, d.time)
    elif t == S.RANGEFINDER:
      from mujoco_inversedynamicstest_tpu.ops import ray as ray_mod

      dist, _ = ray_mod.ray(
          m, d, d.site_xpos[objid], d.site_xmat[objid][:, 2],
          bodyexclude=int(m.site_bodyid[objid]))
      sd = _write(sd, adr, dist)
    elif t == S.CAMPROJECTION:
      sd = _write(sd, adr, _cam_project(m, d, objid, refid))
    elif t in (S.GEOMDIST, S.GEOMNORMAL, S.GEOMFROMTO):
      dist, fromto = _geom_pair_distance(
          m, d, objtype, objid, reftype, refid, m.sensor_cutoff[i])
      if t == S.GEOMDIST:
        sd = _write(sd, adr, dist)
      elif t == S.GEOMNORMAL:
        n = fromto[3:] - fromto[:3]
        nn = math.norm_safe(n)
        sd = _write(sd, adr, jnp.where(nn > 1e-15, n / nn, n * 0.0))
      else:
        sd = _write(sd, adr, fromto)
    elif t == S.PLUGIN:
      inst = m.plugin_hooks[int(m.sensor_plugin[i])]
      sd = _write(sd, adr, inst.sensor(m, d, i))
    elif t == S.USER:
      sd = _write(sd, adr, m.user_sensor_fn(m, d, i))
    else:
      raise NotImplementedError(f"POS sensor {t.name}")

  return d.replace(sensordata=_apply_cutoff(m, sd, _STAGE_POS))


def _cam_project(m: Model, d: Data, objid: int, refid: int):
  """Pixel coordinates of a site in a camera image (ref ``cam_project``,
  sensor.c:126)."""
  target = d.site_xpos[objid]
  xc = d.cam_xmat[refid].T @ (target - d.cam_xpos[refid])
  res = m.cam_resolution[refid]
  ss = m.cam_sensorsize[refid]
  has_intrinsic = jnp.all(ss != 0)
  fx_i = m.cam_intrinsic[refid, 0] / jnp.where(ss[0] == 0, 1.0, ss[0]) * res[0]
  fy_i = m.cam_intrinsic[refid, 1] / jnp.where(ss[1] == 0, 1.0, ss[1]) * res[1]
  f_fov = 0.5 / jnp.tan(m.cam_fovy[refid] * jnp.pi / 360.0) * res[1]
  fx = jnp.where(has_intrinsic, fx_i, f_fov)
  fy = jnp.where(has_intrinsic, fy_i, f_fov)
  z = xc[2]
  u = -fx * xc[0] / z + res[0] / 2.0
  v = fy * xc[1] / z + res[1] / 2.0
  return jnp.stack([u, v])


def _geom_pair_distance(m: Model, d: Data, objtype, objid, reftype, refid,
                        cutoff):
  """min distance over the (body|geom) x (body|geom) geom set (ref
  ``mjSENS_GEOMDIST`` branch, sensor.c:378)."""
  from mujoco_inversedynamicstest_tpu.ops import collision as coll_mod

  def geom_set(t, i):
    if ObjType(t) == ObjType.BODY:
      return list(range(int(m.body_geomadr[i]),
                        int(m.body_geomadr[i]) + int(m.body_geomnum[i])))
    return [int(i)]

  dtype = d.qpos.dtype
  dist = jnp.asarray(cutoff, dtype)
  fromto = jnp.zeros(6, dtype)
  for g1 in geom_set(objtype, objid):
    for g2 in geom_set(reftype, refid):
      dn, ft = coll_mod.geom_distance(m, d, g1, g2, cutoff)
      closer = dn < dist
      fromto = jnp.where(closer, ft, fromto)
      dist = jnp.where(closer, dn, dist)
  return dist, fromto


def _limit_row(m: Model, d: Data, t, objid: int, what: str):
  """First active limit row for a joint/tendon (ref sensor.c:295-315)."""
  from mujoco_inversedynamicstest_tpu.models.types import ConstraintType
  from mujoco_inversedynamicstest_tpu.ops.constraint import row_layout

  lay = row_layout(m)
  S = SensorType
  ctype = (
      ConstraintType.LIMIT_JOINT
      if t in (S.JOINTLIMITPOS, S.JOINTLIMITVEL, S.JOINTLIMITFRC)
      else ConstraintType.LIMIT_TENDON
  )
  rows = np.nonzero((lay.efc_type == ctype) & (lay.efc_id == objid))[0]
  out = jnp.zeros((), dtype=d.qpos.dtype)
  claimed = jnp.zeros((), dtype=bool)
  for r in rows:
    if what == "posmargin":
      val = d.efc_pos[r] - d.efc_margin[r]
    elif what == "vel":
      val = d.efc_J[r] @ d.qvel
    else:
      val = d.efc_force[r]
    take = d.efc_active[r] & ~claimed
    out = jnp.where(take, val, out)
    claimed = claimed | d.efc_active[r]
  return out


def sensor_vel(m: Model, d: Data) -> Data:
  """Velocity-stage sensors (ref ``mj_sensorVel``:527)."""
  if not _enabled(m):
    return d
  sd = d.sensordata
  S = SensorType

  needs_subtree = any(
      m.sensor_needstage[i] == _STAGE_VEL
      and m.sensor_type[i] in (S.SUBTREELINVEL, S.SUBTREEANGMOM)
      for i in range(m.nsensor)
  )
  if needs_subtree:
    sub_linvel, sub_angmom = smooth.subtree_vel(m, d)

  for i in range(m.nsensor):
    if m.sensor_needstage[i] != _STAGE_VEL:
      continue
    t = S(m.sensor_type[i])
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    refid = int(m.sensor_refid[i])
    reftype = int(m.sensor_reftype[i])
    adr = int(m.sensor_adr[i])

    if t == S.JOINTVEL:
      sd = _write(sd, adr, d.qvel[m.jnt_dofadr[objid]])
    elif t == S.TENDONVEL:
      sd = _write(sd, adr, d.ten_velocity[objid])
    elif t == S.ACTUATORVEL:
      sd = _write(sd, adr, d.actuator_velocity[objid])
    elif t == S.BALLANGVEL:
      sd = _write(sd, adr, d.qvel[m.jnt_dofadr[objid] + np.arange(3)])
    elif t == S.VELOCIMETER:
      v = object_velocity(m, d, ObjType.SITE, objid, local=True)
      sd = _write(sd, adr, v[3:])
    elif t == S.GYRO:
      v = object_velocity(m, d, ObjType.SITE, objid, local=True)
      sd = _write(sd, adr, v[:3])
    elif t in (S.FRAMELINVEL, S.FRAMEANGVEL):
      v = object_velocity(m, d, objtype, objid, local=False)
      if refid >= 0:
        pos, _ = _frame_pos_mat(m, d, objtype, objid)
        rpos, rmat = _frame_pos_mat(m, d, reftype, refid)
        vref = object_velocity(m, d, reftype, refid, local=False)
        rel = v - vref
        rel = rel.at[3:].add(jnp.cross(pos - rpos, vref[:3]))
        v = jnp.concatenate([rmat.T @ rel[:3], rmat.T @ rel[3:]])
      sd = _write(sd, adr, v[3:] if t == S.FRAMELINVEL else v[:3])
    elif t == S.SUBTREELINVEL:
      sd = _write(sd, adr, sub_linvel[objid])
    elif t == S.SUBTREEANGMOM:
      sd = _write(sd, adr, sub_angmom[objid])
    elif t in (S.JOINTLIMITVEL, S.TENDONLIMITVEL):
      sd = _write(sd, adr, _limit_row(m, d, t, objid, "vel"))
    elif t == S.E_KINETIC:
      sd = _write(sd, adr, energy_vel(m, d))
    elif t == S.PLUGIN:
      inst = m.plugin_hooks[int(m.sensor_plugin[i])]
      sd = _write(sd, adr, inst.sensor(m, d, i))
    elif t == S.USER:
      sd = _write(sd, adr, m.user_sensor_fn(m, d, i))
    else:
      raise NotImplementedError(f"VEL sensor {t.name}")

  return d.replace(sensordata=_apply_cutoff(m, sd, _STAGE_VEL))


def sensor_acc(m: Model, d: Data) -> Data:
  """Acceleration/force-stage sensors (ref ``mj_sensorAcc``:708)."""
  if not _enabled(m):
    return d
  S = SensorType

  needs_rnepost = any(
      m.sensor_needstage[i] == _STAGE_ACC
      and m.sensor_type[i] in (
          S.ACCELEROMETER, S.FORCE, S.TORQUE, S.FRAMELINACC, S.FRAMEANGACC
      )
      for i in range(m.nsensor)
  )
  if needs_rnepost:
    d = smooth.rne_postconstraint(m, d)
  sd = d.sensordata

  for i in range(m.nsensor):
    if m.sensor_needstage[i] != _STAGE_ACC:
      continue
    t = S(m.sensor_type[i])
    objid = int(m.sensor_objid[i])
    objtype = int(m.sensor_objtype[i])
    adr = int(m.sensor_adr[i])

    if t == S.ACTUATORFRC:
      sd = _write(sd, adr, d.actuator_force[objid])
    elif t == S.JOINTACTFRC:
      sd = _write(sd, adr, d.qfrc_actuator[m.jnt_dofadr[objid]])
    elif t == S.ACCELEROMETER:
      a = object_acceleration(m, d, ObjType.SITE, objid, local=True)
      sd = _write(sd, adr, a[3:])
    elif t in (S.FORCE, S.TORQUE):
      body = int(m.site_bodyid[objid])
      root = int(m.body_rootid[body])
      off = d.site_xpos[objid] - d.subtree_com[root]
      w = math.transform_force(d.cfrc_int[body], off)
      mat = d.site_xmat[objid]
      w = jnp.concatenate([mat.T @ w[:3], mat.T @ w[3:]])
      sd = _write(sd, adr, w[3:] if t == S.FORCE else w[:3])
    elif t in (S.FRAMELINACC, S.FRAMEANGACC):
      a = object_acceleration(m, d, objtype, objid, local=False)
      sd = _write(sd, adr, a[3:] if t == S.FRAMELINACC else a[:3])
    elif t in (S.JOINTLIMITFRC, S.TENDONLIMITFRC):
      sd = _write(sd, adr, _limit_row(m, d, t, objid, "force"))
    elif t == S.TOUCH:
      sd = _write(sd, adr, _touch(m, d, objid))
    elif t == S.PLUGIN:
      inst = m.plugin_hooks[int(m.sensor_plugin[i])]
      sd = _write(sd, adr, inst.sensor(m, d, i))
    elif t == S.USER:
      sd = _write(sd, adr, m.user_sensor_fn(m, d, i))
    else:
      raise NotImplementedError(f"ACC sensor {t.name}")

  return d.replace(sensordata=_apply_cutoff(m, sd, _STAGE_ACC))


def _touch(m: Model, d: Data, siteid: int):
  """Sum of contact normal forces whose force ray pierces the site zone
  (ref ``mjSENS_TOUCH``, sensor.c:750)."""
  from mujoco_inversedynamicstest_tpu.ops import collision as coll_mod
  from mujoco_inversedynamicstest_tpu.ops import constraint as con_mod
  from mujoco_inversedynamicstest_tpu.ops import ray as ray_mod

  dtype = d.qpos.dtype
  clay = coll_mod.contact_layout(m)
  if clay.ncon == 0:
    return jnp.zeros((), dtype)
  con = d.contact
  bodyid = int(m.site_bodyid[siteid])
  b1 = jnp.asarray(m.geom_bodyid)[con.geom1]
  b2 = jnp.asarray(m.geom_bodyid)[con.geom2]
  relevant = (b1 == bodyid) | (b2 == bodyid)

  forces = con_mod.contact_forces_frame(m, d)
  f0 = forces[:, 0]
  # force ray direction: contact normal, flipped when the sensor body is
  # the contact's second body
  sign = jnp.where(b2 == bodyid, -1.0, 1.0).astype(dtype)
  dirs = con.frame[:, 0] * sign[:, None]

  stype = int(m.site_type[siteid])
  hit = jax.vmap(
      lambda p, v: ray_mod.ray_geom(
          d.site_xpos[siteid], d.site_xmat[siteid], m.site_size[siteid],
          p, v, stype)
  )(con.pos, dirs)

  active = con.dist < con.includemargin
  include = relevant & active & (f0 > 0) & jnp.isfinite(hit)
  return jnp.sum(jnp.where(include, f0, 0.0))


def energy_pos(m: Model, d: Data) -> jax.Array:
  """Potential energy (ref ``mj_energyPos``:920)."""
  dtype = d.qpos.dtype
  e = jnp.zeros((), dtype=dtype)
  if not (m.opt.disableflags & DisableBit.GRAVITY):
    e = -jnp.sum(m.body_mass[1:] * (d.xipos[1:] @ m.opt.gravity))

  # joint springs
  if not (m.opt.disableflags & DisableBit.SPRING):
    jt = m.jnt_type
    scalar = np.nonzero(
        (jt == JointType.HINGE) | (jt == JointType.SLIDE)
    )[0]
    if scalar.size:
      padr = m.jnt_qposadr[scalar]
      dif = d.qpos[padr] - m.qpos_spring[padr]
      e = e + 0.5 * jnp.sum(m.jnt_stiffness[scalar] * dif * dif)
    free = np.nonzero(jt == JointType.FREE)[0]
    if free.size:
      pidx = m.jnt_qposadr[free][:, None] + np.arange(3)[None]
      dif = d.qpos[pidx] - m.qpos_spring[pidx]
      e = e + 0.5 * jnp.sum(
          m.jnt_stiffness[free] * jnp.sum(dif * dif, axis=1)
      )
    ball = np.nonzero(jt == JointType.BALL)[0]
    rot = [(ball, 0)] + ([(free, 3)] if free.size else [])
    for jids, off in rot:
      if not jids.size:
        continue
      pidx = m.jnt_qposadr[jids][:, None] + off + np.arange(4)[None]
      quat = math.normalize_quat(d.qpos[pidx])
      dif = math.quat_sub(quat, m.qpos_spring[pidx])
      e = e + 0.5 * jnp.sum(
          m.jnt_stiffness[jids] * jnp.sum(dif * dif, axis=1)
      )
    # tendon springs (deadband)
    if m.ntendon:
      length = d.ten_length
      lower = m.tendon_lengthspring[:, 0]
      upper = m.tendon_lengthspring[:, 1]
      disp = (
          jnp.where(length > upper, upper - length, 0.0)
          + jnp.where(length < lower, lower - length, 0.0)
      )
      e = e + 0.5 * jnp.sum(m.tendon_stiffness * disp * disp)
  return e


def energy_vel(m: Model, d: Data) -> jax.Array:
  """Kinetic energy 0.5 qvel' M qvel (ref ``mj_energyVel``:1011)."""
  return 0.5 * jnp.dot(d.qvel, d.qM @ d.qvel)
