"""Forward dynamics pipeline and integrators.

Analog of ``src/engine/engine_forward.c``: ``mj_fwdPosition``:133,
``mj_fwdVelocity``:193, ``mj_fwdActuation``:276, ``mj_fwdAcceleration``:520,
``mj_Euler``:835, ``mj_RungeKutta``:855, ``mj_step``:1134 — recomposed as
pure functions over the ``Data`` pytree with static-shape stages so a whole
step is one XLA computation (batched with ``vmap``, sharded with
``shard_map``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    BiasType,
    Data,
    DisableBit,
    DynType,
    GainType,
    IntegratorType,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import math, passive as passive_mod
from mujoco_inversedynamicstest_tpu.ops import smooth, support
from mujoco_inversedynamicstest_tpu.ops import constraint as constraint_mod
from mujoco_inversedynamicstest_tpu.ops import solver as solver_mod
from mujoco_inversedynamicstest_tpu.ops import sensor as sensor_mod
from mujoco_inversedynamicstest_tpu.ops import wrap as wrap_mod


def fwd_position(m: Model, d: Data) -> Data:
  """Position-dependent computations (ref ``mj_fwdPosition``:133).

  Each stage runs under a ``jax.named_scope`` so XLA traces/profiles show
  the reference's ``mjtTimer`` stage structure (ref mjdata.h TIMER_POS_*).
  """
  with jax.named_scope("kinematics"):
    d = smooth.kinematics(m, d)
    d = smooth.com_pos(m, d)
    d = smooth.camlight(m, d)
    d = smooth.flex(m, d)
    d = smooth.tendon(m, d)
  with jax.named_scope("inertia"):
    d = smooth.crb(m, d)
    d = smooth.factor_m(m, d)
  with jax.named_scope("collision"):
    d = constraint_mod.collision_stage(m, d)
  with jax.named_scope("make_constraint"):
    d = constraint_mod.make_constraint(m, d)
    d = smooth.transmission(m, d)
  return d


def fwd_velocity(m: Model, d: Data) -> Data:
  """Velocity-dependent computations (ref ``mj_fwdVelocity``:193)."""
  if m.ntendon:
    d = d.replace(ten_velocity=d.ten_J @ d.qvel)
  if m.nflexedge:
    d = d.replace(flexedge_velocity=d.flexedge_J @ d.qvel)
  if m.nu:
    d = d.replace(actuator_velocity=d.actuator_moment @ d.qvel)
  d = smooth.com_vel(m, d)
  d = passive_mod.passive(m, d)
  d = constraint_mod.reference_constraint(m, d)
  d = d.replace(qfrc_bias=smooth.rne(m, d, flg_acc=False))
  return d


def _next_activation(m: Model, d: Data, act_dot: jax.Array) -> jax.Array:
  """Advances activation states one step (ref ``nextActivation``,
  engine_forward.c:236): exact update for FILTEREXACT, Euler otherwise,
  then clamping to actrange."""
  if not m.na:
    return d.act

  act_actid = _act_slot_actuator(m)
  h = m.opt.timestep
  act = d.act + act_dot * h

  exact = np.nonzero(
      m.actuator_dyntype[act_actid] == DynType.FILTEREXACT
  )[0]
  if exact.size:
    tau = jnp.maximum(m.actuator_dynprm[act_actid[exact], 0], math.MINVAL)
    act = act.at[exact].set(
        d.act[exact] + act_dot[exact] * tau * (1 - jnp.exp(-h / tau))
    )

  limited = np.nonzero(m.actuator_actlimited[act_actid])[0]
  if limited.size:
    rng = m.actuator_actrange[act_actid[limited]]
    act = act.at[limited].set(
        jnp.clip(act[limited], rng[:, 0], rng[:, 1])
    )
  return act


def _act_slot_actuator(m: Model) -> np.ndarray:
  """Maps each activation slot to its owning actuator id (static)."""
  act_actid = np.zeros(m.na, dtype=np.int32)
  for i in range(m.nu):
    adr, num = m.actuator_actadr[i], m.actuator_actnum[i]
    if adr >= 0:
      act_actid[adr : adr + num] = i
  return act_actid


def fwd_actuation(m: Model, d: Data) -> Data:
  """Actuator forces (ref ``mj_fwdActuation``:276).

  Supports NONE/INTEGRATOR/FILTER/FILTEREXACT dynamics, FIXED/AFFINE gain,
  NONE/AFFINE bias.  Muscle models arrive with the tendon subsystem.
  """
  dtype = d.qpos.dtype
  nu, nv, na = m.nu, m.nv, m.na

  if not nu or (m.opt.disableflags & DisableBit.ACTUATION):
    return d.replace(
        qfrc_actuator=jnp.zeros(nv, dtype=dtype),
        actuator_force=jnp.zeros(nu, dtype=dtype),
        act_dot=jnp.zeros(na, dtype=dtype),
    )

  # clamp (and sanitize) controls
  ctrl = d.ctrl
  if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
    limited = jnp.asarray(m.actuator_ctrllimited.astype(bool))
    ctrl = jnp.where(
        limited,
        jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]),
        ctrl,
    )
  ctrl = jnp.where(jnp.any(~jnp.isfinite(ctrl)), 0.0, ctrl)

  # --- act_dot per activation slot ---
  act_dot = jnp.zeros(na, dtype=dtype)
  if na:
    act_actid = _act_slot_actuator(m)
    # last slot of each stateful actuator gets the dynamics update
    last_adr = m.actuator_actadr + m.actuator_actnum - 1
    stateful = np.nonzero(m.actuator_actadr >= 0)[0]
    for i in stateful:
      dyn = DynType(m.actuator_dyntype[i])
      slot = last_adr[i]
      if dyn == DynType.INTEGRATOR:
        act_dot = act_dot.at[slot].set(ctrl[i])
      elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
        tau = jnp.maximum(m.actuator_dynprm[i, 0], math.MINVAL)
        act_dot = act_dot.at[slot].set((ctrl[i] - d.act[slot]) / tau)
      elif dyn == DynType.MUSCLE:
        act_dot = act_dot.at[slot].set(
            wrap_mod.muscle_dynamics(ctrl[i], d.act[slot],
                                     m.actuator_dynprm[i, :3]))

  # --- gain and bias ---
  gaintype = m.actuator_gaintype
  biastype = m.actuator_biastype
  if not np.all(
      np.isin(gaintype, (GainType.FIXED, GainType.AFFINE, GainType.MUSCLE))):
    raise NotImplementedError(f"gain types {set(gaintype)}")
  if not np.all(
      np.isin(biastype, (BiasType.NONE, BiasType.AFFINE, BiasType.MUSCLE))):
    raise NotImplementedError(f"bias types {set(biastype)}")

  gp, bp = m.actuator_gainprm, m.actuator_biasprm
  affine_g = jnp.asarray((gaintype == GainType.AFFINE))
  gain = jnp.where(
      affine_g,
      gp[:, 0] + gp[:, 1] * d.actuator_length + gp[:, 2] * d.actuator_velocity,
      gp[:, 0],
  )
  affine_b = jnp.asarray((biastype == BiasType.AFFINE))
  bias = jnp.where(
      affine_b,
      bp[:, 0] + bp[:, 1] * d.actuator_length + bp[:, 2] * d.actuator_velocity,
      0.0,
  )

  # muscle FLV gain / passive bias (ref mju_muscleGain/Bias; vmapped group)
  mus_g = np.nonzero(gaintype == GainType.MUSCLE)[0]
  if mus_g.size:
    vals = jax.vmap(wrap_mod.muscle_gain)(
        d.actuator_length[mus_g], d.actuator_velocity[mus_g],
        m.actuator_lengthrange[mus_g], m.actuator_acc0[mus_g],
        gp[mus_g, :9])
    gain = gain.at[mus_g].set(vals)
  mus_b = np.nonzero(biastype == BiasType.MUSCLE)[0]
  if mus_b.size:
    vals = jax.vmap(wrap_mod.muscle_bias)(
        d.actuator_length[mus_b], m.actuator_lengthrange[mus_b],
        m.actuator_acc0[mus_b], bp[mus_b, :9])
    bias = bias.at[mus_b].set(vals)

  # --- input: ctrl for stateless, last activation for stateful ---
  act_input = ctrl
  if na:
    stateful_mask = m.actuator_actadr >= 0
    last_adr_c = np.clip(last_adr, 0, max(na - 1, 0))
    act_last = d.act[last_adr_c]
    # actearly: use next-step activation
    early = np.nonzero(stateful_mask & m.actuator_actearly.astype(bool))[0]
    if early.size:
      act_next = _next_activation(m, d, act_dot)[last_adr_c]
      act_last = act_last.at[early].set(act_next[early])
    act_input = jnp.where(jnp.asarray(stateful_mask), act_last, ctrl)

  force = gain * act_input + bias

  # actuator plugin hooks (mjPLUGIN_ACTUATOR compute point: the reference
  # dispatches plugin actuators inside mj_fwdActuation): plugins override
  # act_dot slots and force entries of their actuators
  for hook in m.plugin_hooks:
    new_ad = hook.act_dot(m, d, ctrl, act_dot)
    if new_ad is not None:
      act_dot = new_ad
    new_f = hook.actuator_force(m, d, ctrl, force)
    if new_f is not None:
      force = new_f

  limited_f = jnp.asarray(m.actuator_forcelimited.astype(bool))
  force = jnp.where(
      limited_f,
      jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]),
      force,
  )

  qfrc = d.actuator_moment.T @ force

  # joint-level gravcomp routed through actuators (ref :508-531)
  actgrav = np.nonzero(m.jnt_actgravcomp)[0]
  if actgrav.size:
    mask = np.zeros(nv, dtype=bool)
    for j in actgrav:
      adr = m.jnt_dofadr[j]
      from mujoco_inversedynamicstest_tpu.models.types import JointType
      mask[adr : adr + JointType(m.jnt_type[j]).dof_width()] = True
    qfrc = qfrc + jnp.where(jnp.asarray(mask), d.qfrc_gravcomp, 0.0)

  # clamp actuator force at joint level (first dof of limited joints)
  limited_j = np.nonzero(m.jnt_actfrclimited)[0]
  if limited_j.size:
    adr = m.jnt_dofadr[limited_j]
    rng = m.jnt_actfrcrange[limited_j]
    qfrc = qfrc.at[adr].set(jnp.clip(qfrc[adr], rng[:, 0], rng[:, 1]))

  return d.replace(
      qfrc_actuator=qfrc, actuator_force=force, act_dot=act_dot
  )


def fwd_acceleration(m: Model, d: Data) -> Data:
  """Smooth acceleration (ref ``mj_fwdAcceleration``:520)."""
  qfrc = (
      d.qfrc_passive
      - d.qfrc_bias
      + d.qfrc_applied
      + d.qfrc_actuator
      + support.xfrc_accumulate(m, d)
  )
  qacc_smooth = smooth.solve_m(m, d, qfrc)
  return d.replace(qfrc_smooth=qfrc, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data, skip_sensor: bool = False,
            ctrl_fn=None) -> Data:
  """Full forward dynamics (ref ``mj_forward`` = ``mj_forwardSkip(NONE)``).

  ``ctrl_fn(m, d) -> (nu,) ctrl`` is the in-step control callback — the
  ``mjcb_control`` analog, fired at the reference's exact callback point:
  after the velocity stage, before actuation (``engine_forward.c:1108``).
  Because it is traced into the step, closed-loop policies jit inside
  ``lax.scan`` rollouts with no host round-trip.
  """
  with jax.named_scope("position"):
    d = fwd_position(m, d)
    if not skip_sensor:
      d = sensor_mod.sensor_pos(m, d)
  with jax.named_scope("velocity"):
    d = fwd_velocity(m, d)
    if not skip_sensor:
      d = sensor_mod.sensor_vel(m, d)
  if ctrl_fn is not None:
    with jax.named_scope("control_callback"):
      d = d.replace(ctrl=jnp.asarray(ctrl_fn(m, d), dtype=d.ctrl.dtype))
  with jax.named_scope("actuation"):
    d = fwd_actuation(m, d)
  with jax.named_scope("acceleration"):
    d = fwd_acceleration(m, d)
  with jax.named_scope("constraint_solve"):
    d = solver_mod.fwd_constraint(m, d)
  if not skip_sensor:
    with jax.named_scope("sensor_acc"):
      d = sensor_mod.sensor_acc(m, d)
  return d


def _advance(m: Model, d: Data, act_dot: jax.Array, qacc: jax.Array,
             qvel_for_pos: Optional[jax.Array] = None) -> Data:
  """State advance (ref ``mj_advance``, engine_forward.c:738)."""
  act = d.act
  if m.na and not (m.opt.disableflags & DisableBit.ACTUATION):
    act = _next_activation(m, d, act_dot)
  qvel = d.qvel + qacc * m.opt.timestep
  qpos = support.integrate_pos(
      m, d.qpos, qvel if qvel_for_pos is None else qvel_for_pos,
      m.opt.timestep,
  )
  return d.replace(
      act=act, qvel=qvel, qpos=qpos, time=d.time + m.opt.timestep
  )


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping.

  (ref ``mj_EulerSkip``:779: when damping present and EULERDAMP enabled,
  solves (M + h diag(B)) qacc = qfrc_smooth + qfrc_constraint).  Dense
  Cholesky replaces the reference's sparse in-place refactorization.
  """
  qacc = d.qacc
  use_damp = m.has_dof_damping and not (
      m.opt.disableflags & DisableBit.EULERDAMP
  )
  if use_damp:
    from mujoco_inversedynamicstest_tpu.ops import linalg

    mh = d.qM + jnp.diag(m.opt.timestep * m.dof_damping)
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    lh = linalg.chol_factor(mh)
    qacc = linalg.chol_solve(lh, qfrc)
  return _advance(m, d, d.act_dot, qacc)


def rungekutta4(m: Model, d: Data, ctrl_fn=None) -> Data:
  """Explicit RK4 (ref ``mj_RungeKutta``:855, tableau :841)."""
  # Butcher tableau (same as the reference's fixed RK4)
  A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
  B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
  h = m.opt.timestep

  d0 = d
  qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
  # stage lists: velocities (for qpos-dot), accelerations, act rates
  vels = [qvel0]
  accs = [d.qacc]
  act_dots = [d.act_dot]

  for i in range(3):
    dqvel = sum(A[i][j] * vels[j] for j in range(i + 1))
    dqacc = sum(A[i][j] * accs[j] for j in range(i + 1))
    dact = sum(A[i][j] * act_dots[j] for j in range(i + 1))
    qpos_i = support.integrate_pos(m, qpos0, dqvel, h)
    qvel_i = qvel0 + h * dqacc
    act_i = act0 + h * dact
    di = d0.replace(qpos=qpos_i, qvel=qvel_i, act=act_i)
    di = forward(m, di, skip_sensor=True, ctrl_fn=ctrl_fn)
    vels.append(qvel_i)
    accs.append(di.qacc)
    act_dots.append(di.act_dot)

  dqvel = sum(b * v for b, v in zip(B, vels))
  dqacc = sum(b * a for b, a in zip(B, accs))
  dact = sum(b * a for b, a in zip(B, act_dots))

  return _advance(m, d0, dact, dqacc, qvel_for_pos=dqvel)


def smooth_vel_deriv(m: Model, d: Data, flg_bias: bool = True,
                     flg_actuation: bool = True) -> jax.Array:
  """qDeriv = d(qfrc_actuator + qfrc_passive - qfrc_bias)/dqvel, (nv, nv).

  Analog of ``mjd_smooth_vel`` (reference ``engine_derivative.c:1522``),
  which hand-assembles sparse spatial-algebra derivatives; here it is one
  ``jax.jacfwd`` through the velocity/actuation stages — exact and fused.
  ``flg_bias=False`` drops the RNE/Coriolis term (the IMPLICITFAST
  approximation).  ``d`` must hold a completed position stage.
  """

  from mujoco_inversedynamicstest_tpu.ops import linalg

  def f(qvel):
    dd = d.replace(qvel=qvel)
    dd = fwd_velocity(m, dd)
    out = dd.qfrc_passive
    if flg_bias:
      out = out - dd.qfrc_bias
    if flg_actuation:
      dd = fwd_actuation(m, dd)
      out = out + dd.qfrc_actuator
    return out

  with linalg.lean_compile():
    return jax.jacfwd(f)(d.qvel)


def implicit(m: Model, d: Data) -> Data:
  """Implicit-in-velocity integrators (ref ``mj_implicitSkip``:948).

  Solves ``(M - h*qDeriv) qacc' = qfrc_smooth + qfrc_constraint``.
  IMPLICIT uses the full qDeriv (incl. Coriolis) with a dense LU;
  IMPLICITFAST drops the Coriolis term and symmetrizes so a Cholesky
  solve suffices (the reference reduces to M-sparsity and Cholesky-
  factors, ``engine_forward.c:948-1026``).
  """
  from mujoco_inversedynamicstest_tpu.ops import linalg

  integrator = IntegratorType(m.opt.integrator)
  full = integrator == IntegratorType.IMPLICIT
  qderiv = smooth_vel_deriv(m, d, flg_bias=full, flg_actuation=True)
  mh = d.qM - m.opt.timestep * qderiv
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  if full:
    qacc = jnp.linalg.solve(mh, qfrc)
  else:
    mh = 0.5 * (mh + mh.T)
    qacc = linalg.chol_solve(linalg.chol_factor(mh), qfrc)
  return _advance(m, d, d.act_dot, qacc)


# mjMAXVAL (reference include/mujoco/mjmodel.h): state-validity bound
_MAXVAL = 1e10


def _check_reset(m: Model, d: Data) -> Data:
  """Auto-recovery from diverged states (per-batch-element masked reset).

  Analog of ``mj_checkPos``/``mj_checkVel`` (+ warning and
  ``mj_resetData``; ref ``engine_forward.c:53-104``).  The reference
  resets the whole mjData; here each vmapped rollout resets
  independently — a diverged element returns to the reference pose with
  zero velocity/controls while the rest of the batch is untouched.
  """
  if m.opt.disableflags & DisableBit.AUTORESET:
    return d
  bad_pos = ~jnp.all(jnp.isfinite(d.qpos)) | jnp.any(jnp.abs(d.qpos)
                                                     > _MAXVAL)
  bad_vel = ~jnp.all(jnp.isfinite(d.qvel)) | jnp.any(jnp.abs(d.qvel)
                                                     > _MAXVAL)
  bad = bad_pos | bad_vel
  rst = lambda x, v: jnp.where(bad, v, x)
  # per-lane warning counters (mjWARN_BADQPOS/BADQVEL analog, mjdata.h:54):
  # vmapped lanes each carry their own counts
  warning = d.warning.at[0].add(bad_pos.astype(d.warning.dtype))
  warning = warning.at[1].add(bad_vel.astype(d.warning.dtype))
  return d.replace(
      qpos=rst(d.qpos, m.qpos0),
      qvel=rst(d.qvel, jnp.zeros_like(d.qvel)),
      act=rst(d.act, jnp.zeros_like(d.act)),
      ctrl=rst(d.ctrl, jnp.zeros_like(d.ctrl)),
      qacc_warmstart=rst(d.qacc_warmstart, jnp.zeros_like(d.qvel)),
      qfrc_applied=rst(d.qfrc_applied, jnp.zeros_like(d.qfrc_applied)),
      xfrc_applied=rst(d.xfrc_applied, jnp.zeros_like(d.xfrc_applied)),
      warning=warning,
  )


def step_n(m: Model, d: Data, n: int, ctrl_fn=None) -> Data:
  """``n`` fused simulation steps as one ``lax.scan`` program.

  The single-dispatch analog of the reference's inner ``mj_step`` loop
  (``sample/testspeed.cc``): per-step dispatch overhead dominates
  single-scene latency on an accelerator (doc/mjx.rst:312-313's caveat),
  so interactive/latency-sensitive callers amortize it by advancing n
  steps per call.  Closed-loop control stays inside via ``ctrl_fn``.
  """

  def body(dd, _):
    return step(m, dd, ctrl_fn=ctrl_fn), None

  d, _ = jax.lax.scan(body, d, None, length=n)
  return d


def step(m: Model, d: Data, ctrl_fn=None) -> Data:
  """One simulation step (ref ``mj_step``, engine_forward.c:1134).

  ``ctrl_fn`` is the traceable in-step control callback (``mjcb_control``
  analog, see :func:`forward`); the RK4 integrator re-fires it per stage
  exactly as the reference re-enters ``mj_forwardSkip`` per stage.
  """
  d = _check_reset(m, d)
  d = forward(m, d, ctrl_fn=ctrl_fn)
  integrator = IntegratorType(m.opt.integrator)
  if integrator == IntegratorType.EULER:
    return euler(m, d)
  if integrator == IntegratorType.RK4:
    return rungekutta4(m, d, ctrl_fn=ctrl_fn)
  return implicit(m, d)
