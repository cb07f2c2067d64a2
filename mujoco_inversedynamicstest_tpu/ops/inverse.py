"""Inverse dynamics — the fork's focal pipeline.

Analog of ``src/engine/engine_inverse.c``: ``mj_inverse``:266,
``mj_inverseSkip``:197, ``mj_invPosition``:37, ``mj_invVelocity``:73,
``mj_discreteAcc``:81, ``mj_invConstraint``:169, ``mj_compareFwdInv``:275.

Given (qpos, qvel, qacc), computes the generalized force ``qfrc_inverse``
that would produce that acceleration:

    qfrc_inverse = RNE(qpos, qvel, qacc) + armature*qacc
                   - qfrc_passive - qfrc_constraint

The whole pipeline is one XLA computation; batched over thousands of
(state, acceleration) samples with ``vmap`` it is the torque oracle of the
MPC engine (BASELINE north-star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    DisableBit,
    EnableBit,
    IntegratorType,
    Model,
)
from mujoco_inversedynamicstest_tpu.ops import constraint as constraint_mod
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import sensor as sensor_mod
from mujoco_inversedynamicstest_tpu.ops import smooth, support


def inv_position(m: Model, d: Data) -> Data:
  """Position stage of the inverse pipeline (ref ``mj_invPosition``:37)."""
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.flex(m, d)
  d = smooth.tendon(m, d)
  d = smooth.crb(m, d)
  d = smooth.factor_m(m, d)
  d = constraint_mod.collision_stage(m, d)
  d = constraint_mod.make_constraint(m, d)
  d = smooth.transmission(m, d)
  return d


def inv_velocity(m: Model, d: Data) -> Data:
  """Velocity stage (ref ``mj_invVelocity``:73 -> ``mj_fwdVelocity``)."""
  return forward_mod.fwd_velocity(m, d)


def discrete_acc(m: Model, d: Data) -> jax.Array:
  """Maps discrete-time qacc to continuous for INVDISCRETE mode.

  Analog of ``mj_discreteAcc`` (ref ``engine_inverse.c:81``).  EULER:
  solves ``M qacc' = (M + h diag(B)) qacc``.  IMPLICIT/IMPLICITFAST:
  ``M qacc' = (M - h qDeriv) qacc`` with qDeriv from autodiff
  (ref :120-157).  RK4 is unsupported (as in the reference :90-93).
  """
  integrator = IntegratorType(m.opt.integrator)
  if integrator == IntegratorType.RK4:
    raise ValueError("discrete inverse dynamics unsupported for RK4")
  if integrator == IntegratorType.EULER:
    use_damp = m.has_dof_damping and not (
        m.opt.disableflags & DisableBit.EULERDAMP
    )
    if not use_damp:
      return d.qacc
    qfrc = smooth.mul_m(m, d, d.qacc) + (
        m.opt.timestep * m.dof_damping * d.qacc
    )
    return smooth.solve_m(m, d, qfrc)
  # implicit / implicitfast
  full = integrator == IntegratorType.IMPLICIT
  qderiv = forward_mod.smooth_vel_deriv(m, d, flg_bias=full)
  mh = d.qM - m.opt.timestep * qderiv
  if not full:
    mh = 0.5 * (mh + mh.T)
  return smooth.solve_m(m, d, mh @ d.qacc)


def inv_constraint(m: Model, d: Data) -> Data:
  """Inverse constraint solve (ref ``mj_invConstraint``:169)."""
  if d.nefc == 0:
    return d.replace(qfrc_constraint=jnp.zeros_like(d.qfrc_constraint))
  # jar = J qacc - aref; then the analytic constraint force update
  jar = d.efc_J @ d.qacc - d.efc_aref
  d, _ = constraint_mod.constraint_update(m, d, jar)
  return d


def inverse(m: Model, d: Data, skip_sensor: bool = True) -> Data:
  """Full inverse dynamics (ref ``mj_inverse``:266).

  Reads (qpos, qvel, qacc) from ``d``; writes ``qfrc_inverse`` (and the
  intermediate stages).
  """
  d = inv_position(m, d)
  if not skip_sensor:
    d = sensor_mod.sensor_pos(m, d)
  d = inv_velocity(m, d)
  if not skip_sensor:
    d = sensor_mod.sensor_vel(m, d)

  qacc = d.qacc
  if m.opt.enableflags & EnableBit.INVDISCRETE:
    d = d.replace(qacc=discrete_acc(m, d))

  d = inv_constraint(m, d)
  qfrc_inverse = smooth.rne(m, d, flg_acc=True)
  if not skip_sensor:
    d = sensor_mod.sensor_acc(m, d)

  qfrc_inverse = (
      qfrc_inverse
      + m.dof_armature * d.qacc
      - d.qfrc_passive
      - d.qfrc_constraint
  )
  return d.replace(qfrc_inverse=qfrc_inverse, qacc=qacc)


def compare_fwd_inv(m: Model, d: Data) -> Data:
  """Forward/inverse consistency diagnostic (ref ``mj_compareFwdInv``:275).

  ``solver_fwdinv[0] = |qfrc_constraint_fwd - qfrc_constraint_inv|``,
  ``solver_fwdinv[1] = |qfrc_applied + J'xfrc + qfrc_actuator -
  qfrc_inverse|``.  ``d`` must hold a completed forward pass.
  """
  qforce = (
      d.qfrc_applied + d.qfrc_actuator + support.xfrc_accumulate(m, d)
  )
  save_constraint = d.qfrc_constraint

  # inverse from the VEL stage down (states already computed by forward)
  qacc = d.qacc
  if m.opt.enableflags & EnableBit.INVDISCRETE:
    d = d.replace(qacc=discrete_acc(m, d))
  di = inv_constraint(m, d)
  qfrc_inverse = smooth.rne(m, di, flg_acc=True) + (
      m.dof_armature * di.qacc - di.qfrc_passive - di.qfrc_constraint
  )

  fwdinv = jnp.stack([
      jnp.linalg.norm(save_constraint - di.qfrc_constraint),
      jnp.linalg.norm(qforce - qfrc_inverse),
  ])
  return d.replace(
      solver_fwdinv=fwdinv, qfrc_constraint=save_constraint, qacc=qacc
  )
