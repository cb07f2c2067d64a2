"""Dynamics derivatives: the linearization primitives of the MPC engine.

Analogs of the reference's derivative modules, re-designed TPU-first:

* ``smooth_vel_deriv``  — analog of ``mjd_smooth_vel`` (reference
  ``src/engine/engine_derivative.c:1522``): the Jacobian ``qDeriv =
  d(qfrc_actuator + qfrc_passive - qfrc_bias)/dqvel`` needed by the
  implicit integrators and the discrete-time inverse.  The reference
  assembles it from hand-written sparse spatial-algebra derivatives; here
  it is one ``jax.jacfwd`` through the velocity/actuation stages — exact,
  fused by XLA, and batched for free under ``vmap``.

* ``transition_fd`` / ``transition_ad`` — analog of ``mjd_transitionFD``
  (reference ``src/engine/engine_derivative_fd.c:550``): state-space
  Jacobians A, B (and sensor Jacobians C, D) of ``step`` in the tangent
  space ``x = [dq; qvel; act]`` (dim ``2*nv + na``).  The FD variant
  vmaps the perturbed steps across columns (one batched XLA call instead
  of the reference's sequential loop); the AD variant is an exact
  ``jacfwd`` through the whole step, including the constraint solver's
  ``lax.while_loop`` (forward-mode differentiable).

* ``inverse_fd`` / ``inverse_ad`` — analog of ``mjd_inverseFD`` (reference
  ``src/engine/engine_derivative_fd.c:611``): Jacobians of
  ``qfrc_inverse`` w.r.t. (qpos, qvel, qacc) — the iLQR/SQP torque-
  linearization primitive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import inverse as inverse_mod
from mujoco_inversedynamicstest_tpu.ops import support


# ---------------------------------------------------------------------------
# tangent-space state <-> Data
# ---------------------------------------------------------------------------


def state_dim(m: Model) -> int:
  """Tangent state dimension 2*nv + na (mjd_transitionFD's state layout)."""
  return 2 * m.nv + m.na


def apply_tangent(m: Model, d: Data, dx: jax.Array,
                  du: Optional[jax.Array] = None) -> Data:
  """Perturbs ``d`` by a tangent state dx = [dq; dv; da] (and ctrl du)."""
  nv, na = m.nv, m.na
  qpos = support.integrate_pos(m, d.qpos, dx[:nv], 1.0)
  qvel = d.qvel + dx[nv:2 * nv]
  act = d.act + dx[2 * nv:2 * nv + na] if na else d.act
  ctrl = d.ctrl + du if du is not None else d.ctrl
  return d.replace(qpos=qpos, qvel=qvel, act=act, ctrl=ctrl)


def measure_tangent(m: Model, d_ref: Data, d: Data) -> jax.Array:
  """Tangent coordinates of ``d``'s state relative to ``d_ref``'s."""
  dq = support.differentiate_pos(m, d_ref.qpos, d.qpos, 1.0)
  parts = [dq, d.qvel - d_ref.qvel]
  if m.na:
    parts.append(d.act - d_ref.act)
  return jnp.concatenate(parts)


def get_state(m: Model, d: Data) -> jax.Array:
  """Physics state vector [qpos; qvel; act] (cf. mjSTATE_PHYSICS)."""
  parts = [d.qpos, d.qvel]
  if m.na:
    parts.append(d.act)
  return jnp.concatenate(parts)


def set_state(m: Model, d: Data, x: jax.Array) -> Data:
  """Writes a [qpos; qvel; act] state vector into ``d``."""
  nq, nv, na = m.nq, m.nv, m.na
  d = d.replace(qpos=x[:nq], qvel=x[nq:nq + nv])
  if na:
    d = d.replace(act=x[nq + nv:nq + nv + na])
  return d


# ---------------------------------------------------------------------------
# qDeriv: d(smooth forces)/dqvel (mjd_smooth_vel) — lives with the
# integrators that consume it; re-exported here for the opt layer.
# ---------------------------------------------------------------------------

smooth_vel_deriv = forward_mod.smooth_vel_deriv


# ---------------------------------------------------------------------------
# transition Jacobians (A, B, C, D)
# ---------------------------------------------------------------------------


class Transition(NamedTuple):
  """State-space linearization of step: dx' = A dx + B du (+ sensors)."""
  A: jax.Array              # (nx, nx)
  B: jax.Array              # (nx, nu)
  C: Optional[jax.Array]    # (nsensordata, nx) or None
  D: Optional[jax.Array]    # (nsensordata, nu) or None


def _step_measured(m: Model, d: Data, d_next: Data, z: jax.Array,
                   flg_sensor: bool):
  """Steps from d perturbed by tangent z=[dx;du]; measures vs d_next."""
  nx = state_dim(m)
  dp = apply_tangent(m, d, z[:nx], z[nx:])
  dn = forward_mod.step(m, dp)
  y = measure_tangent(m, d_next, dn)
  s = dn.sensordata if flg_sensor else jnp.zeros((0,), dtype=y.dtype)
  return y, s


def transition_ad(m: Model, d: Data, flg_sensor: bool = False) -> Transition:
  """Exact transition Jacobians via forward-mode autodiff.

  The TPU-native replacement for ``mjd_transitionFD``: one ``jacfwd``
  through ``step`` (solver ``while_loop`` included).  ``d`` must hold a
  completed forward pass (as the reference requires).
  """
  from mujoco_inversedynamicstest_tpu.ops import linalg

  nx, nu = state_dim(m), m.nu
  # lean mode: jacfwd multiplies the traced step graph by the tangent
  # batch; the scan-form factorizations keep the compile O(1) in nv
  # (194 s -> minutes-less MPC compiles, see linalg.py)
  with linalg.lean_compile():
    d_next = forward_mod.step(m, d)
    z0 = jnp.zeros(nx + nu, dtype=d.qpos.dtype)
    jac_y, jac_s = jax.jacfwd(
        lambda z: _step_measured(m, d, d_next, z, flg_sensor)
    )(z0)
  C = jac_s[:, :nx] if flg_sensor else None
  D = jac_s[:, nx:] if flg_sensor else None
  return Transition(A=jac_y[:, :nx], B=jac_y[:, nx:], C=C, D=D)


def transition_fd(m: Model, d: Data, eps: float = 1e-6,
                  flg_centered: bool = False,
                  flg_sensor: bool = False) -> Transition:
  """Finite-difference transition Jacobians (ref ``mjd_transitionFD``:550).

  The reference loops over columns serially on the CPU; here all
  ``2*(nx+nu)`` (centered) or ``nx+nu`` perturbed steps run as ONE vmapped
  XLA computation — each column is an independent lane of the batch.
  """
  nx, nu = state_dim(m), m.nu
  d_next = forward_mod.step(m, d)
  eye = jnp.eye(nx + nu, dtype=d.qpos.dtype)

  f = jax.vmap(lambda z: _step_measured(m, d, d_next, z, flg_sensor))
  if flg_centered:
    yp, sp = f(eps * eye)
    ym, sm = f(-eps * eye)
    jac_y = (yp - ym).T / (2 * eps)
    jac_s = (sp - sm).T / (2 * eps)
  else:
    y0, s0 = _step_measured(
        m, d, d_next, jnp.zeros(nx + nu, dtype=d.qpos.dtype), flg_sensor
    )
    yp, sp = f(eps * eye)
    jac_y = (yp - y0[None]).T / eps
    jac_s = (sp - s0[None]).T / eps

  C = jac_s[:, :nx] if flg_sensor else None
  D = jac_s[:, nx:] if flg_sensor else None
  return Transition(A=jac_y[:, :nx], B=jac_y[:, nx:], C=C, D=D)


# ---------------------------------------------------------------------------
# inverse-dynamics Jacobians
# ---------------------------------------------------------------------------


class InverseJac(NamedTuple):
  """d qfrc_inverse / d (qpos, qvel, qacc) — the MPC torque linearization."""
  dfdq: jax.Array  # (nv, nv): d qfrc_inverse / d qpos (tangent)
  dfdv: jax.Array  # (nv, nv): d qfrc_inverse / d qvel
  dfda: jax.Array  # (nv, nv): d qfrc_inverse / d qacc


def _inverse_f(m: Model, d: Data, z: jax.Array) -> jax.Array:
  nv = m.nv
  dq, dv, da = z[:nv], z[nv:2 * nv], z[2 * nv:]
  dp = d.replace(
      qpos=support.integrate_pos(m, d.qpos, dq, 1.0),
      qvel=d.qvel + dv,
      qacc=d.qacc + da,
  )
  return inverse_mod.inverse(m, dp).qfrc_inverse


def inverse_ad(m: Model, d: Data) -> InverseJac:
  """Exact inverse-dynamics Jacobians via ``jacfwd`` (TPU-native
  replacement for ``mjd_inverseFD``, reference
  ``engine_derivative_fd.c:611``)."""
  from mujoco_inversedynamicstest_tpu.ops import linalg

  nv = m.nv
  z0 = jnp.zeros(3 * nv, dtype=d.qpos.dtype)
  with linalg.lean_compile():
    jac = jax.jacfwd(lambda z: _inverse_f(m, d, z))(z0)
  return InverseJac(
      dfdq=jac[:, :nv], dfdv=jac[:, nv:2 * nv], dfda=jac[:, 2 * nv:]
  )


def inverse_fd(m: Model, d: Data, eps: float = 1e-6,
               flg_centered: bool = False) -> InverseJac:
  """FD inverse-dynamics Jacobians; all columns vmapped into one call."""
  nv = m.nv
  eye = jnp.eye(3 * nv, dtype=d.qpos.dtype)
  f = jax.vmap(lambda z: _inverse_f(m, d, z))
  if flg_centered:
    jac = (f(eps * eye) - f(-eps * eye)).T / (2 * eps)
  else:
    f0 = _inverse_f(m, d, jnp.zeros(3 * nv, dtype=d.qpos.dtype))
    jac = (f(eps * eye) - f0[None]).T / eps
  return InverseJac(
      dfdq=jac[:, :nv], dfdv=jac[:, nv:2 * nv], dfda=jac[:, 2 * nv:]
  )
