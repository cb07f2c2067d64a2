"""Receding-horizon MPC on the TPU-native dynamics (the north-star engine).

The reference provides the pieces of an MPC loop — ``mj_inverse`` as the
torque oracle (reference ``src/engine/engine_inverse.c:266``),
``mjd_transitionFD`` linearization, ``mju_boxQP`` — but no driver.  This
module is the driver, built TPU-first:

* one MPC *solve* = a warm-started iLQR (SQP on the rollout) — fully
  on-device, no host sync inside the solve;
* a *fleet* of MPC problems is ``vmap`` over (state, warm-start) batches;
* multi-chip/multi-host scaling shards the fleet axis over a
  ``jax.sharding.Mesh`` (ICI within a slice, DCN across hosts); the only
  cross-device traffic is the ``psum`` of scalar diagnostics — the
  weak-scaling recipe from SURVEY §2.6;
* torque parity: ``inverse_torques`` recovers the generalized forces of
  the solution trajectory through the inverse-dynamics pipeline, the
  quantity checked against CPU ``mj_inverse`` at 1e-4 (BASELINE).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import inverse as inverse_mod
from mujoco_inversedynamicstest_tpu.ops import support
import sys
import mujoco_inversedynamicstest_tpu.opt.ilqr
ilqr_mod = sys.modules['mujoco_inversedynamicstest_tpu.opt.ilqr']


class MPCConfig(NamedTuple):
  horizon: int = 25
  ilqr: ilqr_mod.ILQRConfig = ilqr_mod.ILQRConfig(iterations=5, n_alpha=6)
  # steps of the plan consumed (and simulated) per replan
  n_apply: int = 1


class MPCCarry(NamedTuple):
  d: Data              # current "real" system state
  us_warm: jax.Array   # (horizon, nu) warm-start plan


class MPCStepResult(NamedTuple):
  carry: MPCCarry
  u_applied: jax.Array   # (n_apply, nu) controls actually applied
  plan_cost: jax.Array   # iLQR objective of the accepted plan
  niter: jax.Array       # iLQR iterations used


def make_warm_start(m: Model, horizon: int, dtype=None) -> jax.Array:
  return jnp.zeros((horizon, m.nu), dtype or m.dtype)


def mpc_step(m: Model, cost: ilqr_mod.CostFn, carry: MPCCarry,
             config: MPCConfig) -> MPCStepResult:
  """One replan-then-act cycle: solve iLQR from the current state,
  apply the first ``n_apply`` controls to the system, shift the plan.

  Jittable; ``vmap`` over a batch of carries for an MPC fleet.
  """
  cfg = config
  res = ilqr_mod.ilqr(m, cost, carry.d, carry.us_warm, cfg.ilqr)

  u_apply = res.us[:cfg.n_apply]

  def act(d, u):
    return forward_mod.step(m, d.replace(ctrl=u)), None

  d_next, _ = jax.lax.scan(act, carry.d, u_apply)

  # receding-horizon shift: drop consumed controls, repeat the tail
  us_next = jnp.concatenate(
      [res.us[cfg.n_apply:],
       jnp.tile(res.us[-1:], (cfg.n_apply, 1))], axis=0
  )
  return MPCStepResult(
      carry=MPCCarry(d=d_next, us_warm=us_next),
      u_applied=u_apply,
      plan_cost=res.cost,
      niter=res.niter,
  )


class MPCRun(NamedTuple):
  ds: Data             # final states (batched)
  us: jax.Array        # (..., n_replan * n_apply, nu) applied controls
  plan_costs: jax.Array  # (..., n_replan)
  niters: jax.Array      # (..., n_replan)


def run_mpc(m: Model, cost: ilqr_mod.CostFn, d0: Data, n_replan: int,
            config: Optional[MPCConfig] = None,
            us_warm: Optional[jax.Array] = None) -> MPCRun:
  """Runs ``n_replan`` MPC cycles from ``d0`` (single problem; ``vmap``
  this function over a batch of ``d0`` for a fleet)."""
  cfg = config or MPCConfig()
  if us_warm is None:
    us_warm = make_warm_start(m, cfg.horizon, d0.qpos.dtype)

  def body(carry, _):
    out = mpc_step(m, cost, carry, cfg)
    return out.carry, (out.u_applied, out.plan_cost, out.niter)

  carry, (us, costs, niters) = jax.lax.scan(
      body, MPCCarry(d=d0, us_warm=us_warm), None, length=n_replan
  )
  return MPCRun(
      ds=carry.d,
      us=us.reshape(-1, m.nu),
      plan_costs=costs,
      niters=niters,
  )


def inverse_torques(m: Model, xs: ilqr_mod.State) -> jax.Array:
  """Generalized torques along a trajectory via inverse dynamics.

  Given the (T+1)-stacked states of a plan, finite-differences the
  discrete accelerations the integrator actually produced and runs the
  inverse pipeline (ref ``mj_inverse``; with INVDISCRETE semantics these
  match ``mj_step``'s torques) — the BASELINE parity quantity.
  """
  h = m.opt.timestep
  T = xs.qvel.shape[0] - 1
  d0 = _template_data(m, xs)

  def one(qpos, qvel, qvel_next, act):
    qacc = (qvel_next - qvel) / h
    d = d0.replace(qpos=qpos, qvel=qvel, act=act, qacc=qacc)
    return inverse_mod.inverse(m, d).qfrc_inverse

  return jax.vmap(one)(
      jax.tree.map(lambda a: a[:T], xs.qpos),
      xs.qvel[:T],
      xs.qvel[1:],
      jax.tree.map(lambda a: a[:T], xs.act),
  )


def _template_data(m: Model, xs: ilqr_mod.State) -> Data:
  from mujoco_inversedynamicstest_tpu.models.io import make_data

  return make_data(m, dtype=xs.qpos.dtype)
