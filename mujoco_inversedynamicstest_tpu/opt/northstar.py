"""North-star benchmark harness: humanoid MPC solves/s + torque parity.

BASELINE.md's driver metric is *MPC solves/s per chip + max torque error vs
``mj_inverse`` (humanoid, H=100)*: a fleet of receding-horizon iLQR/SQP
solves (reference recipe ``python/LQR.ipynb`` + ``mjd_transitionFD``,
reference ``src/engine/engine_derivative_fd.c:550``), with the executed
trajectories' generalized torques reproduced through the inverse-dynamics
pipeline (reference ``src/engine/engine_inverse.c:266``) and compared to the
CPU oracle at 1e-4 — the fork's own validation pattern
(``src/inverse/inverse_test.cpp:62-125``) lifted to the MPC setting.

TPU-first composition (nothing here is a port):

* one *solve* = one receding-horizon replan = one warm-started iLQR at
  horizon H over the full contact dynamics — entirely on device;
* a *fleet* of solves is ``vmap`` over initial states: with fleet F and
  ``n_alpha`` parallel line-search rollouts, F x n_alpha rollouts are in
  flight during forward passes (the BASELINE "4096 batched rollouts"
  configuration is F=512, n_alpha=8);
* linearizations stream through ``lax.map`` chunks (``ILQRConfig.lin_batch``)
  so the 2*nv+na+nu tangent batch stays within HBM at fleet scale;
* multi-chip: shard the fleet axis over a ``jax.sharding.Mesh`` — see
  ``parallel/scaling.py`` for the weak-scaling harness.
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import inverse as inverse_mod
from mujoco_inversedynamicstest_tpu.ops import support
# import the submodules by file path: the package __init__ re-exports a
# function named ``ilqr`` that shadows the module attribute
import mujoco_inversedynamicstest_tpu.opt.ilqr
import mujoco_inversedynamicstest_tpu.opt.mpc
import sys

ilqr_mod = sys.modules["mujoco_inversedynamicstest_tpu.opt.ilqr"]
mpc_mod = sys.modules["mujoco_inversedynamicstest_tpu.opt.mpc"]


def balance_cost(m: Model, qpos_ref: Optional[jax.Array] = None,
                 w_pos: float = 8.0, w_root: float = 40.0,
                 w_vel: float = 0.08, w_ctrl: float = 0.02):
  """Posture-tracking cost (humanoid standing / BASELINE config 3-4).

  Quadratic in the tangent-space posture error relative to ``qpos_ref``
  (default: the model reference pose qpos0), with the root free joint
  (first 6 tangent coords, if any) weighted ``w_root`` and the remaining
  joints ``w_pos``; plus velocity and control regularization.
  """
  ref = m.qpos0 if qpos_ref is None else qpos_ref
  # per-dof weights: free-root dofs get w_root
  w = np.full(m.nv, w_pos)
  from mujoco_inversedynamicstest_tpu.models.types import JointType

  for j in range(m.njnt):
    if m.jnt_type[j] == JointType.FREE:
      adr = m.jnt_dofadr[j]
      w[adr:adr + 6] = w_root
  w = jnp.asarray(w)

  def cost(mm: Model, s: ilqr_mod.State, u: jax.Array, t: jax.Array):
    dq = support.differentiate_pos(mm, ref.astype(s.qpos.dtype), s.qpos, 1.0)
    return (
        jnp.sum(w.astype(dq.dtype) * dq * dq)
        + w_vel * s.qvel @ s.qvel
        + w_ctrl * u @ u
    )

  return cost


class NorthStarConfig(NamedTuple):
  """Fleet-MPC benchmark configuration."""
  horizon: int = 100
  fleet: int = 512
  n_replan: int = 2
  ilqr_iterations: int = 2
  n_alpha: int = 8
  lin_batch: Optional[int] = 2
  qpos_noise: float = 0.02
  qvel_noise: float = 0.02
  seed: int = 0
  # plan steps executed per replan; n_apply == horizon consumes the whole
  # plan (the H=100 parity configuration: the executed trajectory then IS
  # the full-horizon plan, replayed through both inverse pipelines)
  n_apply: int = 1
  # max fleet lanes per device execution: the measurement harness splits
  # larger fleets into sequential dispatches of this size (long single
  # executions can exceed remote-runtime deadlines; throughput is
  # unaffected — the device is saturated well below 256 lanes)
  max_exec_fleet: int = 256

  def mpc_config(self) -> mpc_mod.MPCConfig:
    return mpc_mod.MPCConfig(
        horizon=self.horizon,
        ilqr=ilqr_mod.ILQRConfig(
            iterations=self.ilqr_iterations,
            n_alpha=self.n_alpha,
            lin_batch=self.lin_batch,
        ),
        n_apply=self.n_apply,
    )


def make_fleet(m: Model, d0: Data, cfg: NorthStarConfig) -> Data:
  """A fleet of perturbed initial states (vmapped Data batch)."""
  rng = np.random.RandomState(cfg.seed)
  dtype = d0.qpos.dtype
  nq_off = 7 if (m.njnt and m.jnt_type[0] == 0) else 0  # keep free root pose
  dq = cfg.qpos_noise * rng.randn(cfg.fleet, m.nq)
  dq[:, :nq_off] = 0.0
  qpos = jnp.asarray(np.array(d0.qpos)[None] + dq, dtype=dtype)
  qvel = jnp.asarray(cfg.qvel_noise * rng.randn(cfg.fleet, m.nv), dtype=dtype)
  return jax.vmap(lambda q, v: d0.replace(qpos=q, qvel=v))(qpos, qvel)


def fleet_mpc_fn(m: Model, cost, cfg: NorthStarConfig):
  """Jittable fleet solve: (Data fleet) -> MPCRun batch.

  One call performs ``fleet * n_replan`` MPC solves.
  """
  mcfg = cfg.mpc_config()

  def run(d0_fleet: Data) -> mpc_mod.MPCRun:
    return jax.vmap(
        lambda d: mpc_mod.run_mpc(m, cost, d, cfg.n_replan, mcfg)
    )(d0_fleet)

  return jax.jit(run)


class NorthStarResult(NamedTuple):
  solves_per_sec: float          # per chip (single-device harness)
  n_solves: int
  wall_time_s: float
  compile_time_s: float
  plan_cost_mean: float          # over FINITE lanes (the quality signal)
  run: mpc_mod.MPCRun            # for downstream parity checks
  # solve-quality diagnostics (VERDICT r2: the throughput number is only
  # trustworthy alongside these)
  finite_lane_fraction: float = float("nan")  # lanes with finite plan cost
  mean_iterations: float = float("nan")       # iLQR iterations per solve
  solve_latency_s: float = float("nan")       # wall seconds per solve


def measure_solves_per_sec(m: Model, cost, d0: Data,
                           cfg: NorthStarConfig) -> NorthStarResult:
  """Times the fleet solve (compile excluded; one warm repetition).

  Fleets larger than ``cfg.max_exec_fleet`` run as sequential dispatches
  of that size (one compiled program, several executions)."""
  fleet = make_fleet(m, d0, cfg)
  chunk = min(cfg.fleet, cfg.max_exec_fleet)
  n_chunks, rem = divmod(cfg.fleet, chunk)
  if rem:
    n_chunks, chunk = 1, cfg.fleet  # non-divisible: single dispatch
  fn = fleet_mpc_fn(m, cost, cfg._replace(fleet=chunk))
  chunks = [
      jax.tree.map(lambda a, i=i: a[i * chunk:(i + 1) * chunk], fleet)
      for i in range(n_chunks)
  ]

  def run_all():
    outs = [fn(c) for c in chunks]
    # host fetch: the remote-TPU backend's block_until_ready can return
    # early; fetching forces true completion (bench.py _sync rationale)
    np.asarray(outs[-1].plan_costs)
    return jax.tree.map(lambda *x: jnp.concatenate(x), *outs)

  t0 = time.perf_counter()
  out = run_all()
  compile_time = time.perf_counter() - t0

  t0 = time.perf_counter()
  out = run_all()
  dt = time.perf_counter() - t0

  n_solves = cfg.fleet * cfg.n_replan
  costs = np.asarray(out.plan_costs)
  finite = np.isfinite(costs)
  return NorthStarResult(
      solves_per_sec=n_solves / dt,
      n_solves=n_solves,
      wall_time_s=dt,
      compile_time_s=compile_time,
      plan_cost_mean=float(costs[finite].mean()) if finite.any()
      else float("nan"),
      run=out,
      finite_lane_fraction=float(finite.mean()),
      mean_iterations=float(np.asarray(out.niters).mean()),
      # the whole fleet progresses in lockstep, so each solve's latency is
      # the batch wall time per replan cycle
      solve_latency_s=dt / cfg.n_replan,
  )


def executed_trajectory(m: Model, d0: Data, us: jax.Array):
  """Rolls applied controls out; returns per-step (qpos, qvel, qacc_discrete).

  ``qacc_discrete[t] = (qvel[t+1] - qvel[t]) / h`` is the acceleration the
  integrator actually produced — the quantity ``mj_inverse`` must reproduce
  torques for (the fork's harness convention,
  reference ``src/inverse/inverse_test.cpp:62-108``).
  """
  h = m.opt.timestep

  def body(d, u):
    dn = forward_mod.step(m, d.replace(ctrl=u))
    return dn, (d.qpos, d.qvel, (dn.qvel - d.qvel) / h)

  _, (qpos, qvel, qacc) = jax.lax.scan(body, d0, us)
  return qpos, qvel, qacc


def inverse_torques_along(m: Model, d_template: Data, qpos: jax.Array,
                          qvel: jax.Array, qacc: jax.Array) -> jax.Array:
  """Our inverse-dynamics torques at each (state, qacc) sample (vmapped)."""

  def one(qp, qv, qa):
    d = d_template.replace(qpos=qp, qvel=qv, qacc=qa)
    return inverse_mod.inverse(m, d).qfrc_inverse

  return jax.vmap(one)(qpos, qvel, qacc)


def torque_parity_vs_host(mjm, m: Model, d0: Data,
                          us: jax.Array) -> Tuple[float, np.ndarray]:
  """Max |qfrc_inverse(ours) - mj_inverse(C)| along the executed trajectory.

  Replays each visited (qpos, qvel, qacc_discrete) sample through BOTH
  inverse pipelines — ours on device (vmapped over the horizon), the C
  engine's on host — and returns (max_abs_err, per_step_err).  This is the
  BASELINE north-star parity quantity (target <= 1e-4 in f64).
  """
  import mujoco

  qpos, qvel, qacc = jax.jit(
      lambda d, u: executed_trajectory(m, d, u)
  )(d0, us)
  ours = jax.jit(
      lambda a, b, c: inverse_torques_along(m, d0, a, b, c)
  )(qpos, qvel, qacc)

  qpos_h, qvel_h = np.asarray(qpos), np.asarray(qvel)
  qacc_h, ours_h = np.asarray(qacc), np.asarray(ours)

  mjd = mujoco.MjData(mjm)
  errs = np.zeros(len(qpos_h))
  for t in range(len(qpos_h)):
    mjd.qpos[:] = qpos_h[t]
    mjd.qvel[:] = qvel_h[t]
    mjd.qacc[:] = qacc_h[t]
    mujoco.mj_inverse(mjm, mjd)
    errs[t] = np.abs(ours_h[t] - mjd.qfrc_inverse).max()
  return float(errs.max()), errs
