"""Weak-scaling harness: MPC solves/s at 1..N mesh devices.

BASELINE's scaling target is >=85% weak-scaling of MPC solves/s from 1 host
to 4 hosts.  The design that achieves it (SURVEY §2.6.7): the fleet axis is
sharded over the device mesh (`shard_map`), each device runs its local
vmapped iLQR solves fully on-device, and the ONLY cross-device traffic is
the `psum` of scalar diagnostics (plan-cost / convergence reductions) —
O(scalars), never state.  This module *measures* solves/s at each device
count instead of asserting the property.

On a real multi-host TPU slice, pass ``jax.devices()`` so the batch axis
rides ICI within a slice and DCN across hosts.  Under the virtual-CPU test
mesh (``xla_force_host_platform_device_count``) the absolute numbers are
not meaningful (all devices share the same cores) but the harness exercises
the identical sharded program.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.opt import northstar
import sys

mpc_mod = sys.modules["mujoco_inversedynamicstest_tpu.opt.mpc"]
from mujoco_inversedynamicstest_tpu.parallel import sharding


class ScalePoint(NamedTuple):
  n_devices: int
  solves_per_sec: float
  wall_time_s: float
  compile_time_s: float
  plan_cost_mean: float


class WeakScalingResult(NamedTuple):
  points: Tuple[ScalePoint, ...]
  # solves/s at max devices divided by (ndev * solves/s at 1 device)
  efficiency: float


def sharded_fleet_mpc_fn(m: Model, cost, cfg: northstar.NorthStarConfig,
                         mesh, axis: str = "batch"):
  """Mesh-sharded fleet MPC: per-device vmapped solves + psum diagnostics.

  Returns a jitted ``fn(fleet_data) -> (plan_costs, global_cost_mean)``
  where ``fleet_data`` has its leading (fleet) axis sharded over ``mesh``.
  The psum is the cross-device reduction pattern of the SQP/line-search
  scalar blocks.
  """
  mcfg = cfg.mpc_config()

  @partial(
      shard_map, mesh=mesh, in_specs=(P(axis),), out_specs=(P(axis), P()),
      check_vma=False,
  )
  def _run(d_shard: Data):
    out = jax.vmap(
        lambda d: mpc_mod.run_mpc(m, cost, d, cfg.n_replan, mcfg)
    )(d_shard)
    local = jnp.mean(out.plan_costs)
    global_mean = jax.lax.pmean(local, axis)
    return out.plan_costs, global_mean

  return jax.jit(_run)


def mpc_weak_scaling(
    m: Model, cost, d0: Data, cfg: northstar.NorthStarConfig,
    fleet_per_device: int = 2,
    device_counts: Optional[Sequence[int]] = None,
    time_budget_s: Optional[float] = None,
) -> WeakScalingResult:
  """Measures MPC solves/s with the fleet sharded over 1..N devices.

  Weak scaling: the per-device fleet is constant, total fleet grows with
  the device count.  Efficiency = throughput(N) / (N * throughput(1)).

  ``time_budget_s`` bounds the sweep: device counts are visited in the
  order given and the sweep stops (keeping completed points) once the
  budget is spent — pass the most important counts first (the driver
  dryrun passes descending counts so the full-mesh point, a persistent-
  cache hit of its own gate program, always lands).
  """
  all_devices = jax.devices()
  if device_counts is None:
    device_counts = [n for n in (1, 2, 4, 8) if n <= len(all_devices)]

  sweep_t0 = time.perf_counter()
  points = []
  for n in device_counts:
    if (time_budget_s is not None and points
        and time.perf_counter() - sweep_t0 > time_budget_s):
      break
    mesh = sharding.make_mesh(all_devices[:n])
    fleet_cfg = cfg._replace(fleet=fleet_per_device * n)
    fleet = northstar.make_fleet(m, d0, fleet_cfg)
    fleet = sharding.shard_batch(mesh, fleet)
    fn = sharded_fleet_mpc_fn(m, cost, fleet_cfg, mesh)

    t0 = time.perf_counter()
    costs, gmean = fn(fleet)
    np.asarray(costs)
    compile_time = time.perf_counter() - t0

    t0 = time.perf_counter()
    costs, gmean = fn(fleet)
    np.asarray(costs)
    dt = time.perf_counter() - t0

    n_solves = fleet_cfg.fleet * cfg.n_replan
    points.append(ScalePoint(
        n_devices=n,
        solves_per_sec=n_solves / dt,
        wall_time_s=dt,
        compile_time_s=compile_time,
        plan_cost_mean=float(gmean),
    ))

  points.sort(key=lambda p: p.n_devices)
  base = points[0]
  last = points[-1]
  if last.n_devices == base.n_devices:
    eff = float("nan")                 # budget left a single point
  else:
    eff = last.solves_per_sec / (
        last.n_devices / base.n_devices * base.solves_per_sec
    )
  return WeakScalingResult(points=tuple(points), efficiency=float(eff))
