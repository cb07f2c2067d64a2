"""Device-mesh distribution of batched simulation / MPC.

The reference's parallelism surface (SURVEY §2.6) maps to TPU as:

* batch rollout parallelism (reference ``python/mujoco/rollout.cc`` thread
  pool; MJX ``pmap`` in ``mjx/mujoco/mjx/_src/test_util.py:74-91``)
  -> ``vmap`` within a chip x a sharded ``batch`` mesh axis across chips
  (ICI) and hosts (DCN), via ``shard_map``;
* intra-step task parallelism (threadpool split in ``mj_fwdPosition``,
  reference ``engine_forward.c:152-170``) -> XLA schedules independent
  subgraphs automatically — no explicit analog;
* island parallelism -> subsumed by the batch axis;
* model/tensor parallelism has no analog: models are small (nv <= a few
  hundred); the scaling axis is the batch of simulations.

Cross-device communication is limited to reduction scalars / QP blocks
(``psum``), which keeps weak scaling near-linear (BASELINE >=85% target).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_inversedynamicstest_tpu.models.types import Data, Model


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = "batch") -> Mesh:
  """Creates a 1-D device mesh over the batch axis.

  For multi-host topologies, pass ``jax.devices()`` (global) so the mesh
  spans hosts; the batch axis then rides ICI within a slice and DCN
  across hosts.
  """
  devices = list(devices) if devices is not None else jax.devices()
  return Mesh(np.array(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "batch"):
  """Places a batched pytree with its leading axis sharded over the mesh."""
  sharding = NamedSharding(mesh, P(axis))
  return jax.tree.map(
      lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and
      x.ndim >= 1 else x,
      tree,
  )


def replicate(mesh: Mesh, tree):
  """Replicates a pytree (e.g. the Model) across the mesh."""
  sharding = NamedSharding(mesh, P())
  return jax.tree.map(
      lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") else x,
      tree,
  )


def sharded_step_fn(m: Model, mesh: Mesh, step_fn: Callable,
                    axis: str = "batch") -> Callable:
  """Builds a jitted, mesh-sharded batched step.

  ``step_fn(m, d) -> d`` is vmapped over the per-device shard and
  shard_mapped over the mesh; a ``psum`` over per-device diagnostics
  exercises the cross-device reduction path the SQP/iLQR blocks use.
  Returns ``fn(batched_data) -> (batched_data, global_mean_|qacc|)``.
  """

  vstep = jax.vmap(step_fn, in_axes=(None, 0))

  @partial(
      shard_map,
      mesh=mesh,
      in_specs=(P(axis),),
      out_specs=(P(axis), P()),
      check_vma=False,
  )
  def _sharded(d_shard: Data):
    d_out = vstep(m, d_shard)
    # cross-device scalar reduction (the MPC QP/line-search pattern)
    local = jnp.sum(jnp.abs(d_out.qacc)) / d_out.qacc.size
    global_mean = jax.lax.pmean(local, axis)
    return d_out, global_mean

  return jax.jit(_sharded)


def weak_scaling_batch(m: Model, make_data_fn: Callable, batch_per_device:
                       int, mesh: Mesh, axis: str = "batch") -> Data:
  """Allocates a mesh-sharded batch of ``Data`` (batch_per_device x ndev)."""
  n = batch_per_device * mesh.devices.size
  d0 = make_data_fn(m)
  batched = jax.vmap(lambda _: d0)(jnp.arange(n))
  return shard_batch(mesh, batched, axis)
