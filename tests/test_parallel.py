"""Mesh-sharded batched stepping on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.parallel import sharding

from models import ACTUATED


def test_sharded_step_matches_vmap():
  assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
  m = mi.load_model(ACTUATED)
  d0 = mi.make_data(m)
  mesh = sharding.make_mesh(jax.devices()[:8])

  n = 16
  rng = np.random.RandomState(0)
  qpos = jnp.asarray(np.array(d0.qpos)[None] + 0.05 * rng.randn(n, m.nq))
  batched = jax.vmap(lambda q: d0.replace(qpos=q))(qpos)

  ref = jax.jit(jax.vmap(mi.step, in_axes=(None, 0)))(m, batched)

  batched_sharded = sharding.shard_batch(mesh, batched)
  step = sharding.sharded_step_fn(m, mesh, mi.step)
  out, diag = step(batched_sharded)

  np.testing.assert_allclose(out.qpos, ref.qpos, atol=1e-12)
  np.testing.assert_allclose(
      float(diag), float(jnp.mean(jnp.abs(ref.qacc))), atol=1e-12
  )


def test_weak_scaling_shapes():
  m = mi.load_model(ACTUATED)
  mesh = sharding.make_mesh(jax.devices()[:4])
  batch = sharding.weak_scaling_batch(m, mi.make_data, 3, mesh)
  assert batch.qpos.shape == (12, m.nq)
