"""Benchmark: batched simulation throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline reference: MJX humanoid on 8-chip TPU v5e reaches 2.7M steps/s at
batch 16384 (reference ``doc/mjx.rst:341-350``) => 337.5K steps/s/chip.
Round-1 model is the contact-free flagship (collision lands next round);
vs_baseline is computed against the per-chip humanoid number regardless so
the trend across rounds is monotone-comparable.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC_PER_CHIP = 2_700_000 / 8

BATCH = 8192
NSTEP = 200


def main():
  import mujoco_inversedynamicstest_tpu as mi
  from __graft_entry__ import _FLAGSHIP_XML

  m = mi.load_model(_FLAGSHIP_XML, dtype=jnp.float32)
  d0 = mi.make_data(m)

  rng = np.random.RandomState(0)
  qpos = jnp.asarray(
      np.array(d0.qpos)[None] + 0.05 * rng.randn(BATCH, m.nq),
      dtype=jnp.float32,
  )
  ctrl = jnp.asarray(0.2 * rng.randn(BATCH, m.nu), dtype=jnp.float32)
  batch = jax.vmap(lambda q, c: d0.replace(qpos=q, ctrl=c))(qpos, ctrl)

  vstep = jax.vmap(mi.step, in_axes=(None, 0))

  @jax.jit
  def rollout(ds):
    def body(ds, _):
      return vstep(m, ds), ()
    ds, _ = jax.lax.scan(body, ds, None, length=NSTEP)
    return ds

  # compile + warmup
  out = rollout(batch)
  out.qpos.block_until_ready()

  t0 = time.perf_counter()
  out = rollout(batch)
  out.qpos.block_until_ready()
  dt = time.perf_counter() - t0

  steps_per_sec = BATCH * NSTEP / dt
  print(json.dumps({
      "metric": "batched_step_throughput_flagship_nv6",
      "value": round(steps_per_sec, 1),
      "unit": "steps/s/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
  }))


if __name__ == "__main__":
  main()
