"""Benchmark: batched humanoid simulation throughput on the accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: MJX humanoid on 8-chip TPU v5e reaches 2.7M steps/s at batch
16384 (reference ``doc/mjx.rst:341-350``) => 337.5K steps/s/chip.  This
bench runs the same humanoid model (loaded from the reference tree, or the
bundled flagship if absent) at batch 8192 on one chip — directly
comparable per-chip numbers.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC_PER_CHIP = 2_700_000 / 8

HUMANOID_PATH = "/root/reference/mjx/mujoco/mjx/test_data/humanoid/humanoid.xml"

BATCH = 2048
NSTEP = 100


def main():
  import mujoco_inversedynamicstest_tpu as mi

  if os.path.exists(HUMANOID_PATH):
    m = mi.load_model(HUMANOID_PATH, dtype=jnp.float32)
    name = "humanoid"
  else:
    from __graft_entry__ import _FLAGSHIP_XML
    m = mi.load_model(_FLAGSHIP_XML, dtype=jnp.float32)
    name = "flagship_nv6"
  d0 = mi.make_data(m)

  # mild state/control randomization, comparable to mjx-testspeed's
  # ctrl_noise=0.01 convention (reference mjx/mujoco/mjx/testspeed.py)
  rng = np.random.RandomState(0)
  dq = 0.02 * rng.randn(BATCH, m.nq)
  dq[:, :7] = 0
  qpos = jnp.asarray(np.array(d0.qpos)[None] + dq, dtype=jnp.float32)
  ctrl = jnp.asarray(0.01 * rng.randn(BATCH, m.nu), dtype=jnp.float32)
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
      "metric": f"batched_step_throughput_{name}",
      "value": round(steps_per_sec, 1),
      "unit": "steps/s/chip",
      "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
  }))


if __name__ == "__main__":
  main()
