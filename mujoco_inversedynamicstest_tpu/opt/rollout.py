"""Batched open-loop rollout — the MPC inner loop.

Analog of the reference's threaded batch rollout
(``python/mujoco/rollout.py:261`` module fn / ``rollout.cc:240``): the
reference dispatches nbatch trajectories to a persistent C++ thread pool,
one ``mjData`` per thread.  TPU-native, a rollout batch is ``vmap`` over
initial states/controls and ``lax.scan`` over time — one XLA computation,
no host round-trips, sharding over a device mesh via
``parallel.sharding``.

Semantics mirrored from the reference:
* initial state is an ``mjSTATE_FULLPHYSICS`` vector per batch element;
* per-step inputs are selected by a ``control_spec`` of mjSTATE user
  flags (CTRL / QFRC_APPLIED / XFRC_APPLIED / ...);
* outputs are the per-step FULLPHYSICS state and sensordata.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    Model,
    StateFlag,
)
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import support


class RolloutResult(NamedTuple):
  state: jax.Array       # (nbatch, nstep, nfullphysics)
  sensordata: jax.Array  # (nbatch, nstep, nsensordata)


def _rollout_one(m: Model, d_template: Data, initial_state: jax.Array,
                 control: Optional[jax.Array], control_spec: int,
                 nstep: int, ctrl_fn=None) -> RolloutResult:
  d0 = support.set_state(
      m, d_template, initial_state, StateFlag.FULLPHYSICS
  )

  def body(d, ctrl_t):
    if ctrl_t is not None:
      d = support.set_state(m, d, ctrl_t, control_spec)
    d = forward_mod.step(m, d, ctrl_fn=ctrl_fn)
    out = support.get_state(m, d, StateFlag.FULLPHYSICS)
    return d, (out, d.sensordata)

  xs = control if control is not None else None
  _, (states, sensors) = jax.lax.scan(body, d0, xs, length=nstep)
  return RolloutResult(state=states, sensordata=sensors)


def rollout(m: Model, d_template: Data, initial_state: jax.Array,
            control: Optional[jax.Array] = None,
            control_spec: int = StateFlag.CTRL,
            nstep: Optional[int] = None,
            ctrl_fn=None) -> RolloutResult:
  """Batched rollout (analog of ``rollout.rollout``), open or closed loop.

  Args:
    m: model.
    d_template: a ``make_data``-style Data providing workspace shapes.
    initial_state: (nbatch, nfullphysics) mjSTATE_FULLPHYSICS vectors.
    control: optional (nbatch, nstep, ncontrol) per-step inputs, where
      ncontrol = ``support.state_size(m, control_spec)``; if None, the
      template's inputs are held for ``nstep`` steps.
    control_spec: which input fields ``control`` writes each step.
    nstep: horizon; required if ``control`` is None.
    ctrl_fn: optional traceable feedback policy ``(m, d) -> (nu,) ctrl``
      fired inside each step at the ``mjcb_control`` point (reference
      ``engine_forward.c:1108``) — closed-loop rollouts run entirely
      on-device inside the ``lax.scan``, no host splice per step.

  Returns (state, sensordata) stacked over (nbatch, nstep).  Jittable;
  to shard over devices wrap with ``parallel.sharding.shard_batch``.
  """
  if control is None and nstep is None:
    raise ValueError("must pass control or nstep")
  if nstep is None:
    nstep = control.shape[1]

  if control is None:
    fn = jax.vmap(
        lambda s: _rollout_one(m, d_template, s, None, control_spec, nstep,
                               ctrl_fn)
    )
    return fn(initial_state)
  fn = jax.vmap(
      lambda s, c: _rollout_one(m, d_template, s, c, control_spec, nstep,
                                ctrl_fn)
  )
  return fn(initial_state, control)
