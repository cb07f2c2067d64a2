"""Checkpoint / resume for (Model, Data fleet, MPC carry) pytrees.

The reference has three persistence mechanisms (SURVEY §5): state vectors
``mj_getState``/``mj_setState`` (reference ``engine_support.c:176/208``),
compiled keyframes (``engine_support.c:240``), and binary model
serialization ``mj_saveModel``/``mj_loadModel`` (.mjb, reference
``engine_io.c:720/776``).  This module is their fleet-scale analog: one
checkpoint directory holds

* ``model.mjb`` — the compiled host model, serialized with the reference's
  own binary format (so a checkpoint is self-contained: no MJCF paths or
  assets needed at restore time);
* ``model.json`` — framework-level model metadata (dtype, impl flags);
* ``state.npz`` — every array leaf of an arbitrary state pytree (a
  ``Data`` batch, an ``MPCCarry``, a dict of both, SQP state, ...), keyed
  by its pytree path, saved verbatim — restore is bit-exact.

The state pytree's *structure* is not serialized; restore rebuilds it from
a template (exactly like orbax's ``restore_args``): construct the carry
the same way the run did, then ``restore`` fills in the saved leaves.
This keeps the format dumb, portable, and independent of host-side static
metadata (which lives in the model files).

Usage::

    ckpt.save("/ckpt/step100", m, {"carry": carry, "key": key})
    m2 = ckpt.load_model("/ckpt/step100")
    tmpl = {"carry": make_carry(m2, ...), "key": jnp.zeros_like(key)}
    state = ckpt.restore("/ckpt/step100", tmpl)   # bit-exact resume
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import Model

_MODEL_FILE = "model.mjb"
_META_FILE = "model.json"
_STATE_FILE = "state.npz"


def _leaf_key(path) -> str:
  """Stable string key for a pytree path (attr/index/dict entries)."""
  parts = []
  for p in path:
    if hasattr(p, "name"):
      parts.append(str(p.name))
    elif hasattr(p, "key"):
      parts.append(str(p.key))
    elif hasattr(p, "idx"):
      parts.append(str(p.idx))
    else:
      parts.append(str(p))
  return "/".join(parts) or "."


def save(path: str, m: Model, state: Any) -> None:
  """Writes a checkpoint directory: model.mjb + model.json + state.npz.

  ``state`` is any pytree of arrays (Data batch, MPCCarry, nested dicts).
  Sharded arrays are gathered to host; saving is synchronous.
  """
  import mujoco

  from mujoco_inversedynamicstest_tpu.models import interop

  os.makedirs(path, exist_ok=True)

  src = interop._source(m)
  mujoco.mj_saveModel(src, os.path.join(path, _MODEL_FILE), None)

  with open(os.path.join(path, _META_FILE), "w") as f:
    json.dump({
        "dtype": np.dtype(m.dtype).name,
        "format": 1,
    }, f)

  leaves = jax.tree_util.tree_flatten_with_path(state)[0]
  arrays = {}
  for p, leaf in leaves:
    key = _leaf_key(p)
    if key in arrays:
      raise ValueError(f"duplicate state leaf key {key!r}")
    arrays[key] = np.asarray(jax.device_get(leaf))
  np.savez(os.path.join(path, _STATE_FILE), **arrays)


def load_model(path: str, dtype=None) -> Model:
  """Rebuilds the compiled Model from a checkpoint's model.mjb."""
  import mujoco

  from mujoco_inversedynamicstest_tpu.models.io import put_model

  with open(os.path.join(path, _META_FILE)) as f:
    meta = json.load(f)
  if dtype is None:
    dtype = jnp.dtype(meta["dtype"])
  mjm = mujoco.MjModel.from_binary_path(os.path.join(path, _MODEL_FILE))
  return put_model(mjm, dtype=dtype)


def restore(path: str, template: Any, strict: bool = True) -> Any:
  """Fills ``template``'s array leaves with the checkpointed values.

  The template supplies structure and sharding: each restored leaf is
  ``device_put`` with the template leaf's sharding when it has one, so a
  fleet checkpoint restores directly onto a mesh.  With ``strict`` every
  template leaf must exist in the checkpoint with a matching shape.
  """
  with np.load(os.path.join(path, _STATE_FILE)) as z:
    saved = {k: z[k] for k in z.files}

  leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
  out = []
  for p, leaf in leaves:
    key = _leaf_key(p)
    if key not in saved:
      if strict:
        raise KeyError(f"checkpoint missing state leaf {key!r}")
      out.append(leaf)
      continue
    val = saved[key]
    if strict and tuple(val.shape) != tuple(np.shape(leaf)):
      raise ValueError(
          f"checkpoint leaf {key!r} shape {val.shape} != template "
          f"{np.shape(leaf)}")
    if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
      out.append(jax.device_put(val.astype(leaf.dtype), leaf.sharding))
    else:
      out.append(jnp.asarray(val, dtype=np.asarray(leaf).dtype))
  return jax.tree_util.tree_unflatten(treedef, out)
