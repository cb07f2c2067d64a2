"""Constraint solvers (CG / Newton) — analog of ``src/engine/engine_solver.c``.

This module currently implements the smooth fast path (no constraint rows:
``qacc = qacc_smooth``, ref ``mj_fwdConstraint`` early-exit at
``engine_forward.c:654``).  The CG/Newton solvers with ``lax.while_loop``
and exact quartic line search land with the constraint milestone.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import Data, Model


def fwd_constraint(m: Model, d: Data) -> Data:
  """Constraint forces and final qacc (ref ``mj_fwdConstraint``:654)."""
  if d.nefc == 0:
    return d.replace(
        qacc=d.qacc_smooth,
        qfrc_constraint=jnp.zeros_like(d.qfrc_constraint),
        qacc_warmstart=d.qacc_smooth,
    )
  raise NotImplementedError("pending solver milestone")
