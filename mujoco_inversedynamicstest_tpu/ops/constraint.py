"""Constraint assembly: static-shape efc row construction.

Analog of ``mj_makeConstraint`` (reference
``src/engine/engine_core_constraint.c:2005``).  TPU-first: row counts are
fixed at trace time from the model (equality rows, friction dofs, joint
limits, contact budget); inactive rows are masked, not absent — the
reference's dynamic arena allocation has no analog here.

This module currently implements the smooth-model fast path (zero rows).
Equality/limit/friction/contact rows land with the constraint milestone.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import (
    Data,
    DisableBit,
    Model,
)


def count_rows(m: Model) -> dict:
  """Static constraint-row budget for a model (trace-time)."""
  flags = m.opt.disableflags
  ne = nf = nl = 0
  if not (flags & DisableBit.CONSTRAINT):
    if not (flags & DisableBit.EQUALITY):
      widths = {0: 3, 1: 6, 2: 1, 3: 1, 7: 1}  # EqType -> rows
      ne = int(sum(widths.get(int(t), 0) for t in m.eq_type))
    if not (flags & DisableBit.FRICTIONLOSS):
      nf = int(np.sum(m.dof_frictionloss_nz))
    if not (flags & DisableBit.LIMIT):
      nl = int(np.sum(m.jnt_limited))
  return dict(ne=ne, nf=nf, nl=nl)


def _has_collidable_pairs(m: Model) -> bool:
  if m.opt.disableflags & DisableBit.CONTACT:
    return False
  n = m.ngeom
  for g1 in range(n):
    for g2 in range(g1, n):
      b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
      if b1 == b2:
        continue
      # parent-child filtering (world does not count as a parent,
      # cf. reference engine_collision_driver.c filterBodyPair)
      parent_child = (m.body_parentid[b2] == b1 and b1 != 0) or (
          m.body_parentid[b1] == b2 and b2 != 0
      )
      if parent_child and not (
          m.opt.disableflags & DisableBit.FILTERPARENT
      ):
        continue
      t1 = m.geom_contype[g1] & m.geom_conaffinity[g2]
      t2 = m.geom_contype[g2] & m.geom_conaffinity[g1]
      if t1 or t2:
        return True
  return bool(len(m.pair_geom1))


def collision_stage(m: Model, d: Data) -> Data:
  """Collision detection (analog of ``mj_collision``, reference
  ``src/engine/engine_collision_driver.c:265``)."""
  if _has_collidable_pairs(m):
    raise NotImplementedError(
        "contact collision: pending collision milestone; disable contacts "
        "or set contype/conaffinity to 0"
    )
  return d


def make_constraint(m: Model, d: Data) -> Data:
  """Instantiates constraint rows (smooth fast path: zero rows)."""
  counts = count_rows(m)
  if counts["ne"] or counts["nf"] or counts["nl"]:
    raise NotImplementedError(
        "equality/friction/limit rows: pending constraint milestone"
    )
  return d


def reference_constraint(m: Model, d: Data) -> Data:
  """Constraint reference accelerations aref (ref
  ``mj_referenceConstraint``, engine_core_constraint.c:2362)."""
  if d.nefc == 0:
    return d
  raise NotImplementedError("pending constraint milestone")


def constraint_update(m: Model, d: Data, jar):
  """State-dependent constraint force update (ref ``mj_constraintUpdate``,
  engine_core_constraint.c:2556)."""
  if d.nefc == 0:
    return d.replace(qfrc_constraint=jnp.zeros_like(d.qfrc_constraint))
  raise NotImplementedError("pending constraint milestone")
