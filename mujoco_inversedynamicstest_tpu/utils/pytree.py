"""Pytree dataclass machinery for the TPU-native physics framework.

The framework's ``Model`` and ``Data`` containers are frozen dataclasses
registered as JAX pytrees.  Numeric simulation state (jax arrays) are pytree
*leaves* so they trace/vmap/shard; structural metadata (sizes, index tables,
tree levels) are *static* aux-data so they stay host-side numpy and can drive
trace-time specialization (the analog of the reference's compile-time model
layout, cf. reference ``include/mujoco/mjmodel.h:592-1158``).

Static numpy arrays are wrapped so the aux-data is hashable, which JAX
requires for jit cache keys.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax
import numpy as np

_T = TypeVar("_T")


class _StaticWrapper:
  """Hashable wrapper for static (non-leaf) field values.

  Equality/hash are content-based for numpy arrays so models that compile to
  identical layouts share jit caches.
  """

  __slots__ = ("value", "_hash")

  def __init__(self, value: Any):
    object.__setattr__(self, "value", value)
    object.__setattr__(self, "_hash", self._compute_hash(value))

  @staticmethod
  def _compute_hash(value: Any) -> int:
    if isinstance(value, np.ndarray):
      return hash((value.shape, str(value.dtype), value.tobytes()))
    if isinstance(value, (list, tuple)):
      return hash(tuple(_StaticWrapper._compute_hash(v) for v in value))
    if isinstance(value, dict):
      return hash(
          tuple(sorted((k, _StaticWrapper._compute_hash(v))
                       for k, v in value.items()))
      )
    try:
      return hash(value)
    except TypeError:
      return hash(id(value))

  def __hash__(self) -> int:
    return self._hash

  def __eq__(self, other: Any) -> bool:
    if not isinstance(other, _StaticWrapper):
      return NotImplemented
    return _static_eq(self.value, other.value)

  def __repr__(self) -> str:
    return f"Static({self.value!r})"


def _static_eq(a: Any, b: Any) -> bool:
  if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
    if not isinstance(a, np.ndarray) or not isinstance(b, np.ndarray):
      return False
    return a.shape == b.shape and a.dtype == b.dtype and bool(
        np.all(a == b))
  if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
    return len(a) == len(b) and all(_static_eq(x, y) for x, y in zip(a, b))
  if isinstance(a, dict) and isinstance(b, dict):
    return a.keys() == b.keys() and all(_static_eq(a[k], b[k]) for k in a)
  try:
    return bool(a == b)
  except Exception:  # pylint: disable=broad-except
    return a is b


def static_field(**kwargs):
  """Declares a dataclass field as static pytree aux-data."""
  metadata = kwargs.pop("metadata", {})
  metadata = dict(metadata, pytree_static=True)
  return dataclasses.field(metadata=metadata, **kwargs)


def pytree(cls: type[_T]) -> type[_T]:
  """Class decorator: frozen dataclass registered as a JAX pytree.

  Fields default to pytree leaves; fields declared via :func:`static_field`
  become hashable aux-data.
  """
  cls = dataclasses.dataclass(frozen=True)(cls)

  leaf_names = []
  static_names = []
  for f in dataclasses.fields(cls):
    if f.metadata.get("pytree_static", False):
      static_names.append(f.name)
    else:
      leaf_names.append(f.name)
  leaf_names = tuple(leaf_names)
  static_names = tuple(static_names)

  def flatten(obj):
    leaves = tuple(getattr(obj, n) for n in leaf_names)
    aux = tuple(_StaticWrapper(getattr(obj, n)) for n in static_names)
    return leaves, aux

  def flatten_with_keys(obj):
    leaves = tuple(
        (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names
    )
    aux = tuple(_StaticWrapper(getattr(obj, n)) for n in static_names)
    return leaves, aux

  def unflatten(aux, leaves):
    kwargs = dict(zip(leaf_names, leaves))
    kwargs.update({n: w.value for n, w in zip(static_names, aux)})
    return cls(**kwargs)

  jax.tree_util.register_pytree_with_keys(
      cls, flatten_with_keys, unflatten, flatten
  )

  def replace(self: _T, **updates) -> _T:
    return dataclasses.replace(self, **updates)

  cls.replace = replace
  cls.__pytree_leaf_fields__ = leaf_names
  cls.__pytree_static_fields__ = static_names
  return cls
