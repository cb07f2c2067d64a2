"""Plugin registry: named factories -> per-instance traceable hooks.

Analog of the reference's global plugin table (``mjp_registerPlugin`` /
``mjp_getPluginAtSlot``, reference ``src/engine/engine_plugin.cc``).  A
plugin is registered under its MJCF extension name; ``put_model`` calls
``build_instances`` which resolves every ``<extension><plugin>`` instance
of the compiled model to a ``PluginInstance`` whose hook methods are
jax-traceable closures over static instance data.  Unknown plugin names
refuse loudly at load (the validate_model contract).

Hook surface (mirrors ``mjpPlugin`` capability flags, mjplugin.h:87-99):

* ``passive(m, d) -> qfrc (nv,)`` — added to ``qfrc_passive`` inside
  ``fwd_velocity`` (the mjPLUGIN_PASSIVE compute point,
  ref ``engine_passive.c`` plugin dispatch).

Actuator/sensor hooks follow the same pattern when a plugin needs them.
"""

from __future__ import annotations

import ctypes
import glob
import os
from typing import Callable, Dict, Optional, Tuple

_REGISTRY: Dict[str, Callable] = {}


class PluginInstance:
  """Base class for built plugin instances.

  Subclasses override the hooks they implement; hooks must be pure
  functions of (Model, Data) + the instance's static data (self).
  """

  name: str = ""

  def passive(self, m, d):
    """Returns a (nv,) generalized-force contribution, or None."""
    return None

  def act_dot(self, m, d, ctrl, act_dot):
    """Returns the updated (na,) act_dot (plugin slots overridden), or
    None (the mjPLUGIN_ACTUATOR actdot callback analog)."""
    return None

  def actuator_force(self, m, d, ctrl, force):
    """Returns the updated (nu,) actuator force vector, or None."""
    return None


def register_plugin(name: str, factory: Callable) -> None:
  """Registers ``factory(mjm, instance_id, dtype) -> PluginInstance``."""
  _REGISTRY[name] = factory


def registered_plugins() -> Tuple[str, ...]:
  return tuple(sorted(_REGISTRY))


_plugin_name_fn = None


def plugin_name_at_slot(slot: int) -> Optional[str]:
  """Resolves a compiled model's plugin slot id to its registered name.

  The Python bindings do not expose ``mjp_getPluginAtSlot``; we call it
  through ctypes (the first ``mjpPlugin`` member is the name pointer,
  mjplugin.h:79).
  """
  global _plugin_name_fn
  if _plugin_name_fn is None:
    import mujoco

    libs = glob.glob(
        os.path.join(os.path.dirname(mujoco.__file__), "libmujoco.so*"))
    lib = ctypes.CDLL(libs[0])
    fn = lib.mjp_getPluginAtSlot
    fn.restype = ctypes.c_void_p
    fn.argtypes = [ctypes.c_int]
    _plugin_name_fn = fn
  p = _plugin_name_fn(int(slot))
  if not p:
    return None
  name_ptr = ctypes.cast(p, ctypes.POINTER(ctypes.c_void_p))[0]
  raw = ctypes.cast(name_ptr, ctypes.c_char_p).value
  return raw.decode() if raw else None


def plugin_attrs(mjm, instance: int, keys: Tuple[str, ...]) -> Dict[str, str]:
  """Reads an instance's config attributes (``mj_getPluginConfig`` analog).

  Values are stored as consecutive NUL-terminated strings starting at
  ``plugin_attradr[instance]`` in declaration order (engine_plugin.cc).
  """
  adr = int(mjm.plugin_attradr[instance])
  end = (int(mjm.plugin_attradr[instance + 1])
         if instance + 1 < mjm.nplugin else mjm.npluginattr)
  blob = bytes(mjm.plugin_attr[adr:end])
  vals = blob.split(b"\0")
  return {k: (vals[i].decode() if i < len(vals) else "")
          for i, k in enumerate(keys)}


def build_instances(mjm, dtype) -> Tuple[PluginInstance, ...]:
  """Resolves every plugin instance of a compiled model (or raises)."""
  out = []
  for i in range(int(getattr(mjm, "nplugin", 0))):
    name = plugin_name_at_slot(int(mjm.plugin[i]))
    if name not in _REGISTRY:
      raise NotImplementedError(
          f"unsupported by the TPU engine: plugin '{name}' (registered: "
          f"{', '.join(registered_plugins()) or 'none'})")
    inst = _REGISTRY[name](mjm, i, dtype)
    inst.name = name
    out.append(inst)
  return tuple(out)
