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

  def sensor(self, m, d, sensor_id):
    """Returns the (sensor_dim,) reading for a PLUGIN sensor (the
    mjPLUGIN_SENSOR compute hook, dispatched at the sensor's declared
    needstage).  put_model refuses plugin sensors whose port leaves this
    base implementation in place."""
    return None


def register_plugin(name: str, factory: Callable) -> None:
  """Registers ``factory(mjm, instance_id, dtype) -> PluginInstance``."""
  _REGISTRY[name] = factory


def registered_plugins() -> Tuple[str, ...]:
  return tuple(sorted(_REGISTRY))


class _MjpPluginHead(ctypes.Structure):
  """Leading members of ``mjpPlugin`` (mjplugin.h:77-81) — enough to read
  the name and the declared attribute-name table."""

  _fields_ = [
      ("name", ctypes.c_char_p),
      ("nattribute", ctypes.c_int),
      ("attributes", ctypes.POINTER(ctypes.c_char_p)),
  ]


_plugin_at_slot_fn = None


def _plugin_at_slot(slot: int) -> Optional[_MjpPluginHead]:
  global _plugin_at_slot_fn
  if _plugin_at_slot_fn is None:
    import mujoco

    libs = glob.glob(
        os.path.join(os.path.dirname(mujoco.__file__), "libmujoco.so*"))
    lib = ctypes.CDLL(libs[0])
    fn = lib.mjp_getPluginAtSlot
    fn.restype = ctypes.POINTER(_MjpPluginHead)
    fn.argtypes = [ctypes.c_int]
    _plugin_at_slot_fn = fn
  p = _plugin_at_slot_fn(int(slot))
  return p.contents if p else None


def plugin_name_at_slot(slot: int) -> Optional[str]:
  """Resolves a compiled model's plugin slot id to its registered name.

  The Python bindings do not expose ``mjp_getPluginAtSlot``; we call it
  through ctypes against the ``mjpPlugin`` struct head (mjplugin.h:77).
  """
  head = _plugin_at_slot(slot)
  if head is None or not head.name:
    return None
  return head.name.decode()


def plugin_attr_names(slot: int) -> Tuple[str, ...]:
  """Declared config-attribute names of a plugin, in declaration order."""
  head = _plugin_at_slot(slot)
  if head is None:
    return ()
  return tuple(
      head.attributes[i].decode() for i in range(int(head.nattribute)))


def plugin_attrs(mjm, instance: int, keys: Tuple[str, ...]) -> Dict[str, str]:
  """Reads an instance's config attributes (``mj_getPluginConfig`` analog).

  Values are stored as consecutive NUL-terminated strings starting at
  ``plugin_attradr[instance]`` in declaration order (engine_plugin.cc).
  The order is read from the plugin's own declared attribute table
  (mjpPlugin.attributes) rather than assumed from ``keys``, so a plugin
  version that reorders or adds attributes cannot silently misassign
  values (advisor r3).
  """
  adr = int(mjm.plugin_attradr[instance])
  end = (int(mjm.plugin_attradr[instance + 1])
         if instance + 1 < mjm.nplugin else mjm.npluginattr)
  blob = bytes(mjm.plugin_attr[adr:end])
  vals = blob.split(b"\0")
  declared = plugin_attr_names(int(mjm.plugin[instance]))
  if declared:
    by_name = {n: (vals[i].decode() if i < len(vals) else "")
               for i, n in enumerate(declared)}
    unknown = [k for k in keys if k not in by_name]
    if unknown:
      raise NotImplementedError(
          f"plugin attribute(s) {unknown} not declared by the plugin "
          f"(declared: {declared}); the port is out of date")
    return {k: by_name[k] for k in keys}
  # no declared table (shouldn't happen for registered plugins): positional
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
