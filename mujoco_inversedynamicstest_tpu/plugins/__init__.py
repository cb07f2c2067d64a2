"""Engine plugin analogs: Python-callable hooks inside the jitted step.

The reference extends the engine through the ``mjpPlugin`` C ABI
(reference ``include/mujoco/mjplugin.h:77-135``: capability flags +
``nstate``/``init``/``compute``/``advance`` callbacks, registry in
``src/engine/engine_plugin.cc``).  Here the same extension point is a
Python registry of *pure-function* hooks: a plugin instance contributes
jax-traceable terms (passive forces today; actuator/sensor hooks share
the registry) that compile into the step like any built-in stage.

First-party ports live beside the registry (``cable.py`` — the
discrete-elastic-rod cable from ``plugin/elasticity/cable.cc``).
"""

from mujoco_inversedynamicstest_tpu.plugins.registry import (
    PluginInstance,
    build_instances,
    plugin_attrs,
    plugin_name_at_slot,
    register_plugin,
    registered_plugins,
)
from mujoco_inversedynamicstest_tpu.plugins import cable  # registers itself
from mujoco_inversedynamicstest_tpu.plugins import pid  # registers itself
from mujoco_inversedynamicstest_tpu.plugins import sdf  # registers itself
from mujoco_inversedynamicstest_tpu.plugins import sdflib  # registers itself
from mujoco_inversedynamicstest_tpu.plugins import shell  # registers itself
from mujoco_inversedynamicstest_tpu.plugins import touch_grid  # registers itself
