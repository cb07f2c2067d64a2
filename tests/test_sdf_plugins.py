"""SDF plugin geom tests: analytic distance parity vs the C plugins and
collision behavior of mjGEOM_SDF geoms.

The pip ``mujoco`` wheel ships the first-party SDF plugins
(``plugin/sdf/*.cc``), so their ``sdf_staticdistance`` entry points are
callable via ctypes — the distance-function ports are checked pointwise
against the exact C implementations.  Collision behavior (the
``mjc_SDF`` analog, ``ops/collision_sdf.py:make_plugin_narrowphase``)
is checked by settling tests against the C engine.
"""

import ctypes
import glob
import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.plugins import registry as preg
from mujoco_inversedynamicstest_tpu.plugins import sdf as sdf_mod


_FN = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double))


class _MjpPluginFns(ctypes.Structure):
  """mjpPlugin layout far enough to reach sdf_staticdistance
  (pip mujoco include/mujoco/mjplugin.h struct mjpPlugin_)."""

  _fields_ = [
      ("name", ctypes.c_char_p),
      ("nattribute", ctypes.c_int),
      ("attributes", ctypes.POINTER(ctypes.c_char_p)),
      ("capabilityflags", ctypes.c_int),
      ("needstage", ctypes.c_int),
  ] + [(f"fn{i}", ctypes.c_void_p) for i in range(10)] + [
      ("sdf_distance", ctypes.c_void_p),
      ("sdf_gradient", ctypes.c_void_p),
      ("sdf_staticdistance", _FN),
      ("sdf_attribute", ctypes.c_void_p),
      ("sdf_aabb", ctypes.c_void_p),
  ]


def _c_staticdistance(plugin_name):
  libs = glob.glob(
      os.path.join(os.path.dirname(mujoco.__file__), "libmujoco.so*"))
  lib = ctypes.CDLL(libs[0])
  lib.mjp_pluginCount.restype = ctypes.c_int
  lib.mjp_getPluginAtSlot.restype = ctypes.POINTER(_MjpPluginFns)
  lib.mjp_getPluginAtSlot.argtypes = [ctypes.c_int]
  for i in range(lib.mjp_pluginCount()):
    head = lib.mjp_getPluginAtSlot(i).contents
    if head.name and head.name.decode() == plugin_name:
      return head.sdf_staticdistance
  return None


class _FakeModel:
  """Minimal host-model stub feeding plugin_attrs-free construction."""


def _make_instance(cls, attr):
  inst = cls.__new__(cls)
  inst.attr = np.asarray(attr, np.float64)
  return inst


@pytest.mark.parametrize("name,cls,attr", [
    ("mujoco.sdf.torus", sdf_mod.TorusInstance, (0.35, 0.15)),
    ("mujoco.sdf.torus", sdf_mod.TorusInstance, (0.5, 0.05)),
    ("mujoco.sdf.bowl", sdf_mod.BowlInstance, (0.4, 1.0, 0.02)),
    ("mujoco.sdf.bowl", sdf_mod.BowlInstance, (0.2, 0.6, 0.05)),
    ("mujoco.sdf.bolt", sdf_mod.BoltInstance, (0.26,)),
    ("mujoco.sdf.nut", sdf_mod.NutInstance, (0.26,)),
    ("mujoco.sdf.gear", sdf_mod.GearInstance, (0.0, 2.8, 25.0, 0.2, -1.0)),
    ("mujoco.sdf.gear", sdf_mod.GearInstance, (0.1, 1.6, 16.0, 0.3, 0.4)),
])
def test_sdf_distance_matches_c(name, cls, attr):
  """Pointwise parity of the jnp distance vs the C sdf_staticdistance."""
  cfn = _c_staticdistance(name)
  if cfn is None:
    pytest.skip(f"{name} not registered in the host engine")
  inst = _make_instance(cls, attr)
  c_attr = (ctypes.c_double * len(attr))(*attr)

  rng = np.random.RandomState(0)
  center, half = inst.aabb()
  pts = center + (2.0 * rng.rand(200, 3) - 1.0) * (half * 1.3 + 0.1)
  ours = np.asarray(jax.vmap(inst.sdf)(jnp.asarray(pts)))
  for p, o in zip(pts, ours):
    c_p = (ctypes.c_double * 3)(*p)
    ref = cfn(c_p, c_attr)
    # _norm2 carries a 1e-30 epsilon; the gear port linearizes nothing
    np.testing.assert_allclose(o, ref, atol=1e-9, err_msg=f"{name} at {p}")


def test_sdf_gradient_finite():
  """jax.grad of each port is finite on a dense sample (the collider
  descends on these gradients)."""
  for cls, attr in [
      (sdf_mod.TorusInstance, (0.35, 0.15)),
      (sdf_mod.BowlInstance, (0.4, 1.0, 0.02)),
      (sdf_mod.BoltInstance, (0.26,)),
      (sdf_mod.NutInstance, (0.26,)),
      (sdf_mod.GearInstance, (0.0, 2.8, 25.0, 0.2, -1.0)),
  ]:
    inst = _make_instance(cls, attr)
    rng = np.random.RandomState(1)
    center, half = inst.aabb()
    pts = center + (2.0 * rng.rand(100, 3) - 1.0) * (half + 0.05)
    g = np.asarray(jax.vmap(jax.grad(inst.sdf))(jnp.asarray(pts)))
    assert np.isfinite(g).all(), cls.__name__


def _torus_scene(extra=""):
  return f"""
  <mujoco>
    <extension>
      <plugin plugin="mujoco.sdf.torus">
        <instance name="torus">
          <config key="radius1" value="0.35"/>
          <config key="radius2" value="0.15"/>
        </instance>
      </plugin>
    </extension>
    <asset><mesh name="torus"><plugin instance="torus"/></mesh></asset>
    <option sdf_iterations="10" sdf_initpoints="40"/>
    <worldbody>
      <body pos="0 0 0.5" euler="90 0 0">
        <geom type="sdf" mesh="torus" name="t">
          <plugin instance="torus"/>
        </geom>
      </body>
      {extra}
    </worldbody>
  </mujoco>
  """


def test_sphere_on_torus_settles_like_c():
  """A sphere dropped on a torus settles at the C engine's height."""
  xml = _torus_scene("""
      <body pos="0 0 1.2">
        <freejoint/>
        <geom type="sphere" size="0.1" mass="0.3"/>
      </body>
  """)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(300):
    d = step(d)
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
  assert np.isfinite(np.asarray(d.qpos)).all()
  # same resting surface; the contact sets differ in depth convention
  # (the C SDF collider reports the intersection objective = roughly half
  # the penetration, see make_plugin_narrowphase doc) and in init seeds,
  # so equilibria agree to ~mm, not solver precision
  np.testing.assert_allclose(float(d.qpos[2]), mjd.qpos[2], atol=1e-2)


def test_sdf_sdf_pair_loads_and_runs():
  """SDF-SDF contact (torus dropped on torus) runs finite."""
  xml = _torus_scene("""
      <body pos="0 0.02 1.3" euler="90 0 0">
        <freejoint/>
        <geom type="sdf" mesh="torus" mass="0.4">
          <plugin instance="torus"/>
        </geom>
      </body>
  """)
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(200):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  # came to rest on (or threaded around) the fixed torus, not fallen through
  assert float(d.qpos[2]) > 0.4


def test_ball_in_bowl_settles_like_c():
  """Ball in a tilted bowl (the reference's bowl.xml configuration)."""
  xml = """
  <mujoco>
    <extension>
      <plugin plugin="mujoco.sdf.bowl">
        <instance name="bowl">
          <config key="height" value="0.4"/>
          <config key="radius" value="1.0"/>
          <config key="thickness" value="0.02"/>
        </instance>
      </plugin>
    </extension>
    <asset><mesh name="bowl"><plugin instance="bowl"/></mesh></asset>
    <option sdf_iterations="10" sdf_initpoints="40"/>
    <default><geom solref="0.01 1" solimp=".95 .99 .0001" condim="1"/></default>
    <worldbody>
      <body pos="0 0 1">
        <geom type="sdf" name="bowl" mesh="bowl">
          <plugin instance="bowl"/>
        </geom>
      </body>
      <body pos=".2 -.1 2.2">
        <freejoint/>
        <geom type="sphere" size=".15" mass="0.2"/>
      </body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(500):
    d = step(d)
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
  assert np.isfinite(np.asarray(d.qpos)).all()
  # both should be inside the bowl near its bottom
  assert abs(float(d.qpos[2]) - mjd.qpos[2]) < 0.05
