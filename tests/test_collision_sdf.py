"""Cylinder/ellipsoid SDF narrowphase tests.

The reference collides these pairs with libccd MPR
(``engine_collision_convex.c``), which is itself approximate — so tests
check geometric ground truth (analytically known depths/normals) and
C agreement where the C answer is reliable, rather than bitwise parity.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _ours(xml):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  ct = out.contact
  dist = np.asarray(ct.dist)
  act = dist < np.asarray(ct.includemargin) + 1e-12
  rows = [(float(dist[i]), np.asarray(ct.pos[i]), np.asarray(ct.frame[i, 0]))
          for i in np.nonzero(act)[0]]
  return mjm, mjd, rows


def test_sphere_cylinder_side():
  mjm, mjd, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="0.17 0 0.1"><freejoint/>
      <geom type="cylinder" size="0.08 0.1"/></body>
  </worldbody></mujoco>""")
  assert len(rows) == 1
  d, p, n = rows[0]
  assert abs(d - (-0.01)) < 1e-9
  np.testing.assert_allclose(n, [1, 0, 0], atol=1e-9)
  np.testing.assert_allclose(p, [0.095, 0, 0.1], atol=1e-9)


def test_sphere_cylinder_cap():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.3"><freejoint/><geom type="sphere" size="0.11"/></body>
    <body pos="0 0 0.1"><freejoint/>
      <geom type="cylinder" size="0.2 0.1"/></body>
  </worldbody></mujoco>""")
  assert len(rows) == 1
  d, p, n = rows[0]
  assert abs(d - (-0.01)) < 1e-9
  np.testing.assert_allclose(n, [0, 0, -1], atol=1e-9)


def test_plane_ellipsoid():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <geom type="plane" size="1 1 .1"/>
    <body pos="0 0 0.045" euler="20 0 0"><freejoint/>
      <geom type="ellipsoid" size="0.1 0.07 0.05"/></body>
  </worldbody></mujoco>""")
  assert len(rows) == 1
  d, p, n = rows[0]
  # support depth of the tilted ellipsoid below its center
  expected = 0.045 - np.sqrt((0.07 * np.sin(np.radians(20))) ** 2
                             + (0.05 * np.cos(np.radians(20))) ** 2)
  assert abs(d - expected) < 1e-9
  np.testing.assert_allclose(n, [0, 0, 1], atol=1e-12)


def test_ellipsoid_ellipsoid_axis():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/>
      <geom type="ellipsoid" size="0.1 0.08 0.06"/></body>
    <body pos="0.15 0 0.1"><freejoint/>
      <geom type="ellipsoid" size="0.07 0.07 0.09"/></body>
  </worldbody></mujoco>""")
  assert len(rows) == 1
  d, p, n = rows[0]
  assert abs(d - (-0.02)) < 1e-4
  np.testing.assert_allclose(n, [1, 0, 0], atol=1e-3)


def test_capsule_cylinder_crossed():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.1" euler="0 90 0"><freejoint/>
      <geom type="capsule" size="0.05 0.12"/></body>
    <body pos="0 0 0.23" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.09 0.05"/></body>
  </worldbody></mujoco>""")
  best = min(rows, key=lambda r: r[0])
  assert abs(best[0] - (-0.01)) < 1e-6
  np.testing.assert_allclose(best[2], [0, 0, 1], atol=1e-6)


def test_cylinder_cylinder_parallel():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.12" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.1 0.05"/></body>
    <body pos="0 0 0.30" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.1 0.06"/></body>
  </worldbody></mujoco>""")
  assert len(rows) >= 1
  for d, p, n in rows:
    assert abs(d - (-0.02)) < 1e-6
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-6)


def test_slider_crank_reference_steps():
  """The reference slider_crank model (cylinder-cylinder contacts) loads,
  matches C forward, and simulates stably."""
  import os
  path = "/root/reference/model/slider_crank/slider_crank.xml"
  if not os.path.exists(path):
    pytest.skip("reference model not mounted")
  mjm = mujoco.MjModel.from_xml_path(path)
  mjd = mujoco.MjData(mjm)
  mjd.ctrl[:] = 0.5
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-8)

  @jax.jit
  def run(d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=100)
    return d

  dT = run(d)
  assert np.all(np.isfinite(np.asarray(dT.qpos)))


def test_cylinder_box_lying():
  """Cylinder lying on a box top face (beyond the MJX capability table)."""
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/>
      <geom type="box" size="0.2 0.2 0.1" mass="1"/></body>
    <body pos="0 0 0.245" euler="90 0 0"><freejoint/>
      <geom type="cylinder" size="0.05 0.12" mass="0.2"/></body>
  </worldbody></mujoco>""")
  assert len(rows) >= 1
  # canonical geom order puts the cylinder (type 5) first, so the contact
  # normal (geom1 -> geom2) points down into the box
  # flat-on-flat SDF descent converges to ~1e-5 of the true depth
  for d, p, n in rows:
    assert abs(d - (-0.005)) < 1e-4
    np.testing.assert_allclose(n, [0, 0, -1], atol=1e-3)


def test_ellipsoid_box():
  _, _, rows = _ours("""
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/>
      <geom type="box" size="0.2 0.2 0.1" mass="1"/></body>
    <body pos="0 0 0.24"><freejoint/>
      <geom type="ellipsoid" size="0.08 0.06 0.05" mass="0.2"/></body>
  </worldbody></mujoco>""")
  assert len(rows) == 1
  d, p, n = rows[0]
  assert abs(d - (-0.01)) < 1e-5
  np.testing.assert_allclose(n, [0, 0, -1], atol=1e-4)
