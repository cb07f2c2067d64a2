"""Flex element-level collision tests (ops/flexcol.py).

Differential targets: ``mj_collideGeomElem`` (sphere/capsule vs flex
elements, reference ``engine_collision_driver.c:412``) and
``mj_collideFlexInternal`` (evpairs + within-tet faces, ``:1726``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _sheet_xml(extra="", count="5 5 1", spacing="0.08 0.08 0.08",
               radius="0.008", internal=None, pin=True):
  internal_attr = "" if internal is None else f'internal="{internal}"'
  pins = ('<pin id="0"/><pin id="4"/><pin id="20"/><pin id="24"/>'
          if pin else "")
  return f"""
  <mujoco>
    <option timestep="0.001"/>
    <worldbody>
      <flexcomp type="grid" count="{count}" spacing="{spacing}"
                radius="{radius}" name="sheet" dim="2" mass="0.2">
        <contact selfcollide="none" {internal_attr}/>
        <edge equality="true"/>
        {pins}
      </flexcomp>
      {extra}
    </worldbody>
  </mujoco>
  """


def test_internal_true_loads():
  """A flex with internal contacts enabled loads unedited (the 3.3.1-era
  MJCF default; the 3.10 host compiler defaults it off)."""
  mjm = mujoco.MjModel.from_xml_string(_sheet_xml(internal="true"))
  assert bool(np.asarray(mjm.flex_internal)[0])
  m = mi.put_model(mjm)
  d = jax.jit(lambda dd: mi.step(m, dd))(mi.make_data(m))
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_sphere_on_sheet_contact_matches_c():
  """A sphere pressed into the *interior* of a triangle (where vertex
  spheres would miss) produces the C engine's contact and forces."""
  extra = """
      <body pos="0.04 0.01 0.1">
        <freejoint/>
        <geom type="sphere" size="0.015" mass="0.05"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)

  # drop the sphere until it contacts in C
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon > 0, "degenerate test: C reports no contact"

  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  active = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
  assert active.any(), "element narrowphase missed the C contact"
  scale = max(1.0, np.abs(mjd.qacc).max())
  err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
  assert err < 1e-6, f"qacc mismatch {err}"


def test_sphere_rollout_tracks_c():
  """Sphere dropped mid-sheet: short contact-rich rollout tracks C."""
  extra = """
      <body pos="0.04 0.0 0.05">
        <freejoint/>
        <geom type="sphere" size="0.02" mass="0.05"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(250):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  # same resting configuration to mm scale (narrowphase backends differ:
  # exact closest point here vs CCD in C)
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 2e-3, f"trajectory diverged: {err}"


def test_no_tunneling_through_triangle_interior():
  """Regression for the vertex-sphere gap: a small sphere dropped on a
  triangle center must NOT fall through the sheet."""
  extra = """
      <body pos="0.04 0.04 0.05">
        <freejoint/>
        <geom type="sphere" size="0.006" mass="0.01"/>
      </body>
  """
  # coarse sheet: vertex spheres of radius 8mm every 8cm leave huge gaps
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(400):
    d = step(d)
  zidx = mjm.jnt_qposadr[mjm.nflexvert and 0] + 2  # sphere free joint z
  # locate the sphere's z in qpos: first (only) free joint
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > -0.05, f"sphere tunneled through the sheet (z={z})"


def test_capsule_on_sheet_settles_like_c():
  """A capsule dropped on the sheet rests at the C engine's height.

  Unlike the sphere case (identical kernels -> exact parity), capsule
  contacts come from different manifolds (exact segment-triangle closest
  points here vs multi-point CCD in C), so the comparison is the resting
  configuration, not the transient trajectory."""
  extra = """
      <body pos="0.04 0.02 0.06">
        <freejoint/>
        <geom type="capsule" size="0.01" fromto="-0.03 0 0 0.03 0 0"
              mass="0.04"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  adr = mjm.jnt_qposadr[free_j]
  z_ours = float(np.asarray(d.qpos)[adr + 2])
  z_c = float(mjd.qpos[adr + 2])
  assert abs(z_ours - z_c) < 5e-3, (z_ours, z_c)


def test_box_on_sheet_settles_like_c():
  """A box dropped on the sheet interior rests at the C engine's height.

  Box-element contacts come from barycentric SDF descent here vs
  multi-point CCD in C (different manifolds), so the comparison is the
  resting configuration — the ``test_capsule_on_sheet_settles_like_c``
  protocol."""
  extra = """
      <body pos="0.04 0.02 0.06">
        <freejoint/>
        <geom type="box" size="0.02 0.015 0.01" mass="0.04"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  adr = mjm.jnt_qposadr[free_j]
  z_ours = float(np.asarray(d.qpos)[adr + 2])
  z_c = float(mjd.qpos[adr + 2])
  assert abs(z_ours - z_c) < 5e-3, (z_ours, z_c)


def test_small_box_does_not_tunnel_triangle_interior():
  """Regression for the vertex-sphere gap, box edition: a small box
  dropped on a triangle center must be caught by element narrowphase."""
  extra = """
      <body pos="0.04 0.04 0.05">
        <freejoint/>
        <geom type="box" size="0.005 0.005 0.005" mass="0.01"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(400):
    d = step(d)
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > -0.05, f"box tunneled through the sheet (z={z})"


_MESH_ASSET = """
    <asset>
      <mesh name="octa" vertex="0.02 0 0  -0.02 0 0  0 0.015 0
                                0 -0.015 0  0 0 0.012  0 0 -0.012"/>
    </asset>
"""


def test_mesh_on_sheet_settles_like_c():
  """A convex mesh (octahedron) dropped on the sheet interior rests at
  the C engine's height — element-level support-descent narrowphase
  (ref ``mj_collideGeomElem`` -> ``mjc_ConvexElem``), closing the last
  rigid-partner vertex-sphere fallback."""
  extra = """
      <body pos="0.04 0.02 0.06">
        <freejoint/>
        <geom type="mesh" mesh="octa" mass="0.04"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false").replace(
      "<worldbody>", _MESH_ASSET + "<worldbody>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  adr = mjm.jnt_qposadr[free_j]
  z_ours = float(np.asarray(d.qpos)[adr + 2])
  z_c = float(mjd.qpos[adr + 2])
  assert abs(z_ours - z_c) < 5e-3, (z_ours, z_c)


def test_small_mesh_does_not_tunnel_triangle_interior():
  """Regression for the vertex-sphere gap, mesh edition."""
  extra = """
      <body pos="0.04 0.04 0.05">
        <freejoint/>
        <geom type="mesh" mesh="octa" mass="0.01"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false").replace(
      "<worldbody>", _MESH_ASSET + "<worldbody>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(400):
    d = step(d)
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > -0.05, f"mesh tunneled through the sheet (z={z})"


def _tet_xml(extra=""):
  return f"""
  <mujoco>
    <option timestep="0.001"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <flexcomp type="grid" count="3 3 3" spacing="0.05 0.05 0.05"
                radius="0.005" name="cube" dim="3" mass="0.3"
                pos="0 0 0.2">
        <contact selfcollide="none" internal="true"/>
        <edge equality="true"/>
      </flexcomp>
      {extra}
    </worldbody>
  </mujoco>
  """


def test_cylinder_on_sheet_settles_like_c():
  """A cylinder dropped on the sheet interior rests at the C engine's
  height (thin-shell support-function contact, dim-2)."""
  extra = """
      <body pos="0.0 0.0 0.03">
        <freejoint/>
        <geom type="cylinder" size="0.03 0.01" mass="0.03"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(600):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  adr = mjm.jnt_qposadr[free_j]
  z_ours = float(np.asarray(d.qpos)[adr + 2])
  z_c = float(mjd.qpos[adr + 2])
  assert abs(z_ours - z_c) < 5e-3, (z_ours, z_c)


def test_ellipsoid_does_not_tunnel_triangle_interior():
  """A small ellipsoid dropped on a triangle center is caught by the
  thin-shell element contact (vertex spheres would miss)."""
  extra = """
      <body pos="0.04 0.04 0.05">
        <freejoint/>
        <geom type="ellipsoid" size="0.006 0.005 0.004" mass="0.01"/>
      </body>
  """
  xml = _sheet_xml(extra=extra, internal="false")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(400):
    d = step(d)
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > -0.05, f"ellipsoid tunneled through the sheet (z={z})"


def test_box_on_tet_cube_settles_finite():
  """A box dropped on a dim-3 flex cube: volumetric SAT path runs and the
  box rests on top (no tunneling through the tet lattice)."""
  extra = """
      <body pos="0.02 0.01 0.35">
        <freejoint/>
        <geom type="box" size="0.02 0.015 0.01" mass="0.05"/>
      </body>
  """
  mjm = mujoco.MjModel.from_xml_string(_tet_xml(extra))
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(250):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > 0.05, f"box fell through the tet cube (z={z})"


def test_mesh_on_tet_cube_settles_finite():
  """A convex mesh dropped on a dim-3 flex cube rests on top (support
  descent vs rounded tets; no tunneling through the lattice)."""
  extra = """
      <body pos="0.02 0.01 0.35">
        <freejoint/>
        <geom type="mesh" mesh="octa" mass="0.05"/>
      </body>
  """
  xml = _tet_xml(extra).replace("<worldbody>", _MESH_ASSET + "<worldbody>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(250):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > 0.05, f"mesh fell through the tet cube (z={z})"


def test_dim3_internal_loads_and_runs():
  """A dim-3 flexcomp with default internal=true loads (evpairs +
  within-tet anti-collapse faces) and simulates finite."""
  mjm = mujoco.MjModel.from_xml_string(_tet_xml())
  assert int(mjm.nflexevpair) >= 0
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(100):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_tetface_contacts_match_c_forward():
  """Within-tet face-vertex contacts (planeVertex): forces at a crushed
  configuration match the C engine."""
  mjm = mujoco.MjModel.from_xml_string(_tet_xml())
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)

  # crush the cube vertically so tet faces approach opposite vertices
  rng = np.random.RandomState(0)
  mjd.qpos[:] = mjm.qpos0
  nv3 = mjm.nflexvert
  for v in range(nv3):
    adr = mjm.jnt_qposadr[mjm.body_jntadr[mjm.flex_vertbodyid[v]]]
    mjd.qpos[adr + 2] *= 0.3          # compress z toward the body origin
    mjd.qpos[adr:adr + 3] += 0.001 * rng.randn(3)
  mujoco.mj_forward(mjm, mjd)

  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  scale = max(1.0, np.abs(mjd.qacc).max())
  err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
  assert err < 1e-6, f"qacc mismatch {err} (C ncon={mjd.ncon})"
