"""Mesh-SDF bridge plugin tests (``mujoco.sdf.sdflib`` analog).

The pip ``mujoco`` wheel does not ship the SdfLib plugin, so there is no
C oracle — validation is geometric (the voxel SDF of analytically-known
meshes) plus behavioral (host compile round-trips through the ctypes
stub, settling against the mesh-SDF geom at the analytic height).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops import meshsdf


def _cube_mesh(h=0.1):
  verts = np.array([[sx * h, sy * h, sz * h]
                    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
  faces = []
  quad = lambda a, b, c, d: faces.extend([[a, b, c], [a, c, d]])
  quad(0, 1, 3, 2)
  quad(4, 6, 7, 5)
  quad(0, 4, 5, 1)
  quad(2, 3, 7, 6)
  quad(0, 2, 6, 4)
  quad(1, 5, 7, 3)
  return verts, np.array(faces)


def test_voxel_sdf_matches_analytic_cube():
  """Grid SDF of a cube mesh matches the analytic box SDF to sub-voxel."""
  verts, faces = _cube_mesh(0.1)
  g = meshsdf.mesh_sdf_grid(verts, faces, res=48)
  rng = np.random.RandomState(0)
  pts = (rng.rand(200, 3) - 0.5) * 0.36
  vox = float(np.linalg.norm(g.spacing))
  gv = jnp.asarray(g.values)
  args = tuple(jnp.asarray(a) for a in
               (g.lo, g.spacing, g.box_center, g.box_half))
  for p in pts:
    q = np.abs(p) - 0.1
    outside = np.linalg.norm(np.maximum(q, 0.0))
    analytic = outside + min(q.max(), 0.0)
    s = float(meshsdf.sample_grid(gv, *args, jnp.asarray(p)))
    # trilinear voxel accuracy; corner regions worst (~1.5 diagonals)
    assert abs(s - analytic) < 1.5 * vox, (p, s, analytic)


_XML = """
<mujoco>
  <extension>
    <plugin plugin="mujoco.sdf.sdflib">
      <instance name="sdf"><config key="aabb" value="0"/></instance>
    </plugin>
  </extension>
  <asset>
    <mesh name="cube" vertex="0.1 0.1 0.1  0.1 0.1 -0.1  0.1 -0.1 0.1
                              0.1 -0.1 -0.1  -0.1 0.1 0.1  -0.1 0.1 -0.1
                              -0.1 -0.1 0.1  -0.1 -0.1 -0.1">
      <plugin instance="sdf"/>
    </mesh>
  </asset>
  <option sdf_iterations="20" sdf_initpoints="16"/>
  <worldbody>
    <geom type="sdf" mesh="cube"><plugin instance="sdf"/></geom>
    <body pos="0.0 0.0 0.3"><freejoint/>
      <geom type="sphere" size="0.05" mass="0.1"/></body>
  </worldbody>
</mujoco>
"""


def test_sdflib_model_loads():
  """A model with a mujoco.sdf.sdflib mesh compiles through the host
  stub (marching-cubes round trip) and loads into the TPU engine."""
  m = mi.load_model(_XML)
  assert m.ngeom == 2
  d = jax.jit(lambda dd: mi.step(m, dd))(mi.make_data(m))
  assert np.isfinite(np.asarray(d.qpos)).all()


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/model/plugin/sdf/cow.xml"),
    reason="reference model tree not mounted")
def test_reference_cow_model_loads():
  """The reference's own sdflib example (spot.obj mesh + torus SDF,
  plugin/sdf/cow.xml) loads through the bridge — OBJ pre-scan, stub
  compile, voxel SDF — and simulates finite."""
  m = mi.load_model("/root/reference/model/plugin/sdf/cow.xml")
  d = jax.jit(lambda dd: mi.step(m, dd))(mi.make_data(m))
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_sphere_rests_on_sdflib_cube():
  """A sphere dropped on the mesh-SDF cube rests at the analytic height
  (cube top 0.1 + sphere radius 0.05, within a voxel)."""
  m = mi.load_model(_XML, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(500):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  z = float(np.asarray(d.qpos)[2])
  assert abs(z - 0.15) < 0.015, z
