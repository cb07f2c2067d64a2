"""Flex and skin ray tests (ops/ray.py ray_flex/ray_skin) vs the C
``mju_rayFlex`` (ref engine_ray.c:848) / ``mju_raySkin`` (:1026)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops import ray as ray_mod


def _sheet():
  xml = """
  <mujoco>
    <worldbody>
      <flexcomp type="grid" count="5 5 1" spacing="0.1 0.1 0.1"
                radius="0.01" name="sheet" dim="2" mass="0.2">
        <contact selfcollide="none" internal="false"/>
        <edge equality="true"/>
      </flexcomp>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qpos[:] = mjm.qpos0 + 0.01 * rng.randn(mjm.nq)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = jax.jit(lambda dd: mi.forward(m, dd))(mi.put_data(m, mjd))
  return mjm, mjd, m, d


@pytest.mark.parametrize("flags", [
    dict(flg_vert=0, flg_edge=0, flg_face=1, flg_skin=1),
    dict(flg_vert=0, flg_edge=1, flg_face=0, flg_skin=0),
    dict(flg_vert=1, flg_edge=0, flg_face=0, flg_skin=0),
])
def test_ray_flex_matches_c(flags):
  mjm, mjd, m, d = _sheet()
  rng = np.random.RandomState(1)
  checked = 0
  for trial in range(12):
    pnt = np.array([0.15 * rng.randn(), 0.15 * rng.randn(), 0.4])
    vec = np.array([0.2 * rng.randn(), 0.2 * rng.randn(), -1.0])
    vec /= np.linalg.norm(vec)
    vertid = np.zeros(1, np.int32)
    ref = mujoco.mj_rayFlex(
        mjm, mjd, 0, bool(flags["flg_vert"]), bool(flags["flg_edge"]),
        bool(flags["flg_face"]), bool(flags["flg_skin"]), 0, pnt, vec,
        vertid)
    dist, vid = ray_mod.ray_flex(
        m, d, 0, pnt, vec,
        flg_vert=bool(flags["flg_vert"]), flg_edge=bool(flags["flg_edge"]),
        flg_face=bool(flags["flg_face"]), flg_skin=bool(flags["flg_skin"]))
    if ref < 0:
      assert float(dist) < 0, f"trial {trial}: C missed, we hit {dist}"
      continue
    checked += 1
    np.testing.assert_allclose(float(dist), ref, atol=1e-10,
                               err_msg=f"trial {trial} flags {flags}")
    assert int(vid) == int(vertid[0]), f"trial {trial}"
  # vertex mode: 1cm spheres are small targets for random rays
  assert checked >= 2, "degenerate test: almost no hits"


def _np_ray_tri(tri, pnt, vec):
  """Brute-force Möller-Trumbore oracle (the mju_raySkin python binding
  is not callable with arrays, so the oracle is local)."""
  v0, v1, v2 = tri
  e1, e2 = v1 - v0, v2 - v0
  h = np.cross(vec, e2)
  a = e1 @ h
  if abs(a) < 1e-12:
    return np.inf
  f = 1.0 / a
  s = pnt - v0
  u = f * (s @ h)
  q = np.cross(s, e1)
  v = f * (vec @ q)
  t = f * (e2 @ q)
  if u < 0 or v < 0 or u + v > 1 or t < 0:
    return np.inf
  return t


def test_ray_skin_matches_c():
  """ray_skin vs a brute-force triangle-sweep oracle (mju_raySkin
  semantics, ref engine_ray.c:1026) on a deformed sheet mesh."""
  rng = np.random.RandomState(2)
  nx, ny = 6, 5
  xs, ys = np.meshgrid(np.linspace(-1, 1, nx), np.linspace(-1, 1, ny))
  vert = np.stack(
      [xs.ravel(), ys.ravel(), 0.1 * rng.randn(nx * ny)], axis=1
  ).astype(np.float64)
  face = []
  for r in range(ny - 1):
    for c in range(nx - 1):
      a = r * nx + c
      face.append([a, a + 1, a + nx])
      face.append([a + 1, a + nx + 1, a + nx])
  face = np.asarray(face, np.int32)

  checked = 0
  for trial in range(10):
    pnt = np.array([0.8 * rng.randn(), 0.8 * rng.randn(), 2.0])
    vec = np.array([0.1 * rng.randn(), 0.1 * rng.randn(), -1.0])
    vec /= np.linalg.norm(vec)
    ts = np.array([_np_ray_tri(vert[fc], pnt, vec) for fc in face])
    ref = ts.min()
    dist, vid = ray_mod.ray_skin(face, vert, pnt, vec)
    if not np.isfinite(ref):
      assert float(dist) < 0
      continue
    checked += 1
    np.testing.assert_allclose(float(dist), ref, atol=1e-12,
                               err_msg=f"trial {trial}")
    # nearest vertex of the hit triangle
    kbest = int(np.argmin(ts))
    hit = pnt + vec * ref
    corners = vert[face[kbest]]
    near = face[kbest][np.argmin(np.linalg.norm(corners - hit, axis=1))]
    assert int(vid) == int(near)
  assert checked >= 3


def test_rangefinder_on_flex_scene_runs():
  """Rangefinder sensors load and run on a flex scene (they see rigid
  geoms only — exactly the reference's mj_ray, which skips flexes)."""
  xml = """
  <mujoco>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <flexcomp type="grid" count="4 4 1" spacing="0.1 0.1 0.1"
                radius="0.01" name="sheet" dim="2" mass="0.2" pos="0 0 0.5">
        <contact selfcollide="none" internal="false"/>
        <edge equality="true"/>
      </flexcomp>
      <body pos="0 0 1.5">
        <joint type="slide" axis="0 0 1"/>
        <geom type="sphere" size="0.05" mass="0.1"/>
        <site name="rf" pos="0 0 -0.06" zaxis="0 0 -1"/>
      </body>
    </worldbody>
    <sensor><rangefinder site="rf"/></sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = jax.jit(lambda dd: mi.forward(m, dd))(mi.put_data(m, mjd))
  np.testing.assert_allclose(
      np.asarray(d.sensordata), mjd.sensordata, atol=1e-9)
