"""Height-field collision + ray differential tests.

Terrain heights are set programmatically on the compiled model (the MJCF
asset only fixes the grid), then both engines consume identical data:
the C engine via ``mjc_ConvexHField`` prism CCD / ``mj_rayHfield``
(reference ``engine_collision_convex.c``, ``engine_ray.c:453``), ours via
``ops/hfield.py``.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops import ray as ray_mod

NROW, NCOL = 9, 11


def _terrain_xml(geom: str) -> str:
  return f"""
  <mujoco>
    <option timestep="0.005"/>
    <asset>
      <hfield name="terrain" nrow="{NROW}" ncol="{NCOL}"
              size="1.0 0.8 0.3 0.1"/>
    </asset>
    <worldbody>
      <geom type="hfield" hfield="terrain" pos="0 0 0"/>
      <body pos="0 0 1">
        <freejoint/>
        {geom}
        <site name="eye" pos="0 0 0.2" zaxis="0 0 -1"/>
      </body>
    </worldbody>
    <sensor>
      <rangefinder site="eye"/>
    </sensor>
  </mujoco>
  """


def _set_heights(mjm):
  """Smooth deterministic bumps, normalized to [0, 1]."""
  r, c = np.meshgrid(np.arange(NROW), np.arange(NCOL), indexing="ij")
  z = 0.5 + 0.35 * np.sin(c * 0.7) * np.cos(r * 0.9)
  z = (z - z.min()) / (z.max() - z.min())
  mjm.hfield_data[:] = z.ravel()
  return z


def _surface_z(mjm, x, y):
  """Exact top-surface height at (x, y) via the cell triangle planes."""
  size = mjm.hfield_size[0]
  dx = 2 * size[0] / (NCOL - 1)
  dy = 2 * size[1] / (NROW - 1)
  data = mjm.hfield_data.reshape(NROW, NCOL)
  cf, rf = (x + size[0]) / dx, (y + size[1]) / dy
  ci, ri = int(np.clip(np.floor(cf), 0, NCOL - 2)), int(
      np.clip(np.floor(rf), 0, NROW - 2))
  fx, fy = cf - ci, rf - ri
  z = lambda rr, cc: data[rr, cc] * size[2]
  v00 = np.array([dx * ci - size[0], dy * ri - size[1], z(ri, ci)])
  v11 = np.array([dx * (ci + 1) - size[0], dy * (ri + 1) - size[1],
                  z(ri + 1, ci + 1)])
  third = (np.array([dx * (ci + 1) - size[0], dy * ri - size[1],
                     z(ri, ci + 1)]) if fx >= fy else
           np.array([dx * ci - size[0], dy * (ri + 1) - size[1],
                     z(ri + 1, ci)]))
  n = np.cross(v11 - v00, third - v00)
  n *= np.sign(n[2])
  return v00[2] - (n[0] * (x - v00[0]) + n[1] * (y - v00[1])) / n[2], n / np.linalg.norm(n)


def test_hfield_ray_vs_c():
  """Rangefinder over terrain matches ``mj_ray`` for many rays."""
  mjm = mujoco.MjModel.from_xml_string(_terrain_xml(
      '<geom type="sphere" size="0.08" mass="1"/>'))
  _set_heights(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)

  rng = np.random.RandomState(0)
  geomid = np.zeros(1, np.int32)
  for _ in range(25):
    pnt = np.array([rng.uniform(-0.9, 0.9), rng.uniform(-0.7, 0.7),
                    rng.uniform(0.5, 1.5)])
    vec = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4), -1.0])
    vec /= np.linalg.norm(vec)
    c_dist = mujoco.mj_ray(mjm, mjd, pnt, vec, None, 1, -1, geomid)
    ours, gid = ray_mod.ray(m, d, jnp.asarray(pnt), jnp.asarray(vec))
    if c_dist < 0:
      assert float(ours) < 0
    else:
      np.testing.assert_allclose(float(ours), c_dist, atol=1e-9)
      assert int(gid) == int(geomid[0])


def test_hfield_rangefinder_sensor():
  """The wired-up rangefinder sensor matches the C sensor pipeline."""
  mjm = mujoco.MjModel.from_xml_string(_terrain_xml(
      '<geom type="sphere" size="0.08" mass="1"/>'))
  _set_heights(mjm)
  m = mi.put_model(mjm)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(1)
  for _ in range(5):
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[0:3] = [rng.uniform(-0.5, 0.5), rng.uniform(-0.4, 0.4),
                     rng.uniform(0.8, 1.2)]
    mujoco.mj_forward(mjm, mjd)
    d = mi.put_data(m, mjd)
    d = jax.jit(lambda dd: mi.forward(m, dd))(d)
    np.testing.assert_allclose(
        np.asarray(d.sensordata), mjd.sensordata, atol=1e-9)


def test_hfield_sphere_contact_vs_c():
  """Sphere resting on a terrain triangle: dist/normal/qacc match C."""
  mjm = mujoco.MjModel.from_xml_string(_terrain_xml(
      '<geom type="sphere" size="0.08" mass="1"/>'))
  _set_heights(mjm)
  m = mi.put_model(mjm)
  mjd = mujoco.MjData(mjm)

  fwd = jax.jit(lambda dd: mi.forward(m, dd))
  rng = np.random.RandomState(2)
  qacc_checked = 0
  for trial in range(10):
    x, y = rng.uniform(-0.6, 0.6), rng.uniform(-0.45, 0.45)
    zs, n = _surface_z(mjm, x, y)
    # place the sphere penetrating the local plane by ~2cm along its normal
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[0:3] = np.array([x, y, zs]) + n * (0.08 - 0.02) / n[2]
    mujoco.mj_forward(mjm, mjd)
    assert mjd.ncon >= 1
    d = mi.put_data(m, mjd)
    d = fwd(d)
    con = d.contact
    act = np.where(np.asarray(con.dist) < 0)[0]
    # every active contact of ours matches a distinct C contact exactly
    c_used = set()
    for k in act:
      hit = None
      for c in range(mjd.ncon):
        if c in c_used:
          continue
        if (abs(float(con.dist[k]) - mjd.contact.dist[c]) < 1e-6
            and np.abs(np.asarray(con.pos[k])
                       - mjd.contact.pos[c]).max() < 1e-6
            and np.abs(np.asarray(con.frame[k][0])
                       - mjd.contact.frame[c][:3]).max() < 1e-6):
          hit = c
          break
      assert hit is not None, f"trial {trial}: unmatched contact {k}"
      c_used.add(hit)
    # full active set recovered (up to the 4-slot budget)
    assert len(act) == min(mjd.ncon, 4), (
        f"trial {trial}: {len(act)} active vs C ncon={mjd.ncon}")
    # with identical contact sets the dynamics must agree
    if len(act) == mjd.ncon:
      np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-6)
      qacc_checked += 1
  assert qacc_checked >= 5


def test_hfield_box_settles():
  """A box dropped on terrain comes to rest on the surface (capability:
  the vertex-sampling manifold supports resting contact)."""
  mjm = mujoco.MjModel.from_xml_string(_terrain_xml(
      '<geom type="box" size="0.1 0.1 0.05" mass="1"/>'))
  _set_heights(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  d = d.replace(qpos=d.qpos.at[2].set(0.6))

  @jax.jit
  def roll(dd):
    def body(dd, _):
      return mi.step(m, dd), ()
    dd, _ = jax.lax.scan(body, dd, None, length=400)
    return dd

  d = roll(d)
  zs, _ = _surface_z(mjm, float(d.qpos[0]), float(d.qpos[1]))
  assert np.isfinite(np.asarray(d.qpos)).all()
  # at rest: near-zero velocity, box bottom near the local surface
  assert float(jnp.linalg.norm(d.qvel)) < 0.5
  assert zs - 0.02 < float(d.qpos[2]) < zs + 0.25


def test_hfield_capsule_contact_vs_c():
  """Capsule lying on a locally planar patch: penetration matches C."""
  mjm = mujoco.MjModel.from_xml_string(_terrain_xml(
      '<geom type="capsule" size="0.05 0.15" mass="1" euler="90 0 0"/>'))
  _set_heights(mjm)
  m = mi.put_model(mjm)
  fwd = jax.jit(lambda dd: mi.forward(m, dd))
  mjd = mujoco.MjData(mjm)

  rng = np.random.RandomState(3)
  checked = 0
  for _ in range(12):
    x, y = rng.uniform(-0.5, 0.5), rng.uniform(-0.35, 0.35)
    zs, n = _surface_z(mjm, x, y)
    mujoco.mj_resetData(mjm, mjd)
    mjd.qpos[0:3] = np.array([x, y, zs + 0.04])
    mujoco.mj_forward(mjm, mjd)
    if mjd.ncon == 0:
      continue
    # skip configurations wedged against near-vertical terrain walls:
    # the reference's prism CCD emits side-face contacts there, which the
    # top-surface design intentionally does not model (ops/hfield.py
    # docstring)
    if any(abs(mjd.contact.frame[c][2]) < 0.2 for c in range(mjd.ncon)):
      continue
    checked += 1
    d = mi.put_data(m, mjd)
    d = fwd(d)
    ours = np.sort(np.asarray(d.contact.dist))
    ref = np.sort(mjd.contact.dist[:mjd.ncon])
    # deepest penetration agrees (manifold cardinality may differ:
    # C emits one contact per prism, we emit per-triangle slots)
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-5)
  assert checked >= 4
