"""Convex narrowphase differential tests vs the C engine.

Covers box-box (ref ``engine_collision_box.c:607`` mjc_BoxBox), capsule-box
(mjc_CapsuleBox), and the mesh pairs the reference routes through CCD
(``engine_collision_convex.c``).  Test pattern: configurations whose exact
contact set is unambiguous (face stacks, vertex-face, edge-edge) must match
the C engine's (dist, pos, normal) per active contact; rounded/degenerate
configurations check dist/normal agreement only.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

TET_ASSET = (
    '<asset><mesh name="tet" vertex="0 0 0  .2 0 0  0 .2 0  0 0 .2"/></asset>'
)


def _active_contacts(m, d):
  """Runs our forward; returns active (dist, pos, normal) rows sorted."""
  out = jax.jit(mi.forward)(m, d)
  ct = out.contact
  dist = np.asarray(ct.dist)
  inc = np.asarray(ct.includemargin)
  act = dist < inc + 1e-10
  rows = []
  for i in np.nonzero(act)[0]:
    rows.append((
        float(dist[i]), np.asarray(ct.pos[i]), np.asarray(ct.frame[i, 0]),
        int(ct.geom1[i]), int(ct.geom2[i]),
    ))
  return rows, out


def _c_contacts(mjm, mjd):
  mujoco.mj_forward(mjm, mjd)
  rows = []
  for i in range(mjd.ncon):
    c = mjd.contact[i]
    rows.append((float(c.dist), np.array(c.pos), np.array(c.frame[:3]),
                 int(c.geom1), int(c.geom2)))
  return rows


def _match(ours, ref, atol=1e-6, require_all=True):
  """Every C contact must have an exact counterpart in ours (pos/dist/normal)."""
  used = set()
  for dist, pos, nrm, g1, g2 in ref:
    found = False
    for j, (d2, p2, n2, h1, h2) in enumerate(ours):
      if j in used:
        continue
      flip = (g1, g2) != (h1, h2)
      n_ref = -nrm if flip else nrm
      if (abs(dist - d2) < atol and np.allclose(pos, p2, atol=atol)
          and np.allclose(n_ref, n2, atol=1e-5)):
        used.add(j)
        found = True
        break
    assert not require_all or found, (
        f"C contact not matched: dist={dist} pos={pos} n={nrm}\nours={ours}"
    )


def _setup(xml):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


@pytest.mark.parametrize("offset,euler", [
    ((0.03, 0.02, 0.17), (0, 0, 0)),      # aligned face stack
    ((0.05, -0.04, 0.165), (0, 0, 25)),   # twisted face stack
])
def test_box_box_face_manifold(offset, euler):
  xml = f"""
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="{offset[0]} {offset[1]} {0.1 + offset[2]}"
          euler="{euler[0]} {euler[1]} {euler[2]}">
      <freejoint/><geom type="box" size="0.08 0.08 0.08"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) > 0
  # C may emit up to 8 manifold points, we keep 4: every one of our
  # contacts must match a C contact, and we must find >= min(4, nC)
  _match(ours, ref, require_all=False)
  matched = 0
  for d2, p2, n2, h1, h2 in ours:
    for dist, pos, nrm, g1, g2 in ref:
      if abs(dist - d2) < 1e-6 and np.allclose(pos, p2, atol=1e-6):
        matched += 1
        break
  assert matched == len(ours), f"unmatched extra contacts: {ours} vs {ref}"
  assert matched >= min(4, len(ref))


def test_box_box_vertex_face():
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="0.2 0.0 0.1" euler="0 0 40"><freejoint/>
      <geom type="box" size="0.08 0.08 0.08"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) == 2
  _match(ours, ref)


def test_box_box_edge_edge():
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="0.16 0.0 0.305" euler="45 0 0"><freejoint/>
      <geom type="box" size="0.08 0.08 0.08"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) == 2
  # the C engine splits the edge-edge contact into 2 clipped points; our
  # SAT reports the single closest point on the shared edge line with the
  # same depth and normal
  assert len(ours) >= 1
  for d2, p2, n2, h1, h2 in ours:
    assert abs(d2 - ref[0][0]) < 1e-6
    assert np.allclose(n2, ref[0][2], atol=1e-5)


def test_capsule_box_lying():
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="0.0 0.0 0.25" euler="90 0 0"><freejoint/>
      <geom type="capsule" size="0.05 0.08"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) == 2
  _match(ours, ref)


def test_capsule_box_rotated_face():
  xml = """
  <mujoco><worldbody>
    <body pos="0 0 0.1"><freejoint/><geom type="box" size="0.1 0.1 0.1"/></body>
    <body pos="0.05 0.05 0.21" euler="0 90 30"><freejoint/>
      <geom type="capsule" size="0.03 0.08"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) == 2
  _match(ours, ref)


def test_plane_mesh_tet():
  xml = f"""
  <mujoco>{TET_ASSET}<worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 -0.005"><freejoint/><geom type="mesh" mesh="tet"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  # all three bottom verts at equal depth; C keeps 2, we keep up to 4 —
  # every C contact must be found among ours
  _match(ours, ref)
  for d2, p2, n2, _, _ in ours:
    # mesh_vert is stored float32 by the compiler: ~1e-8 roundtrip noise
    assert abs(d2 - ref[0][0]) < 1e-7
    assert np.allclose(n2, [0, 0, 1], atol=1e-7)


def test_sphere_mesh_vertex():
  xml = f"""
  <mujoco>{TET_ASSET}<worldbody>
    <body pos="0 0 0"><freejoint/><geom type="sphere" size="0.05"/></body>
    <body pos="0.04 0 0"><freejoint/><geom type="mesh" mesh="tet"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) == 1
  _match(ours, ref)


def test_capsule_mesh_edge():
  xml = f"""
  <mujoco>{TET_ASSET}<worldbody>
    <body pos="0 0 0.23" euler="0 90 0"><freejoint/>
      <geom type="capsule" size="0.03 0.15"/></body>
    <body pos="0 0 0"><freejoint/><geom type="mesh" mesh="tet"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  ref = _c_contacts(mjm, mjd)
  ours, _ = _active_contacts(m, d)
  assert len(ref) >= 1
  _match(ours, ref, require_all=False)
  # deepest contact must match
  best = min(ours, key=lambda r: r[0])
  assert abs(best[0] - ref[0][0]) < 1e-6


def test_box_stack_forward_dynamics_parity():
  """Stacked boxes: qacc from the full pipeline matches C when the
  contact sets coincide (aligned 4-point manifolds)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <body pos="0 0 0.0995"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1" mass="1"/></body>
      <body pos="0.02 0.01 0.2985"><freejoint/>
        <geom type="box" size="0.08 0.08 0.08" mass="0.5"/></body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _setup(xml)
  mjd.qvel[:] = 0.05 * np.random.RandomState(3).randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  ours_active = int(np.sum(
      np.asarray(out.contact.dist) < np.asarray(out.contact.includemargin)))
  assert ours_active == mjd.ncon, (ours_active, mjd.ncon)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)


def test_box_stack_steps_stably():
  """A 3-box stack must remain standing over 200 steps (energy sanity)."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <body pos="0 0 0.1"><freejoint/>
        <geom type="box" size="0.1 0.1 0.1" mass="1"/></body>
      <body pos="0.01 0.0 0.28"><freejoint/>
        <geom type="box" size="0.08 0.08 0.08" mass="0.5"/></body>
      <body pos="0.0 0.01 0.42"><freejoint/>
        <geom type="box" size="0.06 0.06 0.06" mass="0.3"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  d = mi.make_data(m)

  @jax.jit
  def run(d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=200)
    return d

  dT = run(d)
  qpos = np.asarray(dT.qpos)
  assert np.all(np.isfinite(qpos))
  # box heights approximately preserved (stack did not explode/collapse)
  assert abs(qpos[2] - 0.1) < 0.02
  assert abs(qpos[9] - 0.28) < 0.03
  assert abs(qpos[16] - 0.42) < 0.04


def test_convex_xml_corpus_loads_and_steps():
  """The reference's convex test scene loads and simulates finitely."""
  import os
  path = "/root/reference/mjx/mujoco/mjx/test_data/convex.xml"
  if not os.path.exists(path):
    pytest.skip("reference corpus not mounted")
  mjm = mujoco.MjModel.from_xml_path(path)
  m = mi.put_model(mjm)
  d = mi.make_data(m)

  @jax.jit
  def run(d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=100)
    return d

  dT = run(d)
  assert np.all(np.isfinite(np.asarray(dT.qpos)))
