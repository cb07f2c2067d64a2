"""Trilinear (nodal-dof) flex tests.

Differential targets: the interp branches of ``mj_flex`` (reference
``engine_core_smooth.c:494``, vertex positions from node bodies),
``mj_passive`` (``engine_passive.c:125``, stretch-frame nodal
elasticity) and the contact Jacobian node-weight chaining
(``mj_vertBodyWeight``, ``engine_core_constraint.c:1061``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _xml(extra="", pos="0 0 0.3", plane=False):
  pl = '<geom type="plane" size="2 2 .1"/>' if plane else ""
  return f"""
  <mujoco>
    <option timestep="0.001"/>
    <worldbody>
      {pl}
      <flexcomp type="grid" count="5 5 5" spacing="0.05 0.05 0.05"
                radius="0.005" name="cube" dim="3" mass="0.3" pos="{pos}"
                dof="trilinear">
        <contact selfcollide="none" internal="false"/>
        <edge equality="false"/>
        <elasticity young="5e4" poisson="0.2" damping="0.003"/>
      </flexcomp>
      {extra}
    </worldbody>
  </mujoco>
  """


def test_trilinear_loads_and_steps():
  """A trilinear flexcomp loads (the round-4 refusal is gone): 8 node
  bodies carry the 24 dofs, 125 vertices interpolate."""
  mjm = mujoco.MjModel.from_xml_string(_xml())
  assert int(mjm.flex_interp[0]) == 1 and int(mjm.nflexnode) == 8
  m = mi.put_model(mjm)
  d = jax.jit(lambda dd: mi.step(m, dd))(mi.make_data(m))
  assert np.isfinite(np.asarray(d.qpos)).all()


def _perturbed(mjm, scale=0.01, seed=0):
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + scale * rng.randn(mjm.nq)
  mjd.qvel[:] = scale * rng.randn(mjm.nv)
  return mjd


def test_vertex_positions_match_c():
  """flexvert_xpos from trilinear interpolation matches mj_flex."""
  mjm = mujoco.MjModel.from_xml_string(_xml())
  mjd = _perturbed(mjm, scale=0.02)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  np.testing.assert_allclose(
      np.asarray(d.flexvert_xpos), mjd.flexvert_xpos, atol=1e-12)


def test_nodal_elasticity_forward_matches_c():
  """qacc of a deformed free-floating trilinear cube (stretch-frame
  nodal spring + damper + gravity) matches the C engine."""
  mjm = mujoco.MjModel.from_xml_string(_xml())
  mjd = _perturbed(mjm, scale=0.015, seed=3)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  scale = max(1.0, np.abs(mjd.qacc).max())
  err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
  assert err < 1e-6, f"qacc mismatch {err}"


def test_trilinear_rollout_tracks_c():
  """Short free-flight rollout (elastic wobble, no contacts) tracks C."""
  mjm = mujoco.MjModel.from_xml_string(_xml())
  mjd = _perturbed(mjm, scale=0.01, seed=1)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.put_data(m, mjd)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 1e-6, f"trajectory diverged: {err}"


def test_trilinear_cube_rests_on_plane_like_c():
  """Dropped on a plane, the trilinear cube settles at the C engine's
  height (plane_vert contacts with node-weight Jacobians)."""
  mjm = mujoco.MjModel.from_xml_string(_xml(pos="0 0 0.16", plane=True))
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(500):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert mjd.ncon > 0
  assert np.isfinite(np.asarray(d.qpos)).all()
  z_c = mjd.flexvert_xpos[:, 2].min()
  z_ours = float(np.asarray(d.flexvert_xpos)[:, 2].min())
  assert abs(z_ours - z_c) < 5e-3, (z_ours, z_c)


def test_sphere_rests_on_trilinear_cube():
  """A rigid sphere dropped on the trilinear cube is carried by the
  geom_elem narrowphase with node-weight Jacobians (no tunneling)."""
  extra = """
      <body pos="0.02 0.01 0.5">
        <freejoint/>
        <geom type="sphere" size="0.02" mass="0.05"/>
      </body>
  """
  mjm = mujoco.MjModel.from_xml_string(
      _xml(extra=extra, pos="0 0 0.16", plane=True))
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(400):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  free_j = int(np.nonzero(
      np.asarray(mjm.jnt_type) == int(mujoco.mjtJoint.mjJNT_FREE))[0][0])
  z = float(np.asarray(d.qpos)[mjm.jnt_qposadr[free_j] + 2])
  assert z > 0.1, f"sphere fell through the trilinear cube (z={z})"
