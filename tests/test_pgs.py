"""Dual PGS solver tests (ops/pgs.py) vs ``mj_solPGS``
(reference ``src/engine/engine_solver.c:328``)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _xml(cone):
  return f"""
  <mujoco>
    <option timestep="0.002" solver="PGS" iterations="60"
            tolerance="1e-12" cone="{cone}"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <body pos="0 0 0.28">
        <freejoint/>
        <geom type="box" size="0.1 0.1 0.1" mass="1" friction="0.6"/>
      </body>
      <body pos="0.5 0 0.6">
        <joint name="j0" type="hinge" axis="0 1 0" damping="0.1"
               range="-30 30" limited="true" frictionloss="0.02"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" mass="0.4"/>
        <body pos="0.3 0 0">
          <joint name="j1" type="hinge" axis="1 0 0"/>
          <geom type="sphere" size="0.05" mass="0.2"/>
        </body>
      </body>
      <body pos="-0.4 0 0.4">
        <joint type="slide" axis="0 0 1"/>
        <geom type="sphere" size="0.08" mass="0.5" friction="0.4"/>
      </body>
    </worldbody>
    <equality>
      <joint joint1="j0" joint2="j1" polycoef="0 1 0 0 0"/>
    </equality>
  </mujoco>
  """


@pytest.mark.parametrize("cone", ["pyramidal", "elliptic"])
def test_pgs_forward_matches_c(cone):
  """Converged PGS qacc at a contact-rich state matches the C solver.

  Run to convergence (PGS needs ~300 sweeps here): the dual objective is
  strictly convex, so both engines must land on the same optimum; at a
  shared mid-convergence iteration cap the iterates differ by design."""
  xml = _xml(cone).replace('iterations="60"', 'iterations="500"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  rng = np.random.RandomState(0)
  for trial in range(3):
    mujoco.mj_resetData(mjm, mjd)
    # settle into contact, then randomize velocities
    for _ in range(200):
      mujoco.mj_step(mjm, mjd)
    mjd.qvel[:] += 0.1 * rng.randn(mjm.nv)
    mujoco.mj_forward(mjm, mjd)

    d = mi.put_data(m, mjd)
    d = jax.jit(lambda dd: mi.forward(m, dd))(d)
    scale = max(1.0, np.abs(mjd.qacc).max())
    err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
    # both sides are iterative dual solvers at tolerance; sweep order
    # matches but f64 rounding in the AR assembly differs
    assert err < 5e-5, f"{cone} trial {trial}: qacc err {err}"


@pytest.mark.parametrize("cone", ["pyramidal", "elliptic"])
def test_pgs_rollout_tracks_c(cone):
  mjm = mujoco.MjModel.from_xml_string(_xml(cone))
  mjd = mujoco.MjData(mjm)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 1e-3, f"{cone}: rollout err {err}"
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_pgs_noslip_composes():
  """PGS + noslip post-pass runs and stays finite (ref mj_fwdConstraint
  runs noslip after any solver)."""
  xml = _xml("pyramidal").replace(
      'iterations="60"', 'iterations="60" noslip_iterations="5"')
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(50):
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()


def test_pgs_solver_stats_recorded():
  mjm = mujoco.MjModel.from_xml_string(_xml("pyramidal"))
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  assert int(d.solver_niter) > 0
  stats = np.asarray(d.solver_stat)
  assert np.isfinite(stats).all()
