"""Elliptic friction cone differential tests vs the C engine.

Covers the elliptic branches of contact instantiation
(ref ``engine_core_constraint.c:1118``), impedance R-scaling
(``mj_makeImpedance``:1558 — R1 = R0/impratio, Rj mu_j^2 const),
the cone zones of ``mj_constraintUpdate`` (:2460), the Newton cone
Hessian (``engine_solver.c:1574``), and the cone terms of the exact
line search (``CGeval``:1081).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

HUMANOID_PATH = "/root/reference/model/humanoid/humanoid.xml"

SCENE = """
<mujoco>
  <option cone="elliptic" timestep="0.002" impratio="{impratio}"/>
  <worldbody>
    <geom type="plane" size="2 2 .1"/>
    <body pos="0 0 0.099"><freejoint/>
      <geom type="sphere" size="0.1" mass="1" friction="0.8 0.01 0.002"/>
    </body>
    <body pos="0.3 0 0.097" euler="0 90 0"><freejoint/>
      <geom type="capsule" size="0.05 0.1" mass="0.4" condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""


def _setup(xml, seed=0, vel=0.3):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = vel * rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


@pytest.mark.parametrize("impratio,condim", [(1.0, 3), (1.5, 6), (3.0, 4)])
def test_elliptic_forward_inverse_parity(impratio, condim):
  xml = SCENE.format(impratio=impratio, condim=condim)
  mjm, mjd, m, d = _setup(xml)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-9)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-9)

  mujoco.mj_inverse(mjm, mjd)
  inv = jax.jit(mi.inverse)(m, d.replace(qacc=jnp.asarray(mjd.qacc)))
  np.testing.assert_allclose(inv.qfrc_inverse, mjd.qfrc_inverse, atol=1e-9)


def test_elliptic_sliding_zones_trajectory():
  """Fast sliding exercises the cone middle zone over a trajectory."""
  xml = SCENE.format(impratio=1.0, condim=3)
  mjm, mjd, m, d = _setup(xml, vel=1.5)
  step = jax.jit(mi.step)
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-9)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-8)


def test_elliptic_cg_solver():
  """The CG solver path handles cone zones in its line search too."""
  xml = SCENE.format(impratio=1.0, condim=3).replace(
      '<option', '<option solver="CG" iterations="100" ')
  mjm, mjd, m, d = _setup(xml)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)


def test_elliptic_solreffriction():
  """Explicit pair with solreffriction drives the friction-row KBIP."""
  xml = """
  <mujoco>
    <option cone="elliptic" timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="2 2 .1"/>
      <body pos="0 0 0.099"><freejoint/>
        <geom name="ball" type="sphere" size="0.1" mass="1"/>
      </body>
    </worldbody>
    <contact>
      <pair geom1="floor" geom2="ball" solreffriction="0.05 1.2"
            friction="0.6 0.6 0.004 0.001 0.001"/>
    </contact>
  </mujoco>"""
  mjm, mjd, m, d = _setup(xml, vel=0.8)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-9)


@pytest.mark.parametrize("cone", ["pyramidal", "elliptic"])
def test_noslip_post_pass_parity(cone):
  """Noslip dual Gauss-Seidel polishing matches ``mj_solNoSlip``
  (ref ``engine_solver.c:550``) for both cones, incl. condim=6 QCQP."""
  xml = f"""
  <mujoco>
    <option cone="{cone}" timestep="0.002" noslip_iterations="5"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <body pos="0 0 0.099"><freejoint/>
        <geom type="sphere" size="0.1" mass="1" friction="0.6"/></body>
      <body pos="0.3 0 0.097" euler="0 90 0"><freejoint/>
        <geom type="capsule" size="0.05 0.1" mass="0.4" condim="6"/></body>
    </worldbody>
  </mujoco>"""
  mjm, mjd, m, d = _setup(xml, vel=0.5)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-9)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-9)
  step = jax.jit(mi.step)
  for _ in range(30):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-10)


def test_noslip_dry_friction():
  """Noslip over dof-friction rows (the dry-friction scalar sweep)."""
  xml = """
  <mujoco>
    <option noslip_iterations="10"/>
    <worldbody>
      <body pos="0 0 1">
        <joint name="s" type="slide" axis="1 0 0" frictionloss="2.5"/>
        <geom type="box" size=".1 .1 .1" mass="1"/>
      </body>
    </worldbody>
    <actuator><motor joint="s"/></actuator>
  </mujoco>"""
  mjm, mjd, m, d = _setup(xml, vel=0.0)
  mjd.ctrl[:] = 1.0
  mujoco.mj_forward(mjm, mjd)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-10)


@pytest.mark.skipif(
    not __import__("os").path.exists(HUMANOID_PATH),
    reason="reference model not mounted")
@pytest.mark.parametrize("seed", [0, 1])
def test_humanoid_elliptic_parity(seed):
  """VERDICT item 3 done-criterion: humanoid with cone='elliptic' matches
  C forward + inverse at 1e-6."""
  spec = open(HUMANOID_PATH).read().replace(
      "<option", '<option cone="elliptic" ', 1)
  mjm = mujoco.MjModel.from_xml_string(spec)
  assert mjm.opt.cone == 1
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0
  mjd.qpos[7:] += 0.08 * rng.randn(mjm.nq - 7)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mjd.ctrl[:] = 0.2 * rng.randn(mjm.nu)
  mujoco.mj_forward(mjm, mjd)

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-6)

  mujoco.mj_inverse(mjm, mjd)
  inv = jax.jit(mi.inverse)(m, d.replace(qacc=jnp.asarray(mjd.qacc)))
  np.testing.assert_allclose(inv.qfrc_inverse, mjd.qfrc_inverse, atol=1e-6)
