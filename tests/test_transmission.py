"""Transmission + equality tail differential tests vs the C engine.

Covers slider-crank (ref ``engine_core_smooth.c:988``), site transmission
with refsite (:1105), body/adhesion transmission (:1229), and tendon
equality coupling (``engine_core_constraint.c:640``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

SLIDERCRANK = """
<mujoco><option timestep="0.002"/>
<worldbody>
  <body name="crank" pos="0 0 0.5">
    <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
    <geom type="capsule" size="0.02" fromto="0 0 0 0.15 0 0" mass="0.3"/>
    <site name="cranksite" pos="0.15 0 0"/></body>
  <body name="slider" pos="0.4 0 0.5">
    <joint type="slide" axis="1 0 0" damping="0.2"/>
    <geom type="box" size="0.04 0.02 0.02" mass="0.2"/>
    <site name="slidersite" euler="0 90 0"/></body>
</worldbody>
<actuator><general cranksite="cranksite" slidersite="slidersite"
  cranklength="0.3" gear="2"/></actuator>
</mujoco>"""

REFSITE = """
<mujoco><option timestep="0.002"/>
<worldbody>
  <site name="ref" pos="0.1 0 0.9" euler="0 20 0"/>
  <body pos="0 0 1"><joint type="hinge" axis="0 1 0" damping="0.1"/>
    <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
    <body pos="0.2 0 0"><joint type="slide" axis="0 0 1" damping="0.1"/>
      <geom type="box" size="0.02 0.02 0.02" mass="0.1"/>
      <site name="s" euler="10 0 0"/></body></body>
</worldbody>
<actuator><position site="s" refsite="ref" kp="3" gear="1 0.5 0 0.2 0 1"/>
</actuator>
</mujoco>"""

TENDON_EQ = """
<mujoco><option timestep="0.002"/>
<worldbody>
  <body pos="0 0 1"><joint name="j1" type="hinge" axis="0 1 0"/>
    <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
    <site name="a1" pos="0.2 0 0"/></body>
  <body pos="0.5 0 1"><joint name="j2" type="hinge" axis="0 1 0"/>
    <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
    <site name="a2" pos="0.2 0 0"/></body>
  <site name="w0" pos="0 0 1.3"/><site name="w1" pos="0.5 0 1.3"/>
</worldbody>
<tendon>
  <spatial name="t1"><site site="w0"/><site site="a1"/></spatial>
  <spatial name="t2"><site site="w1"/><site site="a2"/></spatial>
</tendon>
<equality><tendon tendon1="t1" tendon2="t2" polycoef="0 1 0.3 0 0"/>
</equality>
</mujoco>"""

ADHESION = """
<mujoco><option timestep="0.002"/>
<worldbody>
  <geom type="plane" size="1 1 .1"/>
  <body name="gripper" pos="0 0 0.099"><freejoint/>
    <geom type="sphere" size="0.1" mass="0.5"/></body>
</worldbody>
<actuator><adhesion body="gripper" ctrlrange="0 5" gain="10"/></actuator>
</mujoco>"""


def _dense_moment(mjm, mjd):
  """Reconstructs the dense (nu, nv) moment from the sparse C storage
  (moment_rownnz/rowadr/colind, the mjData layout since MuJoCo 3.2)."""
  out = np.zeros((mjm.nu, mjm.nv))
  flat = np.asarray(mjd.actuator_moment).reshape(-1)
  for i in range(mjm.nu):
    adr, nnz = mjd.moment_rowadr[i], mjd.moment_rownnz[i]
    for k in range(nnz):
      out[i, mjd.moment_colind[adr + k]] = flat[adr + k]
  return out


def _check(xml, ctrl=None, vel=0.2, nstep=40, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = vel * rng.randn(mjm.nv)
  if ctrl is not None:
    mjd.ctrl[:] = ctrl
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-9)
  np.testing.assert_allclose(
      out.actuator_length, mjd.actuator_length, atol=1e-12)
  np.testing.assert_allclose(
      out.actuator_moment, _dense_moment(mjm, mjd), atol=1e-12)
  step = jax.jit(mi.step)
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-10)


def test_slidercrank():
  _check(SLIDERCRANK, ctrl=[0.5])


def test_slidercrank_reference_model():
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
  np.testing.assert_allclose(
      out.actuator_length, mjd.actuator_length, atol=1e-12)
  # BASELINE config 1: single-step inverse torque check
  mujoco.mj_inverse(mjm, mjd)
  inv = jax.jit(mi.inverse)(m, d.replace(qacc=jnp.asarray(mjd.qacc)))
  np.testing.assert_allclose(inv.qfrc_inverse, mjd.qfrc_inverse, atol=1e-8)


def test_site_refsite():
  _check(REFSITE, ctrl=[0.3])


def test_tendon_equality():
  _check(TENDON_EQ)


def test_adhesion_body_transmission():
  _check(ADHESION, ctrl=[2.0], vel=0.05)


def test_adhesion_holds_against_gravity():
  """With enough adhesion gain the sphere sticks to the floor."""
  mjm = mujoco.MjModel.from_xml_string(ADHESION)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  d = d.replace(ctrl=jnp.asarray([3.0]), qvel=jnp.zeros(6).at[2].set(0.5))

  @jax.jit
  def run(d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=150)
    return d

  dT = run(d)
  assert abs(float(dT.qpos[2]) - 0.099) < 0.005  # still on the floor
