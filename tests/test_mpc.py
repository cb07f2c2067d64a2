"""MPC driver tests + BASELINE torque-parity checks.

BASELINE configs covered here:
* slider_crank single-step inverse torque check vs CPU ``mj_inverse``
  (reference ``model/slider_crank/slider_crank.xml`` scaled down to the
  inline test model; parity target 1e-4, we assert far tighter);
* arm reach iLQR-MPC: plan torques reproduced by the inverse-dynamics
  pipeline and validated against CPU ``mj_inverse`` on the rolled-out
  trajectory (the fork's own harness pattern, reference
  ``src/inverse/inverse_test.cpp:62-125``).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu import opt

from models import SLIDER_CRANK

ARM = """
<mujoco>
  <option timestep="0.01"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j0" type="hinge" axis="0 1 0" damping="0.15"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.6"/>
      <body pos="0.25 0 0">
        <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j0" gear="1" ctrlrange="-3 3"/>
    <motor joint="j1" gear="1" ctrlrange="-3 3"/>
  </actuator>
</mujoco>
"""


def test_slider_crank_inverse_parity():
  """BASELINE config 1: slider_crank inverse torque check vs CPU."""
  mjm = mujoco.MjModel.from_xml_string(SLIDER_CRANK)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qpos[:] = 0.1 * rng.randn(mjm.nq)
  mjd.qvel[:] = 0.3 * rng.randn(mjm.nv)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)

  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(lambda dd: mi.inverse(m, dd))(d)
  np.testing.assert_allclose(
      out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-9
  )


def test_mpc_stabilizes_arm_and_torque_parity():
  """Receding-horizon MPC drives the arm to a target; the plan's inverse
  torques match CPU mj_inverse along the executed trajectory."""
  mjm = mujoco.MjModel.from_xml_string(ARM)
  m = mi.put_model(mjm)
  d0 = mi.make_data(m)

  q_target = jnp.asarray([0.7, -0.4])

  def cost(mm, s, u, t):
    dq = s.qpos - q_target
    return 0.02 * u @ u + 2.0 * dq @ dq + 0.05 * s.qvel @ s.qvel

  cfg = opt.MPCConfig(
      horizon=20,
      ilqr=opt.ILQRConfig(iterations=4, n_alpha=6),
      n_apply=1,
  )
  n_replan = 60
  run = jax.jit(
      lambda d: opt.run_mpc(m, cost, d, n_replan, cfg)
  )(d0)

  q_final = np.asarray(run.ds.qpos)
  assert np.linalg.norm(q_final - np.asarray(q_target)) < 0.1, q_final

  # --- torque parity along the executed trajectory (fork's harness
  # pattern: replay states through both inverse pipelines) ---
  mjd = mujoco.MjData(mjm)
  d = d0
  step = jax.jit(mi.step)
  inv = jax.jit(lambda dd: mi.inverse(m, dd))
  us = np.asarray(run.us)
  max_err = 0.0
  for t in range(us.shape[0]):
    d_prev = d
    d = step(m, d.replace(ctrl=jnp.asarray(us[t])))
    qacc = (np.asarray(d.qvel) - np.asarray(d_prev.qvel)) / mjm.opt.timestep

    # CPU inverse at the pre-step state with the realized acceleration
    mjd.qpos[:] = np.asarray(d_prev.qpos)
    mjd.qvel[:] = np.asarray(d_prev.qvel)
    mjd.qacc[:] = qacc
    mujoco.mj_inverse(mjm, mjd)

    ours = inv(
        d_prev.replace(qacc=jnp.asarray(qacc))
    ).qfrc_inverse
    max_err = max(max_err, float(np.abs(ours - mjd.qfrc_inverse).max()))
  assert max_err < 1e-6, f"inverse torque mismatch: {max_err}"


def test_mpc_fleet_vmap():
  """A fleet of MPC problems runs as one vmapped computation."""
  mjm = mujoco.MjModel.from_xml_string(ARM)
  m = mi.put_model(mjm)
  d0 = mi.make_data(m)
  nfleet = 3
  rng = np.random.RandomState(1)
  qpos0 = jnp.asarray(0.2 * rng.randn(nfleet, mjm.nq))
  batch = jax.vmap(lambda q: d0.replace(qpos=q))(qpos0)

  def cost(mm, s, u, t):
    return 0.05 * u @ u + s.qpos @ s.qpos + 0.05 * s.qvel @ s.qvel

  cfg = opt.MPCConfig(horizon=10, ilqr=opt.ILQRConfig(iterations=3))
  run = jax.jit(
      jax.vmap(lambda d: opt.run_mpc(m, cost, d, 5, cfg))
  )(batch)
  assert run.us.shape == (nfleet, 5, mjm.nu)
  assert np.all(np.isfinite(np.asarray(run.us)))
