"""Differential tests: smooth dynamics vs the C MuJoCo engine.

Pattern follows the reference's MJX test strategy (reference
``mjx/mujoco/mjx/_src/smooth_test.py``): build mujoco.MjModel, randomize
state, run C ``mj_forward``, run our jitted stage functions, compare
field-by-field.
"""

import jax
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

from models import ALL_SMOOTH


def _randomize(mjm, mjd, seed):
  rng = np.random.RandomState(seed)
  mjd.qpos[:] = mjm.qpos0 + 0.3 * rng.randn(mjm.nq)
  # keep quaternions sane
  mujoco.mj_normalizeQuat(mjm, mjd.qpos)
  mjd.qvel[:] = 0.5 * rng.randn(mjm.nv)
  mjd.qacc[:] = rng.randn(mjm.nv)


def _setup(xml, seed=0):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  _randomize(mjm, mjd, seed)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


def _position_stage(m, d):
  d = mi.kinematics(m, d)
  d = mi.com_pos(m, d)
  d = mi.crb(m, d)
  d = mi.factor_m(m, d)
  return d


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
@pytest.mark.parametrize("seed", [0, 1])
def test_kinematics(name, seed):
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name], seed)
  d = jax.jit(mi.kinematics)(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-12)
  np.testing.assert_allclose(d.xpos, mjd.xpos, atol=1e-12)
  np.testing.assert_allclose(d.xquat, mjd.xquat.reshape(-1, 4), atol=1e-12)
  np.testing.assert_allclose(d.xmat, mjd.xmat.reshape(-1, 3, 3), atol=1e-12)
  np.testing.assert_allclose(d.xanchor, mjd.xanchor, atol=1e-12)
  np.testing.assert_allclose(d.xaxis, mjd.xaxis, atol=1e-12)
  np.testing.assert_allclose(d.xipos, mjd.xipos, atol=1e-12)
  np.testing.assert_allclose(d.ximat, mjd.ximat.reshape(-1, 3, 3), atol=1e-12)
  np.testing.assert_allclose(d.geom_xpos, mjd.geom_xpos, atol=1e-12)
  np.testing.assert_allclose(
      d.geom_xmat, mjd.geom_xmat.reshape(-1, 3, 3), atol=1e-12
  )


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
def test_com_pos(name):
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name])
  d = jax.jit(lambda m, d: mi.com_pos(m, mi.kinematics(m, d)))(m, d)
  np.testing.assert_allclose(d.subtree_com, mjd.subtree_com, atol=1e-11)
  np.testing.assert_allclose(d.cinert, mjd.cinert, atol=1e-11)
  np.testing.assert_allclose(d.cdof, mjd.cdof, atol=1e-11)


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
def test_crb_and_factor(name):
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name])
  d = jax.jit(_position_stage)(m, d)

  qm_ref = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm_ref)
  np.testing.assert_allclose(d.qM, qm_ref, atol=1e-11)

  # factorization checked through the solve: M^{-1} vec
  rng = np.random.RandomState(3)
  vec = rng.randn(mjm.nv)
  res_ref = vec.copy()
  mujoco.mj_solveM(mjm, mjd, res_ref.reshape(1, -1), vec.reshape(1, -1))
  res = jax.jit(mi.solve_m)(m, d, vec)
  np.testing.assert_allclose(res, res_ref, atol=1e-9)

  # mul_m round trip
  mul = jax.jit(mi.mul_m)(m, d, vec)
  mul_ref = np.zeros(mjm.nv)
  mujoco.mj_mulM(mjm, mjd, mul_ref, vec)
  np.testing.assert_allclose(mul, mul_ref, atol=1e-10)


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
@pytest.mark.parametrize("seed", [0, 2])
def test_com_vel(name, seed):
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name], seed)
  fn = lambda m, d: mi.com_vel(m, mi.com_pos(m, mi.kinematics(m, d)))
  d = jax.jit(fn)(m, d)
  np.testing.assert_allclose(d.cvel, mjd.cvel, atol=1e-11)
  np.testing.assert_allclose(d.cdof_dot, mjd.cdof_dot, atol=1e-11)


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
@pytest.mark.parametrize("flg_acc", [False, True])
def test_rne(name, flg_acc):
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name])

  def fn(m, d):
    d = mi.com_vel(m, mi.com_pos(m, mi.kinematics(m, d)))
    return mi.rne(m, d, flg_acc=flg_acc)

  qfrc = jax.jit(fn)(m, d)
  qfrc_ref = np.zeros(mjm.nv)
  mujoco.mj_rne(mjm, mjd, int(flg_acc), qfrc_ref)
  np.testing.assert_allclose(qfrc, qfrc_ref, atol=1e-10)


@pytest.mark.parametrize("name", sorted(ALL_SMOOTH))
def test_vmap_batching(name):
  """The whole position+velocity stage must vmap cleanly."""
  mjm, mjd, m, d = _setup(ALL_SMOOTH[name])
  batch = 4
  qpos = np.tile(np.array(d.qpos), (batch, 1)) + 0.01 * np.arange(batch)[:, None]
  ds = jax.vmap(lambda q: d.replace(qpos=q))(qpos)
  out = jax.jit(jax.vmap(_position_stage, in_axes=(None, 0)))(m, ds)
  assert out.qM.shape == (batch, mjm.nv, mjm.nv)
  assert not np.any(np.isnan(out.qM))


def test_blocked_ltdl_matches_dense():
  """Multi-mechanism scenes use the blocked factorization (one dense
  Cholesky per root subtree, ops/smooth.py _dof_blocks); it must agree
  with the dense (nv, nv) path exactly (same arithmetic per block)."""
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1"><freejoint/><geom type="sphere" size="0.1" mass="1"/></body>
      <body pos="1 0 1"><freejoint/><geom type="box" size="0.1 0.1 0.1" mass="2"/></body>
      <body pos="2 0 1">
        <joint type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
        <body pos="0.3 0 0">
          <joint type="hinge" axis="1 0 0"/>
          <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.3"/>
        </body>
      </body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mi.put_model(mjm)
  d = mi.make_data(m)
  d = d.replace(qpos=d.qpos + 0.01 * np.arange(mjm.nq))

  from mujoco_inversedynamicstest_tpu.ops.smooth import _dof_blocks

  blocks = _dof_blocks(m)
  assert blocks is not None and sorted(blocks) == [2, 6]
  assert len(blocks[6]) == 2 and len(blocks[2]) == 1

  def fk_factor(mm, dd):
    dd = mi.crb(mm, mi.com_pos(mm, mi.kinematics(mm, dd)))
    dd = mi.factor_m(mm, dd)
    return dd

  d_b = jax.jit(fk_factor)(m, d)
  m_dense = m.replace(force_dense_ltdl=True)
  d_d = jax.jit(fk_factor)(m_dense, d)

  rng = np.random.RandomState(0)
  x = rng.randn(mjm.nv)
  y_b = jax.jit(lambda mm, dd, xx: mi.solve_m(mm, dd, xx))(m, d_b, x)
  y_d = jax.jit(lambda mm, dd, xx: mi.solve_m(mm, dd, xx))(m_dense, d_d, x)
  np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_d), atol=1e-12)
  # and against the C engine's M solve
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = np.asarray(d.qpos)
  mujoco.mj_forward(mjm, mjd)
  res = x.copy()
  mujoco.mj_solveM(mjm, mjd, res.reshape(1, -1), x.reshape(1, -1))
  np.testing.assert_allclose(np.asarray(y_b), res, atol=1e-10)
