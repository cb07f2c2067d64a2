"""Differential tests: collision + contact dynamics vs the C engine."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi

BOUNCE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0.03 0.02 0.25">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""

CAPSULE_DROP = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.12" quat="0.98 0.05 0.17 0">
      <freejoint/>
      <geom type="capsule" size="0.04" fromto="-0.12 0 0 0.12 0 0" mass="0.4"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_DROP = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.1" quat="0.99 0.1 0.05 0.02">
      <freejoint/>
      <geom type="box" size="0.05 0.04 0.03" mass="0.4"/>
    </body>
  </worldbody>
</mujoco>
"""

SPHERES = """
<mujoco>
  <option timestep="0.002" gravity="0 0 0"/>
  <worldbody>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.08" mass="0.3"/>
    </body>
    <body pos="0.13 0.05 0.5">
      <freejoint/>
      <geom type="sphere" size="0.07" mass="0.2" friction="1.4 0.01 0.002"/>
    </body>
  </worldbody>
</mujoco>
"""

MIXED = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 0.1" friction="0.8 0.01 0.002"/>
    <body pos="0 0 0.3">
      <joint type="hinge" axis="0 1 0" pos="0 0 0.2" damping="0.1"/>
      <geom type="capsule" size="0.05" fromto="-0.15 0 0 0.15 0 0" mass="0.5"/>
    </body>
    <body pos="0.05 0.02 0.6">
      <freejoint/>
      <geom type="sphere" size="0.06" mass="0.2" priority="1" condim="6"
            friction="1.1 0.02 0.003"/>
    </body>
    <body pos="-0.2 0.1 0.45">
      <freejoint/>
      <geom type="capsule" size="0.03" fromto="0 -0.08 0 0 0.08 0" mass="0.15"
            condim="1"/>
    </body>
  </worldbody>
</mujoco>
"""

ALL_CONTACT = {
    "bounce": BOUNCE,
    "capsule_drop": CAPSULE_DROP,
    "box_drop": BOX_DROP,
    "spheres": SPHERES,
    "mixed": MIXED,
}


def _setup(xml, seed=0, qvel_scale=0.3):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(seed)
  mjd.qvel[:] = qvel_scale * rng.randn(mjm.nv)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  return mjm, mjd, m, d


def _match_contacts(mjd, d_out):
  """Maps C contacts to our active contact slots by (geom pair, position)."""
  ours_active = np.nonzero(
      np.array(d_out.contact.dist) < np.array(d_out.contact.includemargin)
  )[0]
  assert len(ours_active) == mjd.ncon, (
      f"active contacts {len(ours_active)} != C ncon {mjd.ncon}"
  )
  pairs = []
  used = set()
  for i in range(mjd.ncon):
    g1, g2 = mjd.contact.geom1[i], mjd.contact.geom2[i]
    best, best_d = None, np.inf
    for j in ours_active:
      if j in used:
        continue
      if (int(d_out.contact.geom1[j]), int(d_out.contact.geom2[j])) != (g1,
                                                                        g2):
        continue
      dd = np.linalg.norm(np.array(d_out.contact.pos[j]) - mjd.contact.pos[i])
      if dd < best_d:
        best, best_d = j, dd
    assert best is not None, f"no match for C contact {i} ({g1},{g2})"
    used.add(best)
    pairs.append((i, best))
  return pairs


@pytest.mark.parametrize("name", sorted(ALL_CONTACT))
@pytest.mark.parametrize("seed", [0, 1])
def test_contacts_match(name, seed):
  mjm, mjd, m, d = _setup(ALL_CONTACT[name], seed)
  mujoco.mj_forward(mjm, mjd)
  out = jax.jit(mi.fwd_position)(m, d)
  for ci, oj in _match_contacts(mjd, out):
    np.testing.assert_allclose(
        float(out.contact.dist[oj]), mjd.contact.dist[ci], atol=1e-10
    )
    np.testing.assert_allclose(
        np.array(out.contact.pos[oj]), mjd.contact.pos[ci], atol=1e-10
    )
    np.testing.assert_allclose(
        np.array(out.contact.frame[oj]).ravel(), mjd.contact.frame[ci],
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.array(out.contact.friction[oj]), mjd.contact.friction[ci],
        atol=1e-12,
    )
    assert int(out.contact.dim[oj]) == mjd.contact.dim[ci]


@pytest.mark.parametrize("name", sorted(ALL_CONTACT))
@pytest.mark.parametrize("seed", [0, 1])
def test_forward_contact(name, seed):
  mjm, mjd, m, d = _setup(ALL_CONTACT[name], seed)
  mujoco.mj_forward(mjm, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)
  np.testing.assert_allclose(
      out.qfrc_constraint, mjd.qfrc_constraint, atol=1e-6
  )


@pytest.mark.parametrize("name", sorted(ALL_CONTACT))
def test_step_contact(name):
  mjm, mjd, m, d = _setup(ALL_CONTACT[name])
  step = jax.jit(mi.step)
  for i in range(40):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-5)
  np.testing.assert_allclose(d.qvel, mjd.qvel, atol=1e-4)


@pytest.mark.parametrize("name", sorted(ALL_CONTACT))
def test_inverse_contact(name):
  """Inverse dynamics with contact forces vs mj_inverse."""
  mjm, mjd, m, d = _setup(ALL_CONTACT[name])
  rng = np.random.RandomState(9)
  mjd.qacc[:] = rng.randn(mjm.nv)
  mujoco.mj_inverse(mjm, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc))
  out = jax.jit(mi.inverse)(m, d)
  np.testing.assert_allclose(out.qfrc_inverse, mjd.qfrc_inverse, atol=1e-7)
