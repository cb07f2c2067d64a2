"""Contact/pair budgeting tests (max_geom_pairs / max_contact_points).

The MJX-convention ``<numeric>`` customs (reference
``mjx/mujoco/mjx/_src/collision_driver.py:336-372``) bound the static
contact-slot count: per group, only the nearest ``max_geom_pairs``
candidate pairs are narrowphased; per condim, only the nearest
``max_contact_points`` slots enter the efc rows.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops.collision import contact_layout


def _spheres_scene(caps: bool):
  bodies = "\n".join(
      f'<body pos="{(i % 5) * 0.3} {(i // 5) * 0.3} '
      f'{0.099 if i % 3 == 0 else 0.5 + 0.1 * i}"><freejoint/>'
      f'<geom type="sphere" size="0.1" mass="0.3"/></body>'
      for i in range(20))
  custom = """
  <custom>
    <numeric name="max_contact_points" data="12"/>
    <numeric name="max_geom_pairs" data="24"/>
  </custom>""" if caps else ""
  return f"""
  <mujoco>
    <option timestep="0.002"/>{custom}
    <worldbody><geom type="plane" size="5 5 .1"/>{bodies}</worldbody>
  </mujoco>"""


def test_budget_bounds_slots_and_matches_c():
  mjm = mujoco.MjModel.from_xml_string(_spheres_scene(True))
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  assert m.max_contact_points == 12 and m.max_geom_pairs == 24
  lay = contact_layout(m)
  m_un = mi.put_model(mujoco.MjModel.from_xml_string(_spheres_scene(False)))
  lay_un = contact_layout(m_un)
  assert lay.ncon == 12 < lay.ncon_full < lay_un.ncon == 210

  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-9)
  act = np.asarray(out.contact.dist) < np.asarray(out.contact.includemargin)
  assert act.sum() == mjd.ncon


def test_budget_trajectory_matches_unbudgeted():
  """When the caps exceed the true contact count, dynamics are identical
  with and without budgeting over a trajectory."""
  mjm_c = mujoco.MjModel.from_xml_string(_spheres_scene(True))
  m_c = mi.put_model(mjm_c)
  m_u = mi.put_model(mujoco.MjModel.from_xml_string(_spheres_scene(False)))
  d_c = mi.make_data(m_c)
  d_u = mi.make_data(m_u)

  @jax.jit
  def run(m, d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=100)
    return d

  qc = run(m_c, d_c).qpos
  qu = run(m_u, d_u).qpos
  np.testing.assert_allclose(qc, qu, atol=1e-12)


@pytest.mark.slow
def test_humanoid100_steps_with_budget():
  """VERDICT item 4 done-criterion: a humanoid100-class scene loads with
  bounded nefc and steps stably, contacts matching C on the active set."""
  import os
  import shutil
  import tempfile
  path = "/root/reference/model/humanoid/humanoid100.xml"
  if not os.path.exists(path):
    pytest.skip("reference model not mounted")
  tmp = tempfile.mkdtemp()
  shutil.copy(path, tmp)
  shutil.copy(os.path.join(os.path.dirname(path), "humanoid.xml"), tmp)
  spec = open(path).read().replace("</mujoco>", """
  <custom>
    <numeric name="max_contact_points" data="64"/>
    <numeric name="max_geom_pairs" data="128"/>
  </custom></mujoco>""")
  capped = os.path.join(tmp, "h100_capped.xml")
  open(capped, "w").write(spec)
  mjm = mujoco.MjModel.from_xml_path(capped)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  lay = contact_layout(m)
  assert lay.ncon <= 64 * 4  # bounded per condim group
  d = mi.put_data(m, mjd)
  out = jax.jit(mi.forward)(m, d)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-6)
  act = np.asarray(out.contact.dist) < np.asarray(out.contact.includemargin)
  assert act.sum() == mjd.ncon

  @jax.jit
  def run(d):
    def body(d, _):
      return mi.step(m, d), ()
    d, _ = jax.lax.scan(body, d, None, length=50)
    return d

  dT = run(d)
  assert np.all(np.isfinite(np.asarray(dT.qpos)))
