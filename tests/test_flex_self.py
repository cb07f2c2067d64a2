"""Flex self-collision tests (ops/flexcol.py 'selfpair' groups).

Differential target: ``mj_collideElems`` on same-flex element pairs
(reference ``engine_collision_driver.c:469``; narrowphase
``mjc_ConvexElem``, margin forced to 0 for self pairs).  The C backend
is MPR/GJK, ours support direction descent — comparisons are
qualitative (contact activation + force directions), the
``test_collision_sdf.py`` protocol for CCD-backed pairs.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

import mujoco_inversedynamicstest_tpu as mi


def _sheet_xml(selfcollide="auto", pin=False, count="5 5 1"):
  pins = '<pin id="0"/><pin id="4"/>' if pin else ""
  return f"""
  <mujoco>
    <option timestep="0.001"/>
    <worldbody>
      <geom type="plane" size="2 2 .1"/>
      <flexcomp type="grid" count="{count}" spacing="0.08 0.08 0.08"
                radius="0.008" name="sheet" dim="2" mass="0.2"
                pos="0 0 0.2">
        <contact selfcollide="{selfcollide}" internal="false"/>
        <edge equality="true"/>
        {pins}
      </flexcomp>
    </worldbody>
  </mujoco>
  """


def test_selfcollide_loads_and_steps():
  """A flex with selfcollide enabled (the MJCF default 'auto') loads and
  simulates finite — the round-4 load refusal is gone."""
  mjm = mujoco.MjModel.from_xml_string(_sheet_xml())
  assert int(np.asarray(mjm.flex_selfcollide)[0]) != 0
  m = mi.put_model(mjm)
  d = jax.jit(lambda dd: mi.step(m, dd))(mi.make_data(m))
  assert np.isfinite(np.asarray(d.qpos)).all()


def _folded_state(mjm):
  """Folds the right columns of the 5x5 sheet back over the middle:
  two cloth layers 10 mm apart (< 2*radius = 16 mm shell contact)."""
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = mjm.qpos0
  folded = []
  for v in range(mjm.nflexvert):
    b = mjm.flex_vertbodyid[v]
    adr = mjm.jnt_qposadr[mjm.body_jntadr[b]]
    x = float(mjm.body_pos[b][0])     # slide joints are offsets from
    if x > 0.04:                      # body_pos; columns at x=0.08,0.16
      mjd.qpos[adr] = (0.12 - x) - x  # reflect about the fold line
      mjd.qpos[adr + 2] = 0.010       # second layer 10 mm above
      folded.append(v)
  return mjd, folded


def test_folded_sheet_contacts_match_c_qualitatively():
  """A folded sheet (two layers pressed within the shell distance)
  produces self contacts in both engines, with separating forces: the
  top layer accelerates up, the bottom layer down."""
  mjm = mujoco.MjModel.from_xml_string(_sheet_xml())
  mjd, folded = _folded_state(mjm)
  mujoco.mj_forward(mjm, mjd)
  # C side: element-element self contacts exist
  self_con = sum(
      1 for i in range(mjd.ncon)
      if mjd.contact[i].elem[0] >= 0 and mjd.contact[i].elem[1] >= 0)
  assert self_con > 0, "degenerate test: C reports no self contact"

  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.put_data(m, mjd)
  d = jax.jit(lambda dd: mi.forward(m, dd))(d)
  act = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
  assert act.sum() > 0, "no active self contacts"

  # force directions: compare the vertical acceleration sign pattern of
  # pressed vertices between engines (gravity is -9.81 on every lane;
  # a separating self-contact force makes top-layer vertices less
  # negative than free fall, bottom-layer more negative)
  qacc_ours = np.asarray(d.qacc)
  qacc_c = np.asarray(mjd.qacc)
  for v in folded[:8]:
    adr = mjm.jnt_dofadr[mjm.body_jntadr[mjm.flex_vertbodyid[v]]]
    az_c, az_ours = qacc_c[adr + 2], qacc_ours[adr + 2]
    if az_c > -9.0:   # C says this top-layer vertex is being pushed up
      assert az_ours > -9.81, (v, az_c, az_ours)


def test_folded_sheet_settles_like_c():
  """Rolled out side by side, the folded sheet keeps the same layer
  structure as the C engine: the fold-edge column slides off onto the
  plane in both, the rest stays layered a shell above the base sheet
  (sorted per-vertex heights within 5 mm — chaotic contact dynamics
  permute which interior vertex lands where)."""
  mjm = mujoco.MjModel.from_xml_string(_sheet_xml())
  mjd, folded = _folded_state(mjm)
  m = mi.put_model(mjm, dtype=jnp.float64)
  d = mi.put_data(m, mjd)
  step = jax.jit(lambda dd: mi.step(m, dd))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  z_c = np.sort([mjd.flexvert_xpos[v, 2] for v in folded])
  z_ours = np.sort([np.asarray(d.flexvert_xpos)[v, 2] for v in folded])
  np.testing.assert_allclose(z_ours, z_c, atol=5e-3)
  # both engines keep a layered (above-shell) population
  assert (z_ours > 0.012).sum() == (z_c > 0.012).sum()
