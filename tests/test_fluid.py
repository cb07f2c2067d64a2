"""Inertia-box fluid model — differential tests vs C MuJoCo.

Reference: ``mj_inertiaBoxFluidModel`` (``src/engine/engine_passive.c:527``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco

import mujoco_inversedynamicstest_tpu as mi
from mujoco_inversedynamicstest_tpu.ops import forward as fwd

_XML = """<mujoco>
<option density="{density}" viscosity="{viscosity}" wind="{wind}"/>
<worldbody>
  <body pos="0 0 1"><freejoint/><geom type="box" size=".1 .05 .2" mass="1"/>
    <body pos="0.2 0 0"><joint type="hinge" axis="0 1 0"/>
      <geom type="capsule" size=".03" fromto="0 0 0 .3 0 0" mass=".4"/>
    </body>
  </body>
</worldbody></mujoco>"""


@pytest.mark.parametrize("density,viscosity,wind", [
    (1.2, 0.0, "0 0 0"),            # drag/lift only
    (0.0, 0.0002, "0 0 0"),         # viscosity only
    (1.2, 0.0002, "0.5 -0.3 0.1"),  # both + wind
])
def test_fluid_matches_c(density, viscosity, wind):
  xml = _XML.format(density=density, viscosity=viscosity, wind=wind)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(1)
  mjd.qpos[:] = mjm.qpos0
  mjd.qpos[2] += 0.2
  mjd.qvel[:] = rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)

  m = mi.put_model(mjm)
  assert m.has_fluid
  d = mi.make_data(m).replace(
      qpos=jnp.asarray(mjd.qpos), qvel=jnp.asarray(mjd.qvel)
  )
  d = jax.jit(lambda d: fwd.forward(m, d))(d)

  np.testing.assert_allclose(
      np.asarray(d.qfrc_fluid), mjd.qfrc_fluid, atol=1e-12
  )
  np.testing.assert_allclose(
      np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-12
  )
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-10)


def test_no_fluid_is_static_noop():
  xml = _XML.format(density=0, viscosity=0, wind="0 0 0")
  m = mi.put_model(mujoco.MjModel.from_xml_string(xml))
  assert not m.has_fluid
  d = mi.make_data(m)
  d = fwd.forward(m, d)
  assert float(jnp.abs(d.qfrc_fluid).max()) == 0.0


ELLIPSOID_FLUID_XML = """
<mujoco>
  <option density="1.2" viscosity="0.00002" wind="0.5 -0.3 0.1"
          timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1"><freejoint/>
      <geom type="ellipsoid" size="0.08 0.05 0.03" mass="0.2"
            fluidshape="ellipsoid" fluidcoef="0.5 0.25 1.5 1.0 1.0"/></body>
    <body pos="0.5 0 1"><freejoint/>
      <geom type="capsule" size="0.03 0.1" mass="0.1"
            fluidshape="ellipsoid"/>
      <geom type="sphere" size="0.05" pos="0.2 0 0" mass="0.1"/></body>
    <body pos="1 0 1"><freejoint/>
      <geom type="box" size="0.05 0.04 0.03" mass="0.2"/></body>
  </worldbody>
</mujoco>"""


def test_ellipsoid_fluid_model():
  """Ellipsoid fluid (added mass, Magnus/Kutta lift, blunt/slender/angular
  drag; ref ``mj_ellipsoidFluidModel``, engine_passive.c:588) matches C,
  coexisting with inertia-box bodies in the same model."""
  mjm = mujoco.MjModel.from_xml_string(ELLIPSOID_FLUID_XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.RandomState(0)
  mjd.qvel[:] = rng.randn(mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mi.put_model(mjm)
  d = mi.put_data(m, mjd)
  out = jax.jit(lambda dd: fwd.forward(m, dd))(d)
  np.testing.assert_allclose(out.qfrc_fluid, mjd.qfrc_fluid, atol=1e-12)
  np.testing.assert_allclose(out.qacc, mjd.qacc, atol=1e-10)

  step = jax.jit(mi.step)
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  np.testing.assert_allclose(d.qpos, mjd.qpos, atol=1e-12)
