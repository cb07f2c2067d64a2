"""Viewer driver logic (headless): watch pane + loop plumbing."""

import numpy as np

import mujoco_inversedynamicstest_tpu as mi

XML = """<mujoco><worldbody><body pos="0 0 1">
<joint type="hinge" axis="0 1 0"/>
<geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="1"/>
</body></worldbody></mujoco>"""


def test_headless_loop_with_watch(capsys):
  m = mi.load_model(XML)
  out = mi.viewer.launch(m, max_steps=5, watch="qpos", watch_every=0.0,
                         _headless_smoke=True)
  assert np.isfinite(np.asarray(out.qpos)).all()
  assert "[watch]" in capsys.readouterr().out


def test_headless_loop_with_profiler_pane(capsys):
  m = mi.load_model(XML)
  out = mi.viewer.launch(m, max_steps=5, profile=True, profile_every=0.0,
                         _headless_smoke=True)
  assert np.isfinite(np.asarray(out.qpos)).all()
  text = capsys.readouterr().out
  assert "[profile]" in text and "steps/s" in text and "newton iters" in text


def test_profiler_pane_batched_lane(capsys):
  import jax

  m = mi.load_model(XML)
  d0 = mi.make_data(m)
  batch = jax.vmap(lambda _: d0)(np.arange(3))
  mi.viewer.launch(m, batch, index=1, max_steps=4, profile=True,
                   profile_every=0.0, _headless_smoke=True)
  assert "[profile]" in capsys.readouterr().out


def test_unknown_watch_field_refused():
  m = mi.load_model(XML)
  try:
    mi.viewer.launch(m, max_steps=1, watch="nope", _headless_smoke=True)
  except AttributeError as e:
    assert "nope" in str(e)
  else:
    raise AssertionError("bad watch field accepted")
