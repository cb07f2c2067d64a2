"""Offscreen rendering: device state in, RGB/depth/segmentation out.

Analog of the reference's ``python/mujoco/renderer.py`` (`Renderer`,
reference ``python/mujoco/renderer.py:27-337``).  SURVEY §1 maps L4
visualization to *delegation*: rendering is a host/GL concern with no TPU
equivalent, so this module streams device ``Data`` into a host ``MjData``
via ``models/interop.get_data`` and hands it to the reference renderer.
The value added here is the batch plumbing: rendering a lane of a vmapped
fleet, or a (batch, height, width, 3) stack of frames in one call.

Usage::

    import mujoco_inversedynamicstest_tpu as mi
    r = mi.renderer.Renderer(m, height=240, width=320)
    rgb = r.render(d)                      # one frame
    rgb = r.render(fleet, index=3)         # lane 3 of a fleet
    frames = r.render_batch(fleet)         # whole fleet -> (B, H, W, 3)
    depth = r.render(d, depth=True)
    seg = r.render(d, segmentation=True)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.models import interop


class Renderer:
  """Offscreen renderer over the host GL contexts (EGL/OSMesa/GLFW).

  Thin delegation: owns one ``mujoco.Renderer`` and one scratch ``MjData``;
  ``render`` copies the device state across (primary state only — the C
  engine recomputes derived quantities for a consistent scene) and returns
  the pixels.
  """

  def __init__(self, m: Model, height: int = 240, width: int = 320,
               max_geom: int = 10000):
    import mujoco

    self._m = m
    self._src = interop._source(m)
    self._mjd = mujoco.MjData(self._src)
    self._renderer = mujoco.Renderer(
        self._src, height=height, width=width, max_geom=max_geom)

  @property
  def model(self):
    return self._src

  def render(self, d: Data, *, index: Optional[int] = None,
             camera=-1, depth: bool = False, segmentation: bool = False,
             scene_option=None) -> np.ndarray:
    """Renders one frame from a Data (or lane ``index`` of a batch).

    Returns (H, W, 3) uint8 RGB by default; (H, W) float32 depth with
    ``depth=True``; (H, W, 2) int32 (objid, objtype) with
    ``segmentation=True`` — the reference Renderer's three output modes.
    """
    if d.qpos.ndim == 2:
      d = jax.tree.map(lambda x: x[0 if index is None else index], d)
    interop.get_data(self._m, d, mjd=self._mjd, recompute=True)

    if depth:
      self._renderer.enable_depth_rendering()
    elif segmentation:
      self._renderer.enable_segmentation_rendering()
    try:
      self._renderer.update_scene(
          self._mjd, camera=camera, scene_option=scene_option)
      return self._renderer.render()
    finally:
      if depth:
        self._renderer.disable_depth_rendering()
      elif segmentation:
        self._renderer.disable_segmentation_rendering()

  def render_batch(self, d: Data, *, camera=-1, depth: bool = False,
                   segmentation: bool = False, scene_option=None
                   ) -> np.ndarray:
    """Renders every lane of a vmapped Data batch -> stacked pixels.

    One bulk device->host transfer for the whole batch (instead of one
    per lane), then per-lane host renders.
    """
    if d.qpos.ndim != 2:
      raise ValueError("render_batch expects a vmapped (batched) Data")
    host = jax.device_get(d)
    n = host.qpos.shape[0]
    return np.stack([
        self.render(jax.tree.map(lambda x: x[i], host), camera=camera,
                    depth=depth, segmentation=segmentation,
                    scene_option=scene_option)
        for i in range(n)
    ])

  def close(self):
    self._renderer.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
