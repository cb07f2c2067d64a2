"""Taxel-grid touch sensor plugin (port of the reference capability).

Physics of ``mujoco.sensor.touch_grid`` (reference
``plugin/sensor/touch_grid.cc:249-374``): contacts whose welded bodies
include the sensor site's parent weld are read out as 6D contact forces
(``mj_contactForce``), rotated into the site frame, sign-flipped so they
act ON the sensor body, and permuted to (normal, tangent, tangent) =
(z, x, y).  Contact positions relative to the site are mapped to
spherical (azimuth, elevation) angles — the site frame points down -z —
and binned into a ``size[0] x size[1]`` taxel grid whose edges span the
field of view with an optional foveal deformation
(``touch_grid.cc:108-135``).  ``sensordata`` is ``nchannel`` stacked
frames, channel-major.

TPU-first form: the static-capacity contact set is processed as one
masked batch — per-slot forces from ``constraint.contact_forces_frame``,
a vectorized spherical transform, and two ``searchsorted`` lookups +
scatter-add per channel.  Inactive or out-of-FOV contacts carry zero
weight; no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.plugins import registry


def _fovea(x: np.ndarray, gamma: float) -> np.ndarray:
  """Linear/quintic interpolated foveal deformation (touch_grid.cc:108)."""
  if not gamma:
    return x
  g = np.clip(gamma, 0.0, 1.0)
  return g * x ** 5 + (1 - g) * x


def _bin_edges(size, fov, gamma):
  """(x_edges, y_edges) in radians (touch_grid.cc:118-135)."""
  xe = _fovea(np.linspace(-1.0, 1.0, size[0] + 1), gamma)
  ye = _fovea(np.linspace(-1.0, 1.0, size[1] + 1), gamma)
  return xe * fov[0] * np.pi / 180.0, ye * fov[1] * np.pi / 180.0


class TouchGridInstance(registry.PluginInstance):
  """Static taxel-grid config + the traceable sensor hook."""

  def __init__(self, mjm, instance: int, dtype):
    attrs = registry.plugin_attrs(
        mjm, instance, ("nchannel", "size", "fov", "gamma"))
    self.nchannel = int(float(attrs["nchannel"] or 1) or 1)
    if not 1 <= self.nchannel <= 6:
      raise NotImplementedError("touch_grid: nchannel must be in [1, 6]")
    self.size = [int(float(v)) for v in attrs["size"].split()]
    fov = [float(v) for v in attrs["fov"].split()]
    gamma = float(attrs["gamma"] or 0.0)
    if len(self.size) != 2 or len(fov) != 2:
      raise NotImplementedError("touch_grid: size/fov must be 2-vectors")
    xe, ye = _bin_edges(self.size, fov, gamma)
    npdt = np.dtype(dtype)
    self._x_edges = np.asarray(xe, npdt)
    self._y_edges = np.asarray(ye, npdt)
    self._mjm = mjm  # host model (static tables only)

  def sensor(self, m, d, sensor_id):
    """(nchannel * size[0] * size[1],) taxel histogram — the
    mjPLUGIN_SENSOR compute hook (touch_grid.cc:249)."""
    from mujoco_inversedynamicstest_tpu.ops import collision as coll_mod
    from mujoco_inversedynamicstest_tpu.ops import constraint as con_mod

    dtype = d.qpos.dtype
    sx, sy = self.size
    frame = sx * sy
    nout = self.nchannel * frame
    clay = coll_mod.contact_layout(m)
    if clay.ncon == 0:
      return jnp.zeros(nout, dtype)

    site_id = int(m.sensor_objid[sensor_id])
    weldid = m.body_weldid
    parent_body = int(weldid[m.site_bodyid[site_id]])
    parent_weld = int(weldid[parent_body])

    con = d.contact
    body1 = jnp.asarray(m.geom_bodyid)[con.geom1]
    body2 = jnp.asarray(m.geom_bodyid)[con.geom2]
    weld1 = jnp.asarray(weldid)[body1]
    weld2 = jnp.asarray(weldid)[body2]
    relevant = (weld1 == parent_weld) | (weld2 == parent_weld)
    active = con.dist < con.includemargin

    site_pos = d.site_xpos[site_id]
    site_mat = d.site_xmat[site_id]

    # 6D force in contact frame -> world -> site frame (rows of con.frame
    # are the frame axes, so world = frame^T @ f, matching the reference's
    # column-major mju_mulMatTVec3 on mjContact.frame)
    f6 = con_mod.contact_forces_frame(m, d)                  # (ncon, 6)
    fw = jnp.einsum("cab,cb->ca", con.frame.transpose(0, 2, 1), f6[:, :3])
    tw = jnp.einsum("cab,cb->ca", con.frame.transpose(0, 2, 1), f6[:, 3:])
    fs = fw @ site_mat                                       # mat^T @ v
    ts = tw @ site_mat
    # forces point small->large body; flip if the parent is the smaller
    flip = parent_body < jnp.maximum(body1, body2)
    sign = jnp.where(flip, -1.0, 1.0).astype(dtype)[:, None]
    fs, ts = fs * sign, ts * sign
    # permute xyz -> zxy: (normal, tangent, tangent) leading
    chans = jnp.stack(
        [fs[:, 2], fs[:, 0], fs[:, 1], ts[:, 2], ts[:, 0], ts[:, 1]],
        axis=1)                                              # (ncon, 6)

    # positions -> site frame -> spherical (touch_grid.cc:151-156)
    rel = (con.pos - site_pos) @ site_mat
    x, y, z = rel[:, 0], rel[:, 1], rel[:, 2]
    az = jnp.arctan2(x, -z)
    el = jnp.arctan2(y, jnp.sqrt(x * x + z * z))

    # 2D histogram: LowerBound == searchsorted(side='left');
    # idx==0 or idx==n_edges means out of field of view
    xe = jnp.asarray(self._x_edges)
    ye = jnp.asarray(self._y_edges)
    xi = jnp.searchsorted(xe, az)
    yi = jnp.searchsorted(ye, el)
    in_fov = (xi > 0) & (xi < sx + 1) & (yi > 0) & (yi < sy + 1)
    valid = relevant & active & in_fov
    taxel = (jnp.clip(yi - 1, 0, sy - 1) * sx
             + jnp.clip(xi - 1, 0, sx - 1))                  # (ncon,)

    w = jnp.where(valid[:, None], chans[:, :self.nchannel], 0.0)
    hist = jnp.zeros((self.nchannel, frame), dtype)
    hist = hist.at[:, taxel].add(w.T)
    return hist.reshape(nout)


def _factory(mjm, instance: int, dtype):
  return TouchGridInstance(mjm, instance, dtype)


registry.register_plugin("mujoco.sensor.touch_grid", _factory)
