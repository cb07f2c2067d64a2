"""Analytic SDF plugin geoms (ports of the reference's first-party set).

The reference's SDF plugins (``plugin/sdf/{torus,bowl,nut,bolt,gear}.cc``)
implement ``mjPLUGIN_SDF``: a signed distance + gradient in the geom's
own frame, consumed by the implicit-surface collider
(``src/engine/engine_collision_sdf.c``) and by compile-time marching
cubes.  Here each port is a pure-jnp distance function (gradients come
from ``jax.grad`` — the reference hand-writes them per shape) plus the
static AABB the collider seeds its descent inits from; the collision path
lives in ``ops/collision_sdf.py:make_plugin_narrowphase``.

Distance formulas are the same published shader-land constructions the
reference cites (iquilezles.org / shadertoy, per-file references below),
translated to branchless jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.plugins import registry

_SQRT12 = float(np.sqrt(2.0) / 2.0)


def _fract(x):
  return x - jnp.floor(x)


def _union(a, b):
  return jnp.minimum(a, b)


def _intersection(a, b):
  return jnp.maximum(a, b)


def _subtraction(a, b):
  return jnp.maximum(a, -b)


def _norm2(x, y):
  return jnp.sqrt(x * x + y * y + 1e-30)


class SdfGeomInstance(registry.PluginInstance):
  """Base: an analytic SDF shape instance.

  Subclasses set ``attr`` (np array, declared defaults applied) and
  implement ``sdf(x) -> distance`` (traceable, local frame) and
  ``aabb() -> (center(3), half(3))`` (static, the sdf_aabb analog)."""

  defaults: tuple = ()
  attr_names: tuple = ()

  def __init__(self, mjm, instance: int, dtype):
    attrs = registry.plugin_attrs(mjm, instance, self.attr_names)
    self.attr = np.array([
        float(attrs[n]) if attrs[n] else float(d)
        for n, d in zip(self.attr_names, self.defaults)])

  def sdf(self, x):
    raise NotImplementedError

  def aabb(self):
    raise NotImplementedError


class TorusInstance(SdfGeomInstance):
  """``mujoco.sdf.torus`` (ref plugin/sdf/torus.cc:28-31)."""

  attr_names = ("radius1", "radius2")
  defaults = (0.35, 0.15)

  def sdf(self, x):
    r1, r2 = self.attr
    q = _norm2(x[0], x[1]) - r1
    return _norm2(q, x[2]) - r2

  def aabb(self):
    r1, r2 = self.attr
    return np.zeros(3), np.array([r1 + r2, r1 + r2, r2])


class BowlInstance(SdfGeomInstance):
  """``mujoco.sdf.bowl`` (ref plugin/sdf/bowl.cc:28-38; a cut hollow
  sphere, iquilezles.org/articles/distfunctions)."""

  attr_names = ("height", "radius", "thickness")
  defaults = (0.4, 1.0, 0.02)

  def sdf(self, x):
    height, radius, thick = self.attr
    width = float(np.sqrt(max(radius * radius - height * height, 0.0)))
    q0, q1 = _norm2(x[0], x[1]), x[2]
    d_rim = _norm2(q0 - width, q1 - height)
    d_shell = jnp.abs(_norm2(q0, q1) - radius)
    return jnp.where(height * q0 < width * q1, d_rim, d_shell) - thick

  def aabb(self):
    _, radius, thick = self.attr
    return np.zeros(3), np.full(3, radius + thick)


def _hex_head(x, radius):
  """Hexagonal head clipped by cones (shared by bolt/nut,
  ref bolt.cc:48-61)."""
  k = 6.0 / np.pi / 2.0
  angle = -jnp.floor(jnp.arctan2(x[1], x[0]) * k + 0.5) / k
  s0, s1 = jnp.sin(angle), jnp.sin(angle + np.pi * 0.5)
  px = s1 * x[0] - s0 * x[1]
  head = px - 0.5
  head = _intersection(head, jnp.abs(x[2] + 0.25) - 0.25)
  head = _intersection(head, (x[2] + radius - 0.22) * _SQRT12)
  return head


_SCREW = 12.0


class BoltInstance(SdfGeomInstance):
  """``mujoco.sdf.bolt`` (ref plugin/sdf/bolt.cc:30-63; threaded screw +
  hex head, shadertoy.com/view/XtffzX)."""

  attr_names = ("radius",)
  defaults = (0.26,)

  def sdf(self, x):
    (r0,) = self.attr
    radius = _norm2(x[0], x[1]) - r0
    azimuth = jnp.arctan2(x[1], x[0])
    triangle = jnp.abs(_fract(x[2] * _SCREW - azimuth / np.pi / 2.0) - 0.5)
    thread = (radius - triangle / _SCREW) * _SQRT12
    bolt = _subtraction(thread, 0.5 - jnp.abs(x[2] + 0.5))
    cone = (x[2] - radius) * _SQRT12
    bolt = _subtraction(bolt, cone + 1.0 * _SQRT12)
    return _union(bolt, _hex_head(x, radius))

  def aabb(self):
    return np.zeros(3), np.array([0.6, 0.6, 1.0])


class NutInstance(SdfGeomInstance):
  """``mujoco.sdf.nut`` (ref plugin/sdf/nut.cc:30-63; the bolt's thread
  subtracted from a hex head)."""

  attr_names = ("radius",)
  defaults = (0.26,)

  def sdf(self, x):
    (r0,) = self.attr
    radius2 = _norm2(x[0], x[1]) - r0
    azimuth = jnp.arctan2(x[1], x[0])
    triangle = jnp.abs(_fract(x[2] * _SCREW - azimuth / np.pi / 2.0) - 0.5)
    thread2 = (radius2 - triangle / _SCREW) * _SQRT12
    cone2 = (x[2] - radius2) * _SQRT12
    hole = _subtraction(thread2, cone2 + 0.5 * _SQRT12)
    hole = _union(hole, -cone2 - 0.05 * _SQRT12)
    return _subtraction(_hex_head(x, radius2), hole)

  def aabb(self):
    return np.zeros(3), np.array([0.6, 0.6, 1.0])


class GearInstance(SdfGeomInstance):
  """``mujoco.sdf.gear`` (ref plugin/sdf/gear.cc:54-146; extruded
  involute gear profile, shadertoy.com/view/3lG3WR)."""

  attr_names = ("alpha", "diameter", "teeth", "thickness", "innerdiameter")
  defaults = (0.0, 2.8, 25.0, 0.2, -1.0)

  def sdf(self, x):
    alpha, D, N, thickness, innerD = self.attr
    psi = 3.096e-5 * N * N - 6.557e-3 * N + 0.551  # pressure angle
    R = D / 2.0
    Pd = N / D
    P = np.pi / Pd
    a = 1.0 / Pd
    Ro = (D + 2.0 * a) / 2.0
    h = 2.2 / Pd
    innerR = float(innerD / 2.0 if innerD >= 0.0 else Ro - h - 0.14 * D)
    Rb = D * float(np.cos(psi)) / 2.0
    alphaStride = P / R
    invAlpha = float(np.arccos(np.clip(Rb / R, -1.0, 1.0)))
    invPhi = float(np.tan(invAlpha)) - invAlpha
    shift = alphaStride / 2.0 - 2.0 * invPhi

    rho = _norm2(x[0], x[1])
    fi = jnp.arctan2(x[1], x[0]) + alpha
    mod = lambda v, y: v - y * jnp.floor(v / y)
    fia = mod(fi + shift / 2.0, alphaStride) - shift / 2.0
    fib = mod(-fi - shift + shift / 2.0, alphaStride) - shift / 2.0

    # involute tooth flanks (math.stackexchange.com/questions/1266689)
    safe_rho = jnp.maximum(rho, Rb + 1e-12)
    acos_rbRho = jnp.arccos(jnp.clip(Rb / safe_rho, -1.0, 1.0))
    ta = jnp.sqrt(jnp.maximum(safe_rho * safe_rho - Rb * Rb, 0.0))
    dista = jnp.where(rho > Rb, ta - Rb * (fia + acos_rbRho), -1.0e6)
    distb = jnp.where(rho > Rb, ta - Rb * (fib + acos_rbRho), -1.0e6)

    smooth_union = lambda p, q, k: (
        lambda hh: q * (1.0 - hh) + p * hh - k * hh * (1.0 - hh)
    )(jnp.clip(0.5 + 0.5 * (q - p) / k, 0.0, 1.0))
    smooth_intersection = lambda p, q, k: _subtraction(
        _intersection(p, q),
        smooth_union(_subtraction(p, q), _subtraction(q, p), k))

    gear_outer = rho - Ro
    gear_low_base = rho - (Ro - h)
    crown_base = rho - innerR
    cogs = _intersection(dista, distb)
    base_walls = _intersection(fia - (alphaStride - shift),
                               fib - (alphaStride - shift))
    cogs = _intersection(base_walls, cogs)
    cogs = smooth_intersection(gear_outer, cogs, 0.0035 * D)
    cogs = smooth_union(gear_low_base, cogs, Rb - Ro + h)
    cogs = _subtraction(cogs, crown_base)

    # the reference's early exits, applied as selects
    d2d = jnp.where(innerR - rho > 0.0, innerR - rho,
                    jnp.where(Ro - rho < -0.2, rho - Ro, cogs))

    # extrusion along z (gear.cc:45-49)
    w0, w1 = d2d, jnp.abs(x[2]) - thickness / 2.0
    outside = _norm2(jnp.maximum(w0, 0.0), jnp.maximum(w1, 0.0))
    return jnp.minimum(jnp.maximum(w0, w1), 0.0) + outside

  def aabb(self):
    _, D, _, thickness, _ = self.attr
    return np.zeros(3), np.array(
        [D / 2.0 * 1.25, D / 2.0 * 1.25, thickness / 2.0 * 1.1])


for _name, _cls in (
    ("mujoco.sdf.torus", TorusInstance),
    ("mujoco.sdf.bowl", BowlInstance),
    ("mujoco.sdf.bolt", BoltInstance),
    ("mujoco.sdf.nut", NutInstance),
    ("mujoco.sdf.gear", GearInstance),
):
  registry.register_plugin(
      _name, (lambda cls: lambda mjm, i, dt: cls(mjm, i, dt))(_cls))
