"""Tendon wrapping geometry and muscle curves — branchless JAX.

Capability parity with the reference's tendon-wrap / muscle utilities
(reference ``src/engine/engine_util_misc.c``: ``mju_wrap``:284,
``wrap_circle``:79, ``wrap_inside``:160, ``is_intersect``:35,
``length_circle``:55, ``mju_muscleGain``/``Bias``/``Dynamics``:430-630,
``mju_sigmoid``:1470), re-expressed as pure branchless functions (``where``
selects instead of early returns, fixed-iteration Newton instead of a
convergence loop) so they trace once under ``jit`` and batch under ``vmap``.
All "no wrap" early-exits become a returned ``wlen < 0`` sentinel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.ops import math

_MINVAL = 1e-15
_BIG = 1e10


def _norm2(v):
  return jnp.sqrt(jnp.sum(v * v, axis=-1))


def _normalize2(v):
  n = _norm2(v)
  safe = jnp.where(n < _MINVAL, 1.0, n)
  return v / safe, n


def _is_intersect(p1, p2, p3, p4):
  """True if 2D segments (p1,p2) and (p3,p4) intersect (ref :35)."""
  det = (p4[1] - p3[1]) * (p2[0] - p1[0]) - (p4[0] - p3[0]) * (p2[1] - p1[1])
  safe_det = jnp.where(jnp.abs(det) < _MINVAL, 1.0, det)
  a = ((p4[0] - p3[0]) * (p1[1] - p3[1])
       - (p4[1] - p3[1]) * (p1[0] - p3[0])) / safe_det
  b = ((p2[0] - p1[0]) * (p1[1] - p3[1])
       - (p2[1] - p1[1]) * (p1[0] - p3[0])) / safe_det
  hit = (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
  return jnp.where(jnp.abs(det) < _MINVAL, False, hit)


def _length_circle(p0, p1, ind, radius):
  """Arc length from p0 to p1 along circle; ind selects orientation (ref :55)."""
  p0n, _ = _normalize2(p0)
  p1n, _ = _normalize2(p1)
  angle = jnp.arccos(jnp.clip(jnp.dot(p0n, p1n), -1.0, 1.0))
  cross = p0[1] * p1[0] - p0[0] * p1[1]
  flip = ((cross > 0) & ind) | ((cross < 0) & ~ind)
  angle = jnp.where(flip, 2 * jnp.pi - angle, angle)
  return radius * angle


def wrap_circle(end0, end1, side, has_side, radius):
  """2D circle wrap (ref ``wrap_circle``:79).

  Returns ``(wlen, pnt0, pnt1)``; ``wlen < 0`` means no wrap.  ``side`` is
  the 2D side-point direction already rescaled to the circle (or zeros).
  """
  sqlen0 = jnp.dot(end0, end0)
  sqlen1 = jnp.dot(end1, end1)
  sqrad = radius * radius

  dif = end1 - end0
  dd = jnp.dot(dif, dif)

  # nearest point on the segment to the origin
  a = jnp.clip(-jnp.dot(dif, end0) / jnp.where(dd < _MINVAL, 1.0, dd), 0.0, 1.0)
  closest = a * dif + end0

  no_wrap = (
      (sqlen0 < sqrad) | (sqlen1 < sqrad) | (radius < _MINVAL)
      | (dd < _MINVAL)
      | ((jnp.dot(closest, closest) > sqrad)
         & (~has_side | (jnp.dot(side, closest) >= 0)))
  )

  sqrt0 = jnp.sqrt(jnp.maximum(sqlen0 - sqrad, 0.0))
  sqrt1 = jnp.sqrt(jnp.maximum(sqlen1 - sqrad, 0.0))
  safe0 = jnp.where(sqlen0 < _MINVAL, 1.0, sqlen0)
  safe1 = jnp.where(sqlen1 < _MINVAL, 1.0, sqlen1)

  def tangents(sgn):
    t0 = jnp.stack([
        (end0[0] * sqrad + sgn * radius * end0[1] * sqrt0) / safe0,
        (end0[1] * sqrad - sgn * radius * end0[0] * sqrt0) / safe0,
    ])
    t1 = jnp.stack([
        (end1[0] * sqrad - sgn * radius * end1[1] * sqrt1) / safe1,
        (end1[1] * sqrad + sgn * radius * end1[0] * sqrt1) / safe1,
    ])
    return t0, t1

  sol0 = tangents(1.0)
  sol1 = tangents(-1.0)

  def goodness(sol):
    t0, t1 = sol
    mid, _ = _normalize2(t0 + t1)
    g_side = jnp.dot(mid, side)
    g_short = -jnp.dot(t0 - t1, t0 - t1)
    g = jnp.where(has_side, g_side, g_short)
    return jnp.where(_is_intersect(end0, t0, end1, t1), -10000.0, g)

  pick0 = goodness(sol0) > goodness(sol1)
  p0 = jnp.where(pick0, sol0[0], sol1[0])
  p1 = jnp.where(pick0, sol0[1], sol1[1])

  no_wrap = no_wrap | _is_intersect(end0, p0, end1, p1)
  # ind is the chosen solution INDEX (0: sgn=+1, 1: sgn=−1) as in ref :55
  wlen = _length_circle(p0, p1, ~pick0, radius)
  return jnp.where(no_wrap, -1.0, wlen), p0, p1


def wrap_inside(end0, end1, radius, maxiter: int = 20,
                z_init: float = 1.0 - 1e-7, tolerance: float = 1e-6):
  """2D inside wrap (ref ``wrap_inside``:160): both tangent points coincide.

  Returns ``(wlen, pnt0, pnt1)`` with ``wlen`` 0 (wrap, zero arc) or -1.
  Newton root-find of ``asin(A z) + asin(B z) - 2 asin(z) + G = 0`` run for
  a fixed ``maxiter`` iterations with masked updates.
  """
  len0 = _norm2(end0)
  len1 = _norm2(end1)
  dif = end1 - end0
  dd = jnp.dot(dif, dif)

  no_wrap = (
      (len0 <= radius) | (len1 <= radius) | (radius < _MINVAL)
      | (len0 < _MINVAL) | (len1 < _MINVAL)
  )
  # segment-circle intersection: no wrap
  a = -jnp.dot(dif, end0) / jnp.where(dd < _MINVAL, 1.0, dd)
  closest = end0 + a * dif
  seg_hits = (dd > _MINVAL) & (a > 0) & (a < 1) & (_norm2(closest) <= radius)
  no_wrap = no_wrap | seg_hits

  # numerical-failure default: average direction on the circle
  pdef, _ = _normalize2(0.5 * (end0 + end1))
  pdef = pdef * radius

  safe_l0 = jnp.maximum(len0, _MINVAL)
  safe_l1 = jnp.maximum(len1, _MINVAL)
  A = radius / safe_l0
  B = radius / safe_l1
  cosG = (len0 * len0 + len1 * len1 - dd) / (2 * safe_l0 * safe_l1)
  degenerate = cosG < -1 + _MINVAL          # opposite: no wrap
  trivial = cosG > 1 - _MINVAL              # same direction: default point
  G = jnp.arccos(jnp.clip(cosG, -1.0, 1.0))

  def f(z):
    return (jnp.arcsin(jnp.clip(A * z, -1.0, 1.0))
            + jnp.arcsin(jnp.clip(B * z, -1.0, 1.0))
            - 2 * jnp.arcsin(jnp.clip(z, -1.0, 1.0)) + G)

  z0 = jnp.asarray(z_init, dtype=end0.dtype)
  # failed=True → keep the default point (reference returns 0 with default)
  failed = f(z0) > 0

  def body(carry, _):
    z, fz, done, fail = carry
    df = (A / jnp.maximum(_MINVAL, jnp.sqrt(jnp.maximum(1 - z * z * A * A, 0.0)))
          + B / jnp.maximum(_MINVAL, jnp.sqrt(jnp.maximum(1 - z * z * B * B, 0.0)))
          - 2 / jnp.maximum(_MINVAL, jnp.sqrt(jnp.maximum(1 - z * z, 0.0))))
    bad = df > -_MINVAL
    z1 = z - fz / jnp.where(bad, -1.0, df)
    bad = bad | (z1 > z)
    fz1 = f(z1)
    bad = bad | (fz1 > tolerance)
    step_done = done | (jnp.abs(fz1) <= tolerance)
    keep = done | bad | fail
    z = jnp.where(keep, z, z1)
    fz = jnp.where(keep, fz, fz1)
    return (z, fz, step_done, fail | (bad & ~done)), None

  (z, fz, done, failed), _ = jax.lax.scan(
      body, (z0, f(z0), jnp.asarray(False), failed), None, length=maxiter)
  failed = failed | ~done | trivial

  # finalize: rotate from end0 or end1 depending on cross sign
  use0 = end0[0] * end1[1] - end0[1] * end1[0] > 0
  vec = jnp.where(use0, end0, end1)
  ang = jnp.where(
      use0,
      jnp.arcsin(jnp.clip(z, -1, 1)) - jnp.arcsin(jnp.clip(A * z, -1, 1)),
      jnp.arcsin(jnp.clip(z, -1, 1)) - jnp.arcsin(jnp.clip(B * z, -1, 1)),
  )
  vecn, _ = _normalize2(vec)
  c, s = jnp.cos(ang), jnp.sin(ang)
  pnt = radius * jnp.stack([c * vecn[0] - s * vecn[1],
                            s * vecn[0] + c * vecn[1]])
  pnt = jnp.where(failed, pdef, pnt)
  wlen = jnp.where(no_wrap, -1.0, 0.0)
  return wlen, pnt, pnt


def wrap(x0, x1, xpos, xmat, radius, side, has_side, is_sphere):
  """3D tendon wrap around a sphere or an (x,y)-projected cylinder.

  Analog of ``mju_wrap`` (ref ``engine_util_misc.c:284``); ``is_sphere`` is a
  static python bool (wrap type is model metadata).  Returns
  ``(wlen, w0, w1)`` — arc length (−1: no wrap) and the two world-frame
  tangent points on the wrap geom's surface.
  """
  dtype = x0.dtype
  p0 = xmat.T @ (x0 - xpos)
  p1 = xmat.T @ (x1 - xpos)
  too_close = (jnp.linalg.norm(p0) < _MINVAL) | (jnp.linalg.norm(p1) < _MINVAL)

  if is_sphere:
    axis0 = p0 / jnp.maximum(jnp.linalg.norm(p0), _MINVAL)
    normal = jnp.cross(p0, p1)
    nrm = jnp.linalg.norm(normal)
    # (p0, p1) parallel: pick a fallback in-plane axis
    i = jnp.argmax(jnp.abs(axis0))
    alt = jnp.ones(3, dtype=dtype).at[i].set(0.0)
    normal_alt = jnp.cross(axis0, alt)
    normal_alt = normal_alt / jnp.maximum(jnp.linalg.norm(normal_alt), _MINVAL)
    normal = jnp.where(nrm < _MINVAL, normal_alt,
                       normal / jnp.maximum(nrm, _MINVAL))
    axis1 = jnp.cross(normal, axis0)
    axis1 = axis1 / jnp.maximum(jnp.linalg.norm(axis1), _MINVAL)
  else:
    axis0 = jnp.array([1.0, 0.0, 0.0], dtype=dtype)
    axis1 = jnp.array([0.0, 1.0, 0.0], dtype=dtype)

  end0 = jnp.stack([jnp.dot(p0, axis0), jnp.dot(p0, axis1)])
  end1 = jnp.stack([jnp.dot(p1, axis0), jnp.dot(p1, axis1)])

  s3 = xmat.T @ (side - xpos)
  sd = jnp.stack([jnp.dot(s3, axis0), jnp.dot(s3, axis1)])
  sdn, _ = _normalize2(sd)
  sd = sdn * radius

  inside = has_side & (jnp.linalg.norm(s3) < radius)
  w_in, pi0, pi1 = wrap_inside(end0, end1, radius)
  w_out, po0, po1 = wrap_circle(
      end0, end1, jnp.where(has_side, sd, jnp.zeros_like(sd)),
      has_side, radius)

  wlen = jnp.where(inside, w_in, w_out)
  pnt0 = jnp.where(inside, pi0, po0)
  pnt1 = jnp.where(inside, pi1, po1)

  res0 = axis0 * pnt0[0] + axis1 * pnt0[1]
  res1 = axis0 * pnt1[0] + axis1 * pnt1[1]

  if not is_sphere:
    # cylinder: interpolate z along the path, lengthen arc by height
    L0 = jnp.sqrt((p0[0] - res0[0]) ** 2 + (p0[1] - res0[1]) ** 2)
    L1 = jnp.sqrt((p1[0] - res1[0]) ** 2 + (p1[1] - res1[1]) ** 2)
    total = jnp.maximum(L0 + jnp.maximum(wlen, 0.0) + L1, _MINVAL)
    z0 = p0[2] + (p1[2] - p0[2]) * L0 / total
    z1 = p0[2] + (p1[2] - p0[2]) * (L0 + jnp.maximum(wlen, 0.0)) / total
    res0 = res0.at[2].set(z0)
    res1 = res1.at[2].set(z1)
    height = jnp.abs(z1 - z0)
    wlen = jnp.where(wlen >= 0, jnp.sqrt(wlen * wlen + height * height), wlen)

  w0 = xmat @ res0 + xpos
  w1 = xmat @ res1 + xpos
  wlen = jnp.where(too_close, -1.0, wlen)
  return wlen, w0, w1


# ---------------------------------------------------------------------------
# Muscle model (ref engine_util_misc.c:430-630; doc/modeling.rst "Muscles")
# ---------------------------------------------------------------------------


def sigmoid(x):
  """Quintic smoothstep on [0, 1] (ref ``mju_sigmoid``:1470)."""
  y = x * x * x * (3 * x * (2 * x - 5) + 10)
  return jnp.clip(jnp.where(x <= 0, 0.0, jnp.where(x >= 1, 1.0, y)), 0.0, 1.0)


def muscle_gain_length(length, lmin, lmax):
  """Normalized FL curve: bump peaking at L=1 (ref ``mju_muscleGainLength``)."""
  a = 0.5 * (lmin + 1)
  b = 0.5 * (1 + lmax)

  def q(x):
    return 0.5 * x * x

  x_low = (length - lmin) / jnp.maximum(_MINVAL, a - lmin)
  x_mid1 = (1 - length) / jnp.maximum(_MINVAL, 1 - a)
  x_mid2 = (length - 1) / jnp.maximum(_MINVAL, b - 1)
  x_high = (lmax - length) / jnp.maximum(_MINVAL, lmax - b)

  fl = jnp.where(
      length <= a, q(x_low),
      jnp.where(length <= 1, 1 - q(x_mid1),
                jnp.where(length <= b, 1 - q(x_mid2), q(x_high))))
  in_range = (lmin <= length) & (length <= lmax)
  return jnp.where(in_range, fl, 0.0)


def _effective_force(force, scale, acc0):
  return jnp.where(force < 0, scale / jnp.maximum(_MINVAL, acc0), force)


def muscle_gain(length, vel, lengthrange, acc0, prm):
  """Active FLV muscle force, negative pulling (ref ``mju_muscleGain``:500)."""
  rng0, rng1, force, scale, lmin, lmax, vmax, _, fvmax = (
      prm[0], prm[1], prm[2], prm[3], prm[4], prm[5], prm[6], prm[7], prm[8])
  force = _effective_force(force, scale, acc0)
  L0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(_MINVAL, rng1 - rng0)
  L = rng0 + (length - lengthrange[0]) / jnp.maximum(_MINVAL, L0)
  V = vel / jnp.maximum(_MINVAL, L0 * vmax)

  FL = muscle_gain_length(L, lmin, lmax)
  y = fvmax - 1
  FV = jnp.where(
      V <= -1, 0.0,
      jnp.where(V <= 0, (V + 1) ** 2,
                jnp.where(V <= y,
                          fvmax - (y - V) ** 2 / jnp.maximum(_MINVAL, y),
                          fvmax)))
  return -force * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
  """Passive muscle force, negative pulling (ref ``mju_muscleBias``:540)."""
  rng0, rng1, force, scale, lmax, fpmax = (
      prm[0], prm[1], prm[2], prm[3], prm[5], prm[7])
  force = _effective_force(force, scale, acc0)
  L0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(_MINVAL, rng1 - rng0)
  L = rng0 + (length - lengthrange[0]) / jnp.maximum(_MINVAL, L0)
  b = 0.5 * (1 + lmax)
  x_mid = (L - 1) / jnp.maximum(_MINVAL, b - 1)
  x_high = (L - b) / jnp.maximum(_MINVAL, b - 1)
  return jnp.where(
      L <= 1, 0.0,
      jnp.where(L <= b, -force * fpmax * 0.5 * x_mid * x_mid,
                -force * fpmax * (0.5 + x_high)))


def muscle_dynamics(ctrl, act, prm):
  """Activation dynamics act_dot (ref ``mju_muscleDynamics``:600).

  Millard et al. (2013) timescales with optional sigmoid-smoothed switching.
  """
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  tau_act = prm[0] * (0.5 + 1.5 * actclamp)
  tau_deact = prm[1] / (0.5 + 1.5 * actclamp)
  width = prm[2]
  dctrl = ctrlclamp - act
  tau_smooth = tau_deact + (tau_act - tau_deact) * sigmoid(dctrl / jnp.maximum(
      _MINVAL, width) + 0.5)
  tau_hard = jnp.where(dctrl > 0, tau_act, tau_deact)
  tau = jnp.where(width < _MINVAL, tau_hard, tau_smooth)
  return dctrl / jnp.maximum(_MINVAL, tau)
