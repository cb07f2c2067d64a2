"""Discrete-elastic-rod cable plugin (port of the reference capability).

Physics of ``mujoco.elasticity.cable`` (reference
``plugin/elasticity/cable.cc:120-257``): each cable segment body ``i``
carries a ball (or free, for the first) joint; the *curvature* of the rod
at joint ``i`` is the rotation vector of ``body_quat[i] ⊗ qpos_quat[i]``
(orientation of segment ``i`` in segment ``i-1``'s frame).  The elastic
moment is ``-K (ω - ω0) / L`` with per-axis stiffness
``K = [G·J, E·Iy, E·Iz]`` from the segment cross-section (torsion
constant and second moments, cable.cc:178-199), reference curvature
``ω0`` (zero when ``flat="true"``), and segment length ``L``.  Each
joint's moment acts on the two adjacent bodies (pulled back into their
frames, cable.cc:207-247) and enters ``qfrc_passive`` through the
rotational body Jacobian (``mj_applyFT`` with zero force).

TPU-first form: all per-body quantities are batched gathers + one
``einsum`` against the stacked rotational Jacobians — no per-body loop,
no plugin state (the C plugin's ``nstate`` is 0 likewise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.ops import math
from mujoco_inversedynamicstest_tpu.plugins import registry


def _section_stiffness(mjm, i: int, G: float, E: float):
  """[G·J, E·Iy, E·Iz] from the body's first geom (cable.cc:178-199)."""
  g = int(mjm.body_geomadr[i])
  gt = int(mjm.geom_type[g])
  size = np.asarray(mjm.geom_size[g])
  if gt in (3, 5):  # CAPSULE, CYLINDER
    J = np.pi * size[0] ** 4 / 2.0
    Iy = Iz = np.pi * size[0] ** 4 / 4.0
  elif gt == 6:  # BOX
    h, w = size[1], size[2]
    a, b = max(h, w), min(h, w)
    J = a * b ** 3 * (16.0 / 3.0 - 3.36 * b / a * (1 - b ** 4 / a ** 4 / 12))
    Iy = (2 * w) ** 3 * 2 * h / 12.0
    Iz = (2 * h) ** 3 * 2 * w / 12.0
  else:
    J = Iy = Iz = 0.0
  return np.array([J * G, Iy * E, Iz * E])


class CableInstance(registry.PluginInstance):
  """Static cable data + the traceable passive-force hook."""

  def __init__(self, mjm, instance: int, dtype):
    attrs = registry.plugin_attrs(
        mjm, instance, ("twist", "bend", "flat", "vmax"))
    G = float(attrs["twist"] or 0.0)
    E = float(attrs["bend"] or 0.0)
    flat = attrs["flat"].strip().lower() == "true"

    bodies = [i for i in range(1, mjm.nbody)
              if mjm.body_plugin[i] == instance]
    if bodies != list(range(bodies[0], bodies[0] + len(bodies))):
      raise NotImplementedError("cable plugin bodies must be contiguous")
    n = len(bodies)
    i0 = bodies[0]

    # joint quaternion qpos addresses for bodies 1..n-1 of the chain
    # (ball joints; address of the quat = qposadr + dofnum - 3 per
    # cable.cc:171 — for a ball joint that is its qposadr)
    qadr = np.array([
        int(mjm.jnt_qposadr[mjm.body_jntadr[i]])
        + int(mjm.body_dofnum[i]) - 3
        for i in bodies[1:]], np.int32)

    body_quat = np.asarray(mjm.body_quat)[bodies]            # (n, 4)

    # reference curvature omega0 at qpos0 (zero when flat), in f64 numpy
    def np_quat_sub(qa, qb):
      # rotvec of qb^-1 * qa (mju_subQuat)
      w = qb[0] * qa[0] + qb[1:] @ qa[1:]
      v = qb[0] * qa[1:] - qa[0] * qb[1:] - np.cross(qb[1:], qa[1:])
      if w < 0:
        w, v = -w, -v
      s = np.linalg.norm(v)
      if s < 1e-15:
        return 2.0 * v
      return v * (2.0 * np.arctan2(s, w) / s)

    omega0 = np.zeros((n, 3))
    if not flat:
      for b in range(1, n):
        qj = np.asarray(mjm.qpos0[qadr[b - 1]:qadr[b - 1] + 4], np.float64)
        omega0[b] = np_quat_sub(np.asarray(body_quat[b], np.float64), qj)

    # segment lengths + section stiffness at qpos0 (needs FK: body
    # positions at the reference pose)
    import mujoco

    d0 = mujoco.MjData(mjm)
    d0.qpos[:] = mjm.qpos0
    mujoco.mj_kinematics(mjm, d0)
    xpos0 = np.asarray(d0.xpos)[bodies]

    K = np.zeros((n, 3))
    L = np.zeros(n)
    for b in range(n):
      K[b] = _section_stiffness(mjm, bodies[b], G, E)
      L[b] = (np.linalg.norm(xpos0[b] - xpos0[b - 1]) if b else 0.0)

    # host numpy: these embed as zero-copy closure constants (io.py:_jx)
    self.i0 = i0
    self.n = n
    self.bodies = np.asarray(bodies, np.int32)
    self.qadr = qadr
    npdt = np.dtype(dtype)
    self._body_quat = np.asarray(body_quat, npdt)
    self._omega0 = np.asarray(omega0[1:], npdt)              # (n-1, 3)
    self._K = np.asarray(K[1:], npdt)                        # (n-1, 3)
    self._L = np.asarray(np.maximum(L[1:], 1e-30), npdt)     # (n-1,)

  def passive(self, m, d):
    """qfrc_passive contribution (the mjPLUGIN_PASSIVE compute hook)."""
    from mujoco_inversedynamicstest_tpu.ops import support

    n = self.n
    if n < 2:
      return None
    dtype = d.qpos.dtype

    # joint quats of chain bodies 1..n-1: (n-1, 4) static-index gather
    qj = d.qpos[jnp.asarray(self.qadr)[:, None]
                + jnp.arange(4, dtype=jnp.int32)[None]]
    quat = math.quat_mul(self._body_quat[1:], qj)            # (n-1, 4)
    ident = jnp.zeros_like(quat).at[:, 0].set(1.0)
    omega = math.quat_sub(quat, ident)                       # rotvec
    tmp = -(self._K * (omega - self._omega0)) / self._L[:, None]
    # pulled back into the previous body's frame for the owning body
    stress_pull = math.rotate_inv(tmp, quat)                 # (n-1, 3)

    # local frame moments: body b gets +stress_pull[b-1] (its own joint)
    # and -tmp[b] (the next joint), cable.cc:224-247
    lfrc = jnp.zeros((n, 3), dtype)
    lfrc = lfrc.at[1:].add(stress_pull)
    lfrc = lfrc.at[:-1].add(-tmp)

    # world torques on each chain body
    xq = d.xquat[jnp.asarray(self.bodies)]
    torque = math.rotate(lfrc, xq)                           # (n, 3)

    # project through the rotational Jacobians (mj_applyFT, force = 0)
    jacp, jacr = support.jac_all_bodies(m, d, d.xpos)
    jr = jacr[jnp.asarray(self.bodies)]                      # (n, nv, 3)
    return jnp.einsum("bvc,bc->v", jr, torque)


def _factory(mjm, instance: int, dtype):
  return CableInstance(mjm, instance, dtype)


registry.register_plugin("mujoco.elasticity.cable", _factory)
