"""Thin-shell bending elasticity plugin (port of the reference capability).

Physics of ``mujoco.elasticity.shell`` (reference
``plugin/elasticity/shell.cc:140-233``): over the triangle mesh spanned
by the plugin's vertex bodies, every interior edge defines a 4-vertex
*flap* (the edge's two endpoints + the opposite vertices of its two
incident triangles).  At rest, a 4x4 bending Hessian per flap is
assembled from the cotangent discretization of the quadratic curvature
energy (Wardetzky et al., "Discrete Quadratic Curvature Energies"):
``B_e[i,j] = 1.5 * c_i c_j / vol_e * mu * t^3 / 12`` with
``c = [a03+a04, a01+a02, -(a01+a03), -(a02+a04)]`` the cotangent weights,
``vol_e`` the two-triangle area, ``mu = E / 2(1+nu)`` the shear modulus
and ``t`` the thickness (shell.cc:178-204).  Each step the bending force
on flap vertex ``i`` is ``-sum_j B_e[i,j] * xpos_j`` accumulated into the
vertices' translational dofs (shell.cc:207-233).

TPU-first form: all flaps evaluate as one batched gather + einsum; the
per-vertex scatter-add lands on the contiguous 3-dof slide blocks the
flexcomp compiler lays out (force index ``dofadr(i0) + 3*vertex + xyz``,
exactly the reference's insertion rule).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.plugins import registry


def _cot(x: np.ndarray, v0: int, v1: int, v2: int) -> float:
  """Cotangent of the angle at v0 between edges to v1 and v2."""
  e1 = x[v1] - x[v0]
  e2 = x[v2] - x[v0]
  n = np.cross(e1, e2)
  return float(e1 @ e2) / float(np.linalg.norm(n))


def _area(x: np.ndarray, v) -> float:
  return 0.5 * float(np.linalg.norm(
      np.cross(x[v[1]] - x[v[0]], x[v[2]] - x[v[0]])))


def _build_flaps(face: np.ndarray):
  """Edge flaps from the triangle list (shell.cc CreateStencils:91-137).

  Returns (ne, 4) vertex ids; boundary flaps keep -1 in slot 3."""
  edge_local = ((1, 2), (2, 0), (0, 1))
  edge_index = {}
  flaps = []
  for tri in face:
    for e in range(3):
      a, b = int(tri[edge_local[e][0]]), int(tri[edge_local[e][1]])
      key = (min(a, b), max(a, b))
      opp = int(tri[(edge_local[e][1] + 1) % 3])
      if key not in edge_index:
        edge_index[key] = len(flaps)
        flaps.append([a, b, opp, -1])
      else:
        flaps[edge_index[key]][3] = opp
  return np.asarray(flaps, np.int32)


class ShellInstance(registry.PluginInstance):
  """Static flap topology + bending Hessians + the passive hook."""

  def __init__(self, mjm, instance: int, dtype):
    attrs = registry.plugin_attrs(
        mjm, instance,
        ("face", "edge", "young", "poisson", "thickness", "damping"))
    E = float(attrs["young"] or 0.0)
    nu = float(attrs["poisson"] or 0.0)
    thick = float(attrs["thickness"] or 0.0)
    if attrs["damping"] and float(attrs["damping"]):
      raise NotImplementedError(
          "shell plugin damping attribute (unused by the reference's "
          "Compute; refuse rather than silently ignore a nonzero value)")

    bodies = [i for i in range(1, mjm.nbody)
              if mjm.body_plugin[i] == instance]
    i0 = bodies[0]
    nvert = len(bodies)
    if bodies != list(range(i0, i0 + nvert)):
      raise NotImplementedError("shell plugin bodies must be contiguous")
    for b in bodies:
      if int(mjm.body_dofnum[b]) != 3:
        raise NotImplementedError(
            "shell plugin vertex bodies must carry exactly 3 dofs (the "
            "reference's force-insertion rule, shell.cc:229, assumes it)")

    if attrs["face"].split():
      face = np.asarray([int(v) for v in attrs["face"].split()],
                        np.int32).reshape(-1, 3)
    else:
      # newer host compilers no longer forward the flexcomp's face table
      # into the plugin config; derive the triangles from the flex whose
      # vertices are exactly this instance's bodies (dim-2 => triangles)
      face = None
      for f in range(int(getattr(mjm, "nflex", 0))):
        va, vn = int(mjm.flex_vertadr[f]), int(mjm.flex_vertnum[f])
        vb = np.asarray(mjm.flex_vertbodyid[va:va + vn])
        if set(vb.tolist()) == set(bodies):
          if int(mjm.flex_dim[f]) != 2:
            raise NotImplementedError("shell plugin on a non-dim-2 flex")
          ea = int(mjm.flex_elemdataadr[f])
          en = int(mjm.flex_elemnum[f])
          elem = np.asarray(mjm.flex_elem[ea:ea + 3 * en],
                            np.int32).reshape(en, 3)
          # element entries are flex-local vertex ids; map to body-relative
          face = (vb[elem] - i0).astype(np.int32)
          break
      if face is None:
        raise NotImplementedError(
            "shell plugin: no face config and no matching flex to derive "
            "the triangle mesh from")

    flaps = _build_flaps(face)
    interior = flaps[:, 3] >= 0
    flaps_in = flaps[interior]                       # (ne_int, 4)

    # rest positions: the vertex bodies' local offsets (shell.cc:175 uses
    # m->body_pos of the chain — flexcomp emits them in a common parent)
    x0 = np.asarray(mjm.body_pos[i0:i0 + nvert], np.float64)

    mu = E / (2.0 * (1.0 + nu))
    coef = 1.5 * mu * thick ** 3 / 12.0
    ne = len(flaps_in)
    bend = np.zeros((ne, 4, 4))
    for e in range(ne):
      v = flaps_in[e]
      a01 = _cot(x0, v[0], v[1], v[2])
      a02 = _cot(x0, v[0], v[3], v[1])
      a03 = _cot(x0, v[1], v[2], v[0])
      a04 = _cot(x0, v[1], v[0], v[3])
      c = np.array([a03 + a04, a01 + a02, -(a01 + a03), -(a02 + a04)])
      vol = _area(x0, v) + _area(x0, (v[1], v[0], v[3]))
      bend[e] = coef * np.outer(c, c) / vol

    self.i0 = i0
    self.nvert = nvert
    self._flaps = flaps_in                                    # (ne, 4)
    self._bend = np.asarray(bend, np.dtype(dtype))            # (ne, 4, 4)
    self._dofadr0 = int(mjm.body_dofadr[i0])

  def passive(self, m, d):
    """qfrc_passive contribution (the mjPLUGIN_PASSIVE compute hook)."""
    if not len(self._flaps):
      return None
    dtype = d.qpos.dtype
    xs = d.xpos[self.i0 + jnp.asarray(self._flaps)]           # (ne, 4, 3)
    force = jnp.einsum("eij,ejx->eix", jnp.asarray(self._bend), xs)
    # scatter -force into per-vertex 3-vectors, then into the dof vector
    vfrc = jnp.zeros((self.nvert, 3), dtype)
    vfrc = vfrc.at[jnp.asarray(self._flaps)].add(-force)
    qfrc = jnp.zeros(m.nv, dtype)
    sl = slice(self._dofadr0, self._dofadr0 + 3 * self.nvert)
    return qfrc.at[sl].set(vfrc.reshape(-1))


def _factory(mjm, instance: int, dtype):
  return ShellInstance(mjm, instance, dtype)


registry.register_plugin("mujoco.elasticity.shell", _factory)
