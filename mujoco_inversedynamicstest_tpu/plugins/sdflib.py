"""Mesh-SDF bridge plugin (``mujoco.sdf.sdflib`` analog).

The reference plugin (``plugin/sdf/sdflib.cc``) builds an SdfLib octree
from a triangle mesh at instance-init time and serves signed distances
to the SDF collider.  Here the octree is a dense voxel grid built on the
host (``ops/meshsdf.py``) and sampled on device by trilinear
interpolation, with the same outside-the-box Euclidean composition
(``boxProjection``, sdflib.cc:34).

Two halves:

* **Device side** (``SdfLibInstance``): registered in the framework's
  plugin registry; voxelizes the compiled model's mesh (transformed by
  ``mesh_pos/quat`` exactly like the C plugin, sdflib.cc:81-87) and
  exposes ``sdf(x)`` to ``ops/collision_sdf.make_plugin_narrowphase``.

* **Host-compiler side** (``enable_host_sdflib`` +
  ``host_compile_grid``): the pip ``mujoco`` wheel does not ship the
  SdfLib plugin, so models referencing it cannot even compile.  A
  ctypes-registered stub (a real ``mjpPlugin`` built against the
  wheel's ``mjplugin.h`` ABI) makes the compiler accept the plugin; its
  ``sdf_staticdistance``/``sdf_aabb`` callbacks serve a pre-scanned
  voxel grid of the referenced mesh so the compiler's marching-cubes
  mesh regeneration (``mjCMesh::LoadSDF``, user_mesh.cc:281) round-
  trips the geometry.  ``models.io.load_model`` performs the pre-scan
  automatically for XML inputs.
"""

from __future__ import annotations

import contextlib
import ctypes
import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.ops import meshsdf
from mujoco_inversedynamicstest_tpu.plugins import registry

PLUGIN_NAME = "mujoco.sdf.sdflib"


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------


class SdfLibInstance(registry.PluginInstance):
  """Voxel-SDF instance over the geom's compiled mesh."""

  def __init__(self, mjm, instance: int, dtype):
    gid = -1
    for g in range(mjm.ngeom):
      if mjm.geom_plugin[g] == instance:
        gid = g
        break
    if gid < 0:
      raise NotImplementedError(
          f"sdflib instance {instance} is not attached to any geom")
    mid = int(mjm.geom_dataid[gid])
    adr, num = int(mjm.mesh_vertadr[mid]), int(mjm.mesh_vertnum[mid])
    fadr, fnum = int(mjm.mesh_faceadr[mid]), int(mjm.mesh_facenum[mid])
    verts = np.asarray(mjm.mesh_vert[adr:adr + num], np.float64)
    faces = np.asarray(mjm.mesh_face[fadr:fadr + fnum], np.int64)
    # the C plugin builds in the pre-recentering frame (sdflib.cc:81-87):
    # rotate by mesh_quat, translate by mesh_pos
    q = np.asarray(mjm.mesh_quat[mid], np.float64)
    w, x, y, z = q
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    verts = verts @ rot.T + np.asarray(mjm.mesh_pos[mid], np.float64)
    grid = meshsdf.mesh_sdf_grid(verts, faces)
    self._values = jnp.asarray(grid.values, dtype)
    self._lo = jnp.asarray(grid.lo, dtype)
    self._spacing = jnp.asarray(grid.spacing, dtype)
    self._center = jnp.asarray(grid.box_center, dtype)
    self._half = jnp.asarray(grid.box_half, dtype)
    self._aabb = (np.asarray(grid.box_center), np.asarray(grid.box_half))

  def sdf(self, x):
    return meshsdf.sample_grid(self._values, self._lo, self._spacing,
                               self._center, self._half, x)

  def aabb(self):
    return self._aabb


registry.register_plugin(
    PLUGIN_NAME, lambda mjm, i, dt: SdfLibInstance(mjm, i, dt))


# ---------------------------------------------------------------------------
# host-compiler side (ctypes stub against the wheel's mjplugin.h ABI)
# ---------------------------------------------------------------------------

_mjtNum = ctypes.c_double
_NSTATE = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p, ctypes.c_int)
_NSENSOR = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int)
_INIT = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int)
_RESET = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.POINTER(_mjtNum), ctypes.c_void_p,
    ctypes.c_int)
_COMPUTE = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int)
_SDFDIST = ctypes.CFUNCTYPE(
    _mjtNum, ctypes.POINTER(_mjtNum), ctypes.c_void_p, ctypes.c_int)
_SDFGRAD = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(_mjtNum), ctypes.POINTER(_mjtNum),
    ctypes.c_void_p, ctypes.c_int)
_SDFSTATIC = ctypes.CFUNCTYPE(
    _mjtNum, ctypes.POINTER(_mjtNum), ctypes.POINTER(_mjtNum))
_SDFATTR = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(_mjtNum), ctypes.POINTER(ctypes.c_char_p),
    ctypes.POINTER(ctypes.c_char_p))
_SDFAABB = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(_mjtNum), ctypes.POINTER(_mjtNum))


class _MjpPlugin(ctypes.Structure):
  """mjpPlugin, field-for-field against the pip wheel's mjplugin.h."""

  _fields_ = [
      ("name", ctypes.c_char_p),
      ("nattribute", ctypes.c_int),
      ("attributes", ctypes.POINTER(ctypes.c_char_p)),
      ("capabilityflags", ctypes.c_int),
      ("needstage", ctypes.c_int),
      ("nstate", _NSTATE),
      ("nsensordata", _NSENSOR),
      ("init", _INIT),
      ("destroy", ctypes.c_void_p),
      ("copy", ctypes.c_void_p),
      ("reset", _RESET),
      ("compute", _COMPUTE),
      ("advance", ctypes.c_void_p),
      ("visualize", ctypes.c_void_p),
      ("actuator_act_dot", ctypes.c_void_p),
      ("sdf_distance", _SDFDIST),
      ("sdf_gradient", _SDFGRAD),
      ("sdf_staticdistance", _SDFSTATIC),
      ("sdf_attribute", _SDFATTR),
      ("sdf_aabb", _SDFAABB),
  ]


_MJPLUGIN_SDF = 1 << 3
_keepalive = []
_registered = False
# the grid served to the compiler's marching-cubes pass (one active
# sdflib mesh per compile; set via host_compile_grid)
_active_grid: Optional[meshsdf.SdfGrid] = None


def _host_has_plugin(lib) -> bool:
  lib.mjp_pluginCount.restype = ctypes.c_int

  class _Head(ctypes.Structure):
    _fields_ = [("name", ctypes.c_char_p)]

  lib.mjp_getPluginAtSlot.restype = ctypes.POINTER(_Head)
  lib.mjp_getPluginAtSlot.argtypes = [ctypes.c_int]
  for i in range(lib.mjp_pluginCount()):
    head = lib.mjp_getPluginAtSlot(i).contents
    if head.name and head.name.decode() == PLUGIN_NAME:
      return True
  return False


def _grid_sample_np(grid: meshsdf.SdfGrid, p: np.ndarray) -> float:
  """Host-side mirror of meshsdf.sample_grid (numpy, for callbacks)."""
  r = p - grid.box_center
  q = np.abs(r) - grid.box_half
  excess = float(np.linalg.norm(np.maximum(q, 0.0)))
  xin = grid.box_center + np.clip(r, -grid.box_half, grid.box_half)
  u = (xin - grid.lo) / grid.spacing
  i0 = np.clip(np.floor(u).astype(int), 0,
               np.asarray(grid.values.shape) - 2)
  f = u - i0
  v = grid.values[i0[0]:i0[0] + 2, i0[1]:i0[1] + 2, i0[2]:i0[2] + 2]
  c = (v[0] * (1 - f[0]) + v[1] * f[0])
  c = (c[0] * (1 - f[1]) + c[1] * f[1])
  return float(c[0] * (1 - f[2]) + c[1] * f[2]) + (
      excess if np.any(q > 0) else 0.0)


def enable_host_sdflib() -> None:
  """Registers the sdflib stub in the host engine (idempotent)."""
  global _registered
  if _registered:
    return
  import mujoco

  libs = glob.glob(
      os.path.join(os.path.dirname(mujoco.__file__), "libmujoco.so*"))
  if not libs:
    raise NotImplementedError("host libmujoco not found")
  lib = ctypes.CDLL(libs[0])
  if _host_has_plugin(lib):
    _registered = True
    return

  p = _MjpPlugin()
  ctypes.memset(ctypes.byref(p), 0, ctypes.sizeof(p))
  p.name = PLUGIN_NAME.encode()
  attrs = (ctypes.c_char_p * 1)(b"aabb")
  p.nattribute = 1
  p.attributes = attrs
  p.capabilityflags = _MJPLUGIN_SDF
  p.nstate = _NSTATE(lambda m, i: 0)
  p.nsensordata = _NSENSOR(lambda m, i, s: 0)
  p.init = _INIT(lambda m, d, i: 0)
  p.reset = _RESET(lambda m, st, pd, i: None)
  p.compute = _COMPUTE(lambda m, d, i, c: None)

  def _dist(pt, d, i):
    if _active_grid is None:
      return 1.0
    return _grid_sample_np(_active_grid,
                           np.array([pt[0], pt[1], pt[2]]))

  def _static(pt, at):
    if _active_grid is None:
      return 1.0
    return _grid_sample_np(_active_grid,
                           np.array([pt[0], pt[1], pt[2]]))

  def _grad(g, pt, d, i):
    eps = 1e-6
    p0 = np.array([pt[0], pt[1], pt[2]])
    d0 = _dist(pt, d, i)
    for k in range(3):
      pk = p0.copy()
      pk[k] += eps
      if _active_grid is None:
        g[k] = 0.0
      else:
        g[k] = (_grid_sample_np(_active_grid, pk) - d0) / eps

  def _attr(out, names, vals):
    out[0] = 0.0

  def _aabb(aabb, at):
    if _active_grid is None:
      for k in range(6):
        aabb[k] = 0.5 if k >= 3 else 0.0
      return
    for k in range(3):
      aabb[k] = float(_active_grid.box_center[k])
      aabb[3 + k] = float(_active_grid.box_half[k])

  p.sdf_distance = _SDFDIST(_dist)
  p.sdf_gradient = _SDFGRAD(_grad)
  p.sdf_staticdistance = _SDFSTATIC(_static)
  p.sdf_attribute = _SDFATTR(_attr)
  p.sdf_aabb = _SDFAABB(_aabb)
  _keepalive.extend([p, attrs, p.nstate, p.nsensordata, p.init, p.reset,
                     p.compute, p.sdf_distance, p.sdf_gradient,
                     p.sdf_staticdistance, p.sdf_attribute, p.sdf_aabb])

  lib.mjp_registerPlugin.argtypes = [ctypes.POINTER(_MjpPlugin)]
  lib.mjp_registerPlugin.restype = ctypes.c_int
  lib.mjp_registerPlugin(ctypes.byref(p))
  _registered = True


@contextlib.contextmanager
def host_compile_grid(grid: meshsdf.SdfGrid):
  """Serves ``grid`` to the host compiler's sdflib callbacks."""
  global _active_grid
  enable_host_sdflib()
  prev = _active_grid
  _active_grid = grid
  try:
    yield
  finally:
    _active_grid = prev


# ---------------------------------------------------------------------------
# XML pre-scan (load_model hook)
# ---------------------------------------------------------------------------


def prescan_xml(xml_text: str, base_dir: str = "."):
  """Finds the mesh attached to an sdflib instance in MJCF text and
  voxelizes it for the host compile.  Returns an SdfGrid or None."""
  import xml.etree.ElementTree as ET

  try:
    root = ET.fromstring(xml_text)
  except ET.ParseError:
    return None
  instances = set()
  for pl in root.iter("plugin"):
    if pl.get("plugin") == PLUGIN_NAME:
      for inst in pl.iter("instance"):
        instances.add(inst.get("name"))
  if not instances:
    return None

  meshdir = "."
  comp = root.find("compiler")
  if comp is not None and comp.get("meshdir"):
    meshdir = comp.get("meshdir")

  targets = []
  for mesh in root.iter("mesh"):
    for pl in mesh.iter("plugin"):
      if pl.get("instance") in instances or pl.get("plugin") == PLUGIN_NAME:
        targets.append(mesh)
  if not targets:
    return None
  if len(targets) > 1:
    raise NotImplementedError(
        "multiple sdflib meshes in one model (one active compile grid)")

  mesh = targets[0]
  if mesh.get("vertex"):
    verts = np.fromstring(mesh.get("vertex"), sep=" ").reshape(-1, 3)
    from scipy.spatial import ConvexHull

    faces = ConvexHull(verts).simplices
    # orient hull faces outward (qhull does not guarantee winding)
    cen = verts.mean(0)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.einsum("fc,fc->f", n, tri.mean(1) - cen) < 0
    faces[flip] = faces[flip][:, ::-1]
  elif mesh.get("file"):
    path = os.path.join(base_dir, meshdir, mesh.get("file"))
    verts, faces = _read_obj(path)
  else:
    return None
  scale = np.fromstring(mesh.get("scale", "1 1 1"), sep=" ")
  return meshsdf.mesh_sdf_grid(verts * scale, faces)


def _read_obj(path: str):
  """Minimal OBJ reader (v/f records; polygons fan-triangulated)."""
  verts, faces = [], []
  with open(path) as f:
    for line in f:
      parts = line.split()
      if not parts:
        continue
      if parts[0] == "v":
        verts.append([float(x) for x in parts[1:4]])
      elif parts[0] == "f":
        idx = [int(t.split("/")[0]) - 1 for t in parts[1:]]
        for k in range(1, len(idx) - 1):
          faces.append([idx[0], idx[k], idx[k + 1]])
  return np.asarray(verts, np.float64), np.asarray(faces, np.int64)
