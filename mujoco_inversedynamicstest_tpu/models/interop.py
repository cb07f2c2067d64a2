"""Host interop: names, keyframes, and Data export back to the C engine.

Parity targets in the reference:
- ``mj_name2id`` / ``mj_id2name`` (``src/engine/engine_name.c``),
- ``mj_resetDataKeyframe`` / ``mj_setKeyframe``
  (``src/engine/engine_io.c``, ``engine_support.c:240``),
- MJX ``get_data`` (``mjx/mujoco/mjx/_src/io.py``) — copying the pytree
  ``Data`` back into a ``mujoco.MjData`` so the reference's viewer,
  renderer, and tooling work on our states (SURVEY.md §7 step 8:
  rendering is delegated to the reference viewer via interop).

All functions here are host-side (numpy / C-engine calls) and must stay
out of jitted code.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.models.types import Data, Model


def _source(m: Model):
  if m._source is None:
    raise ValueError(
        "Model was built without its host mujoco.MjModel (put_model(..., "
        "_keep_source=False)); name/keyframe/interop APIs need it."
    )
  return m._source


def name2id(m: Model, objtype, name: str) -> int:
  """Object id for a name, −1 if absent (ref ``mj_name2id``)."""
  import mujoco

  if isinstance(objtype, str):
    objtype = getattr(mujoco.mjtObj, "mjOBJ_" + objtype.upper())
  return int(mujoco.mj_name2id(_source(m), objtype, name))


def id2name(m: Model, objtype, objid: int) -> Optional[str]:
  """Name of an object id, None if unnamed (ref ``mj_id2name``)."""
  import mujoco

  if isinstance(objtype, str):
    objtype = getattr(mujoco.mjtObj, "mjOBJ_" + objtype.upper())
  return mujoco.mj_id2name(_source(m), objtype, int(objid))


def nkey(m: Model) -> int:
  return int(_source(m).nkey)


def reset_data_keyframe(m: Model, d: Data, key) -> Data:
  """Data with state loaded from model keyframe ``key`` (name or id).

  Analog of ``mj_resetDataKeyframe`` (reference ``engine_io.c``): sets
  qpos/qvel/act/ctrl/mocap/time from the compiled keyframe.
  """
  src = _source(m)
  if isinstance(key, str):
    k = name2id(m, "key", key)
    if k < 0:
      raise KeyError(f"no keyframe named {key!r}")
  else:
    k = int(key)
  if not 0 <= k < src.nkey:
    raise IndexError(f"keyframe {k} out of range [0, {src.nkey})")

  dtype = d.qpos.dtype
  rep = dict(
      time=jnp.asarray(src.key_time[k], dtype=dtype),
      qpos=jnp.asarray(src.key_qpos[k], dtype=dtype),
      qvel=jnp.asarray(src.key_qvel[k], dtype=dtype),
  )
  if m.na:
    rep["act"] = jnp.asarray(src.key_act[k], dtype=dtype)
  if m.nu:
    rep["ctrl"] = jnp.asarray(src.key_ctrl[k], dtype=dtype)
  if m.nmocap:
    rep["mocap_pos"] = jnp.asarray(src.key_mpos[k].reshape(-1, 3), dtype=dtype)
    rep["mocap_quat"] = jnp.asarray(
        src.key_mquat[k].reshape(-1, 4), dtype=dtype)
  return d.replace(**rep)


_STATE_FIELDS = (
    "time", "qpos", "qvel", "act", "ctrl", "qacc_warmstart",
    "qfrc_applied", "xfrc_applied", "mocap_pos", "mocap_quat",
)


def get_data(m: Model, d: Data, mjd=None, recompute: bool = True):
  """Copies a (single, unbatched) ``Data`` into a ``mujoco.MjData``.

  With ``recompute=True`` (default) only the primary-state fields are
  copied and the C engine's ``mj_forward`` recomputes every derived
  quantity, so the result is internally consistent for the reference
  viewer/renderer.  NOTE this replaces our device-computed derived fields
  (sensordata, contacts, qacc) with the C engine's — do NOT use the
  recomputed values to "validate" the device engine against itself.
  With ``recompute=False`` the device-computed derived fields (xpos,
  xquat, sensordata, qacc, qfrc_*) are copied verbatim instead and no C
  forward pass runs.  Pass an existing ``mjd`` to reuse its allocation
  (viewer loop).
  """
  import mujoco

  src = _source(m)
  if mjd is None:
    mjd = mujoco.MjData(src)

  mjd.time = float(d.time)
  mjd.qpos[:] = np.asarray(d.qpos, dtype=np.float64)
  mjd.qvel[:] = np.asarray(d.qvel, dtype=np.float64)
  if m.na:
    mjd.act[:] = np.asarray(d.act, dtype=np.float64)
  if m.nu:
    mjd.ctrl[:] = np.asarray(d.ctrl, dtype=np.float64)
  mjd.qacc_warmstart[:] = np.asarray(d.qacc_warmstart, dtype=np.float64)
  mjd.qfrc_applied[:] = np.asarray(d.qfrc_applied, dtype=np.float64)
  mjd.xfrc_applied[:] = np.asarray(d.xfrc_applied, dtype=np.float64)
  if m.nmocap:
    mjd.mocap_pos[:] = np.asarray(d.mocap_pos, dtype=np.float64)
    mjd.mocap_quat[:] = np.asarray(d.mocap_quat, dtype=np.float64)

  if recompute:
    mujoco.mj_forward(src, mjd)
    return mjd

  # copy device-computed derived quantities verbatim
  mjd.xpos[:] = np.asarray(d.xpos, dtype=np.float64)
  mjd.xquat[:] = np.asarray(d.xquat, dtype=np.float64)
  mjd.xmat[:] = np.asarray(d.xmat, dtype=np.float64).reshape(-1, 9)
  mjd.xipos[:] = np.asarray(d.xipos, dtype=np.float64)
  mjd.ximat[:] = np.asarray(d.ximat, dtype=np.float64).reshape(-1, 9)
  ng = src.ngeom  # exclude virtual flex-vertex geoms appended past ngeom
  mjd.geom_xpos[:] = np.asarray(d.geom_xpos, dtype=np.float64)[:ng]
  mjd.geom_xmat[:] = np.asarray(
      d.geom_xmat, dtype=np.float64).reshape(-1, 9)[:ng]
  mjd.site_xpos[:] = np.asarray(d.site_xpos, dtype=np.float64)
  mjd.site_xmat[:] = np.asarray(d.site_xmat, dtype=np.float64).reshape(-1, 9)
  mjd.qacc[:] = np.asarray(d.qacc, dtype=np.float64)
  mjd.qfrc_constraint[:] = np.asarray(d.qfrc_constraint, dtype=np.float64)
  mjd.qfrc_passive[:] = np.asarray(d.qfrc_passive, dtype=np.float64)
  mjd.qfrc_actuator[:] = np.asarray(d.qfrc_actuator, dtype=np.float64)
  if mjd.sensordata.size:
    mjd.sensordata[:] = np.asarray(d.sensordata, dtype=np.float64)
  if m.nflexvert:
    mjd.flexvert_xpos[:] = np.asarray(d.flexvert_xpos, dtype=np.float64)
  return mjd


def get_data_batch(m: Model, batch: Data, index: int, mjd=None):
  """Extracts element ``index`` of a vmapped ``Data`` batch into MjData."""
  import jax

  one = jax.tree.map(lambda x: x[index], batch)
  return get_data(m, one, mjd=mjd)
