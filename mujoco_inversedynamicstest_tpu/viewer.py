"""Interactive viewer driver: device-side stepping, host-side rendering.

Analog of the reference's ``python/mujoco/viewer.py`` (``launch_passive``
:540): visualization stays a host concern (SURVEY §1 L4 maps the viewer to
delegation), so this module runs the TPU engine's ``step`` in a loop and
streams each state into a passive ``mujoco.viewer`` handle through
``models/interop.get_data``.  Nothing here is jitted against wall-clock:
the device program is the same compiled step used everywhere else.

Usage::

    import mujoco_inversedynamicstest_tpu as mi
    m = mi.load_model(xml)
    mi.viewer.launch(m)                    # simulate + render until closed
    mi.viewer.launch(m, batch, index=3)    # watch lane 3 of a fleet
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.models import interop


def launch(
    m: Model,
    d: Optional[Data] = None,
    *,
    index: Optional[int] = None,
    ctrl_fn: Optional[Callable[[Data], Data]] = None,
    realtime: bool = True,
    max_steps: Optional[int] = None,
    watch: Optional[str] = None,
    watch_every: float = 0.5,
    profile: bool = False,
    profile_every: float = 2.0,
    _headless_smoke: bool = False,
) -> Data:
  """Steps the device engine and mirrors the state into the host viewer.

  Args:
    m: compiled Model (must carry its host source model for interop).
    d: initial Data (or a vmapped batch, with ``index`` selecting the
      rendered lane); defaults to ``make_data(m)``.
    index: lane to render when ``d`` is batched.
    ctrl_fn: optional per-step callback ``Data -> Data`` run before each
      step (set ctrl, apply forces — the mjcb_control delegation point).
    realtime: sleep to track the model timestep (like the reference
      viewer's speed control); False = run as fast as the device allows.
    max_steps: stop after this many steps (None = until window closes).
    watch: name of a Data field (e.g. ``"qpos"``, ``"solver_niter"``,
      ``"sensordata"``) printed at ``watch_every``-second intervals —
      the simulate app's Watch pane (ref ``simulate/simulate.cc``
      watch field), delegated to the terminal.
    watch_every: seconds between watch prints.
    profile: print a periodic runtime summary — realized steps/s,
      realtime factor, mean device step latency, Newton iterations,
      active contact / constraint-row counts, warning counters — the
      simulate app's Profiler pane (ref ``simulate/simulate.cc``
      profiler figures fed by the mjtTimer stage timers), delegated to
      the terminal like the Watch pane.
    profile_every: seconds between profiler prints.
    _headless_smoke: internal—exercise the loop without opening a window.

  Returns the final Data.
  """
  import mujoco
  import mujoco.viewer

  from mujoco_inversedynamicstest_tpu.models import io as io_mod
  from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod

  if d is None:
    d = io_mod.make_data(m)

  batched = d.qpos.ndim == 2
  if batched and index is None:
    index = 0

  if batched:
    step = jax.jit(jax.vmap(lambda dd: forward_mod.step(m, dd)))
  else:
    step = jax.jit(lambda dd: forward_mod.step(m, dd))

  src = interop._source(m)
  mjd = mujoco.MjData(src)

  def sync_into(handle_mjd, d):
    one = jax.tree.map(lambda x: x[index], d) if batched else d
    interop.get_data(m, one, mjd=handle_mjd)

  def read_perturb(d, handle_mjd):
    """Mouse perturbations back into device state (the simulate app's
    readback: ``mjv_applyPerturbForce`` writes ``xfrc_applied`` and
    pose perturbation writes mocap, ref ``simulate/simulate.cc`` +
    ``engine_vis_interact.c``).  The rendered lane of a batch absorbs
    the perturbation; other lanes are untouched."""
    import jax.numpy as jnp
    import numpy as np

    dtype = d.qpos.dtype
    xf = np.asarray(handle_mjd.xfrc_applied)
    updates = {}
    if xf.any() or bool(jax.device_get(jnp.any(d.xfrc_applied != 0))):
      new_xf = jnp.asarray(xf, dtype)
      updates["xfrc_applied"] = (
          d.xfrc_applied.at[index].set(new_xf) if batched else new_xf)
    if m.nmocap:
      mp = jnp.asarray(np.asarray(handle_mjd.mocap_pos), dtype)
      mq = jnp.asarray(np.asarray(handle_mjd.mocap_quat), dtype)
      updates["mocap_pos"] = (
          d.mocap_pos.at[index].set(mp) if batched else mp)
      updates["mocap_quat"] = (
          d.mocap_quat.at[index].set(mq) if batched else mq)
    return d.replace(**updates) if updates else d

  nstep = 0
  dt = float(m.opt.timestep)

  if watch is not None and not hasattr(d, watch):
    raise AttributeError(f"watch: Data has no field '{watch}'")
  last_watch = [0.0]

  def maybe_watch(d):
    if watch is None:
      return
    now = time.perf_counter()
    if now - last_watch[0] < watch_every:
      return
    last_watch[0] = now
    import numpy as np

    val = getattr(d, watch)
    one = (jax.tree.map(lambda x: x[index], val)
           if batched and getattr(val, "ndim", 0) else val)
    with np.printoptions(precision=4, suppress=True, threshold=12):
      print(f"[watch] t={nstep * dt:8.3f} {watch} = {np.asarray(one)}")

  # Profiler pane: wall-clock interval counters (simulate app's Profiler
  # figure shows realized fps/steps + solver stats + counts; our timing
  # truth is the realized rate over the interval — per-stage shares live
  # in bench.py's prefix-differencing breakdown, not here, because the
  # viewer runs the fused step and must not re-jit prefix programs).
  prof = {"t0": time.perf_counter(), "n0": 0}

  def maybe_profile(d):
    if not profile:
      return
    now = time.perf_counter()
    wall = now - prof["t0"]
    if wall < profile_every:
      return
    import numpy as np

    steps = nstep - prof["n0"]
    prof["t0"], prof["n0"] = now, nstep
    one = jax.tree.map(lambda x: x[index], d) if batched else d
    niter = int(np.asarray(one.solver_niter)) \
        if one.solver_niter is not None else 0
    nefc_act = int(np.asarray(one.efc_active).sum()) \
        if one.efc_active is not None else 0
    ncon_act = int((np.asarray(one.contact.dist)
                    < np.asarray(one.contact.includemargin)).sum()) \
        if one.contact is not None and one.contact.dist is not None else 0
    warn = np.asarray(one.warning) if one.warning is not None else None
    rate = steps / max(wall, 1e-9)
    print(
        f"[profile] {rate:9.1f} steps/s ({rate * dt:5.2f}x realtime, "
        f"{1e3 / max(rate, 1e-9):6.2f} ms/step) | newton iters {niter:3d} "
        f"| contacts {ncon_act:3d} efc {nefc_act:4d}"
        + (f" | warnings {warn.tolist()}" if warn is not None
           and warn.any() else ""))

  if _headless_smoke:
    while max_steps is None or nstep < max_steps:
      if ctrl_fn is not None:
        d = ctrl_fn(d)
      d = step(d)
      sync_into(mjd, d)
      maybe_watch(d)
      maybe_profile(d)
      nstep += 1
      if max_steps is None and nstep >= 10:
        break
    return d

  # render/sync at display rate, stepping physics multiple times per frame
  # to catch up with wall clock (the reference viewer's pattern: its
  # physics loop advances `elapsed/timestep` steps per UI frame) — with
  # 1-2 ms timesteps a sync-per-step loop would attempt 500-1000 Hz GUI
  # updates and fall behind realtime
  frame_dt = 1.0 / 60.0
  with mujoco.viewer.launch_passive(src, mjd) as handle:
    sim_ahead = 0.0  # simulated seconds minus wall seconds
    t_prev = time.perf_counter()
    while handle.is_running() and (max_steps is None or nstep < max_steps):
      now = time.perf_counter()
      if realtime:
        sim_ahead -= now - t_prev
        t_prev = now
        # never fall more than one frame behind (avoid spiral of death)
        sim_ahead = max(sim_ahead, -frame_dt)
        n_sub = max(1, int(-sim_ahead / dt) + 1) if sim_ahead < 0 else 0
      else:
        n_sub = max(1, int(frame_dt / dt))
      for _ in range(n_sub):
        if max_steps is not None and nstep >= max_steps:
          break
        if ctrl_fn is not None:
          d = ctrl_fn(d)
        d = step(d)
        nstep += 1
        sim_ahead += dt
      sync_into(mjd, d)
      handle.sync()
      maybe_watch(d)
      maybe_profile(d)
      # mouse perturbations applied by the GUI flow back into the device
      # state so drags exert real forces (the simulate app's loop)
      d = read_perturb(d, mjd)
      if realtime:
        leftover = frame_dt - (time.perf_counter() - now)
        if leftover > 0:
          time.sleep(leftover)
  return d
