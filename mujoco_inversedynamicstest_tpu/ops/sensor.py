"""Sensors and energy — analog of ``src/engine/engine_sensor.c``.

Stage entry points mirror ``mj_sensorPos``:222 / ``mj_sensorVel``:527 /
``mj_sensorAcc``:708.  Sensor evaluation is filled in per-type in the
sensor milestone; models without sensors pass through untouched.
"""

from __future__ import annotations

from mujoco_inversedynamicstest_tpu.models.types import Data, DisableBit, Model


def _enabled(m: Model) -> bool:
  return m.nsensor > 0 and not (m.opt.disableflags & DisableBit.SENSOR)


def sensor_pos(m: Model, d: Data) -> Data:
  if not _enabled(m):
    return d
  raise NotImplementedError("pending sensor milestone")


def sensor_vel(m: Model, d: Data) -> Data:
  if not _enabled(m):
    return d
  raise NotImplementedError("pending sensor milestone")


def sensor_acc(m: Model, d: Data) -> Data:
  if not _enabled(m):
    return d
  raise NotImplementedError("pending sensor milestone")
