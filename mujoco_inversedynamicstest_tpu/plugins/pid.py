"""PID actuator plugin (port of ``mujoco.pid``).

Physics of the reference plugin (``plugin/actuator/pid.cc:142-225``): for
each plugin actuator, ``error = ctrl − actuator_length`` and

``force = kp·error + kd·(0 − actuator_velocity) + ki·integral``

where the integral state lives in an activation slot, advanced through the
engine's own act integration via ``act_dot = (clip(integral + error·h,
±imax) − act)/h`` (so one Euler step lands exactly on the clipped
integral), and ``imax`` in MJCF is a max *force* converted to an integral
clamp ``imax/ki`` (pid.cc:86-89).  With ``slewmax`` the commanded ctrl is
rate-limited against a second activation slot holding the previous ctrl.

Supported subset: ``dyntype="none"`` plugin actuators (the common PID
form).  Filtered/integrated-velocity variants (dyntype FILTER/INTEGRATOR
feeding the PID setpoint) refuse loudly at load.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_inversedynamicstest_tpu.plugins import registry


class PidInstance(registry.PluginInstance):

  def __init__(self, mjm, instance: int, dtype):
    attrs = registry.plugin_attrs(
        mjm, instance, ("kp", "ki", "kd", "imax", "slewmax"))
    self.kp = float(attrs["kp"] or 0.0)
    self.ki = float(attrs["ki"] or 0.0)
    self.kd = float(attrs["kd"] or 0.0)
    imax_force = attrs["imax"]
    self.imax = (float(imax_force) / self.ki
                 if (imax_force and self.ki) else None)
    self.slewmax = float(attrs["slewmax"]) if attrs["slewmax"] else None
    if self.slewmax is not None and self.slewmax < 0:
      raise NotImplementedError("pid plugin: slewmax must be non-negative")

    acts = [i for i in range(mjm.nu)
            if mjm.actuator_plugin[i] == instance]
    if not acts:
      raise NotImplementedError(
          f"pid plugin instance {instance} drives no actuators")
    for i in acts:
      if mjm.actuator_dyntype[i] != 0:  # mjDYN_NONE
        raise NotImplementedError(
            "pid plugin with dyntype != none (filtered setpoint) is not "
            "supported; use dyntype='none'")
      expected = (1 if self.ki else 0) + (1 if self.slewmax is not None
                                          else 0)
      if int(mjm.actuator_actnum[i]) != expected:
        raise NotImplementedError(
            f"pid actuator {i}: actdim {int(mjm.actuator_actnum[i])} != "
            f"expected {expected}")
    self.acts = np.asarray(acts, np.int32)
    self.actadr = np.asarray(
        [int(mjm.actuator_actadr[i]) for i in acts], np.int32)

  def _ctrl(self, m, d, ctrl):
    """Clamped, slew-limited setpoint per plugin actuator (GetCtrl)."""
    ai = jnp.asarray(self.acts)
    c = ctrl[ai]
    if self.slewmax is not None:
      slew_adr = jnp.asarray(self.actadr + (1 if self.ki else 0))
      prev = d.act[slew_adr]
      h = m.opt.timestep
      have_prev = d.time > 0
      lo, hi = prev - self.slewmax * h, prev + self.slewmax * h
      c = jnp.where(have_prev, jnp.clip(c, lo, hi), c)
    return c

  def _integral(self, m, d, err):
    intg = d.act[jnp.asarray(self.actadr)] + err * m.opt.timestep
    if self.imax is not None:
      intg = jnp.clip(intg, -self.imax, self.imax)
    return intg

  def act_dot(self, m, d, ctrl, act_dot):
    if not (self.ki or self.slewmax is not None):
      return None
    ai = jnp.asarray(self.acts)
    c = self._ctrl(m, d, ctrl)
    h = m.opt.timestep
    if self.ki:
      err = c - d.actuator_length[ai]
      intg = self._integral(m, d, err)
      adr = jnp.asarray(self.actadr)
      act_dot = act_dot.at[adr].set((intg - d.act[adr]) / h)
    if self.slewmax is not None:
      slew_adr = jnp.asarray(self.actadr + (1 if self.ki else 0))
      act_dot = act_dot.at[slew_adr].set((c - d.act[slew_adr]) / h)
    return act_dot

  def actuator_force(self, m, d, ctrl, force):
    ai = jnp.asarray(self.acts)
    c = self._ctrl(m, d, ctrl)
    err = c - d.actuator_length[ai]
    err_dot = -d.actuator_velocity[ai]
    f = self.kp * err + self.kd * err_dot
    if self.ki:
      f = f + self.ki * self._integral(m, d, err)
    return force.at[ai].set(f)


registry.register_plugin(
    "mujoco.pid", lambda mjm, instance, dtype: PidInstance(
        mjm, instance, dtype))
