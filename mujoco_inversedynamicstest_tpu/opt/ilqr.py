"""iLQR / LQR trajectory optimization on the TPU-native dynamics.

The reference ships the *building blocks* of trajectory optimization —
``mjd_transitionFD`` linearization (reference
``src/engine/engine_derivative_fd.c:550``), banded Cholesky
(``mju_cholFactorBand``, reference ``engine_util_solve.c:291``), ``mju_boxQP``
(:1034), and an LQR recipe (reference ``python/LQR.ipynb``) — but runs them
serially on the CPU.  This module composes the same algorithm TPU-first:

* dynamics linearizations for ALL timesteps are one ``vmap`` of the
  autodiff transition Jacobian (each a ``jacfwd`` through ``step``);
* the Riccati backward pass is a ``lax.scan`` (sequential by nature, but
  with static (nx, nx) block shapes that tile onto the MXU);
* the forward pass line search evaluates ALL step sizes in parallel
  (``vmap`` over alphas) instead of backtracking serially;
* control limits use the projected-Newton ``box_qp`` per backward step
  (the ILQG/boxQP method the reference implements in C);
* the whole solve is one jittable function — ``vmap`` it for batched MPC.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.models.types import Data, Model
from mujoco_inversedynamicstest_tpu.ops import forward as forward_mod
from mujoco_inversedynamicstest_tpu.ops import support
from mujoco_inversedynamicstest_tpu.opt import derivative
from mujoco_inversedynamicstest_tpu.opt import qp


class State(NamedTuple):
  """Trajectory state sample (the mjSTATE_PHYSICS triple)."""
  qpos: jax.Array
  qvel: jax.Array
  act: jax.Array


# cost(m, state, u, t) -> scalar; terminal cost gets u = zeros(nu), t = T.
CostFn = Callable[[Model, State, jax.Array, jax.Array], jax.Array]


class ILQRConfig(NamedTuple):
  iterations: int = 30
  # parallel line-search step sizes (static)
  n_alpha: int = 8
  alpha_decay: float = 0.5
  reg_init: float = 1e-6
  reg_min: float = 1e-8
  reg_max: float = 1e8
  reg_factor: float = 10.0
  tol_cost: float = 1e-8
  # use control limits from actuator_ctrlrange via boxQP backward pass
  limits: bool = True
  # linearization chunking: None = vmap all T timesteps at once (fastest,
  # highest memory); an int B = lax.map with batch_size=B (memory bounded
  # to B*(nx+nu) concurrent tangent steps — required for big MPC fleets)
  lin_batch: Optional[int] = None
  # recompute feedback gains for the returned trajectory (an extra
  # linearization pass; only needed when the caller consumes gains_K/k)
  final_gains: bool = False
  # trace the whole solve with the compile-lean scan factorizations
  # (ops/linalg.lean_compile).  Measured on the TPU north-star program
  # (fleet humanoid MPC, H=100, cold cache, separate processes):
  # compile 1475 s -> 238 s (6.2x) for an 8.7% exec-time cost — the
  # right default for a program whose unrolled-kernel variant costs
  # 25 minutes of XLA time per (re)build.  Set False to squeeze peak
  # solves/s out of a compile-once deployment.
  lean_compile: bool = True


class ILQRResult(NamedTuple):
  us: jax.Array        # (T, nu) optimized controls
  xs: State            # (T+1, ...) optimized state trajectory
  cost: jax.Array      # scalar total cost
  gains_K: jax.Array   # (T, nu, nx) feedback gains
  gains_k: jax.Array   # (T, nu) feedforward
  niter: jax.Array     # iterations taken
  reg: jax.Array       # final regularization


def _state_of(d: Data) -> State:
  return State(qpos=d.qpos, qvel=d.qvel, act=d.act)


def _put_state(d: Data, s: State) -> Data:
  return d.replace(qpos=s.qpos, qvel=s.qvel, act=s.act)


def rollout_open_loop(m: Model, d0: Data, us: jax.Array):
  """Rolls the controls out; returns stacked states (T+1) incl. initial."""

  def body(d, u):
    dn = forward_mod.step(m, d.replace(ctrl=u))
    return dn, _state_of(dn)

  d_last, tail = jax.lax.scan(body, d0, us)
  xs = jax.tree.map(
      lambda a, b: jnp.concatenate([a[None], b]), _state_of(d0), tail
  )
  return xs, d_last


def _total_cost(m: Model, cost: CostFn, xs: State, us: jax.Array):
  T = us.shape[0]
  ts = jnp.arange(T, dtype=us.dtype)
  head = jax.tree.map(lambda a: a[:T], xs)
  run = jax.vmap(lambda s, u, t: cost(m, s, u, t))(head, us, ts)
  u_nil = jnp.zeros(m.nu, dtype=us.dtype)
  terminal = cost(
      m, jax.tree.map(lambda a: a[T], xs), u_nil, jnp.asarray(T, us.dtype)
  )
  return jnp.sum(run) + terminal


def _quadratize_cost(m: Model, cost: CostFn, x: State, u: jax.Array,
                     t: jax.Array):
  """Gradient + Hessian of the cost in tangent coords z = [dx; du]."""
  nv, na, nu = m.nv, m.na, m.nu
  nx = 2 * nv + na

  def c(z):
    dx, du = z[:nx], z[nx:]
    qpos = support.integrate_pos(m, x.qpos, dx[:nv], 1.0)
    qvel = x.qvel + dx[nv:2 * nv]
    act = x.act + dx[2 * nv:nx] if na else x.act
    return cost(m, State(qpos, qvel, act), u + du, t)

  z0 = jnp.zeros(nx + nu, dtype=u.dtype)
  g = jax.grad(c)(z0)
  h = jax.hessian(c)(z0)
  return g[:nx], g[nx:], h[:nx, :nx], h[nx:, nx:], h[nx:, :nx]


def _linearize(m: Model, d_template: Data, xs: State, us: jax.Array,
               lin_batch: Optional[int] = None):
  """(A, B) for every timestep: one vmapped autodiff transition.

  With ``lin_batch`` set, timesteps stream through ``lax.map`` in chunks of
  that size instead — same result, memory bounded (big-fleet MPC mode).
  """
  T = us.shape[0]
  head = jax.tree.map(lambda a: a[:T], xs)

  def lin(s, u):
    d = _put_state(d_template, s).replace(ctrl=u)
    d = forward_mod.forward(m, d, skip_sensor=True)
    tr = derivative.transition_ad(m, d)
    return tr.A, tr.B

  if lin_batch:
    return jax.lax.map(
        lambda su: lin(*su), (head, us), batch_size=min(lin_batch, T)
    )
  return jax.vmap(lin)(head, us)


def _backward(m: Model, cfg: ILQRConfig, As, Bs, lx, lu, lxx, luu, lux,
              vx_T, vxx_T, reg, u_lo, u_hi, us):
  """Riccati backward pass; returns (k, K, dV, diverged)."""
  nx = As.shape[1]
  nu = Bs.shape[2]
  dtype = As.dtype
  eye = jnp.eye(nx, dtype=dtype)

  def body(carry, inp):
    vx, vxx, bad = carry
    a, b, gx, gu, hxx, huu, hux, u, lo, hi = inp
    vxx_reg = vxx + reg * eye
    qx = gx + a.T @ vx
    qu = gu + b.T @ vx
    qxx = hxx + a.T @ vxx @ a
    quu = huu + b.T @ vxx_reg @ b
    qux = hux + b.T @ vxx_reg @ a
    # symmetrize for stability
    quu = 0.5 * (quu + quu.T)

    if cfg.limits:
      res = qp.box_qp(quu, qu, lo - u, hi - u, maxiter=20)
      k = res.x
      free = res.free.astype(dtype)
      quu_f = quu * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
      kmat = -jax.scipy.linalg.cho_solve(
          (jnp.linalg.cholesky(quu_f), True), qux * free[:, None]
      )
      ok = jnp.all(jnp.diag(quu) > 0)
    else:
      lq = jnp.linalg.cholesky(quu)
      ok = jnp.all(jnp.isfinite(lq)) & jnp.all(jnp.diag(lq) > 0)
      sol = jax.scipy.linalg.cho_solve(
          (lq, True), jnp.concatenate([qu[:, None], qux], axis=1)
      )
      k = -sol[:, 0]
      kmat = -sol[:, 1:]

    vx_new = qx + kmat.T @ quu @ k + kmat.T @ qu + qux.T @ k
    vxx_new = qxx + kmat.T @ quu @ kmat + kmat.T @ qux + qux.T @ kmat
    vxx_new = 0.5 * (vxx_new + vxx_new.T)
    dv = jnp.stack([k @ qu, 0.5 * k @ (quu @ k)])
    bad = bad | ~ok
    return (vx_new, vxx_new, bad), (k, kmat, dv)

  T = As.shape[0]
  lo = jnp.broadcast_to(u_lo, (T, nu))
  hi = jnp.broadcast_to(u_hi, (T, nu))
  (vx0, vxx0, bad), (ks, Ks, dvs) = jax.lax.scan(
      body, (vx_T, vxx_T, False),
      (As, Bs, lx, lu, lxx, luu, lux, us, lo, hi), reverse=True
  )
  del vx0, vxx0
  return ks, Ks, jnp.sum(dvs, axis=0), bad


def _forward_pass(m: Model, cfg: ILQRConfig, cost: CostFn, d0: Data,
                  xs: State, us: jax.Array, ks, Ks, u_lo, u_hi):
  """Feedback rollout for all alphas in parallel; picks the best."""
  T = us.shape[0]
  nv, na = m.nv, m.na
  dtype = us.dtype
  alphas = cfg.alpha_decay ** jnp.arange(cfg.n_alpha, dtype=dtype)

  def rollout_alpha(alpha):
    def body(d, inp):
      x_nom, u_nom, k, kmat = inp
      dx_parts = [
          support.differentiate_pos(m, x_nom.qpos, d.qpos, 1.0),
          d.qvel - x_nom.qvel,
      ]
      if na:
        dx_parts.append(d.act - x_nom.act)
      dx = jnp.concatenate(dx_parts)
      u = u_nom + alpha * k + kmat @ dx
      if cfg.limits:
        u = jnp.clip(u, u_lo, u_hi)
      dn = forward_mod.step(m, d.replace(ctrl=u))
      return dn, (_state_of(dn), u)

    head = jax.tree.map(lambda a: a[:T], xs)
    d_fin, (tail, us_new) = jax.lax.scan(
        body, d0, (head, us, ks, Ks)
    )
    del d_fin
    xs_new = jax.tree.map(
        lambda a, b: jnp.concatenate([a[None], b]), _state_of(d0), tail
    )
    c = _total_cost(m, cost, xs_new, us_new)
    return xs_new, us_new, c

  xs_all, us_all, costs = jax.vmap(rollout_alpha)(alphas)
  best = jnp.argmin(jnp.where(jnp.isfinite(costs), costs, jnp.inf))
  xs_b = jax.tree.map(lambda a: a[best], xs_all)
  us_b = us_all[best]
  return xs_b, us_b, costs[best]


def ilqr(m: Model, cost: CostFn, d0: Data, us_init: jax.Array,
         config: Optional[ILQRConfig] = None) -> ILQRResult:
  """Iterative LQR: min_U sum_t cost(x_t, u_t, t) + cost(x_T, 0, T).

  Fully jittable; ``vmap`` over (d0, us_init) batches for MPC fleets.
  ``d0`` must be a fresh ``make_data``-style Data holding the initial
  state (qpos, qvel, act).
  """
  cfg = config or ILQRConfig()
  if cfg.lean_compile:
    from mujoco_inversedynamicstest_tpu.ops import linalg

    with linalg.lean_compile():
      return ilqr(m, cost, d0, us_init, cfg._replace(lean_compile=False))
  T, nu = us_init.shape
  nv, na = m.nv, m.na
  nx = 2 * nv + na
  dtype = us_init.dtype

  if cfg.limits:
    limited = jnp.asarray(m.actuator_ctrllimited, bool)
    big = jnp.asarray(1e10, dtype)
    u_lo = jnp.where(limited, m.actuator_ctrlrange[:, 0], -big)
    u_hi = jnp.where(limited, m.actuator_ctrlrange[:, 1], big)
    us_init = jnp.clip(us_init, u_lo, u_hi)
  else:
    u_lo = u_hi = jnp.zeros(nu, dtype)

  xs0, _ = rollout_open_loop(m, d0, us_init)
  cost0 = _total_cost(m, cost, xs0, us_init)

  ts = jnp.arange(T, dtype=dtype)
  u_nil = jnp.zeros(nu, dtype)

  def iteration(carry):
    xs, us, c_prev, reg, it, done = carry

    As, Bs = _linearize(m, d0, xs, us, cfg.lin_batch)
    head = jax.tree.map(lambda a: a[:T], xs)
    lx, lu, lxx, luu, lux = jax.vmap(
        lambda s, u, t: _quadratize_cost(m, cost, s, u, t)
    )(head, us, ts)
    x_T = jax.tree.map(lambda a: a[T], xs)
    gT, _, hT, _, _ = _quadratize_cost(
        m, cost, x_T, u_nil, jnp.asarray(T, dtype)
    )

    def bw(reg_in):
      return _backward(m, cfg, As, Bs, lx, lu, lxx, luu, lux, gT, hT,
                       reg_in, u_lo, u_hi, us)

    # escalate regularization until the backward pass succeeds
    def reg_cond(rc):
      _, _, _, bad, reg_c = rc
      return bad & (reg_c < cfg.reg_max)

    def reg_body(rc):
      _, _, _, _, reg_c = rc
      reg_n = jnp.minimum(reg_c * cfg.reg_factor, cfg.reg_max)
      ks_n, Ks_n, dv_n, bad_n = bw(reg_n)
      return ks_n, Ks_n, dv_n, bad_n, reg_n

    ks0, Ks0, dv0, bad0 = bw(reg)
    ks, Ks, dv, bad, reg_used = jax.lax.while_loop(
        reg_cond, reg_body, (ks0, Ks0, dv0, bad0, reg)
    )

    xs_new, us_new, c_new = _forward_pass(
        m, cfg, cost, d0, xs, us, ks, Ks, u_lo, u_hi
    )

    # non-finite guard: a NaN/Inf c_new never replaces the incumbent, and
    # a non-finite incumbent (diverged initial rollout) is replaced by ANY
    # finite plan — without this a NaN cost0 poisons every iteration
    # (NaN comparisons are False, so improvement can never fire)
    improved = jnp.isfinite(c_new) & (
        (c_new < c_prev - cfg.tol_cost) | ~jnp.isfinite(c_prev))
    # on improvement decrease reg, else increase and keep the trajectory
    reg_next = jnp.where(
        improved,
        jnp.maximum(reg_used / cfg.reg_factor, cfg.reg_min),
        jnp.minimum(reg_used * cfg.reg_factor, cfg.reg_max),
    )
    xs_out = jax.tree.map(
        lambda new, old: jnp.where(improved, new, old), xs_new, xs
    )
    us_out = jnp.where(improved, us_new, us)
    c_out = jnp.where(improved, c_new, c_prev)
    done_next = done | (~improved & (reg_used >= cfg.reg_max)) | (
        improved & (c_prev - c_new < cfg.tol_cost * (1 + jnp.abs(c_prev)))
    )
    return xs_out, us_out, c_out, reg_next, it + 1, done_next

  def cond(carry):
    _, _, _, _, it, done = carry
    return (~done) & (it < cfg.iterations)

  reg0 = jnp.asarray(cfg.reg_init, dtype)
  xs_f, us_f, c_f, reg_f, it_f, _ = jax.lax.while_loop(
      cond, iteration,
      (xs0, us_init, cost0, reg0, jnp.asarray(0, jnp.int32), False),
  )

  # final gains for the returned trajectory (for MPC warm starts);
  # costs one extra linearization pass, so it is opt-in (cfg.final_gains)
  if cfg.final_gains:
    As, Bs = _linearize(m, d0, xs_f, us_f, cfg.lin_batch)
    head = jax.tree.map(lambda a: a[:T], xs_f)
    lx, lu, lxx, luu, lux = jax.vmap(
        lambda s, u, t: _quadratize_cost(m, cost, s, u, t)
    )(head, us_f, ts)
    x_T = jax.tree.map(lambda a: a[T], xs_f)
    gT, _, hT, _, _ = _quadratize_cost(
        m, cost, x_T, u_nil, jnp.asarray(T, dtype)
    )
    ks, Ks, _, _ = _backward(
        m, ILQRConfig(limits=cfg.limits), As, Bs, lx, lu, lxx, luu, lux,
        gT, hT, jnp.asarray(cfg.reg_min, dtype), u_lo, u_hi, us_f
    )
  else:
    ks = jnp.zeros((T, nu), dtype)
    Ks = jnp.zeros((T, nu, nx), dtype)

  return ILQRResult(
      us=us_f, xs=xs_f, cost=c_f, gains_K=Ks, gains_k=ks, niter=it_f,
      reg=reg_f,
  )


# ---------------------------------------------------------------------------
# LQR (infinite horizon, for the humanoid-balance config;
# recipe: reference python/LQR.ipynb)
# ---------------------------------------------------------------------------


def lqr_gain(a: jax.Array, b: jax.Array, q: jax.Array, r: jax.Array,
             iterations: int = 200):
  """Discrete-time infinite-horizon LQR gain via Riccati iteration.

  Returns (K, P) with u = -K dx.  The reference's LQR notebook solves the
  same DARE with scipy on the host; here it is a ``lax.scan`` usable
  inside jit (e.g. re-linearized on-device each MPC step).
  """

  def body(p, _):
    btp = b.T @ p
    gain = jnp.linalg.solve(r + btp @ b, btp @ a)
    p_new = q + a.T @ p @ (a - b @ gain)
    p_new = 0.5 * (p_new + p_new.T)
    return p_new, None

  p0 = q
  p, _ = jax.lax.scan(body, p0, None, length=iterations)
  k = jnp.linalg.solve(r + b.T @ p @ b, b.T @ p @ a)
  return k, p
