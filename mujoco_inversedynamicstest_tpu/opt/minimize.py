"""Nonlinear least squares (Gauss-Newton) with box bounds.

Analog of the reference's ``python/mujoco/minimize.py:138 least_squares``
(dense Gauss-Newton with bounds, used for system ID / inverse problems),
re-designed TPU-first: the residual Jacobian comes from ``jax.jacfwd``
(the reference finite-differences it column-by-column on the host), the
bounded GN step is the projected-Newton ``box_qp`` (the reference uses
scipy), and the whole solve is a jittable ``lax.while_loop`` —
``vmap``-able over batches of problems.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from mujoco_inversedynamicstest_tpu.opt import qp


class LeastSquaresResult(NamedTuple):
  x: jax.Array        # solution
  cost: jax.Array     # 0.5 * ||r(x)||^2
  grad_norm: jax.Array
  niter: jax.Array


def least_squares(
    residual: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    bounds: Optional[tuple] = None,
    max_iter: int = 50,
    tol_grad: float = 1e-9,
    tol_step: float = 1e-12,
    mu_init: float = 1e-4,
    mu_factor: float = 3.0,
) -> LeastSquaresResult:
  """min_x 0.5 ||residual(x)||^2, optionally with lower/upper bounds.

  Levenberg-regularized Gauss-Newton: H = J'J + mu*I, step from
  ``box_qp`` when bounded (or a Cholesky solve when not), mu adapted on
  step acceptance — the reference's algorithm (minimize.py:138-330) as
  one jittable while_loop.
  """
  n = x0.shape[0]
  dtype = x0.dtype
  lo = bounds[0] if bounds is not None else None
  hi = bounds[1] if bounds is not None else None
  if lo is not None:
    x0 = jnp.clip(x0, lo, hi)

  def cost(x):
    r = residual(x)
    return 0.5 * r @ r

  eye = jnp.eye(n, dtype=dtype)

  def body(carry):
    x, c, mu, it, done = carry
    r = residual(x)
    jac = jax.jacfwd(residual)(x)
    g = jac.T @ r
    h = jac.T @ jac + mu * eye

    if lo is not None:
      res = qp.box_qp(h, g, lo - x, hi - x, maxiter=30)
      dx = res.x
    else:
      l = jnp.linalg.cholesky(h)
      dx = -jax.scipy.linalg.cho_solve((l, True), g)

    x_new = x + dx if lo is None else jnp.clip(x + dx, lo, hi)
    c_new = cost(x_new)
    improved = c_new < c
    x_out = jnp.where(improved, x_new, x)
    c_out = jnp.where(improved, c_new, c)
    mu_new = jnp.where(improved, jnp.maximum(mu / mu_factor, 1e-10),
                       jnp.minimum(mu * mu_factor, 1e10))
    gnorm = jnp.linalg.norm(g)
    step = jnp.linalg.norm(dx)
    done_new = done | (gnorm < tol_grad) | (improved & (step < tol_step)) | (
        ~improved & (mu >= 1e10)
    )
    return x_out, c_out, mu_new, it + 1, done_new

  def cond(carry):
    _, _, _, it, done = carry
    return (~done) & (it < max_iter)

  c0 = cost(x0)
  x, c, _, it, _ = jax.lax.while_loop(
      cond, body,
      (x0, c0, jnp.asarray(mu_init, dtype), jnp.asarray(0, jnp.int32),
       False),
  )
  r = residual(x)
  g = jax.jacfwd(residual)(x).T @ r
  return LeastSquaresResult(
      x=x, cost=c, grad_norm=jnp.linalg.norm(g), niter=it
  )
