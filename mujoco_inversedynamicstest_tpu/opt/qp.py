"""QP / banded linear algebra for trajectory optimization.

Analogs of the reference's optimization utilities
(``src/engine/engine_util_solve.c``):

* ``box_qp`` — projected-Newton box-constrained QP, analog of
  ``mju_boxQP`` (reference ``engine_util_solve.c:1034``).  The reference
  mutates a Cholesky factor with rank-1 downdates; here each Newton
  iteration re-factors the masked free-set Hessian — a dense (n,n)
  Cholesky is a single fused XLA op, it vmaps across thousands of QPs
  (one per rollout/timestep), and keeps shapes static.

* ``chol_factor_band`` / ``chol_solve_band`` — banded Cholesky, analog of
  ``mju_cholFactorBand`` / ``mju_cholSolveBand`` (reference
  ``engine_util_solve.c:291/395``), the band solver used for
  trajectory-wide Newton steps.  Band storage is dense-row format
  identical to the reference; the factorization scans over rows with
  ``lax.scan`` carrying a sliding window so the trace is O(ntotal) ops of
  static (nband, nband) shape — MXU-tileable and vmappable over batches.

All functions are jittable and shape-static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class BoxQPResult(NamedTuple):
  x: jax.Array          # (n,) solution
  free: jax.Array       # (n,) bool: dofs strictly inside the box
  cost: jax.Array       # scalar objective 0.5 x'Hx + x'g
  niter: jax.Array      # iterations taken
  hfree_chol: jax.Array  # (n, n) Cholesky of the masked free Hessian


def _masked_chol_solve(h: jax.Array, g: jax.Array, free: jax.Array):
  """Solves H[free,free] x = g[free] with clamped rows pinned to identity.

  Keeps the (n, n) shape static: clamped rows/cols of H are zeroed and
  their diagonal set to 1, clamped entries of g zeroed — equivalent to
  solving the free subsystem (the reference instead compresses indices,
  ``engine_util_solve.c:1116-1133``).
  """
  fm = free.astype(h.dtype)
  hm = h * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
  l = jnp.linalg.cholesky(hm)
  x = jax.scipy.linalg.cho_solve((l, True), g * fm)
  return x * fm, l


def box_qp(h: jax.Array, g: jax.Array, lower: Optional[jax.Array] = None,
           upper: Optional[jax.Array] = None,
           x0: Optional[jax.Array] = None, maxiter: int = 50,
           tol_grad: float = 1e-10, tol_ls: float = 1e-8) -> BoxQPResult:
  """min_x 0.5 x'Hx + x'g  s.t. lower <= x <= upper  (projected Newton).

  Analog of ``mju_boxQP`` (reference ``engine_util_solve.c:1034``):
  identical free-set logic (clamped = at bound AND gradient pushing
  outward) and Armijo backtracking projected line search, recomposed as a
  ``lax.while_loop`` with static shapes.  H must be SPD.
  """
  n = g.shape[0]
  dtype = g.dtype
  big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
  lo = jnp.full((n,), -big, dtype) if lower is None else lower
  hi = jnp.full((n,), big, dtype) if upper is None else upper
  x_init = jnp.zeros(n, dtype) if x0 is None else x0
  x_init = jnp.clip(x_init, lo, hi)

  def cost(x):
    return 0.5 * x @ (h @ x) + x @ g

  def body(carry):
    x, _, it, _ = carry
    grad = h @ x + g
    at_lo = (x <= lo) & (grad > 0)
    at_hi = (x >= hi) & (grad < 0)
    free = ~(at_lo | at_hi)
    dx, l = _masked_chol_solve(h, -grad, free)

    # projected Armijo backtracking (ref :1171-1192)
    c0 = cost(x)
    slope = grad @ dx

    def ls_body(ls_carry):
      alpha, _, _ = ls_carry
      xn = jnp.clip(x + alpha * dx, lo, hi)
      ok = cost(xn) <= c0 + 0.1 * alpha * slope
      return alpha * 0.5, xn, ok

    def ls_cond(ls_carry):
      alpha, _, ok = ls_carry
      return (~ok) & (alpha > tol_ls)

    xn0 = jnp.clip(x + dx, lo, hi)
    ok0 = cost(xn0) <= c0 + 0.1 * slope
    _, x_new, _ = jax.lax.while_loop(
        ls_cond, ls_body, (jnp.asarray(0.5, dtype), xn0, ok0)
    )

    gnorm = jnp.linalg.norm(grad * free.astype(dtype))
    improved = cost(x_new) < c0 - 1e-16
    done = (gnorm < tol_grad) | ~improved
    x_out = jnp.where(improved, x_new, x)
    return x_out, l, it + 1, done

  def cond(carry):
    _, _, it, done = carry
    return (~done) & (it < maxiter)

  l0 = jnp.eye(n, dtype=dtype)
  x, l, it, _ = jax.lax.while_loop(
      cond, body, (x_init, l0, jnp.asarray(0, jnp.int32), False)
  )
  grad = h @ x + g
  free = ~(((x <= lo) & (grad > 0)) | ((x >= hi) & (grad < 0)))
  return BoxQPResult(x=x, free=free, cost=cost(x), niter=it, hfree_chol=l)


# ---------------------------------------------------------------------------
# banded Cholesky (trajectory band solver)
# ---------------------------------------------------------------------------


def chol_factor_band(mat_band: jax.Array, diagadd: float = 0.0,
                     diagmul: float = 0.0) -> jax.Array:
  """Cholesky of a banded SPD matrix in dense-row band storage.

  Analog of ``mju_cholFactorBand`` (reference ``engine_util_solve.c:291``)
  without the trailing dense block.  ``mat_band`` is (ntotal, nband):
  row i holds [A[i, i-nband+1], ..., A[i, i]] left-zero-padded — the
  reference's band layout.  Returns L in the same layout (last column is
  the diagonal of L).
  """
  ntotal, nband = mat_band.shape
  dtype = mat_band.dtype
  scale = 1.0 + diagmul
  e_idx = jnp.arange(nband)

  def row_step(window, row):
    # window: (nband-1, nband) previous L band rows, aligned so window[c]
    # is the band row of matrix row i-nband+1+c (out-of-range rows are
    # zeros with unit diagonal, contributing nothing).
    r = row.at[-1].multiply(scale).at[-1].add(diagadd)

    def col(c, r):
      # L[i, j] for j = i-nband+1+c: subtract sum_e<c r[e]*L[j, col(e)],
      # where L[j, i-nband+1+e] lives at window[c][nband-1+e-c].
      wj = window[c]
      gather = jnp.clip(nband - 1 + e_idx - c, 0, nband - 1)
      dot = jnp.sum(jnp.where(e_idx < c, r[e_idx] * wj[gather], 0.0))
      return r.at[c].set((r[c] - dot) / wj[nband - 1])

    if nband > 1:
      r = jax.lax.fori_loop(0, nband - 1, col, r)
      diag_sq = r[-1] - jnp.sum(r[:-1] ** 2)
    else:
      diag_sq = r[-1]
    r = r.at[-1].set(jnp.sqrt(jnp.maximum(diag_sq, 1e-30)))
    if nband > 1:
      window = jnp.concatenate([window[1:], r[None]], axis=0)
    return window, r

  w0 = jnp.zeros((max(nband - 1, 0), nband), dtype)
  if nband > 1:
    # rows before the start: zero entries, unit diagonal
    w0 = w0.at[:, -1].set(1.0)
  _, l_band = jax.lax.scan(row_step, w0, mat_band)
  return l_band


def chol_solve_band(l_band: jax.Array, b: jax.Array) -> jax.Array:
  """Solves (L L') x = b given the band factor from ``chol_factor_band``.

  Analog of ``mju_cholSolveBand`` (reference ``engine_util_solve.c:395``).
  Forward then backward substitution, each a ``lax.scan`` carrying an
  (nband-1,) sliding window of solved entries.
  """
  ntotal, nband = l_band.shape
  dtype = l_band.dtype

  # forward: L y = b
  def fwd(window, inp):
    lrow, bi = inp
    dot = jnp.sum(lrow[:-1] * window)
    yi = (bi - dot) / lrow[-1]
    new_window = jnp.concatenate([window[1:], yi[None]]) if nband > 1 else (
        window
    )
    return new_window, yi

  w0 = jnp.zeros((nband - 1,), dtype)
  _, y = jax.lax.scan(fwd, w0, (l_band, b))

  # backward: L' x = y — scan in reverse; row i of L' has entries
  # L[i+t, i] for t in [0, nband), i.e. l_band[i+t, nband-1-t].
  idx = jnp.arange(ntotal)
  t = jnp.arange(1, nband)
  # gather L[i+t, nband-1-t] with zero padding past the end
  rows = jnp.clip(idx[:, None] + t[None, :], 0, ntotal - 1)
  upper = jnp.where(
      (idx[:, None] + t[None, :]) < ntotal,
      l_band[rows, nband - 1 - t[None, :]],
      0.0,
  )  # (ntotal, nband-1): column t-1 holds L[i+t, i]

  def bwd(window, inp):
    urow, yi, lii = inp
    dot = jnp.sum(urow * window)
    xi = (yi - dot) / lii
    new_window = jnp.concatenate([xi[None], window[:-1]]) if nband > 1 else (
        window
    )
    return new_window, xi

  w0 = jnp.zeros((nband - 1,), dtype)
  _, x_rev = jax.lax.scan(
      bwd, w0, (upper[::-1], y[::-1], l_band[::-1, -1])
  )
  return x_rev[::-1]


def band_to_dense(mat_band: jax.Array, lower_only: bool = False):
  """Expands band storage to a dense (ntotal, ntotal) matrix (testing aid,
  analog of ``mju_band2Dense``, reference ``engine_util_solve.c``)."""
  ntotal, nband = mat_band.shape
  dense = jnp.zeros((ntotal, ntotal), mat_band.dtype)
  for k in range(nband):
    # band column k of row i is A[i, i - nband + 1 + k]
    offset = nband - 1 - k
    vals = mat_band[offset:, k]
    dense = dense.at[jnp.arange(offset, ntotal),
                     jnp.arange(ntotal - offset)].set(vals)
  if not lower_only:
    dense = dense + jnp.tril(dense, -1).T
  return dense


def dense_to_band(dense: jax.Array, nband: int) -> jax.Array:
  """Packs the lower band of a dense SPD matrix into band storage."""
  ntotal = dense.shape[0]
  band = jnp.zeros((ntotal, nband), dense.dtype)
  for k in range(nband):
    offset = nband - 1 - k
    vals = jnp.diagonal(dense, -offset)
    band = band.at[jnp.arange(offset, ntotal), k].set(vals)
  return band
