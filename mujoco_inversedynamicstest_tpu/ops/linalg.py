"""Batched small-matrix Cholesky factor/solve — Pallas TPU kernels.

The reference's hot path factors the joint-space inertia (and the Newton
constraint Hessian) once per step per rollout (``mj_factorM``/``mj_solveLD``,
reference ``src/engine/engine_core_smooth.c:1470/1629``;
``FactorizeHessian``, ``engine_solver.c:1501``).  XLA's batched
``cholesky`` lowers to a serial per-matrix algorithm that wastes the VPU at
MuJoCo-scale nv (20-100).  These kernels use the TPU-native layout: the
*batch* dimension lives on vector lanes, the matrix is unrolled over
pivots, and the whole factorization runs in VMEM — every vector op
processes 128 rollouts at once.

Matrices are symmetric, so the column-major relayout is a plain reshape +
transpose done by XLA outside the kernel.

Exposed as ``jax.custom_batching.custom_vmap`` wrappers: unbatched calls
(and non-TPU backends) fall back to ``jnp.linalg``; a vmapped call on TPU
dispatches one kernel over the entire batch.
"""

from __future__ import annotations

import contextlib
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching

_LANES = 128

# Pallas dispatch gate.  History: round 2 shipped these kernels with a
# row-major-flatten shortcut that fed each matrix transposed; on
# bf16-asymmetric Newton Hessians that exploded into NaN lanes inside the
# fleet-MPC programs, and the gate was turned off (round 3) while the
# layout bug was root-caused and regression-tested
# (tests/test_linalg.py::test_pallas_chol_asymmetric_input_regression).
# Round 4 re-enabled it with hardware evidence: with the true
# column-major relayout, the batched humanoid step (batch 2048) and the
# fleet-MPC program both run 100% finite lanes with Pallas dispatching,
# at ~6% higher step throughput than the unrolled kernels in the same
# session.  BENCH_r04 carries the finite-lane proof.
PALLAS_ENABLED = True


def _use_pallas(batch: int, n: int) -> bool:
  if not PALLAS_ENABLED:
    return False
  if jax.default_backend() != "tpu":
    return False
  # lane tiling wants a multiple of 128; small n keeps VMEM bounded
  return batch % _LANES == 0 and 2 <= n <= 128


# ---------------------------------------------------------------------------
# Kernels.  Layout: column-major flattening (col * n + row, batch) so matrix
# columns are contiguous row-slices.
# ---------------------------------------------------------------------------


def _chol_kernel(n, h_ref, l_ref):
  """In-VMEM in-place right-looking Cholesky, unrolled over pivots.

  ``l_ref`` doubles as the working buffer (ref-mutating slice updates —
  Pallas TPU has no scatter).
  """
  l_ref[:] = h_ref[:]                # (n*n, LANES)
  for k in range(n):
    base = k * n
    if k:
      l_ref[base : base + k, :] = jnp.zeros_like(l_ref[base : base + k, :])
    pivot = l_ref[base + k : base + k + 1, :]
    rinv = jax.lax.rsqrt(jnp.maximum(pivot, 1e-30))
    lcol = l_ref[base + k : base + n, :] * rinv  # rows k.. of column k
    l_ref[base + k : base + n, :] = lcol
    # trailing update: column j (> k), rows j..n-1
    for j in range(k + 1, n):
      lj = lcol[j - k : j - k + 1, :]            # L[j, k]
      l_ref[j * n + j : j * n + n, :] = (
          l_ref[j * n + j : j * n + n, :] - lcol[j - k :, :] * lj
      )


def _solve_kernel(n, l_ref, b_ref, x_ref):
  """Forward+backward substitution with L (column-major), batched on lanes."""
  x_ref[:] = b_ref[:]                # (n, LANES)
  # y <- L^{-1} b
  for k in range(n):
    base = k * n
    dinv = 1.0 / l_ref[base + k : base + k + 1, :]
    yk = x_ref[k : k + 1, :] * dinv
    x_ref[k : k + 1, :] = yk
    if k + 1 < n:
      x_ref[k + 1 :, :] = (
          x_ref[k + 1 :, :] - l_ref[base + k + 1 : base + n, :] * yk
      )
  # x <- L^{-T} y
  for k in range(n - 1, -1, -1):
    base = k * n
    dinv = 1.0 / l_ref[base + k : base + k + 1, :]
    if k + 1 < n:
      dot = jnp.sum(
          l_ref[base + k + 1 : base + n, :] * x_ref[k + 1 :, :],
          axis=0, keepdims=True,
      )
      x_ref[k : k + 1, :] = (x_ref[k : k + 1, :] - dot) * dinv
    else:
      x_ref[k : k + 1, :] = x_ref[k : k + 1, :] * dinv


def _pallas_chol(h_batched: jax.Array) -> jax.Array:
  """(B, n, n) -> (B, n, n) lower factor, via the lane-batched kernel."""
  from jax.experimental import pallas as pl

  b, n, _ = h_batched.shape
  # true column-major flatten.  Do NOT shortcut via row-major + "it's
  # symmetric": matrices assembled by TPU matmuls are only symmetric to
  # bf16 accumulation error (measured ~1e-3 relative on Newton Hessians),
  # and feeding the transposed matrix amplified that into NaN factors.
  h_cm = h_batched.transpose(0, 2, 1).reshape(b, n * n).T   # (n*n, B)
  grid = (b // _LANES,)
  out = pl.pallas_call(
      partial(_chol_kernel, n),
      out_shape=jax.ShapeDtypeStruct((n * n, b), h_batched.dtype),
      grid=grid,
      in_specs=[pl.BlockSpec((n * n, _LANES), lambda i: (0, i))],
      out_specs=pl.BlockSpec((n * n, _LANES), lambda i: (0, i)),
  )(h_cm)
  # out is column-major; transpose each matrix back
  return out.T.reshape(b, n, n).transpose(0, 2, 1)


def _pallas_solve(l_batched: jax.Array, b_vec: jax.Array) -> jax.Array:
  """(B, n, n) lower factor + (B, n) rhs -> (B, n) solution."""
  from jax.experimental import pallas as pl

  b, n, _ = l_batched.shape
  l_cm = l_batched.transpose(0, 2, 1).reshape(b, n * n).T  # (n*n, B)
  rhs = b_vec.T                                             # (n, B)
  grid = (b // _LANES,)
  out = pl.pallas_call(
      partial(_solve_kernel, n),
      out_shape=jax.ShapeDtypeStruct((n, b), b_vec.dtype),
      grid=grid,
      in_specs=[
          pl.BlockSpec((n * n, _LANES), lambda i: (0, i)),
          pl.BlockSpec((n, _LANES), lambda i: (0, i)),
      ],
      out_specs=pl.BlockSpec((n, _LANES), lambda i: (0, i)),
  )(l_cm, rhs)
  return out.T


# ---------------------------------------------------------------------------
# Unrolled-pivot batched kernels (pure XLA).
#
# XLA's batched `lax.linalg.cholesky` serializes badly on TPU at MuJoCo
# scale — measured 6.5 ms for (2048, 27, 27) f32, ~45% of the whole step.
# Unrolling the pivot loop into n rank-1 updates keeps every op a
# (B,)-wide elementwise/VPU op that fuses with its neighbors: 0.94 ms for
# the same shape (6.9x), and 0.83 vs 1.46 ms for the two substitutions.
# ---------------------------------------------------------------------------

# unrolled-graph cap: n pivots (factor) and ~n^2/2 fused multiply-subs
# (solve) enter the graph; past this, trace/compile cost beats the win
_UNROLL_N_MAX = 36


def _chol_unrolled(h: jax.Array) -> jax.Array:
  """(B, n, n) -> lower factor; batch-first unrolled right-looking.

  Pivots are clamped at a tiny positive value exactly like the
  reference's ``mju_cholFactor`` (engine_util_solve.c:32): in f32 the
  rank-1 update cascade can round a pivot of an ill-conditioned Newton
  Hessian negative; the clamp yields a finite (if locally poor) factor
  and the solver's monotone line search absorbs the bad direction — the
  C engine's exact behavior.  f64 never reaches the clamp.
  """
  n = h.shape[-1]
  minval = jnp.asarray(1e-15, h.dtype)
  cols = []
  arange = jnp.arange(n)
  for k in range(n):
    # left-looking: one fused dot-reduction per entry (matches LAPACK's
    # rounding profile; a rank-1 update cascade accumulates k sequential
    # roundings per entry and measurably diverges in f32)
    col = h[:, :, k]
    if cols:
      lp = jnp.stack(cols, axis=2)               # (B, n, k)
      # full-precision contraction: the default TPU matmul feeds the MXU
      # bf16 inputs, and ~1e-2 relative error in the correction term is
      # enough to destabilize the factor (measured: lanes diverging from
      # near-reference states)
      col = col - jnp.einsum("bnj,bj->bn", lp, lp[:, k, :],
                             precision=jax.lax.Precision.HIGHEST)
    pivot = jnp.sqrt(jnp.maximum(col[:, k], minval))
    col = jnp.where((arange >= k)[None, :], col / pivot[:, None], 0.0)
    cols.append(col)
  return jnp.stack(cols, axis=2)


def _solve_unrolled(l: jax.Array, rhs: jax.Array) -> jax.Array:
  """(B, n, n) lower factor + (B, n[, k]) rhs -> solution of L L^T x = b.

  Unrolled substitutions fuse into neighboring step ops; standalone the
  scan form is faster (4.3 vs 6.3 ms at (2048, 27) f32) but inside the
  fused step program the scan's sequential loop carries cost ~12% whole-
  step throughput (measured r4), so plain step programs keep this form
  and ``lean_compile`` regions use the scan."""
  n = l.shape[-1]
  extra = rhs.ndim - 2  # trailing rhs dims beyond (B, n)

  def c(i, j):
    v = l[:, i, j]
    return v.reshape(v.shape + (1,) * extra)

  y = []
  for i in range(n):
    acc = rhs[:, i]
    for j in range(i):
      acc = acc - c(i, j) * y[j]
    y.append(acc / c(i, i))
  x = [None] * n
  for i in range(n - 1, -1, -1):
    acc = y[i]
    for j in range(i + 1, n):
      acc = acc - c(j, i) * x[j]
    x[i] = acc / c(i, i)
  return jnp.stack(x, axis=1)


# ---------------------------------------------------------------------------
# Scan-over-pivots batched kernels (compile-lean variants).
#
# The unrolled kernels trace O(n) pivot stages into the graph; under
# ``jacfwd`` linearization (the MPC transition Jacobian) each stage is
# JVP-expanded and the compile cost explodes — measured 201 s to compile
# jacfwd(factor∘solve) at (2048, 27) f32 on TPU vs 5.8 s for the scan
# forms (whose jacfwd is a scan of the JVP body: O(1) graph).  Runtime on
# the same shape: factor 5.6 ms scan vs 3.2 unrolled (slower — masked
# full-matrix updates), solve 4.3 ms scan vs 6.3 unrolled (faster).  So:
# solve is always scan on TPU; factor is unrolled in plain step programs
# and switches to scan inside ``lean_compile()`` regions (MPC
# linearization, fleet programs) where compile time dominates.
# ---------------------------------------------------------------------------

_LEAN = threading.local()


@contextlib.contextmanager
def lean_compile(enable: bool = True):
  """Within this context, batched factorizations trace the O(1)-graph
  scan kernels instead of the unrolled ones (for jacfwd-heavy programs)."""
  prev = getattr(_LEAN, "on", False)
  _LEAN.on = enable
  try:
    yield
  finally:
    _LEAN.on = prev


def _lean_on() -> bool:
  return getattr(_LEAN, "on", False)


def _chol_scan(h: jax.Array) -> jax.Array:
  """(B, n, n) -> lower factor via ``lax.scan`` over pivots.

  Right-looking with masked trailing updates; same pivot clamp as the
  unrolled kernel.  Compile size is O(1) in n (one scan body).
  """
  n = h.shape[-1]
  minval = jnp.asarray(1e-15, h.dtype)
  idx = jnp.arange(n)

  def body(a, k):
    pivot = jnp.sqrt(jnp.maximum(a[:, k, k], minval))          # (B,)
    col = jnp.where(idx >= k, a[:, :, k] / pivot[:, None], 0.0)  # (B, n)
    mask = idx > k
    upd = col[:, :, None] * col[:, None, :]
    upd = jnp.where(mask[None, :, None] & mask[None, None, :], upd, 0.0)
    a = (a - upd).at[:, :, k].set(col)
    return a, None

  a, _ = jax.lax.scan(body, h, jnp.arange(n))
  return jnp.where(idx[None, :, None] >= idx[None, None, :], a, 0.0)


def _solve_scan(l: jax.Array, rhs: jax.Array) -> jax.Array:
  """(B, n, n) lower factor + (B, n[, k...]) rhs -> L L^T x = b, via two
  masked ``lax.scan`` substitutions (O(1) compile; beats the unrolled
  form at runtime too — fewer, wider fused ops)."""
  n = l.shape[-1]
  extra = rhs.ndim - 2
  idx = jnp.arange(n)

  def exp(v):  # (B,) or (B, n) -> append rhs' trailing dims
    return v.reshape(v.shape + (1,) * extra)

  def fwd(y, k):
    lk = l[:, :, k]                                 # column k
    yk = jnp.take(y, k, axis=1) / exp(l[:, k, k])   # (B, *extra)
    y = y - exp(jnp.where(idx > k, lk, 0.0)) * yk[:, None]
    y = y.at[:, k].set(yk)
    return y, None

  y, _ = jax.lax.scan(fwd, rhs, jnp.arange(n))

  def bwd(x, k):
    lk = l[:, k, :]                                 # row k
    xk = jnp.take(x, k, axis=1) / exp(l[:, k, k])
    x = x - exp(jnp.where(idx < k, lk, 0.0)) * xk[:, None]
    x = x.at[:, k].set(xk)
    return x, None

  x, _ = jax.lax.scan(bwd, y, jnp.arange(n - 1, -1, -1))
  return x


def _use_unrolled(batch: int, n: int) -> bool:
  # TPU-only, like _use_pallas: the unrolled graph is the TPU fast path
  # (fused VPU rank-1 updates), but its O(n) pivot stages multiply through
  # jacfwd linearizations into minutes of *CPU* compile time — round 3's
  # 8-device dryrun gate timed out (2512 s) purely on XLA:CPU compiles of
  # these graphs.  CPU callers get jnp.linalg.cholesky, which lowers to a
  # LAPACK custom-call: no graph blow-up and faster anyway on that backend.
  if jax.default_backend() != "tpu":
    return False
  return 2 <= n <= _UNROLL_N_MAX


# ---------------------------------------------------------------------------
# custom_vmap wrappers
# ---------------------------------------------------------------------------


@custom_batching.custom_vmap
def chol_factor(h: jax.Array) -> jax.Array:
  """Lower Cholesky factor of an SPD matrix (batched -> unrolled/Pallas)."""
  # Route the unbatched case through the same clamped kernel as the
  # batched one (advisor r3): otherwise the same non-SPD matrix yields a
  # finite (clamped) factor under vmap but NaN unbatched, and fleet runs
  # diverge from single-scene runs in a way NaN checks can't see.
  if h.ndim == 2 and _use_unrolled(1, h.shape[-1]):
    return _chol_unrolled(h[None])[0]
  return jnp.linalg.cholesky(h)


@chol_factor.def_vmap
def _chol_factor_vmap(axis_size, in_batched, h):
  (h_batched,) = in_batched
  if h_batched and h.ndim == 3:
    if _use_pallas(h.shape[0], h.shape[1]):
      return _pallas_chol(h), True
    if _use_unrolled(h.shape[0], h.shape[1]):
      if _lean_on():
        return _chol_scan(h), True
      return _chol_unrolled(h), True
  return jnp.linalg.cholesky(h), h_batched


@custom_batching.custom_vmap
def chol_solve(l: jax.Array, b: jax.Array) -> jax.Array:
  """Solves (L L^T) x = b given the lower factor."""
  return jax.scipy.linalg.cho_solve((l, True), b)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, l, b):
  l_batched, b_batched = in_batched
  if (
      l_batched and b_batched and l.ndim == 3 and b.ndim == 2
      and _use_pallas(l.shape[0], l.shape[1])
  ):
    return _pallas_solve(l, b), True
  if l_batched or b_batched:
    lb = l if l_batched else jnp.broadcast_to(l, (axis_size,) + l.shape)
    bb = b if b_batched else jnp.broadcast_to(b, (axis_size,) + b.shape)
    if lb.ndim == 3 and bb.ndim in (2, 3) and _use_unrolled(
        lb.shape[0], lb.shape[1]):
      if _lean_on():
        return _solve_scan(lb, bb), True
      return _solve_unrolled(lb, bb), True
    return jax.vmap(
        lambda li, bi: jax.scipy.linalg.cho_solve((li, True), bi)
    )(lb, bb), True
  return jax.scipy.linalg.cho_solve((l, True), b), False
