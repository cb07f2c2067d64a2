"""Lane-batched Cholesky kernel tests (ops/linalg.py).

The Pallas kernels are validated here in interpret mode (runs on the CPU
test mesh) against numpy, including the regression that broke round 2:
matrices assembled by TPU matmuls are only symmetric to accumulation
error, and the old row-major-flatten shortcut fed the kernel an
effectively transposed matrix, exploding the factorization into NaN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_inversedynamicstest_tpu.ops import linalg


def _pallas_chol_interpret(hb):
  from functools import partial

  from jax.experimental import pallas as pl

  b, n, _ = hb.shape
  h_cm = hb.transpose(0, 2, 1).reshape(b, n * n).T
  out = pl.pallas_call(
      partial(linalg._chol_kernel, n),
      out_shape=jax.ShapeDtypeStruct((n * n, b), hb.dtype),
      grid=(b // linalg._LANES,),
      in_specs=[pl.BlockSpec((n * n, linalg._LANES), lambda i: (0, i))],
      out_specs=pl.BlockSpec((n * n, linalg._LANES), lambda i: (0, i)),
      interpret=True,
  )(h_cm)
  return out.T.reshape(b, n, n).transpose(0, 2, 1)


@pytest.mark.parametrize("n", [4, 27])
def test_pallas_chol_kernel_exact(n):
  rng = np.random.RandomState(0)
  B = 128
  A = rng.randn(B, n, n)
  H = np.einsum("bij,bkj->bik", A, A) + 3.0 * np.eye(n)
  L = np.asarray(_pallas_chol_interpret(jnp.asarray(H)))
  Lref = np.linalg.cholesky(H)
  np.testing.assert_allclose(np.tril(L), Lref, atol=1e-10)


def test_pallas_chol_asymmetric_input_regression():
  """The kernel must consume true columns: a matrix with O(1e-3) bf16
  asymmetry (the TPU-matmul Newton Hessian case) must factor like its
  lower triangle, not explode (round-2 NaN root cause)."""
  rng = np.random.RandomState(1)
  n, B = 27, 128
  A = rng.randn(n, n)
  H = A @ A.T + 3.0 * np.eye(n)
  H_asym = H + 1e-3 * np.triu(rng.randn(n, n), k=1)  # upper-only noise
  Hb = np.broadcast_to(H_asym, (B, n, n)).copy()
  L = np.asarray(_pallas_chol_interpret(jnp.asarray(Hb)))
  assert np.isfinite(L).all()
  # the kernel reads columns => effectively factors the symmetrization of
  # the lower triangle; compare against cholesky of the lower part
  H_lower = np.tril(H_asym) + np.tril(H_asym, -1).T
  np.testing.assert_allclose(np.tril(L[0]), np.linalg.cholesky(H_lower),
                             atol=1e-8)


@pytest.mark.parametrize("n", [2, 5, 27])
def test_unrolled_and_scan_kernels_match_lapack(n):
  """The TPU kernels (unrolled + scan factor/solve) are exact vs numpy.

  On the CPU test backend the public wrappers dispatch to LAPACK, so the
  TPU code paths are exercised directly here (they are pure jnp)."""
  rng = np.random.RandomState(3)
  B = 32
  A = rng.randn(B, n, n)
  H = np.einsum("bij,bkj->bik", A, A) + 3.0 * np.eye(n)
  b = rng.randn(B, n)
  bmat = rng.randn(B, n, 2)
  Lref = np.linalg.cholesky(H)
  xref = np.linalg.solve(H, b[..., None])[..., 0]
  xmref = np.linalg.solve(H, bmat)

  for factor in (linalg._chol_unrolled, linalg._chol_scan):
    L = np.asarray(jax.jit(factor)(jnp.asarray(H)))
    np.testing.assert_allclose(L, Lref, atol=1e-10, err_msg=factor.__name__)

  x = np.asarray(jax.jit(linalg._solve_scan)(jnp.asarray(Lref),
                                             jnp.asarray(b)))
  np.testing.assert_allclose(x, xref, atol=1e-10)
  xm = np.asarray(jax.jit(linalg._solve_scan)(jnp.asarray(Lref),
                                              jnp.asarray(bmat)))
  np.testing.assert_allclose(xm, xmref, atol=1e-10)


def test_scan_kernels_jacfwd_matches_unrolled():
  """jacfwd through the scan kernels (the lean_compile MPC path) agrees
  with jacfwd through the unrolled kernels."""
  rng = np.random.RandomState(4)
  n, B = 5, 8
  A = rng.randn(B, n, n)
  H = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + 3.0 * np.eye(n))
  b = jnp.asarray(rng.randn(B, n))
  eye = jnp.eye(n)

  def make(factor):
    def f(v):
      Hp = H + v[None, :, None] * eye[None]
      return linalg._solve_scan(factor(Hp), b).sum(0)
    return jax.jacfwd(f)

  v0 = jnp.zeros(n)
  j_unrolled = np.asarray(make(linalg._chol_unrolled)(v0))
  j_scan = np.asarray(make(linalg._chol_scan)(v0))
  np.testing.assert_allclose(j_scan, j_unrolled, atol=1e-9)


def test_lean_compile_context():
  assert not linalg._lean_on()
  with linalg.lean_compile():
    assert linalg._lean_on()
    with linalg.lean_compile(False):
      assert not linalg._lean_on()
    assert linalg._lean_on()
  assert not linalg._lean_on()


def test_chol_wrappers_match_jnp():
  """The public chol_factor/chol_solve wrappers (jnp path on CPU) agree
  with scipy for batched and unbatched calls."""
  rng = np.random.RandomState(2)
  n, B = 11, 16
  A = rng.randn(B, n, n)
  H = np.einsum("bij,bkj->bik", A, A) + np.eye(n)
  b = rng.randn(B, n)
  L = jax.vmap(linalg.chol_factor)(jnp.asarray(H))
  x = jax.vmap(linalg.chol_solve)(L, jnp.asarray(b))
  xr = np.linalg.solve(H, b[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x), xr, atol=1e-10)
  # unbatched
  x1 = linalg.chol_solve(linalg.chol_factor(jnp.asarray(H[0])),
                         jnp.asarray(b[0]))
  np.testing.assert_allclose(np.asarray(x1), xr[0], atol=1e-10)
