"""LSQR solver tests on systems with known solutions.

Mirrors tests_lsqr.f90 (626 LoC): determined / overdetermined /
underdetermined dense systems, plus soft-thresholding and early-exit
behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.ops.lsqr import lsqr_solve


def _dense_ops(A):
    Aj = jnp.asarray(A)
    return (lambda x: Aj @ x), (lambda u: Aj.T @ u)


def test_determined_system():
    """3x3 system with exact solution."""
    A = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 1.0], [0.0, 1.0, 4.0]])
    x_true = np.array([1.0, -2.0, 3.0])
    b = A @ x_true
    mv, rmv = _dense_ops(A)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), 3, niter=50, rmin=1e-14)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-10)


def test_overdetermined_least_squares():
    """Linear regression: min ||Ax - b|| with known normal-equations solution."""
    rng = np.random.default_rng(0)
    A = rng.normal(size=(50, 4))
    b = rng.normal(size=50)
    x_ls = np.linalg.lstsq(A, b, rcond=None)[0]
    mv, rmv = _dense_ops(A)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), 4, niter=200, rmin=1e-15)
    np.testing.assert_allclose(np.asarray(res.x), x_ls, atol=1e-8)


def test_underdetermined_minimum_norm():
    """LSQR converges to the minimum-norm solution for consistent
    underdetermined systems."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 8))
    x0 = rng.normal(size=8)
    b = A @ x0
    x_mn = A.T @ np.linalg.solve(A @ A.T, b)
    mv, rmv = _dense_ops(A)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), 8, niter=200, rmin=1e-15)
    np.testing.assert_allclose(np.asarray(res.x), x_mn, atol=1e-8)


def test_zero_rhs_returns_zero():
    """|b| = 0 => model is exact, x = 0 (lsqr_solver2.F90:123-126)."""
    A = np.eye(4)
    mv, rmv = _dense_ops(A)
    res = lsqr_solve(mv, rmv, jnp.zeros(4), 4, niter=50, rmin=1e-14)
    np.testing.assert_array_equal(np.asarray(res.x), np.zeros(4))


def test_soft_thresholding_sparsifies():
    """gamma > 0 applies ISTA soft thresholding each iteration."""
    rng = np.random.default_rng(2)
    A = rng.normal(size=(30, 10))
    x_true = np.zeros(10)
    x_true[[2, 7]] = [5.0, -4.0]
    b = A @ x_true
    mv, rmv = _dense_ops(A)
    res = lsqr_solve(mv, rmv, jnp.asarray(b), 10, niter=300, rmin=1e-15, gamma=1e-3)
    x = np.asarray(res.x)
    # The large coefficients are recovered, small ones pushed to ~0.
    assert abs(x[2] - 5.0) < 0.1
    assert abs(x[7] + 4.0) < 0.1


def test_damped_system_matches_ridge():
    """Stacked [A; alpha*I] system equals ridge regression."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(20, 6))
    b = rng.normal(size=20)
    alpha = 0.7
    x_ridge = np.linalg.solve(A.T @ A + alpha**2 * np.eye(6), A.T @ b)

    Aj = jnp.asarray(A)

    def mv(x):
        return jnp.concatenate([Aj @ x, alpha * x])

    def rmv(u):
        return Aj.T @ u[:20] + alpha * u[20:]

    bb = jnp.concatenate([jnp.asarray(b), jnp.zeros(6)])
    res = lsqr_solve(mv, rmv, bb, 6, niter=300, rmin=1e-15)
    np.testing.assert_allclose(np.asarray(res.x), x_ridge, atol=1e-8)


def test_target_misfit_early_exit():
    """With a misfit_fn and a loose target, the loop stops early."""
    rng = np.random.default_rng(4)
    A = rng.normal(size=(40, 40))
    x_true = rng.normal(size=40)
    b = A @ x_true
    mv, rmv = _dense_ops(A)

    def misfit_fn(x):
        return jnp.sqrt(jnp.sum((mv(x) - jnp.asarray(b)) ** 2) / 40)

    res = lsqr_solve(
        mv, rmv, jnp.asarray(b), 40, niter=500, rmin=1e-15,
        target_misfit=1.0, misfit_fn=misfit_fn,
    )
    assert int(res.iters) < 500
    assert float(res.misfit) <= 1.0 or int(res.iters) == 0
