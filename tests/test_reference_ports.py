"""Exact-value unit tests ported from the reference's own suite.

The reference ships closed-form systems with known solutions inside the
binary (src/tests/tests_lsqr.f90, tests_inversion.f90, run via ftnunit).
These are the strongest cross-implementation anchors available without a
Fortran toolchain: the EXPECTED VALUES come from the reference (and the
books it cites), not from our own code, so a solver-semantics regression
cannot pass by being self-consistent.

Each test cites the reference subroutine it ports. The systems are
re-expressed as (matvec, rmatvec) closures — the solver interface of this
rebuild — rather than CSR assembly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.ops.lsqr import lsqr_solve


def _solve_dense(A, b, niter=100, rmin=1e-13, gamma=0.0):
    A = jnp.asarray(A, jnp.float64)
    b = jnp.asarray(b, jnp.float64)
    res = lsqr_solve(
        lambda x: A @ x, lambda u: A.T @ u, b, A.shape[1],
        niter=niter, rmin=rmin, gamma=gamma,
    )
    return np.asarray(res.x)


def test_lsqr_determined():
    """tests_lsqr.f90::test_lsqr_determined (N = 1440): A[j, :] = j,
    b[j] = j * N -> x = ones (the documented expected solution; the matrix
    is rank-1 so this is the LSQR/minimum-norm-consistent answer)."""
    N = 1440
    j = np.arange(1, N + 1, dtype=np.float64)
    A = np.repeat(j[:, None], N, axis=1)
    b = j * N
    x = _solve_dense(A, b, rmin=1e-13)
    np.testing.assert_allclose(x, np.ones(N), rtol=1e-10)


def test_lsqr_overdetermined_1():
    """tests_lsqr.f90::test_lsqr_overdetermined_1: quadratic regression
    design matrix (1000 x 3), x_i = i/N, data from b = (1, -3, 0)
    [van de Geer 2005 example] -> exact recovery."""
    n = 1000
    xi = np.arange(1, n + 1, dtype=np.float64) / n
    A = np.stack([xi**0, xi**1, xi**2], axis=1)
    b_true = np.array([1.0, -3.0, 0.0])
    x = _solve_dense(A, A @ b_true, niter=100, rmin=1e-14)
    np.testing.assert_allclose(x[:2], b_true[:2], rtol=1e-12)
    assert abs(x[2]) < 1e-12


def test_lsqr_overdetermined_2_wunsch():
    """tests_lsqr.f90::test_lsqr_overdetermined_2: the Wunsch (1996)
    Eq.(1.2.13) ocean-circulation least-squares system; expected solution
    (157.611, -38.0747, 96.0291) to 1e-3 (reference tolerance_local for
    double-precision kernels, tests_lsqr.f90:313-316)."""
    A = np.array([
        [1.2550, 1.6731, -1.3927],
        [0.4891, 0.0943, -0.7829],
        [-0.1755, 1.8612, 1.0972],
        [0.4189, 0.2469, -0.5990],
        [-0.2900, 0.7677, 0.8188],
    ])
    b = np.array([0.3511, -1.6710, 6.838, -0.8843, 3.7018])
    x = _solve_dense(A, b, niter=100, rmin=1e-13)
    assert abs(x[0] - 157.611) < 1e-3
    assert abs(x[1] + 38.0747) < 1e-3
    assert abs(x[2] - 96.0291) < 1e-3


def test_lsqr_underdetermined_1():
    """tests_lsqr.f90::test_lsqr_underdetermined_1: x1 + x2 = 1,
    2x1 + x2 - q = 0 -> minimum-norm solution (0, 1, 1), with the
    reference's strict |x1| < 1e-15 bound (Wunsch Eq.(3.4.120))."""
    A = np.array([[1.0, 1.0, 0.0], [2.0, 1.0, -1.0]])
    b = np.array([1.0, 0.0])
    x = _solve_dense(A, b, niter=100, rmin=1e-13)
    assert abs(x[0]) < 1e-15
    np.testing.assert_allclose(x[1:], [1.0, 1.0], rtol=1e-12)


def test_lsqr_underdetermined_2_menke():
    """tests_lsqr.f90::test_lsqr_underdetermined_2: Menke (1989) p.102,
    G = [1/4 1/4 1/4 1/4], d = 1 -> minimum-length solution m = ones."""
    A = np.full((1, 4), 0.25)
    b = np.array([1.0])
    x = _solve_dense(A, b, niter=100, rmin=1e-14)
    np.testing.assert_allclose(x, np.ones(4), rtol=1e-12)


def test_lsqr_underdetermined_3_wunsch():
    """tests_lsqr.f90::test_lsqr_underdetermined_3: Wunsch p.187 after
    Eq.(3.6.26) -> minimum-norm (0, 0.5, 0.5, 0)."""
    A = np.array([[1.0, 1.0, 1.0, 1.0], [1.0, -1.0, -1.0, 1.0]])
    b = np.array([1.0, -1.0])
    x = _solve_dense(A, b, niter=100, rmin=1e-14)
    np.testing.assert_allclose(x, [0.0, 0.5, 0.5, 0.0], atol=1e-12)


@pytest.mark.parametrize("der_type", [1, 2])
def test_cross_gradient_element_count(der_type):
    """tests_inversion.f90::test_cross_gradient_calculate: on a
    20 x 20 x 144 unit grid with model1 = i, model2 = i + 1 the reference's
    assembled constraint matrix stores EXACTLY 457,904 nonzero elements
    (CSR add() skips zero values, sparse_matrix.f90's add) and tau == 0
    (parallel gradients). Our stencil cubes must reproduce that count
    bit-for-bit: nonzero coefficients of C1 + C2 == stored CSR elements."""
    from tomofastx_tpu.inversion import operators as ops

    nx, ny, nz = 20, 20, 144
    N = nx * ny * nz
    ii = np.tile(np.arange(1, nx + 1), ny * nz).astype(np.float64)
    m1 = jnp.asarray(ii)
    m2 = jnp.asarray(ii + 1.0)
    cw = jnp.ones(N)
    op = ops.make_cross_gradient(
        m1, m2, cw, cw, 1.0, der_type, (0, 0), None, 0,
        jnp.ones(nx), jnp.ones(ny), jnp.ones(nz), nx, ny, nz,
    )
    count = int(np.count_nonzero(np.asarray(op.C1))) + int(
        np.count_nonzero(np.asarray(op.C2))
    )
    assert count == 457904
    np.testing.assert_array_equal(np.asarray(op.cost), 0.0)
    np.testing.assert_array_equal(np.asarray(op.rhs), 0.0)
