"""Constraint-operator tests.

Mirrors tests_inversion.f90 (damping block is exactly a scaled identity;
cross-gradient matrix against analytic expectations) and adds adjointness
checks <A x, u> == <x, A^T u> that the LSQR bidiagonalization depends on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.inversion import operators as ops


NX, NY, NZ = 4, 5, 3
N = NX * NY * NZ
RNG = np.random.default_rng(0)


def _grids():
    dX = jnp.asarray(1.0 + 0.1 * np.arange(NX))
    dY = jnp.asarray(2.0 + 0.2 * np.arange(NY))
    dZ = jnp.asarray(0.5 + 0.05 * np.arange(NZ))
    return dX, dY, dZ


# ---------------------------------------------------------------------------
# Damping
# ---------------------------------------------------------------------------


def test_damping_identity():
    """With norm 2 and no local weights, the damping block is exactly
    alpha * pw * I (tests_inversion.f90:50-127)."""
    alpha, pw = 0.3, 0.8
    model = jnp.asarray(RNG.normal(size=(1, N)))
    prior = jnp.asarray(RNG.normal(size=(1, N)))
    cw = jnp.asarray(1.0 + RNG.random(N))
    op = ops.make_damping(alpha, pw, 2.0, model, prior, cw, None, False, 0, NX, NY, NZ)
    x = jnp.asarray(RNG.normal(size=(1, N)))
    np.testing.assert_allclose(np.asarray(op.matvec(x)), alpha * pw * np.asarray(x).ravel())
    # RHS = -alpha*pw*(m - m_prior)/cw
    expected_rhs = -alpha * pw * (np.asarray(model) - np.asarray(prior)) / np.asarray(cw)
    np.testing.assert_allclose(np.asarray(op.rhs), expected_rhs, rtol=1e-14)


def test_damping_lp_norm_multiplier():
    """Lp reweighting |diff|^(p/2-1) on both matrix and RHS (damping.F90:250-261)."""
    alpha, pw, p = 0.5, 1.0, 1.0
    model = jnp.asarray(RNG.normal(size=(1, N)))
    prior = jnp.zeros((1, N))
    cw = jnp.ones(N)
    op = ops.make_damping(alpha, pw, p, model, prior, cw, None, False, 0, NX, NY, NZ)
    diff = np.asarray(model)
    lp = np.abs(diff) ** (p / 2.0 - 1.0)
    np.testing.assert_allclose(np.asarray(op.dcoef), alpha * pw * lp, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(op.rhs), -alpha * pw * diff * lp, rtol=1e-13)


def _dense_from_matvec(matvec, ncols, nrows):
    A = np.zeros((nrows, ncols))
    for c in range(ncols):
        e = np.zeros(ncols)
        e[c] = 1.0
        A[:, c] = np.asarray(matvec(e))
    return A


# ---------------------------------------------------------------------------
# Damping gradient
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("direction", [1, 2, 3])
def test_damping_gradient_adjoint(direction):
    dX, dY, dZ = _grids()
    op = ops.make_damping_gradient(
        0.7, 0.9,
        jnp.asarray(RNG.normal(size=N)),
        jnp.asarray(1.0 + RNG.random(N)),
        jnp.asarray(1.0 + RNG.random(N)),
        dX, dY, dZ, NX, NY, NZ, direction,
    )
    x = RNG.normal(size=N)
    u = RNG.normal(size=N)
    Ax = np.asarray(op.matvec(jnp.asarray(x).reshape(NZ, NY, NX)))
    ATu = np.asarray(op.rmatvec(jnp.asarray(u))).ravel()
    assert abs(Ax @ u - x @ ATu) < 1e-10 * (np.linalg.norm(Ax) * np.linalg.norm(u) + 1)


def test_damping_gradient_rows():
    """Row p (interior): (pw*b/d)*cw_{p+1}*x_{p+1} - (pw*b/d)*cw_p*x_p;
    boundary rows empty (damping_gradient.F90:132-198)."""
    dX, dY, dZ = _grids()
    beta, pw = 2.0, 1.0
    cw = 1.0 + RNG.random(N)
    lw = np.ones(N)
    m = RNG.normal(size=N)
    op = ops.make_damping_gradient(
        beta, pw, jnp.asarray(m), jnp.asarray(cw), jnp.asarray(lw),
        dX, dY, dZ, NX, NY, NZ, 1,
    )
    A = _dense_from_matvec(lambda x: op.matvec(jnp.asarray(x).reshape(NZ, NY, NX)), N, N)
    cwc = cw.reshape(NZ, NY, NX)
    dXn = np.asarray(dX)
    for k in range(NZ):
        for j in range(NY):
            for i in range(NX):
                p = i + j * NX + k * NX * NY
                row = A[p]
                if i == NX - 1:
                    assert np.all(row == 0.0)
                else:
                    v = pw * beta / dXn[i]
                    expected = np.zeros(N)
                    expected[p + 1] = v * cwc[k, j, i + 1]
                    expected[p] = -v * cwc[k, j, i]
                    np.testing.assert_allclose(row, expected, atol=1e-12)


# ---------------------------------------------------------------------------
# Cross-gradient
# ---------------------------------------------------------------------------


def _xgrad_op(der_type, vec_field=None, vec_field_type=0, keep=(0, 0)):
    dX, dY, dZ = _grids()
    m1 = jnp.asarray(RNG.normal(size=N))
    m2 = jnp.asarray(RNG.normal(size=N))
    cw1 = jnp.asarray(1.0 + RNG.random(N))
    cw2 = jnp.asarray(1.0 + RNG.random(N))
    return ops.make_cross_gradient(
        m1, m2, cw1, cw2, 1.3, der_type, keep,
        None if vec_field is None else jnp.asarray(vec_field), vec_field_type,
        dX, dY, dZ, NX, NY, NZ,
    )


@pytest.mark.parametrize("der_type", [1, 2])
def test_cross_gradient_adjoint(der_type):
    op = _xgrad_op(der_type)
    x1 = RNG.normal(size=N)
    x2 = RNG.normal(size=N)
    u = RNG.normal(size=3 * N)
    Ax = np.asarray(
        op.matvec(jnp.asarray(x1).reshape(NZ, NY, NX), jnp.asarray(x2).reshape(NZ, NY, NX))
    )
    g1, g2 = op.rmatvec(jnp.asarray(u))
    lhs = Ax @ u
    rhs = x1 @ np.asarray(g1).ravel() + x2 @ np.asarray(g2).ravel()
    assert abs(lhs - rhs) < 1e-10 * (np.linalg.norm(Ax) * np.linalg.norm(u) + 1)


@pytest.mark.parametrize("der_type", [1, 2])
def test_cross_gradient_jacobian_is_derivative_of_tau(der_type):
    """The stencil coefficients must be the exact Jacobian of the discrete
    tau(m1, m2) in the linearization point (finite-difference check).

    tau is bilinear in (m1, m2), so the directional derivative is exact:
    tau(m1 + e, m2) - tau(m1, m2) = J1 e for the scheme-consistent e."""
    dX, dY, dZ = _grids()
    m1 = RNG.normal(size=N)
    m2 = RNG.normal(size=N)
    cw1 = np.ones(N)
    cw2 = np.ones(N)
    w = 1.0

    def tau_of(m1v, m2v):
        op = ops.make_cross_gradient(
            jnp.asarray(m1v), jnp.asarray(m2v), jnp.asarray(cw1), jnp.asarray(cw2),
            w, der_type, (0, 0), None, 0, dX, dY, dZ, NX, NY, NZ,
        )
        return -np.asarray(op.rhs)  # rhs = -w*tau, w = 1

    op = ops.make_cross_gradient(
        jnp.asarray(m1), jnp.asarray(m2), jnp.asarray(cw1), jnp.asarray(cw2),
        w, der_type, (0, 0), None, 0, dX, dY, dZ, NX, NY, NZ,
    )
    e = RNG.normal(size=N)
    t0 = tau_of(m1, m2)
    t1 = tau_of(m1 + e, m2)
    jac_e = np.asarray(
        op.matvec(jnp.asarray(e).reshape(NZ, NY, NX), jnp.zeros((NZ, NY, NX)))
    ).reshape(3, N)
    np.testing.assert_allclose(t1.reshape(3, N) - t0.reshape(3, N), jac_e, atol=1e-9)

    t2 = tau_of(m1, m2 + e)
    jac_e2 = np.asarray(
        op.matvec(jnp.zeros((NZ, NY, NX)), jnp.asarray(e).reshape(NZ, NY, NX))
    ).reshape(3, N)
    np.testing.assert_allclose(t2.reshape(3, N) - t0.reshape(3, N), jac_e2, atol=1e-9)


def test_cross_gradient_zero_for_identical_models():
    """tau(m, m) = 0 everywhere."""
    dX, dY, dZ = _grids()
    m = jnp.asarray(RNG.normal(size=N))
    cw = jnp.ones(N)
    op = ops.make_cross_gradient(
        m, m, cw, cw, 1.0, 1, (0, 0), None, 0, dX, dY, dZ, NX, NY, NZ
    )
    np.testing.assert_allclose(np.asarray(op.rhs), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.cost), 0.0, atol=1e-20)


def test_cross_gradient_keep_model_constant():
    op = _xgrad_op(1, keep=(1, 0))
    assert float(jnp.sum(jnp.abs(op.C1))) == 0.0
    assert float(jnp.sum(jnp.abs(op.C2))) > 0.0


# ---------------------------------------------------------------------------
# Clustering
# ---------------------------------------------------------------------------


def test_clustering_1d_gaussian_derivative():
    """With one problem active (weight2 = 0), the mixture reduces to 1-D
    Gaussians and the derivative coefficient equals -(x - mu)/s11^2
    (the 2-D Mathematica coefficient degenerates correctly when s12 = 0,
    clustering.F90:638-641)."""
    C = 2
    mu = jnp.asarray([[0.0, 3.0], [0.0, 0.0]])  # (2, C)
    sigma = jnp.asarray([[1.0, 0.5], [1.0, 1.0], [0.0, 0.0]])  # s11, s22, s12
    cellw = jnp.full((N, C), 0.5)
    v1 = jnp.asarray(RNG.normal(size=N))
    v2 = jnp.zeros(N)
    g, d = ops.gaussian_mixture(v1, v2, mu, sigma, cellw, (1.0, 0.0))

    x = np.asarray(v1)
    expected_g = np.zeros(N)
    expected_d = np.zeros(N)
    for c in range(2):
        m, s = float(mu[0, c]), float(sigma[0, c])
        gc = 0.5 * np.exp(-((x - m) ** 2) / (2 * s**2)) / np.sqrt(2 * np.pi * s**2)
        expected_g += gc
        expected_d += -(x - m) / s**2 * gc
    np.testing.assert_allclose(np.asarray(g), expected_g, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d)[0], expected_d, rtol=1e-10)


def test_clustering_2d_gaussian_matches_scipy_style_pdf():
    """2-D mixture value equals the multivariate normal pdf."""
    C = 1
    mu = jnp.asarray([[1.0], [2.0]])
    s11, s22, s12 = 1.5, 0.8, 0.3
    sigma = jnp.asarray([[s11], [s22], [s12]])
    cellw = jnp.ones((N, C))
    v1 = jnp.asarray(RNG.normal(size=N))
    v2 = jnp.asarray(RNG.normal(size=N))
    g, _ = ops.gaussian_mixture(v1, v2, mu, sigma, cellw, (1.0, 1.0))

    cov = np.array([[s11**2, s12**2], [s12**2, s22**2]])
    inv = np.linalg.inv(cov)
    det = np.linalg.det(cov)
    dx = np.asarray(v1) - 1.0
    dy = np.asarray(v2) - 2.0
    quad = inv[0, 0] * dx**2 + 2 * inv[0, 1] * dx * dy + inv[1, 1] * dy**2
    pdf = np.exp(-quad / 2) / (2 * np.pi * np.sqrt(det))
    np.testing.assert_allclose(np.asarray(g), pdf, rtol=1e-10)


# ---------------------------------------------------------------------------
# ADMM projection
# ---------------------------------------------------------------------------


def test_admm_projection_disjoint_intervals():
    from tomofastx_tpu.inversion.joint import admm_iterate

    min_b = jnp.asarray([[-1.0, 5.0]] * 4).T.reshape(2, 4) * jnp.ones((2, 4))
    min_b = jnp.asarray([[-1.0] * 4, [5.0] * 4])
    max_b = jnp.asarray([[1.0] * 4, [6.0] * 4])
    x = jnp.asarray([0.5, 2.0, 4.5, 10.0])
    u = jnp.zeros(4)
    z, u_new, x0 = admm_iterate(jnp.zeros(4), u, x, min_b, max_b)
    # 0.5 inside [-1,1]; 2.0 -> closest boundary 1.0; 4.5 -> 5.0; 10 -> 6.0
    np.testing.assert_allclose(np.asarray(z), [0.5, 1.0, 5.0, 6.0])
    np.testing.assert_allclose(np.asarray(u_new), np.asarray(x) - np.asarray(z))
    np.testing.assert_allclose(np.asarray(x0), np.asarray(z) - np.asarray(u_new))


def test_admm_tie_breaking_first_candidate():
    """Equidistant point: the reference's strict-< scan keeps the FIRST
    candidate in (min1, max1, min2, max2, ...) order."""
    from tomofastx_tpu.inversion.joint import admm_iterate

    min_b = jnp.asarray([[0.0], [4.0]])
    max_b = jnp.asarray([[1.0], [5.0]])
    x = jnp.asarray([2.5])  # equidistant from 1.0 (max1) and 4.0 (min2)
    z, _, _ = admm_iterate(jnp.zeros(1), jnp.zeros(1), x, min_b, max_b)
    assert float(z[0]) == 1.0


def test_cross_gradient_vector_field_mode():
    """vec_field_type = 1 replaces model1's gradient by the supplied field
    (cross_gradient.F90:419-449)."""
    dX, dY, dZ = _grids()
    m1 = jnp.asarray(RNG.normal(size=N))
    m2 = jnp.asarray(RNG.normal(size=N))
    cw = jnp.ones(N)
    vf = jnp.asarray(RNG.normal(size=(N, 3)))
    op = ops.make_cross_gradient(
        m1, m2, cw, cw, 1.0, 1, (0, 0), vf, 1, dX, dY, dZ, NX, NY, NZ
    )
    # tau must equal vf x grad(m2) with the per-cell scheme selection.
    op_ref = ops.make_cross_gradient(
        m1, m2, cw, cw, 1.0, 1, (0, 0), None, 0, dX, dY, dZ, NX, NY, NZ
    )
    # Different from the no-field operator (sanity that the flag acts).
    assert not np.allclose(np.asarray(op.rhs), np.asarray(op_ref.rhs))
    # Adjoint still consistent.
    x1 = RNG.normal(size=N)
    x2 = RNG.normal(size=N)
    u = RNG.normal(size=3 * N)
    Ax = np.asarray(op.matvec(jnp.asarray(x1).reshape(NZ, NY, NX), jnp.asarray(x2).reshape(NZ, NY, NX)))
    g1, g2 = op.rmatvec(jnp.asarray(u))
    assert abs(Ax @ u - (x1 @ np.asarray(g1).ravel() + x2 @ np.asarray(g2).ravel())) < 1e-9 * (
        np.linalg.norm(Ax) * np.linalg.norm(u) + 1
    )


def test_clustering_2d_derivative_finite_difference():
    """The Mathematica-derived 2-D mixture derivatives (coef1/coef2 in
    gaussian_mixture, clustering.F90:514-649) against central finite
    differences of the mixture value wrt BOTH model values — full 2-D
    case with correlated covariance and per-cell weights."""
    C = 3
    mu = jnp.asarray([[0.2, 1.5, -0.7], [2.0, -1.0, 0.4]])
    sigma = jnp.asarray([[1.2, 0.6, 0.9], [0.8, 1.4, 1.1], [0.4, 0.3, 0.5]])
    cellw = jnp.asarray(RNG.uniform(0.2, 1.0, size=(N, C)))
    v1 = jnp.asarray(RNG.normal(size=N))
    v2 = jnp.asarray(RNG.normal(size=N))
    _, d = ops.gaussian_mixture(v1, v2, mu, sigma, cellw, (1.0, 1.0))

    h = 1e-6
    gp1, _ = ops.gaussian_mixture(v1 + h, v2, mu, sigma, cellw, (1.0, 1.0))
    gm1, _ = ops.gaussian_mixture(v1 - h, v2, mu, sigma, cellw, (1.0, 1.0))
    gp2, _ = ops.gaussian_mixture(v1, v2 + h, mu, sigma, cellw, (1.0, 1.0))
    gm2, _ = ops.gaussian_mixture(v1, v2 - h, mu, sigma, cellw, (1.0, 1.0))
    fd1 = np.asarray(gp1 - gm1) / (2 * h)
    fd2 = np.asarray(gp2 - gm2) / (2 * h)
    np.testing.assert_allclose(np.asarray(d)[0], fd1, rtol=2e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d)[1], fd2, rtol=2e-6, atol=1e-12)


def test_clustering_log_mode_derivative_and_rhs():
    """Log optimization mode (clustering_opt_type = 2): the assembled row
    coefficient must be the exact derivative of the log cost
    -d/dm log(g) = -g'/g, and the RHS must be
    -w (log(g_max) - log(g)) (reference: clustering.F90:457-508 log
    branch) — checked against finite differences of -log(gauss) and a
    direct transcription (round-3 verdict item 9)."""
    C = 2
    mu = jnp.asarray([[0.5, -1.0], [1.0, 0.3]])
    sigma = jnp.asarray([[1.1, 0.7], [0.9, 1.3], [0.2, 0.4]])
    cellw = jnp.asarray(RNG.uniform(0.3, 1.0, size=(N, C)))
    v1 = jnp.asarray(RNG.normal(size=N))
    v2 = jnp.asarray(RNG.normal(size=N))
    cw1 = jnp.asarray(RNG.uniform(0.5, 2.0, size=N))
    cw2 = jnp.ones(N)
    gmax = jnp.asarray(RNG.uniform(0.2, 0.5, size=N))
    wg = (0.8, 0.6)

    op = ops.make_clustering(v1, v2, cw1, cw2, wg, mu, sigma, cellw, gmax,
                             opt_type=2, problem=0)

    def neglog(a, b):
        g, _ = ops.gaussian_mixture(a, b, mu, sigma, cellw, (1.0, 1.0))
        return -np.log(np.asarray(g))

    h = 1e-7
    fd = (neglog(v1 + h, v2) - neglog(v1 - h, v2)) / (2 * h)
    # dcoef = w * cw * (-g'/g) for problem 0.
    np.testing.assert_allclose(
        np.asarray(op.dcoef), wg[0] * np.asarray(cw1) * fd, rtol=5e-6
    )
    g, _ = ops.gaussian_mixture(v1, v2, mu, sigma, cellw, (1.0, 1.0))
    expect_rhs = -wg[0] * (-np.log(np.asarray(g)) + np.log(np.asarray(gmax)))
    np.testing.assert_allclose(np.asarray(op.rhs), expect_rhs, rtol=1e-10)
    np.testing.assert_allclose(
        float(op.cost), float(np.sum(expect_rhs**2)), rtol=1e-10
    )
