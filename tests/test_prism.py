"""Prism kernel physics tests.

The Fortran reference cannot be built in this image (no gfortran/MPI), so
parity is established through physics invariants and independent numerical
oracles:
- far-field point-mass / dipole limits,
- Gauss relation (trace-free gravity-gradient tensor),
- numerical volume integration of 1/r-type Green's functions,
- symmetry relations,
- consistency between the gz-only and full-vector kernels.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.ops import prism

G = prism.G_GRAV


def _cell(x1, x2, y1, y2, z1, z2):
    return tuple(jnp.asarray([v], jnp.float64) for v in (x1, x2, y1, y2, z1, z2))


def test_gz_far_field_point_mass():
    """At distance >> cell size, gz -> G * V * dz / r^3 (per unit density)."""
    cell = _cell(-5, 5, -5, 5, 95, 105)  # 10 m cube at depth 100
    V = 1000.0
    gz = float(prism.gravi_z(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), *cell)[0])
    r = 100.0
    expected = G * V / r**2
    assert abs(gz - expected) / expected < 1e-3


def test_gz_numerical_integration():
    """gz equals the volume integral of G * (z - z0) / r^3 (midpoint rule)."""
    cell = _cell(10, 30, -15, 5, 20, 40)
    gz = float(prism.gravi_z(jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0), *cell)[0])

    n = 60
    xs = np.linspace(10, 30, n, endpoint=False) + 10.0 / n
    ys = np.linspace(-15, 5, n, endpoint=False) + 10.0 / n
    zs = np.linspace(20, 40, n, endpoint=False) + 10.0 / n
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    dV = (20.0 / n) ** 3
    r3 = ((X - 1.0) ** 2 + (Y - 2.0) ** 2 + (Z - 3.0) ** 2) ** 1.5
    integral = G * np.sum((Z - 3.0) / r3) * dV
    assert abs(gz - integral) / abs(integral) < 1e-3


def test_gravi_full_consistent_with_gz():
    cell = _cell(10, 30, -15, 5, 20, 40)
    args = (jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0)) + cell
    gz_only = float(prism.gravi_z(*args)[0])
    _, _, gz_full = prism.gravi_full(*args)
    assert abs(float(gz_full[0]) - gz_only) < 1e-15 + 1e-12 * abs(gz_only)


def test_ftg_gauss_trace_free():
    """Gxx + Gyy + Gzz = 0 outside the source (Laplace)."""
    cell = _cell(-10, 10, -20, 20, 30, 60)
    gxx, gyy, gzz, gxy, gyz, gzx = prism.gradi_full(
        jnp.asarray(3.0), jnp.asarray(-4.0), jnp.asarray(0.0), *cell
    )
    trace = float(gxx[0] + gyy[0] + gzz[0])
    scale = max(abs(float(gzz[0])), 1e-20)
    assert abs(trace) < 1e-9 * scale


def test_gzz_is_dgz_dz():
    """Gzz ~ d(gz)/dz by central differences (note the FTG kernel's internal
    Z sign flip makes its output the derivative in the reference convention)."""
    cell = _cell(-10, 10, -20, 20, 30, 60)
    x0, y0 = jnp.asarray(3.0), jnp.asarray(-4.0)
    h = 0.01
    gz_p = float(prism.gravi_z(x0, y0, jnp.asarray(h), *cell)[0])
    gz_m = float(prism.gravi_z(x0, y0, jnp.asarray(-h), *cell)[0])
    dgz_dz = (gz_p - gz_m) / (2 * h)
    gzz = float(prism.gradi_zz(x0, y0, jnp.asarray(0.0), *cell)[0])
    assert abs(abs(gzz) - abs(dgz_dz)) < 1e-4 * abs(dgz_dz)


def test_magnetic_tensor_far_field_dipole():
    """TMI of a small susceptible cube in a vertical field approaches the
    dipole formula on the axis below: B = (mu0/4pi) * 2 m / r^3, with
    m = chi * H * V (SI), expressed in nT like the kernel."""
    # Small cell far away, vertical inducing field (incl = 90).
    cell = _cell(-1, 1, -1, 1, 99, 101)
    V = 8.0
    intensity = 50000.0  # nT
    magv = prism.dircos(90.0, 0.0, 0.0)
    row = prism.magprism_row(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0),
        *cell, magv, intensity, nmodel_components=1, ndata_components=1,
    )
    tmi = float(row[0, 0, 0])  # per unit susceptibility (SI)
    r = 100.0
    # Dipole: B_axis = (mu0 / 4 pi) * 2 m / r^3; with m = (chi/mu0) * B0 * V
    # => B = 2 * B0 * V / (4 pi r^3) in the same units as B0.
    expected = 2.0 * intensity * V / (4.0 * math.pi * r**3)
    assert abs(tmi - expected) / expected < 1e-3


def test_magnetic_tensor_gauss_trace():
    """txx + tyy + tzz = 0 by construction (Gauss), and symmetry txy = tyx."""
    cell = _cell(5, 15, -5, 10, 20, 35)
    tx, ty, tz = prism.sharmbox(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0), *cell
    )
    assert abs(float(tx[0][0] + ty[1][0] + tz[2][0])) < 1e-12
    assert float(tx[1][0]) == float(ty[0][0])


def test_magprism_3comp_consistency():
    """TMI row equals the projection of the 3-component rows on the field
    direction (magnetic_field.f90:247-253)."""
    cell = _cell(5, 15, -5, 10, 20, 35)
    magv = prism.dircos(60.0, 25.0, 0.0)
    intensity = 48000.0
    args = (jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(0.0)) + cell
    tmi = prism.magprism_row(*args, magv, intensity, 1, 1)
    vec = prism.magprism_row(*args, magv, intensity, 1, 3)
    proj = sum(float(vec[0, 0, c]) * magv[c] for c in range(3))
    assert abs(float(tmi[0, 0, 0]) - proj) < 1e-10 * abs(proj)


def test_borehole_subprism_continuity():
    """In-cell observation: the 6-subprism decomposition gives a finite
    tensor, close to the full prism minus a tiny void."""
    cell = _cell(-10, 10, -10, 10, -10, 10)
    args = (jnp.asarray(0.3), jnp.asarray(0.2), jnp.asarray(0.1)) + cell
    tx, ty, tz = prism.magnetic_tensor(*args, handle_inside=True)
    vals = np.array([float(v[0]) for row in (tx, ty, tz) for v in row])
    assert np.all(np.isfinite(vals))


def test_dircos_vertical_field():
    a, b, c = prism.dircos(90.0, 0.0, 0.0)
    assert abs(a) < 1e-12 and abs(b) < 1e-12 and abs(c - 1.0) < 1e-12


def test_dircos_north_field():
    """incl = 0, decl = 0 -> field points north = +Y in the reference's
    X-east/Y-north convention (after decl2 = mod(450 - decl, 360))."""
    a, b, c = prism.dircos(0.0, 0.0, 0.0)
    assert abs(a) < 1e-12 and abs(b - 1.0) < 1e-12 and abs(c) < 1e-12


def test_f32_build_stable_at_aligned_far_field():
    """f32 closed forms must stay finite and accurate for far cells aligned
    with the observation point (log(R + t) cancellation: one f32 ulp of R
    exceeds the true sum -> naive form gives log(0) = -inf). The stable
    o2/(R - t) rewrite must agree with the f64 oracle to f32 accuracy."""
    n = 200
    h = 100.0
    # A row of surface cells along x; observation above a cell edge at the
    # far END of the row (dy = 0 exactly, dz = 0.1): worst-case alignment.
    i = np.arange(n).astype(np.float64)
    X1, X2 = i * h, (i + 1) * h
    Y1, Y2 = np.zeros(n), np.full(n, h)
    Z1, Z2 = np.zeros(n), np.full(n, 50.0)
    # Observation mid-cell in x over the FIRST cell, exactly aligned with
    # the row's y edge, 0.1 m above: far cells to the right have
    # XX = -dx < 0 with dy = 0, dz = 0.1, so R + XX = (dy^2 + dz^2)/(2 dx)
    # ~ 4e-7, below one f32 ulp of R ~ 1e4 -> the naive log rounds to
    # log(0) = -inf and 0 * -inf = NaN. (Mid-cell x keeps it off the
    # singular corner ray the reference aborts on,
    # gravity_field.f90:99-107.)
    xd, yd, zd = 50.0, 0.0, -0.1
    # Prove the geometry bites: the naive f32 form IS non-finite here.
    x_naive = np.float32(xd) - X2.astype(np.float32)  # far cells: big negative
    Rs_naive = np.sqrt(
        x_naive * x_naive + np.float32(0.1) ** 2, dtype=np.float32
    )
    assert np.any(Rs_naive + x_naive <= 0.0), "test geometry no longer triggers cancellation"

    def run(dtype):
        args = [jnp.asarray(a, dtype) for a in (X1, X2, Y1, Y2, Z1, Z2)]
        return {
            "gz": np.asarray(prism.gravi_z(dtype(xd), dtype(yd), dtype(zd), *args)),
            "full": np.column_stack([
                np.asarray(c) for c in prism.gravi_full(dtype(xd), dtype(yd), dtype(zd), *args)
            ]),
            "ftg": np.column_stack([
                np.asarray(c) for c in prism.gradi_full(dtype(xd), dtype(yd), dtype(zd), *args)
            ]),
            "mag": np.column_stack([
                np.asarray(c)
                for row in prism.sharmbox(dtype(xd), dtype(yd), dtype(zd), *args)
                for c in row
            ]),
        }

    r64 = run(np.float64)
    r32 = run(np.float32)
    for key in r64:
        assert np.all(np.isfinite(r32[key])), f"non-finite f32 {key}"
        # Absolute accuracy relative to the row scale. The f32 noise floor
        # here is the 8-corner-sum cancellation (~1e-3 of the row max in
        # this worst-case aligned geometry) — restoring accuracy beyond it
        # is the f64-build/near-field-patch policy's job; THIS test pins
        # finiteness (no log(0)) and the bounded noise floor.
        scale = np.abs(r64[key]).max()
        np.testing.assert_allclose(r32[key], r64[key], atol=1.5e-3 * scale, rtol=0)


def test_stable_log_forms_match_naive_f64():
    """The f64 path must keep the reference's literal formulas: stable
    helpers only reroute f32."""
    rng = np.random.default_rng(0)
    Rs = jnp.asarray(1.0 + rng.random(50))
    t = jnp.asarray(rng.normal(size=50) * 0.5)
    o2 = Rs**2 - t**2
    np.testing.assert_array_equal(
        np.asarray(prism._log_R_plus(Rs, t, o2)), np.asarray(jnp.log(Rs + t))
    )


def _far_cells(n=200, h=100.0, seed=0):
    """Random cells at 5-100 cell-sizes distance from the origin."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(500, 10000, n) * rng.choice([-1, 1], n)
    cy = rng.uniform(500, 10000, n) * rng.choice([-1, 1], n)
    cz = rng.uniform(500, 10000, n)
    return tuple(
        jnp.asarray(a, jnp.float64)
        for a in (cx - h / 2, cx + h / 2, cy - h / 2, cy + h / 2,
                  cz - h / 2, cz + h / 2)
    )


def test_quadrature_matches_closed_forms_far_field():
    """The 27-point Gauss-Legendre far-field kernels (the compensated-f32
    build, round-3 verdict item 3) agree with the f64 closed forms to the
    rule's truncation error on every physics family, signs included."""
    args = _far_cells()
    xd = yd = 0.0
    zd = -0.1
    pairs = [("gz", prism.gravi_z, prism.gravi_z_quad),
             ("gzz", prism.gradi_zz, prism.gradi_zz_quad)]
    for name, exact_fn, quad_fn in pairs:
        exact = np.asarray(exact_fn(xd, yd, zd, *args))
        quad = np.asarray(quad_fn(xd, yd, zd, *args))
        np.testing.assert_allclose(quad, exact, rtol=2e-6, err_msg=name)
    ex = prism.gradi_full(xd, yd, zd, *args)
    qd = prism.gradi_full_quad(xd, yd, zd, *args)
    for i, nm in enumerate(("xx", "yy", "zz", "xy", "yz", "zx")):
        # xy-type components cross zero; bound the error by the tensor
        # scale rather than per-element relative error.
        scale = np.abs(np.asarray(ex[i])).max()
        np.testing.assert_allclose(
            np.asarray(qd[i]), np.asarray(ex[i]), atol=1e-6 * scale, rtol=1e-5,
            err_msg=f"ftg_{nm}")
    ex = prism.sharmbox(xd, yd, zd, *args)
    qd = prism.magnetic_tensor_quad(xd, yd, zd, *args)
    for r in range(3):
        for c in range(3):
            scale = np.abs(np.asarray(ex[r][c])).max()
            np.testing.assert_allclose(
                np.asarray(qd[r][c]), np.asarray(ex[r][c]),
                atol=1e-6 * scale, rtol=1e-5, err_msg=f"mag_{r}{c}")


def test_far_field_f32_closed_form_is_noise_quad_is_not():
    """Documents WHY the compensated-f32 blend exists: in f32 the 8-corner
    alternating sums amplify rounding by ~(R/h)^3 — at R/h ~ 100 the
    closed-form g_z is orders-of-magnitude wrong while the f32 quadrature
    stays at ~1e-5 relative (the bits never cancel)."""
    args64 = _far_cells()
    args32 = tuple(a.astype(jnp.float32) for a in args64)
    xd = yd = jnp.float32(0.0)
    zd = jnp.float32(-0.1)
    exact = np.asarray(prism.gravi_z(0.0, 0.0, -0.1, *args64))
    closed32 = np.asarray(prism.gravi_z(xd, yd, zd, *args32), np.float64)
    quad32 = np.asarray(prism.gravi_z_quad(xd, yd, zd, *args32), np.float64)
    rel_closed = np.abs(closed32 - exact) / np.abs(exact)
    rel_quad = np.abs(quad32 - exact) / np.abs(exact)
    assert rel_closed.max() > 1.0          # catastrophic (measured: ~4e+1)
    assert rel_quad.max() < 5e-5           # measured: ~2.4e-6


def test_forward_rows_blend_selects_by_distance():
    """forward_rows(far_quad=True) must equal the closed form on near
    cells and the quadrature on far cells, per the half-diagonal radius."""
    from tomofastx_tpu.ops import sensitivity as sens

    h = 100.0
    # One near cell (2 half-diagonals) and one far cell (20).
    d = h * math.sqrt(3.0) / 2.0
    cents = [(2.0 * d, 0.0, h), (20.0 * d, 0.0, h)]
    X1 = jnp.asarray([c[0] - h / 2 for c in cents], jnp.float32)
    X2 = X1 + h
    Y1 = jnp.asarray([c[1] - h / 2 for c in cents], jnp.float32)
    Y2 = Y1 + h
    Z1 = jnp.asarray([c[2] - h / 2 for c in cents], jnp.float32)
    Z2 = Z1 + h
    ga = (X1, X2, Y1, Y2, Z1, Z2)
    args = ("grav", 1, 1, 1, (0.0, 0.0, 1.0), 0.0, False, ga,
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-0.1))
    blended = np.asarray(sens.forward_rows(*args, far_quad=True)).ravel()
    closed = np.asarray(sens.forward_rows(*args)).ravel()
    quad = np.asarray(sens._forward_rows_quad(
        "grav", 1, 1, 1, (0.0, 0.0, 1.0), 0.0, ga,
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-0.1))).ravel()
    assert blended[0] == closed[0] and blended[1] == quad[1]
