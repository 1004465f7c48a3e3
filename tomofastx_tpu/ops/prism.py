"""Closed-form rectangular-prism field kernels (gravity, FTG, magnetics).

TPU-native equivalents of the reference's per-row scalar loops
(gravity_field.f90:41-364, magnetic_field.f90:321-457): every function here is
vectorized over all cells at once and designed to be vmapped over observation
points, so the whole sensitivity block becomes one fused XLA computation over
an (ndata, ncells) grid instead of nested Fortran loops.

Conventions (identical to the reference):
- coordinates in meters, X east, Y north, Z down (depth space);
- gravity output in m/s^2 per unit density (kg/m^3), G = 6.674e-11;
- FTG tensor after Dubey & Tiwari (2015), Z sign flipped internally;
- magnetic tensor after Sharma (1966); susceptibility output scaled by
  ambient intensity (nT), magnetization-vector output scaled by mu0*1e9;
  both divided by 4*pi for SI (magnetic_field.f90:286-295).

All math is done in a caller-chosen dtype; the reference computes in float64
and stores float32 (global_typedefs.F90:37-45).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

G_GRAV = 6.674e-11
TWO_PI = 2.0 * math.pi
# Corner signs mu(K)*mu(L)*mu(M) for (K,L,M) in {0,1}^3, with sign(-1)^... ;
# signo = (-1, +1) per the reference (gravity_field.f90:53).
_CORNERS = [(K, L, M) for K in (0, 1) for L in (0, 1) for M in (0, 1)]


def _wrap_atan2(y, x):
    """atan2 wrapped to [0, 2*pi) (reference: gravity_field.f90:81-93)."""
    a = jnp.arctan2(y, x)
    return jnp.where(a < 0.0, a + TWO_PI, a)


def _log_R_plus(Rs, t, o2):
    """log(Rs + t), cancellation-armored for the f32 fast build.

    For t < 0 and |t| ~ Rs (a far cell nearly aligned with the observation
    point along this axis), Rs + t loses all mantissa bits in f32 — one
    ulp of Rs exceeds the true sum, so the naive form rounds to log(0) =
    -inf. The identity Rs + t = (Rs^2 - t^2)/(Rs - t) = o2/(Rs - t) (o2 =
    sum of the other two squared coordinates) has no cancellation. The f64
    path keeps the reference's literal formula (gravity_field.f90:110-117)
    for bit-parity; f64 carries enough mantissa for every physical
    geometry the reference accepts."""
    if Rs.dtype != jnp.float32:
        return jnp.log(Rs + t)
    return jnp.log(jnp.where(t < 0.0, o2 / (Rs - t), Rs + t))


def _half_log_ratio(Rs, t, o2):
    """0.5 * log((Rs - t)/(Rs + t)), stable for both signs of t (f32);
    the f64 path keeps the reference's literal form
    (gravity_field.f90:268-271)."""
    if Rs.dtype != jnp.float32:
        return 0.5 * jnp.log((Rs - t) / (Rs + t))
    big = jnp.where(t < 0.0, Rs - t, Rs + t)  # the non-cancelling side
    ratio = jnp.where(t < 0.0, big * big / o2, o2 / (big * big))
    return 0.5 * jnp.log(ratio)


def _log_ratio_pp(t_num, a_num, t_den, a_den, o2_num, o2_den):
    """log((t_num + a_num)/(t_den + a_den)) with a_i = sqrt(t_i^2 + o2_i),
    f32-armored via t + a = o2/(a - t) for t < 0 (see _log_R_plus); the
    f64 path keeps the reference's literal form (magnetic_field.f90:
    380-457) for bit-parity."""
    if a_num.dtype != jnp.float32:
        return jnp.log((t_num + a_num) / (t_den + a_den))

    def stab(t, a, o2):
        return jnp.where(t < 0.0, o2 / (a - t), t + a)

    return jnp.log(stab(t_num, a_num, o2_num) / stab(t_den, a_den, o2_den))


def _corner_coords(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2):
    """Relative corner coordinates XX[2], YY[2], ZZ[2] per cell."""
    XX = (xd - X1, xd - X2)
    YY = (yd - Y1, yd - Y2)
    ZZ = (zd - Z1, zd - Z2)
    return XX, YY, ZZ


def gravi_z(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2):
    """g_z of unit-density prisms at one observation point.

    Vectorized port of graviprism_z (gravity_field.f90:131-195).
    Returns (ncells,) in the dtype of the inputs (multiply by G outside? no —
    G is included, matching the reference which stores G*gz).
    """
    XX, YY, ZZ = _corner_coords(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)
    gz = 0.0
    for K, L, M in _CORNERS:
        mu = (-1.0) ** (K + L + M + 1)  # signo[K]*signo[L]*signo[M], signo=(-1,1)
        x, y, z = XX[K], YY[L], ZZ[M]
        Rs = jnp.sqrt(x * x + y * y + z * z)
        arg3 = _wrap_atan2(x * y, z * Rs)
        arg4 = _log_R_plus(Rs, x, y * y + z * z)
        arg5 = _log_R_plus(Rs, y, x * x + z * z)
        gz = gz + mu * (z * arg3 - x * arg5 - y * arg4)
    return G_GRAV * gz


def gz_corner_potential(x, y, z):
    """The per-corner antiderivative of the prism g_z closed form:
    f(x, y, z) = z*atan2(xy, zR) - x*log(R + y) - y*log(R + x), so that
    gz_cell = G * sum_{K,L,M} (-1)^(K+L+M+1) f(xd - Xe[i+K], ...) — the
    corner-lattice factorization of graviprism_z
    (gravity_field.f90:131-195). On a tensor-product grid each corner
    value is shared by up to 8 cells, cutting transcendental work ~8x
    (ops/matrixfree.py::LatticeMatrixFreeKernel). Uses the SAME wrapped
    atan2 and cancellation-armored logs as gravi_z, so the per-cell
    alternating sum of these values is exactly gravi_z's."""
    Rs = jnp.sqrt(x * x + y * y + z * z)
    arg3 = _wrap_atan2(x * y, z * Rs)
    arg4 = _log_R_plus(Rs, x, y * y + z * z)
    arg5 = _log_R_plus(Rs, y, x * x + z * z)
    return z * arg3 - x * arg5 - y * arg4


def gravi_full(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2):
    """All three gravity components (gx, gy, gz) per cell.

    Vectorized port of graviprism_full (gravity_field.f90:41-126)."""
    XX, YY, ZZ = _corner_coords(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)
    gx = gy = gz = 0.0
    for K, L, M in _CORNERS:
        mu = (-1.0) ** (K + L + M + 1)
        x, y, z = XX[K], YY[L], ZZ[M]
        Rs = jnp.sqrt(x * x + y * y + z * z)
        arg1 = _wrap_atan2(y * z, x * Rs)
        arg2 = _wrap_atan2(x * z, y * Rs)
        arg3 = _wrap_atan2(x * y, z * Rs)
        lg4 = _log_R_plus(Rs, x, y * y + z * z)
        lg5 = _log_R_plus(Rs, y, x * x + z * z)
        lg6 = _log_R_plus(Rs, z, x * x + y * y)
        gx = gx + mu * (x * arg1 - y * lg6 - z * lg5)
        gy = gy + mu * (y * arg2 - z * lg4 - x * lg6)
        gz = gz + mu * (z * arg3 - x * lg5 - y * lg4)
    return G_GRAV * gx, G_GRAV * gy, G_GRAV * gz


def gradi_zz(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2):
    """Gzz gravity-gradiometry component per cell.

    Vectorized port of gradiprism_zz (gravity_field.f90:314-364).
    Note the internal Z sign flip (ZZ = -(zd - Z))."""
    XX = (xd - X1, xd - X2)
    YY = (yd - Y1, yd - Y2)
    ZZ = (-(zd - Z1), -(zd - Z2))
    gzz = 0.0
    for K, L, M in _CORNERS:
        mu = (-1.0) ** (K + L + M + 1)
        x, y, z = XX[K], YY[L], ZZ[M]
        Rs = jnp.sqrt(x * x + y * y + z * z)
        vzz = -jnp.arctan2(x * y, Rs * z)
        vzz = jnp.where(vzz < 0.0, vzz + TWO_PI, vzz)
        gzz = gzz + mu * vzz
    return G_GRAV * gzz


def gradi_full(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2):
    """Full FTG tensor (Gxx, Gyy, Gzz, Gxy, Gyz, Gzx) per cell.

    Vectorized port of gradiprism_full (gravity_field.f90:207-309), after
    Dubey & Tiwari (2015). Component order matches the reference's data
    component order xx, yy, zz, xy, yz, xz (Parameters_all.txt:56)."""
    XX = (xd - X1, xd - X2)
    YY = (yd - Y1, yd - Y2)
    ZZ = (-(zd - Z1), -(zd - Z2))
    gxx = gyy = gzz = gxy = gyz = gzx = 0.0
    for K, L, M in _CORNERS:
        mu = (-1.0) ** (K + L + M + 1)
        x, y, z = XX[K], YY[L], ZZ[M]
        Rs = jnp.sqrt(x * x + y * y + z * z)
        vxx = _wrap_atan2(x * y, x * x + Rs * z + z * z)
        vyy = _wrap_atan2(x * y, Rs * Rs + Rs * z - x * x)
        vzz = -jnp.arctan2(x * y, Rs * z)
        vzz = jnp.where(vzz < 0.0, vzz + TWO_PI, vzz)
        vxy = _log_R_plus(Rs, z, x * x + y * y)
        vzx = _half_log_ratio(Rs, y, x * x + z * z)
        vyz = _half_log_ratio(Rs, x, y * y + z * z)
        gxx = gxx + mu * vxx
        gyy = gyy + mu * vyy
        gzz = gzz + mu * vzz
        gxy = gxy + mu * vxy
        gyz = gyz + mu * vyz
        gzx = gzx + mu * vzx
    return tuple(G_GRAV * g for g in (gxx, gyy, gzz, gxy, gyz, gzx))


def dircos(incl: float, decl: float, azim: float):
    """Direction cosines from inclination/declination (degrees), with the
    X-axis azimuth convention of the reference (magnetic_field.f90:91-110):
    declination is first converted via mod(450 - decl, 360)."""
    d2r = math.pi / 180.0
    decl2 = math.fmod(450.0 - decl, 360.0)
    xi, xd, xa = incl * d2r, decl2 * d2r, azim * d2r
    a = math.cos(xi) * math.cos(xd - xa)
    b = math.cos(xi) * math.sin(xd - xa)
    c = math.sin(xi)
    return a, b, c


def sharmbox(x0, y0, z0, x1, x2, y1, y2, z1, z2):
    """Magnetic tensor of prisms at one observation point (Sharma 1966).

    Vectorized port of sharmbox (magnetic_field.f90:321-457); note the
    corner arguments are ordered (x1, x2, y1, y2, z1, z2) like every other
    kernel in this module. Returns (ts_x, ts_y, ts_z), each a tuple of 3
    arrays (the tensor rows): ts_x = (txx, txy, txz), etc.
    """
    rx1 = x1 - x0
    rx2 = x2 - x0
    ry1 = y1 - y0
    ry2 = y2 - y0
    rz1 = z1 - z0
    rz2 = z2 - z0

    rx1s, rx2s = rx1 * rx1, rx2 * rx2
    ry1s, ry2s = ry1 * ry1, ry2 * ry2
    rz1s, rz2s = rz1 * rz1, rz2 * rz2

    R1 = ry2s + rx2s
    R2 = ry2s + rx1s
    R3 = ry1s + rx2s
    R4 = ry1s + rx1s
    a1 = jnp.sqrt(rz2s + R2)
    a2 = jnp.sqrt(rz2s + R1)
    a3 = jnp.sqrt(rz1s + R1)
    a4 = jnp.sqrt(rz1s + R2)
    a5 = jnp.sqrt(rz2s + R3)
    a6 = jnp.sqrt(rz2s + R4)
    a7 = jnp.sqrt(rz1s + R4)
    a8 = jnp.sqrt(rz1s + R3)

    txx = (
        jnp.arctan2(ry1 * rz2, rx2 * a5)
        - jnp.arctan2(ry2 * rz2, rx2 * a2)
        + jnp.arctan2(ry2 * rz1, rx2 * a3)
        - jnp.arctan2(ry1 * rz1, rx2 * a8)
        + jnp.arctan2(ry2 * rz2, rx1 * a1)
        - jnp.arctan2(ry1 * rz2, rx1 * a6)
        + jnp.arctan2(ry1 * rz1, rx1 * a7)
        - jnp.arctan2(ry2 * rz1, rx1 * a4)
    )
    tyx = (
        _log_ratio_pp(rz2, a2, rz1, a3, R1, R1)
        - _log_ratio_pp(rz2, a1, rz1, a4, R2, R2)
        + _log_ratio_pp(rz2, a6, rz1, a7, R4, R4)
        - _log_ratio_pp(rz2, a5, rz1, a8, R3, R3)
    )
    tyy = (
        jnp.arctan2(rx1 * rz2, ry2 * a1)
        - jnp.arctan2(rx2 * rz2, ry2 * a2)
        + jnp.arctan2(rx2 * rz1, ry2 * a3)
        - jnp.arctan2(rx1 * rz1, ry2 * a4)
        + jnp.arctan2(rx2 * rz2, ry1 * a5)
        - jnp.arctan2(rx1 * rz2, ry1 * a6)
        + jnp.arctan2(rx1 * rz1, ry1 * a7)
        - jnp.arctan2(rx2 * rz1, ry1 * a8)
    )

    R1 = ry2s + rz1s
    R2 = ry2s + rz2s
    R3 = ry1s + rz1s
    R4 = ry1s + rz2s
    b1 = jnp.sqrt(rx1s + R1)
    b2 = jnp.sqrt(rx2s + R1)
    b3 = jnp.sqrt(rx1s + R2)
    b4 = jnp.sqrt(rx2s + R2)
    b5 = jnp.sqrt(rx1s + R3)
    b6 = jnp.sqrt(rx2s + R3)
    b7 = jnp.sqrt(rx1s + R4)
    b8 = jnp.sqrt(rx2s + R4)
    tyz = (
        _log_ratio_pp(rx1, b1, rx2, b2, R1, R1)
        - _log_ratio_pp(rx1, b3, rx2, b4, R2, R2)
        + _log_ratio_pp(rx1, b7, rx2, b8, R4, R4)
        - _log_ratio_pp(rx1, b5, rx2, b6, R3, R3)
    )

    R1 = rx2s + rz1s
    R2 = rx2s + rz2s
    R3 = rx1s + rz1s
    R4 = rx1s + rz2s
    c1 = jnp.sqrt(ry1s + R1)
    c2 = jnp.sqrt(ry2s + R1)
    c3 = jnp.sqrt(ry1s + R2)
    c4 = jnp.sqrt(ry2s + R2)
    c5 = jnp.sqrt(ry1s + R3)
    c6 = jnp.sqrt(ry2s + R3)
    c7 = jnp.sqrt(ry1s + R4)
    c8 = jnp.sqrt(ry2s + R4)
    txz = (
        _log_ratio_pp(ry1, c1, ry2, c2, R1, R1)
        - _log_ratio_pp(ry1, c3, ry2, c4, R2, R2)
        + _log_ratio_pp(ry1, c7, ry2, c8, R4, R4)
        - _log_ratio_pp(ry1, c5, ry2, c6, R3, R3)
    )

    tzz = -(txx + tyy)  # Gauss (trace-free)
    txy = tyx
    tzy = tyz
    tzx = txz

    return (txx, txy, txz), (tyx, tyy, tyz), (tzx, tzy, tzz)


def mag_corner_potentials(rx, ry, rz):
    """Per-corner antiderivatives of the Sharma (1966) magnetic tensor:
    every 8-term sum in sharmbox (magnetic_field.f90:321-457) is an
    alternating corner sum of one of these five functions —

        txx =  D[f1],  f1 = atan2(ry*rz, rx*R)
        tyy =  D[f2],  f2 = atan2(rx*rz, ry*R)
        txy = -D[f3],  f3 = log(R + rz)
        tyz = -D[f4],  f4 = log(R + rx)
        txz = -D[f5],  f5 = log(R + ry)
        tzz = -(txx + tyy)

    with D = sum_{K,L,M} (-1)^(K+L+M) at the cell's 8 corners. The atan2
    arguments are corner-local quantities, so shared-corner evaluation is
    exactly what the per-cell form computes; the logs use the same
    f32-armored form (the f64 per-cell path uses log of a RATIO, equal up
    to ~1 ulp). See LatticeMatrixFreeKernel."""
    R = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    f1 = jnp.arctan2(ry * rz, rx * R)
    f2 = jnp.arctan2(rx * rz, ry * R)
    f3 = _log_R_plus(R, rz, rx * rx + ry * ry)
    f4 = _log_R_plus(R, rx, ry * ry + rz * rz)
    f5 = _log_R_plus(R, ry, rx * rx + rz * rz)
    return f1, f2, f3, f4, f5


def ftg_corner_potentials(x, y, z):
    """Per-corner antiderivatives of the FTG tensor (Dubey & Tiwari 2015,
    gravity_field.f90:207-364), order (xx, yy, zz, xy, yz, xz):
    G_c = -D[p_c] with D = sum (-1)^(K+L+M) over the cell's corners.
    NOTE the caller must pass the FLIPPED z offset (ze - zd) — the
    reference's gradiprism kernels negate ZZ internally."""
    Rs = jnp.sqrt(x * x + y * y + z * z)
    p_xx = _wrap_atan2(x * y, x * x + Rs * z + z * z)
    p_yy = _wrap_atan2(x * y, Rs * Rs + Rs * z - x * x)
    vzz = -jnp.arctan2(x * y, Rs * z)
    p_zz = jnp.where(vzz < 0.0, vzz + TWO_PI, vzz)
    p_xy = _log_R_plus(Rs, z, x * x + y * y)
    p_yz = _half_log_ratio(Rs, x, y * y + z * z)
    p_xz = _half_log_ratio(Rs, y, x * x + z * z)
    return p_xx, p_yy, p_zz, p_xy, p_yz, p_xz


def combine_mag_tensor(tx, ty, tz, magv, intensity,
                       nmodel_components: int, ndata_components: int):
    """Combine magnetic tensor rows into sensitivity entries — the
    susceptibility / magnetization-vector x TMI / 3-component dispatch and
    unit scaling of magnetic_field_magprism (magnetic_field.f90:118-297).
    tx/ty/tz: 3-tuples of arrays (any shape); returns
    (..., nmodel_components, ndata_components)."""
    mu0_T2nT = 4.0e-7 * math.pi * 1.0e9
    mv = magv

    if nmodel_components == 1:
        mx = tx[0] * mv[0] + tx[1] * mv[1] + tx[2] * mv[2]
        my = ty[0] * mv[0] + ty[1] * mv[1] + ty[2] * mv[2]
        mz = tz[0] * mv[0] + tz[1] * mv[1] + tz[2] * mv[2]
        if ndata_components == 1:
            cols = [[mx * mv[0] + my * mv[1] + mz * mv[2]]]
        elif ndata_components == 3:
            cols = [[mx, my, mz]]
        else:
            raise ValueError("Wrong number of data components in magprism_row!")
        scale = intensity
    elif nmodel_components == 3:
        if ndata_components == 1:
            cols = [
                [tx[k] * mv[0] + ty[k] * mv[1] + tz[k] * mv[2]] for k in range(3)
            ]
        elif ndata_components == 3:
            cols = [[tx[k], ty[k], tz[k]] for k in range(3)]
        else:
            raise ValueError("Wrong number of data components in magprism_row!")
        scale = mu0_T2nT
    else:
        raise ValueError("Wrong number of model components in magprism_row!")

    out = jnp.stack([jnp.stack(kcols, axis=-1) for kcols in cols], axis=-2)
    return out * (scale / (4.0 * math.pi))


def _subprism_bounds(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, width):
    """The 6 sub-prisms around a void of half-width `width` at the observation
    point inside a cell (reference: magnetic_field.f90:155-203).
    Returns a list of 6 bound tuples."""
    return [
        (X1, X2, Y1, Y2, Z1, zd - width),  # top
        (X1, X2, Y1, Y2, zd + width, Z2),  # bottom
        (X1, xd - width, Y1, Y2, zd - width, zd + width),  # west
        (xd + width, X2, Y1, Y2, zd - width, zd + width),  # east
        (xd - width, xd + width, Y1, yd - width, zd - width, zd + width),  # south
        (xd - width, xd + width, yd + width, Y2, zd - width, zd + width),  # north
    ]


def magnetic_tensor(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, handle_inside: bool = False):
    """Magnetic tensor rows (tx, ty, tz) per cell, with optional in-cell
    (borehole) observation handling by 6-subprism decomposition
    (reference: magnetic_field.f90:135-238)."""
    tx, ty, tz = sharmbox(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)

    if handle_inside:
        inside = (X1 < xd) & (X2 > xd) & (Y1 < yd) & (Y2 > yd) & (Z1 < zd) & (Z2 > zd)
        min_clr = jnp.minimum(
            jnp.minimum(jnp.abs(xd - X1), jnp.abs(xd - X2)),
            jnp.minimum(
                jnp.minimum(jnp.abs(yd - Y1), jnp.abs(yd - Y2)),
                jnp.minimum(jnp.abs(zd - Z1), jnp.abs(zd - Z2)),
            ),
        )
        width = jnp.where(0.1 > min_clr, 0.5 * min_clr, 0.1)

        sub_tx = [0.0] * 3
        sub_ty = [0.0] * 3
        sub_tz = [0.0] * 3
        for b in _subprism_bounds(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, width):
            stx, sty, stz = sharmbox(xd, yd, zd, *b)
            for c in range(3):
                sub_tx[c] = sub_tx[c] + stx[c]
                sub_ty[c] = sub_ty[c] + sty[c]
                sub_tz[c] = sub_tz[c] + stz[c]

        tx = tuple(jnp.where(inside, s, t) for s, t in zip(sub_tx, tx))
        ty = tuple(jnp.where(inside, s, t) for s, t in zip(sub_ty, ty))
        tz = tuple(jnp.where(inside, s, t) for s, t in zip(sub_tz, tz))

    return tx, ty, tz


@partial(jax.jit, static_argnames=("nmodel_components", "ndata_components", "handle_inside"))
def magprism_row(
    xd,
    yd,
    zd,
    X1,
    X2,
    Y1,
    Y2,
    Z1,
    Z2,
    magv,
    intensity,
    nmodel_components: int = 1,
    ndata_components: int = 1,
    handle_inside: bool = False,
):
    """One magnetic sensitivity row block → (ncells, nmodel_components,
    ndata_components).

    Vectorized port of magnetic_field_magprism (magnetic_field.f90:118-297):
    susceptibility (1 model comp) or magnetization vector (3 comps); TMI
    (1 data comp) or three-component data (3 comps); unit scaling included.
    """
    tx, ty, tz = magnetic_tensor(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, handle_inside)
    # (ncells, nmodel_components, ndata_components)
    return combine_mag_tensor(
        tx, ty, tz, magv, intensity, nmodel_components, ndata_components
    )


# ---------------------------------------------------------------------------
# Far-field Gauss-Legendre quadrature (the compensated-f32 build).
#
# The closed-form prism kernels are 8-corner sign-alternating sums whose
# cancellation amplifies rounding by ~(R/h)^3 (the alternating sum is a third
# difference of the corner antiderivative): at R/h = 100 an f32 evaluation
# has lost ALL significant bits. The reference computes them in double for
# exactly this reason (gravity_field.f90:41-126). Kahan/two-sum over the 8
# terms cannot help — the bits are lost when each corner term is ROUNDED,
# not when the terms are summed. The stable f32 reformulation is to stop
# differencing: for a far cell, evaluate the smooth point-source integrand
# directly with a fixed Gauss-Legendre rule. A 3x3x3 rule's truncation
# error on the 1/r^2..1/r^3-type kernels is O((h/2R)^6) — at the blend
# radius R = 4 half-diagonals both the f32 closed form (~(R/h)^3 * ulp)
# and the quadrature (~1e-2 * (h/R)^6) sit at ~1e-5 relative, and the
# quadrature error FALLS with distance while the closed form's grows.
# ---------------------------------------------------------------------------

# 3-point Gauss-Legendre nodes/weights on [-1, 1].
_GL3 = (
    (-math.sqrt(3.0 / 5.0), 5.0 / 9.0),
    (0.0, 8.0 / 9.0),
    (math.sqrt(3.0 / 5.0), 5.0 / 9.0),
)

# 2-point Gauss-Legendre rule: the cheap far tier of the TIERED blend
# (8 rsqrt passes per cell instead of 27). Truncation error ~C (h/2R)^4.
_GL2 = (
    (-1.0 / math.sqrt(3.0), 1.0),
    (1.0 / math.sqrt(3.0), 1.0),
)

# Blend radius in units of the cell half-diagonal: cells with center
# distance R > FAR_QUAD_RADIUS * d use the quadrature, nearer cells the
# closed form (error crossover analysis above).
FAR_QUAD_RADIUS = 4.0

# Tier-2 radius: beyond it the 2^3 rule replaces the 3^3 rule in the
# corner-lattice blended operator (base = GL2 everywhere + one windowed
# correction to GL3/closed inside this radius). Calibrated on a
# 100x100x50 prism against the f64 closed forms (round 5):
#     r/halfdiag:      8        12       16       20
#     g_z   GL2 err:   1.2e-5   2.4e-6   7.6e-7   3.1e-7
#     Gzz   GL2 err:   6.6e-5   1.3e-5   4.1e-6   1.7e-6
# At the chosen radii the GL2 boundary error matches the ACCEPTED GL3
# error at the near blend boundary r=4 (g_z 1.6e-6, Gzz 6.4e-6) and
# falls as r^-4 beyond; the 1/r^5 tensor kernels (FTG, magnetics) need
# the larger radius.
FAR_QUAD2_RADIUS_GZ = 12.0
FAR_QUAD2_RADIUS_TENSOR = 16.0


def _quad_accumulate(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, point_fn, n_out,
                     order=3):
    """sum_i w_i * point_fn(source_i - obs) * V/8 over an order^3 GL rule.

    point_fn maps relative source coordinates (x, y, z) = (source - obs)
    to a tuple of n_out integrand arrays; returns a tuple of per-cell
    integrals. Statically unrolled (order^3 fused FMA/rsqrt passes, no
    transcendentals) — XLA fuses this into one elementwise loop."""
    rule = _GL3 if order == 3 else _GL2
    cx, hx = 0.5 * (X1 + X2), 0.5 * (X2 - X1)
    cy, hy = 0.5 * (Y1 + Y2), 0.5 * (Y2 - Y1)
    cz, hz = 0.5 * (Z1 + Z2), 0.5 * (Z2 - Z1)
    acc = [0.0] * n_out
    for u, wu in rule:
        for v, wv in rule:
            for w, ww in rule:
                x = cx + u * hx - xd
                y = cy + v * hy - yd
                z = cz + w * hz - zd
                vals = point_fn(x, y, z)
                wgt = wu * wv * ww
                for i in range(n_out):
                    acc[i] = acc[i] + wgt * vals[i]
    vol8 = hx * hy * hz  # cell volume / 8 (GL weights sum to 2 per axis)
    return tuple(a * vol8 for a in acc)


def gravi_z_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, order=3):
    """Far-field g_z by 27-point quadrature of the point-mass integrand
    g_z = G (z_s - z_o)/r^3 (positive toward a source below in Z-down
    space, matching gravi_z; verified against the f64 closed form in
    test_prism.py)."""

    def f(x, y, z):
        r2 = x * x + y * y + z * z
        ir = jax.lax.rsqrt(r2)
        inv_r3 = ir * ir * ir  # no div: VPU divide is ~10x a multiply
        return (z * inv_r3,)

    (gz,) = _quad_accumulate(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, f, 1,
                             order=order)
    return G_GRAV * gz


def gradi_zz_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, order=3):
    """Far-field Gzz by quadrature of G (3 z^2 - r^2)/r^5 (the second
    vertical derivative of the Newtonian potential; sign verified against
    gradi_zz's f64 closed form)."""

    def f(x, y, z):
        r2 = x * x + y * y + z * z
        inv_r = jax.lax.rsqrt(r2)
        ir2 = inv_r * inv_r
        inv_r5 = ir2 * ir2 * inv_r  # no div: VPU divide is ~10x a multiply
        return ((3.0 * z * z - r2) * inv_r5,)

    (gzz,) = _quad_accumulate(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, f, 1,
                              order=order)
    return G_GRAV * gzz


def gradi_full_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, order=3):
    """Far-field FTG tensor (Gxx, Gyy, Gzz, Gxy, Gyz, Gzx) by quadrature
    of the Newtonian second-derivative tensor (3 r_i r_j - r^2 d_ij)/r^5;
    component signs match gradi_full's conventions (verified in tests)."""

    def f(x, y, z):
        r2 = x * x + y * y + z * z
        inv_r = jax.lax.rsqrt(r2)
        ir2 = inv_r * inv_r
        inv_r5 = ir2 * ir2 * inv_r  # no div: VPU divide is ~10x a multiply
        return (
            (3.0 * x * x - r2) * inv_r5,
            (3.0 * y * y - r2) * inv_r5,
            (3.0 * z * z - r2) * inv_r5,
            3.0 * x * y * inv_r5,
            3.0 * y * z * inv_r5,
            3.0 * x * z * inv_r5,
        )

    xx, yy, zz, xy, yz, zx = _quad_accumulate(
        xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, f, 6, order=order
    )
    return tuple(
        G_GRAV * t for t in (xx, yy, zz, xy, yz, zx)
    )


def magnetic_tensor_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, order=3):
    """Far-field magnetic tensor rows by quadrature of the dipole kernel
    (3 r_i r_j - r^2 d_ij)/r^5 (Sharma 1966's closed form is exactly its
    prism integral); returns the same ((txx,txy,txz),(tyx,tyy,tyz),
    (tzx,tzy,tzz)) layout as sharmbox, signs verified in tests."""

    def f(x, y, z):
        r2 = x * x + y * y + z * z
        inv_r = jax.lax.rsqrt(r2)
        ir2 = inv_r * inv_r
        inv_r5 = ir2 * ir2 * inv_r  # no div: VPU divide is ~10x a multiply
        return (
            (3.0 * x * x - r2) * inv_r5,
            (3.0 * y * y - r2) * inv_r5,
            (3.0 * z * z - r2) * inv_r5,
            3.0 * x * y * inv_r5,
            3.0 * y * z * inv_r5,
            3.0 * x * z * inv_r5,
        )

    xx, yy, zz, xy, yz, zx = _quad_accumulate(
        xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, f, 6, order=order
    )
    return (xx, xy, zx), (xy, yy, yz), (zx, yz, zz)


def far_mask(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, radius=None):
    """Per-cell bool: center distance > radius * half-diagonal (the
    compensated-f32 blend decision)."""
    if radius is None:
        radius = FAR_QUAD_RADIUS
    cx, hx = 0.5 * (X1 + X2), 0.5 * (X2 - X1)
    cy, hy = 0.5 * (Y1 + Y2), 0.5 * (Y2 - Y1)
    cz, hz = 0.5 * (Z1 + Z2), 0.5 * (Z2 - Z1)
    r2 = (cx - xd) ** 2 + (cy - yd) ** 2 + (cz - zd) ** 2
    d2 = hx * hx + hy * hy + hz * hz
    return r2 > (radius * radius) * d2


def validate_finite(name: str, arr):
    """Host-side guard replacing the reference's in-loop aborts on
    boundary-touching observation points (gravity_field.f90:99-107,
    magnetic_field.f90:344-354)."""
    import numpy as np

    a = np.asarray(arr)
    if not np.all(np.isfinite(a)):
        raise FloatingPointError(
            f"Non-finite values in {name}: a data coordinate likely coincides with a "
            "model grid boundary. Adjust the model grid!"
        )


def validate_finite_device(name: str, arr):
    """Same guard as validate_finite but reduced ON DEVICE — only one bool
    crosses the host link (pulling a multi-GB kernel through the tunneled
    TPU transport runs at ~0.13 GB/s, BASELINE.md build profile)."""
    ok = bool(jnp.all(jnp.isfinite(arr)))
    if not ok:
        raise FloatingPointError(
            f"Non-finite values in {name}: a data coordinate likely coincides with a "
            "model grid boundary. Adjust the model grid!"
        )
