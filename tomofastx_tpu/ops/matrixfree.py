"""Matrix-free sensitivity operator: recompute prism responses on the fly.

The reference's answer to kernel memory is wavelet compression + disk cache
(sensitivity_gravmag.F90). On TPU there is a second answer the reference
cannot afford: do not store the kernel at all. The closed-form prism
integrals are a few hundred FLOPs per (data, cell) pair, embarrassingly
parallel, and free of memory traffic — so for problems where even the
packed kernel exceeds HBM, the matvec regenerates its rows per data chunk.

This trades the dense GEMV's HBM bandwidth bound for a VPU transcendental
bound; it is slower per iteration for kernels that fit in HBM and the only
option for kernels that do not. Select with ``tpu.kernelFormat =
matrixfree`` (requires compression off — compression exists to shrink
storage, which this mode eliminates).

All forward families are supported (gravity gz, FTG Gzz/full tensor,
magnetic TMI / 3-component, susceptibility / magnetization vector), via the
same physics dispatch as the stored-kernel builder
(ops/sensitivity.py::_forward_rows). Depth weighting (column weight) and
the baked-in problem*data row weights are applied on the fly
(sensitivity_gravmag.F90:228, 836-843 semantics).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# The GENERIC per-cell operator's far-quad candidate correction crashes
# the TPU worker in composed solver programs above this size (4M
# reproduced; see the gate in make_matrixfree_kernel). The lattice
# operator has NO such bound (its windowed correction is slice-based).
GENERIC_BLEND_MAX_CELLS = 2_000_000


@dataclass(frozen=True)
class _Physics:
    """Static physics description (hashable pytree aux data)."""

    problem: str  # "grav" | "magn"
    data_type: int  # gravity: 1 = g, 2 = gradiometry
    nmc: int  # model components
    ndc: int  # data components
    magv: Tuple[float, float, float]
    intensity: float
    handle_inside: bool
    # Compensated-f32 blend (tpu.farFieldQuad): far cells by Gauss
    # quadrature — the f32 closed forms are cancellation noise in the far
    # field (see ops/prism.py). Set for f32 general per-cell operators.
    far_quad: bool = False


def _rows_for_point(phys: _Physics, grid6, x, y, z, base_only=False):
    """(N, nmc, ndc) physics rows for one observation point — delegates to
    the shared dispatch (ops/sensitivity.py::forward_rows) so the stored
    and matrix-free paths cannot diverge.

    base_only=True (the compensated-f32 operator path): return the pure
    27-point quadrature rows for EVERY cell — the operator adds the
    near-cell closed-form difference separately via _corr_rows_for_point
    (see MatrixFreeKernel.matvec). The evaluate-both select
    (far_quad=True without base_only) remains the stored-kernel build's
    form."""
    from tomofastx_tpu.ops.sensitivity import _forward_rows_quad, forward_rows

    if base_only:
        return _forward_rows_quad(
            phys.problem, phys.data_type, phys.nmc, phys.ndc, phys.magv,
            phys.intensity, grid6, x, y, z,
        )
    return forward_rows(
        phys.problem, phys.data_type, phys.nmc, phys.ndc, phys.magv,
        phys.intensity, phys.handle_inside, grid6, x, y, z,
        far_quad=phys.far_quad,
    )


def _corr_rows_for_point(phys: _Physics, grid6, x, y, z, idx):
    """(K, nmc, ndc) near-patch CORRECTION rows on this point's candidate
    cells (precomputed at construction by near_cell_indices):
    where(near, closed - quad, 0), so the blended operator is
    quad-everywhere PLUS this correction — each cell pays ONE full-grid
    evaluation (vs the round-4 evaluate-both blend's two), and no
    full-array scatter is needed (a vmapped full-array
    dynamic_update_slice crashed the TPU worker at 4M cells — see
    LatticeMatrixFreeKernel._corr_window)."""
    from tomofastx_tpu.ops import prism
    from tomofastx_tpu.ops.sensitivity import _forward_rows_quad, forward_rows

    sub = tuple(a[idx] for a in grid6)
    closed = forward_rows(
        phys.problem, phys.data_type, phys.nmc, phys.ndc, phys.magv,
        phys.intensity, phys.handle_inside, sub, x, y, z,
    )
    quad_s = _forward_rows_quad(
        phys.problem, phys.data_type, phys.nmc, phys.ndc, phys.magv,
        phys.intensity, sub, x, y, z,
    )
    near = ~prism.far_mask(x, y, z, *sub)
    return jnp.where(near[:, None, None], closed - quad_s,
                     jnp.zeros_like(closed))


def near_cell_indices(grid6, xd, yd, zd, chunk=None, margin=1.001):
    """(npoints, K) int32 candidate-near cell indices for the generic
    blended operator, computed ONCE at construction on device.

    K = the max over points of the number of cells within margin * the
    blend radius (in own-half-diagonal units, prism.far_mask criterion),
    rounded up to a multiple of 8; for each point the K cells with the
    largest nearness score radius^2*d2 - r2 are kept. All truly-near
    cells fit (their count <= K by construction and their scores top the
    ordering); the margin absorbs fusion-dependent f32 rounding between
    this pass and the operator's runtime mask."""
    from tomofastx_tpu.ops import prism

    N = grid6[0].shape[0]
    npts = xd.shape[0]
    if chunk is None:
        # The vmapped score/top_k pass materializes chunk x N f32 (plus
        # top_k working set): cap it at ~0.5 GB — a fixed chunk=512 at 4M
        # cells requested 15.78 GB of HBM and OOMed the 16 GB chip
        # (observed live, round 5).
        chunk = max(8, min(512, (1 << 29) // (4 * max(N, 1))))
    rad = prism.FAR_QUAD_RADIUS * margin

    def pad_pts(a):
        out = jnp.full(((npts + chunk - 1) // chunk) * chunk, a[0], a.dtype)
        return out.at[:npts].set(a)

    xp, yp, zp = pad_pts(xd), pad_pts(yd), pad_pts(zd)
    nch = xp.shape[0] // chunk

    @jax.jit
    def counts(g6, xs, ys, zs):
        def one(x, y, z):
            return jnp.sum(
                (~prism.far_mask(x, y, z, *g6, radius=rad)).astype(jnp.int32)
            )

        def per_chunk(args):
            return jax.vmap(one)(*args)

        return jax.lax.map(
            per_chunk,
            (xs.reshape(nch, chunk), ys.reshape(nch, chunk),
             zs.reshape(nch, chunk)),
        ).reshape(-1)

    cnt = counts(grid6, xp, yp, zp)
    K = int(jnp.max(cnt))
    K = min(max(((K + 7) // 8) * 8, 8), N)

    @jax.jit
    def topk_idx(g6, xs, ys, zs):
        def one(x, y, z):
            cx = 0.5 * (g6[0] + g6[1])
            cy = 0.5 * (g6[2] + g6[3])
            cz = 0.5 * (g6[4] + g6[5])
            hx = 0.5 * (g6[1] - g6[0])
            hy = 0.5 * (g6[3] - g6[2])
            hz = 0.5 * (g6[5] - g6[4])
            r2 = (cx - x) ** 2 + (cy - y) ** 2 + (cz - z) ** 2
            d2 = hx * hx + hy * hy + hz * hz
            score = (rad * rad) * d2 - r2
            return jax.lax.top_k(score, K)[1].astype(jnp.int32)

        def per_chunk(args):
            return jax.vmap(one)(*args)

        return jax.lax.map(
            per_chunk,
            (xs.reshape(nch, chunk), ys.reshape(nch, chunk),
             zs.reshape(nch, chunk)),
        ).reshape(-1, K)

    return np.asarray(topk_idx(grid6, xp, yp, zp))[:npts]


@dataclass
class MatrixFreeKernel:
    """Row-regenerating sensitivity operator ((nrows*ndc) x (nmc*N_true)).

    The cell axis may be zero-padded (N >= N_true) so it divides a device
    mesh: padding cells are dummy prisms parked far outside the model
    volume with cw = 0, so their rows contribute nothing; matvec pads x and
    rmatvec slices the gradient back (the arbitrary-N block partition of
    parallel_tools.f90:46-63 as pad-to-multiple sharding)."""

    grid6: Tuple[jax.Array, ...]  # (X1, X2, Y1, Y2, Z1, Z2), each (N,)
    xd: jax.Array  # (nrows_padded,)
    yd: jax.Array
    zd: jax.Array
    cw: jax.Array  # (N,) column weight baked into rows; 0 on cell padding
    row_w: jax.Array  # (nrows_padded, ndc) problem*data weights; 0 on padding
    phys: _Physics
    chunk: int
    nrows: int  # true data count (unpadded)
    N_true: int = None  # logical cell count; None = no cell padding
    # (nrows_padded, K) int32 candidate-near cell indices for the
    # compensated-f32 quad+patch evaluation (near_cell_indices); None
    # when phys.far_quad is off.
    near_idx: "jax.Array | None" = None

    @property
    def N(self) -> int:
        return self.grid6[0].shape[0]

    @property
    def ncols(self) -> int:
        return self.phys.nmc * (self.N_true if self.N_true is not None else self.N)

    # NOTE: matvec/rmatvec share their chunking/padding/output-slicing
    # scaffold with LatticeMatrixFreeKernel below — a change to the
    # observation padding, row-weight application, or [:nrows] slicing
    # here must be mirrored there (and vice versa).
    @property
    def _patched(self) -> bool:
        return self.phys.far_quad and self.near_idx is not None

    def _chunk_rows(self, xs, ys, zs):
        """(chunk, N, nmc, ndc) base rows: pure quadrature when the near
        patch is active (the correction is added at the einsum level),
        else the full forward_rows dispatch."""
        base_only = self._patched
        return jax.vmap(
            lambda x, y, z: _rows_for_point(self.phys, self.grid6, x, y, z,
                                            base_only=base_only)
        )(xs, ys, zs)

    def _idx_chunks(self, nchunks):
        """(nchunks, chunk, K) near-candidate indices (K=1 zeros dummy
        when the patch is off, keeping the scan operands uniform)."""
        if self.near_idx is None:
            return jnp.zeros((nchunks, self.chunk, 1), jnp.int32)
        return self.near_idx.reshape(nchunks, self.chunk, -1)

    def matvec(self, x: jax.Array) -> jax.Array:
        x2 = x.reshape(self.phys.nmc, -1)
        npad = self.N - x2.shape[1]
        if npad:
            x2 = jnp.pad(x2, ((0, 0), (0, npad)))
        xw = self.cw[None, :] * x2  # (nmc, N); cell padding zeroed by cw = 0
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(args):
            xs, ys, zs, w, idx = args
            rows = self._chunk_rows(xs, ys, zs)
            d = jnp.einsum("bnkd,kn->bd", rows, xw)
            if self._patched:
                # Sequential per-point correction (see rmatvec: the
                # batched vmap form with its (B, K) gather participates
                # in the composed-program worker crash at 4M cells).
                def corr_body(_, p):
                    x_, y_, z_, ii = p
                    corr = _corr_rows_for_point(
                        self.phys, self.grid6, x_, y_, z_, ii
                    )
                    return None, jnp.einsum("nkd,kn->d", corr, xw[:, ii])

                _, dc = jax.lax.scan(corr_body, None, (xs, ys, zs, idx))
                d = d + dc
            return w * d

        parts = jax.lax.map(
            per_chunk,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                self.row_w.reshape(nchunks, self.chunk, -1),
                self._idx_chunks(nchunks),
            ),
        )
        return parts.reshape(-1, self.phys.ndc)[: self.nrows].reshape(-1)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u2 = u.reshape(self.nrows, self.phys.ndc)
        u_pad = jnp.zeros((self.xd.shape[0], self.phys.ndc), u.dtype).at[: self.nrows].set(u2)
        u_pad = u_pad * self.row_w
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(g, args):
            xs, ys, zs, uc, idx = args
            rows = self._chunk_rows(xs, ys, zs)
            g = g + jnp.einsum("bnkd,bd->kn", rows, uc)
            if self._patched:
                # SEQUENTIAL per-point candidate updates: the BATCHED
                # form (vmap the einsum, then one g.at[:, (B,K)idx].add)
                # crashed the TPU worker at 4M cells inside composed
                # solver programs (observed live, round 5) — the same
                # batched-full-array-scatter trigger as the lattice
                # operator's round-4 crash (CLAUDE.md). One K-index
                # scatter per scan step runs clean.
                def corr_body(gc, p):
                    x_, y_, z_, ii, ud = p
                    corr = _corr_rows_for_point(
                        self.phys, self.grid6, x_, y_, z_, ii
                    )
                    vals = jnp.einsum("nkd,d->kn", corr, ud)  # (nmc, K)
                    return gc.at[:, ii].add(vals), None

                g, _ = jax.lax.scan(corr_body, g, (xs, ys, zs, idx, uc))
            return g, None

        g0 = jnp.zeros((self.phys.nmc, self.N), u.dtype)
        g, _ = jax.lax.scan(
            per_chunk,
            g0,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                u_pad.reshape(nchunks, self.chunk, -1),
                self._idx_chunks(nchunks),
            ),
        )
        g = self.cw[None, :] * g
        if self.N_true is not None and self.N_true != self.N:
            g = g[:, : self.N_true]
        return g.reshape(-1)


def _mfk_flatten(k: MatrixFreeKernel):
    children = (k.grid6, k.xd, k.yd, k.zd, k.cw, k.row_w, k.near_idx)
    aux = (k.phys, k.chunk, k.nrows, k.N_true)
    return children, aux


def _mfk_unflatten(aux, children):
    grid6, xd, yd, zd, cw, row_w, near_idx = children
    phys, chunk, nrows, N_true = aux
    return MatrixFreeKernel(
        grid6=grid6, xd=xd, yd=yd, zd=zd, cw=cw, row_w=row_w,
        phys=phys, chunk=chunk, nrows=nrows, N_true=N_true, near_idx=near_idx,
    )


jax.tree_util.register_pytree_node(MatrixFreeKernel, _mfk_flatten, _mfk_unflatten)


def detect_lattice(grid):
    """Return (xe, ye, ze) edge vectors when the grid is a tensor-product
    lattice (every cell face shared exactly), else None. Exact float
    comparison: lattice grids written by the shipped tools repeat the
    same edge literals, and any mismatch safely falls back to the general
    per-cell operator."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz

    def edges(lo, hi, axis):
        a = np.asarray(lo).reshape(nz, ny, nx)
        b = np.asarray(hi).reshape(nz, ny, nx)
        # lo must vary only along `axis` (0 = z, 1 = y, 2 = x).
        ref = [slice(0, 1)] * 3
        ref[axis] = slice(None)
        if not np.array_equal(a, np.broadcast_to(a[tuple(ref)], a.shape)):
            return None
        if not np.array_equal(b, np.broadcast_to(b[tuple(ref)], b.shape)):
            return None
        lo1 = a[tuple(ref)].reshape(-1)
        hi1 = b[tuple(ref)].reshape(-1)
        if not np.array_equal(lo1[1:], hi1[:-1]):
            return None
        return np.concatenate([lo1, hi1[-1:]])

    xe = edges(grid.X1, grid.X2, 2)
    ye = edges(grid.Y1, grid.Y2, 1)
    ze = edges(grid.Z1, grid.Z2, 0)
    if xe is None or ye is None or ze is None:
        return None
    return xe, ye, ze


def _diff3(F):
    """D[F](i,j,k) = sum_{K,L,M} (-1)^(K+L+M) F[i+K,j+L,k+M]
    (per axis out[i] = F[i] - F[i+1]): corners -> cells, keeping the
    cancellation LOCAL to each cell's own 8 corner values."""
    g = F
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, g.shape[ax] - 1)
        hi[ax] = slice(1, g.shape[ax])
        g = g[tuple(lo)] - g[tuple(hi)]
    return g


def _lattice_closed_rows(
    xe, ye, ze, x, y, z, problem, data_type, magv, intensity, nmc, ndc
):
    """Corner-difference closed-form rows on a (sub-)lattice:
    (nz, ny, nx, nmc, ndc). Each lattice corner's antiderivative is
    evaluated ONCE and shared by up to 8 cells (~8x fewer transcendentals
    than the per-cell 8-corner sums the reference loops,
    gravity_field.f90:131-195)."""
    from tomofastx_tpu.ops.prism import (
        G_GRAV,
        combine_mag_tensor,
        ftg_corner_potentials,
        gz_corner_potential,
        mag_corner_potentials,
    )

    cx = (x - xe)[None, None, :]
    cy = (y - ye)[None, :, None]
    cz = (z - ze)[:, None, None]

    if problem == "grav" and data_type == 1:
        rows = -G_GRAV * _diff3(gz_corner_potential(cx, cy, cz))
        return rows[..., None, None]

    if problem == "grav":  # data_type 2: FTG
        # The gradiprism kernels flip z internally (ZZ = -(zd - Z)).
        ps = ftg_corner_potentials(cx, cy, -cz)
        if ndc == 1:  # Gzz only
            rows = -G_GRAV * _diff3(ps[2])
            return rows[..., None, None]
        rows = jnp.stack([-G_GRAV * _diff3(pc) for pc in ps], axis=-1)
        return rows[..., None, :]

    # Magnetic corner potentials are evaluated at s = corner - obs (the
    # sharmbox convention, magnetic_field.f90:330-335), NOT obs - corner:
    # f3 = log(R + s_z) is singular on the ray {s_x = s_y = 0, s_z < 0},
    # and with s = corner - obs that ray points UP away from the grid
    # (s_z > 0 below the observation), whereas the obs - corner convention
    # put it straight DOWN through the model — any observation exactly
    # above a lattice node hit log(0) = -inf (caught by the round-3 dense
    # lattice build; the two conventions are D-equivalent where finite
    # since they differ by terms constant along one axis, which the
    # alternating corner difference annihilates).
    f1, f2, f3, f4, f5 = mag_corner_potentials(-cx, -cy, -cz)
    # The tensor-to-row combination is LINEAR with scalar coefficients
    # and the corner difference D is linear, so combine the corner
    # potentials FIRST and difference once per output channel: TMI +
    # susceptibility materializes ONE corner field instead of 5
    # channels + 6 tensor arrays (the memory-bound part of this
    # operator). Corner-space tensor derived term-by-term from sharmbox's
    # 8-corner sums (txx = D[f1], txy = -D[f3], tyz = -D[f4],
    # txz = -D[f5], tzz = -D[f1 + f2]; parity vs the dense sharmbox
    # kernel in tests::test_matrixfree_equals_dense).
    Fc = combine_mag_tensor(
        (f1, -f3, -f5), (-f3, f2, -f4), (-f5, -f4, -(f1 + f2)),
        magv, intensity, nmc, ndc,
    )  # (nz+1, ny+1, nx+1, nmc, ndc)
    return _diff3(Fc)


def _lattice_quad_rows(
    xe, ye, ze, x, y, z, problem, data_type, magv, intensity, nmc, ndc,
    order=3,
):
    """order^3-point Gauss-quadrature rows for EVERY lattice cell:
    (nz, ny, nx, nmc, ndc). FLAT (N,) cell bounds, not the
    (1,1,nx)/(1,ny,1)/(nz,1,1) broadcast triplets: the broadcast-structured
    program hard-crashed the TPU worker above ~2M cells while the flat
    per-cell program is proven at 4M (CLAUDE.md gotcha) — and the element
    count is identical either way. order=2 is the blended operator's cheap
    base tier (see prism.FAR_QUAD2_RADIUS_*); order=3 the accurate mid
    tier and the dense build's far rule."""
    from tomofastx_tpu.ops import prism as P

    nz_, ny_, nx_ = len(ze) - 1, len(ye) - 1, len(xe) - 1
    shp = (nz_, ny_, nx_)
    ga = (
        jnp.broadcast_to(xe[:-1][None, None, :], shp).reshape(-1),
        jnp.broadcast_to(xe[1:][None, None, :], shp).reshape(-1),
        jnp.broadcast_to(ye[:-1][None, :, None], shp).reshape(-1),
        jnp.broadcast_to(ye[1:][None, :, None], shp).reshape(-1),
        jnp.broadcast_to(ze[:-1][:, None, None], shp).reshape(-1),
        jnp.broadcast_to(ze[1:][:, None, None], shp).reshape(-1),
    )
    if problem == "magn":
        tq, uq, vq = P.magnetic_tensor_quad(x, y, z, *ga, order=order)
        quad = P.combine_mag_tensor(tq, uq, vq, magv, intensity, nmc, ndc)
    elif data_type == 1:
        quad = P.gravi_z_quad(x, y, z, *ga, order=order)[..., None, None]
    elif ndc == 1:
        quad = P.gradi_zz_quad(x, y, z, *ga, order=order)[..., None, None]
    else:
        quad = jnp.stack(
            P.gradi_full_quad(x, y, z, *ga, order=order), axis=-1
        )[..., None, :]
    return quad.reshape(shp + quad.shape[1:])


def tier2_radius(problem: str, data_type: int) -> float:
    """Tier-2 window radius (in half-diagonals) for the tiered blend —
    shared by the factory AND parallel/mesh.py::shard_kernel so meshed
    and unmeshed operators use the SAME window geometry (a shard-time
    re-derivation with the near radius 4.0 would silently collapse the
    27-pt/closed mid tier on meshed runs; round-5 review finding)."""
    from tomofastx_tpu.ops import prism

    return (
        prism.FAR_QUAD2_RADIUS_GZ
        if (problem == "grav" and data_type == 1)
        else prism.FAR_QUAD2_RADIUS_TENSOR
    )


def lattice_near_window(xe, ye, ze, xd, yd, zd, radius=None):
    """Host-side geometry for the blended lattice operator's near patch.

    Returns ((wz, wy, wx), wi0) where the static per-axis window sizes
    cover every cell whose center lies within radius*max_half_diagonal of
    ANY point, and wi0 (npoints, 3) holds each observation point's window
    start indices (z, y, x). Every near cell (center distance <=
    radius * its own half-diagonal, prism.far_mask negated) of a point is
    guaranteed inside that point's window: near implies
    |c_ax - t_ax| <= radius*max_half_diagonal =: D per axis, the window
    size is the max count of cell centers in any closed interval of
    length 2D, and the start index is clamped to keep the window in
    range. A small relative margin on D absorbs f32-vs-f64 rounding of
    the on-device mask at the blend boundary (a marginally-near cell
    that escapes the window harmlessly keeps its quadrature value)."""
    from tomofastx_tpu.ops.prism import FAR_QUAD_RADIUS

    if radius is None:
        radius = FAR_QUAD_RADIUS
    xe = np.asarray(xe, np.float64)
    ye = np.asarray(ye, np.float64)
    ze = np.asarray(ze, np.float64)
    maxh2 = (
        np.max(0.5 * np.diff(xe)) ** 2
        + np.max(0.5 * np.diff(ye)) ** 2
        + np.max(0.5 * np.diff(ze)) ** 2
    )
    D = radius * np.sqrt(maxh2) * (1.0 + 1.0e-5)

    def axis(e, t):
        c = 0.5 * (e[:-1] + e[1:])
        n = len(c)
        W = int(np.max(np.searchsorted(c, c + 2.0 * D, side="right")
                       - np.arange(n)))
        W = max(1, min(W, n))
        lo = np.searchsorted(c, np.asarray(t, np.float64) - D, side="left")
        i0 = np.clip(lo, 0, n - W)
        return W, i0.astype(np.int32)

    wx, ix = axis(xe, xd)
    wy, iy = axis(ye, yd)
    wz, iz = axis(ze, zd)
    return (wz, wy, wx), np.stack([iz, iy, ix], axis=1)


def lattice_rows_for_point(
    xe, ye, ze, x, y, z, problem, data_type, magv, intensity, nmc, ndc,
):
    """Per-cell CLOSED-FORM sensitivity rows for one observation point via
    the corner-potential lattice: (nz, ny, nx, nmc, ndc). Used by the
    dense f64 kernel build (ops/sensitivity.py) and as the near-field
    ingredient of the blended operator. The compensated-f32 blended
    OPERATOR does not materialize patched rows at all — it evaluates
    quad-everywhere (_lattice_quad_rows) plus a windowed correction
    (LatticeMatrixFreeKernel._corr_window): the first-cut row-level patch
    (vmapped dynamic_update_slice into the full quad array) crashed the
    TPU worker at 4M cells even in a bare LSQR program."""
    return _lattice_closed_rows(
        xe, ye, ze, x, y, z, problem, data_type, magv, intensity, nmc, ndc,
    )


@dataclass
class LatticeMatrixFreeKernel:
    """Corner-lattice factorization of the matrix-free operator (gravity
    g_z and the full magnetic family).

    On a tensor-product grid the prism closed forms are alternating
    2x2x2 corner sums of point antiderivatives (prism.gz_corner_potential
    for g_z; prism.mag_corner_potentials, 5 channels, for the Sharma
    tensor), and each corner is shared by up to 8 cells. Instead of evaluating 8
    corners per cell (the reference's per-cell loop,
    gravity_field.f90:131-195), evaluate f ONCE per lattice corner and
    difference the corner field back to per-cell rows:

        rows_obs   = -d3^T F_obs          (2x2x2 alternating stencil)
        S @ x      = sum_cells rows_obs * (cw*x)
        S^T u      = cw * sum_obs u_obs * rows_obs

    ~8x fewer transcendentals per matvec than the general operator, with
    the SAME local cancellation as the per-cell form (each cell value is
    a difference of its own 8 f32 corner values). NOTE a tempting
    alternative — moving the stencil onto the model vector and summing
    F * (-d3(cw*x)) over corners — is mathematically identical but
    numerically fatal in f32: F is O(1e5-1e6) while the result is many
    orders smaller, so the GLOBAL sum cancels past f32's mantissa
    (measured: data misfit floor 4e-3 instead of 1e-7 at 4M cells)."""

    xe: jax.Array  # (nx+1,)
    ye: jax.Array  # (ny+1,)
    ze: jax.Array  # (nz+1,)
    xd: jax.Array  # (nrows_padded,)
    yd: jax.Array
    zd: jax.Array
    cw: jax.Array  # (N,)
    row_w: jax.Array  # (nrows_padded, ndc)
    chunk: int
    nrows: int
    nx: int
    ny: int
    nz: int
    # Static physics: "grav" (g_z) or "magn" (Sharma tensor, all
    # susceptibility/vector x TMI/3-component combos; no borehole).
    problem: str = "grav"
    magv: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    intensity: float = 0.0
    nmc: int = 1
    ndc: int = 1
    data_type: int = 1  # gravity: 1 = g_z, 2 = gradiometry (FTG)
    # Compensated-f32 TIERED blend: 8-pt quadrature everywhere + one
    # windowed where(near, closed, 27-pt) - 8-pt correction (see
    # _corr_window; set for f32 operators by the factory, which also
    # supplies win/wi0 from lattice_near_window at the tier-2 radius).
    far_quad: bool = False
    # Static (wz, wy, wx) TIER-2 window sizes (aux; None when far_quad
    # is off) — sized so every cell outside is at least
    # prism.FAR_QUAD2_RADIUS_* half-diagonals away in some axis.
    win: "Tuple[int, int, int] | None" = None
    # (nrows_padded, 3) int32 per-observation window start indices
    # (child; None when far_quad is off).
    wi0: "jax.Array | None" = None
    # Observation sharding (parallel/mesh.py::shard_kernel): when set, each
    # per-chunk batch of observation points is split across the mesh —
    # every device evaluates the corner fields for chunk/n points against
    # the REPLICATED model grid, GSPMD all-gathers the matvec data outputs
    # and psums the rmatvec gradient contraction. This is the reference's
    # data-row split of the forward (sensitivity_gravmag.F90:179-189)
    # composed with its Allreduce-summed adjoint (lsqr_solver2.F90:208-214),
    # re-expressed as sharding constraints. Requires chunk % mesh size == 0.
    mesh: "jax.sharding.Mesh | None" = None

    @property
    def N(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def ncols(self) -> int:
        return self.nmc * self.N

    def _base_rows_for_point(self, x, y, z):
        """(nz, ny, nx, nmc, ndc) base rows for one observation point:
        cheap 8-point (2^3 Gauss) quadrature when far_quad (every cell;
        accurate beyond the tier-2 window, see prism.FAR_QUAD2_RADIUS_*),
        else the corner-difference closed forms."""
        if self.far_quad:
            return _lattice_quad_rows(
                self.xe, self.ye, self.ze, x, y, z, self.problem,
                self.data_type, self.magv, self.intensity, self.nmc,
                self.ndc, order=2,
            )
        return _lattice_closed_rows(
            self.xe, self.ye, self.ze, x, y, z, self.problem, self.data_type,
            self.magv, self.intensity, self.nmc, self.ndc,
        )

    def _corr_window(self, x, y, z, i0):
        """(wz, wy, wx, nmc, ndc) TIERED correction rows for one point:
        where(near, closed, quad3) - quad2 on the static window, so the
        blended operator (base-quad2-everywhere PLUS this correction)
        evaluates closed forms within FAR_QUAD_RADIUS, the 27-point rule
        from there to the window edge, and the cheap 8-point rule beyond
        (every cell outside the window is >= the tier-2 radius away in
        some axis, where the 2^3 rule's error matches the accepted
        3^3-rule error at the near boundary — prism.FAR_QUAD2_RADIUS_*).
        The correction form exists because the round-5 first cut —
        vmapped dynamic_update_slice of the closed rows into the full
        quad array — crashed the TPU worker at 4M cells even in a bare
        LSQR program (the batched full-array scatter; bisect stage A,
        2026-08-21), while einsum contributions plus a tiny sequential
        window update need no full-array scatter at all."""
        from tomofastx_tpu.ops import prism as P

        wz, wy, wx = self.win
        i0z, i0y, i0x = i0[0], i0[1], i0[2]
        xe_w = jax.lax.dynamic_slice(self.xe, (i0x,), (wx + 1,))
        ye_w = jax.lax.dynamic_slice(self.ye, (i0y,), (wy + 1,))
        ze_w = jax.lax.dynamic_slice(self.ze, (i0z,), (wz + 1,))
        args = (x, y, z, self.problem, self.data_type, self.magv,
                self.intensity, self.nmc, self.ndc)
        closed = _lattice_closed_rows(xe_w, ye_w, ze_w, *args)
        quad3_w = _lattice_quad_rows(xe_w, ye_w, ze_w, *args, order=3)
        quad2_w = _lattice_quad_rows(xe_w, ye_w, ze_w, *args, order=2)
        cxw = 0.5 * (xe_w[:-1] + xe_w[1:])[None, None, :]
        hxw = 0.5 * (xe_w[1:] - xe_w[:-1])[None, None, :]
        cyw = 0.5 * (ye_w[:-1] + ye_w[1:])[None, :, None]
        hyw = 0.5 * (ye_w[1:] - ye_w[:-1])[None, :, None]
        czw = 0.5 * (ze_w[:-1] + ze_w[1:])[:, None, None]
        hzw = 0.5 * (ze_w[1:] - ze_w[:-1])[:, None, None]
        r2 = (cxw - x) ** 2 + (cyw - y) ** 2 + (czw - z) ** 2
        d2 = hxw * hxw + hyw * hyw + hzw * hzw
        near = r2 <= (P.FAR_QUAD_RADIUS * P.FAR_QUAD_RADIUS) * d2
        return (
            jnp.where(near[..., None, None], closed, quad3_w) - quad2_w
        )

    def _wi0_chunks(self, nchunks):
        """(nchunks, chunk, 3) window starts (zeros when far_quad off —
        a dummy scan operand keeps the chunk plumbing uniform)."""
        if self.wi0 is None:
            return jnp.zeros((nchunks, self.chunk, 3), jnp.int32)
        return self.wi0.reshape(nchunks, self.chunk, 3)

    def _shard_obs(self, xs, ys, zs, w, i0):
        """Constrain one chunk's observation batch to split over the mesh
        (no-op when unmeshed)."""
        if self.mesh is None:
            return xs, ys, zs, w, i0
        from jax.sharding import NamedSharding, PartitionSpec as P

        # All mesh axes together: on a 2-D (obs x cells) mesh the
        # observation batch splits across every device, not just one axis.
        ax = tuple(self.mesh.axis_names)
        s1 = NamedSharding(self.mesh, P(ax))
        s2 = NamedSharding(self.mesh, P(ax, None))
        c = jax.lax.with_sharding_constraint
        return c(xs, s1), c(ys, s1), c(zs, s1), c(w, s2), c(i0, s2)

    def matvec(self, x: jax.Array) -> jax.Array:
        x2 = x.reshape(self.nmc, self.N)
        y = (self.cw[None, :] * x2).reshape(self.nmc, self.nz, self.ny, self.nx)
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(args):
            xs, ys, zs, w, i0 = self._shard_obs(*args)

            def one(xx, yy, zz, ii):
                d = jnp.einsum(
                    "zyxkd,kzyx->d", self._base_rows_for_point(xx, yy, zz), y
                )
                if self.far_quad:
                    wz, wy, wx = self.win
                    z0 = jnp.zeros((), ii.dtype)
                    yw = jax.lax.dynamic_slice(
                        y, (z0, ii[0], ii[1], ii[2]),
                        (self.nmc, wz, wy, wx),
                    )
                    d = d + jnp.einsum(
                        "zyxkd,kzyx->d", self._corr_window(xx, yy, zz, ii), yw
                    )
                return d

            return w * jax.vmap(one)(xs, ys, zs, i0)

        parts = jax.lax.map(
            per_chunk,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                self.row_w.reshape(nchunks, self.chunk, self.ndc),
                self._wi0_chunks(nchunks),
            ),
        )
        return parts.reshape(-1, self.ndc)[: self.nrows].reshape(-1)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u2 = u.reshape(self.nrows, self.ndc)
        u_pad = (
            jnp.zeros((self.xd.shape[0], self.ndc), u.dtype)
            .at[: self.nrows]
            .set(u2)
        )
        u_pad = u_pad * self.row_w
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(g, args):
            xs, ys, zs, uc, i0 = self._shard_obs(*args)
            rows = jax.vmap(self._base_rows_for_point)(xs, ys, zs)
            g = g + jnp.einsum("bd,bzyxkd->kzyx", uc, rows)
            if self.far_quad:
                wz, wy, wx = self.win

                def body(gc, p):
                    xx, yy, zz, ud, ii = p
                    corr = self._corr_window(xx, yy, zz, ii)
                    contrib = jnp.einsum("zyxkd,d->kzyx", corr, ud)
                    z0 = jnp.zeros((), ii.dtype)
                    start = (z0, ii[0], ii[1], ii[2])
                    blk = jax.lax.dynamic_slice(
                        gc, start, (self.nmc, wz, wy, wx)
                    ) + contrib
                    return jax.lax.dynamic_update_slice(gc, blk, start), None

                g, _ = jax.lax.scan(body, g, (xs, ys, zs, uc, i0))
            return g, None

        g0 = jnp.zeros((self.nmc, self.nz, self.ny, self.nx), u.dtype)
        g3, _ = jax.lax.scan(
            per_chunk,
            g0,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                u_pad.reshape(nchunks, self.chunk, self.ndc),
                self._wi0_chunks(nchunks),
            ),
        )
        g = self.cw[None, :] * g3.reshape(self.nmc, self.N)
        return g.reshape(-1)


def _lmfk_flatten(k: LatticeMatrixFreeKernel):
    children = (k.xe, k.ye, k.ze, k.xd, k.yd, k.zd, k.cw, k.row_w, k.wi0)
    aux = (k.chunk, k.nrows, k.nx, k.ny, k.nz,
           k.problem, k.magv, k.intensity, k.nmc, k.ndc, k.data_type,
           k.far_quad, k.win, k.mesh)
    return children, aux


def _lmfk_unflatten(aux, children):
    xe, ye, ze, xd, yd, zd, cw, row_w, wi0 = children
    (chunk, nrows, nx, ny, nz, problem, magv, intensity, nmc, ndc,
     data_type, far_quad, win, mesh) = aux
    return LatticeMatrixFreeKernel(
        xe=xe, ye=ye, ze=ze, xd=xd, yd=yd, zd=zd, cw=cw, row_w=row_w,
        chunk=chunk, nrows=nrows, nx=nx, ny=ny, nz=nz,
        problem=problem, magv=magv, intensity=intensity, nmc=nmc, ndc=ndc,
        data_type=data_type, far_quad=far_quad, win=win, wi0=wi0, mesh=mesh,
    )


jax.tree_util.register_pytree_node(
    LatticeMatrixFreeKernel, _lmfk_flatten, _lmfk_unflatten
)


def make_matrixfree_kernel(
    par, grid, data, column_weight, problem_weight, data_weight, dtype=jnp.float32,
    chunk=None, pad_cells_to: int = 1, validate: bool = True,
    force_generic: bool = False, force_no_fft: bool = False,
    in_fused_program: bool = False,
) -> "MatrixFreeKernel | LatticeMatrixFreeKernel":
    """Build the operator from the problem description (no kernel storage).

    Fastest applicable operator wins: the FFT/BTTB operator (ops/bttb.py,
    per-layer 2-D FFT convolutions; requires lattice grid with uniform
    x/y spacing + observations on a commensurate lattice at one height),
    then the corner-lattice fast operator (LatticeMatrixFreeKernel,
    2.1-3.5x) when the grid is a tensor-product lattice and the physics
    supports it; otherwise the general per-cell MatrixFreeKernel.
    force_no_fft skips the FFT operator (tests / A-B benchmarking).

    pad_cells_to > 1 zero-pads the cell axis to that multiple (dummy far
    prisms with cw = 0) so the operator shards over a device mesh of that
    size for any N (see parallel/mesh.py::shard_kernel).

    validate=True runs one probe matvec at construction and aborts on
    non-finite output — the stored-kernel build catches a
    boundary-coincident observation point at build time
    (gravity_field.f90:99-107 aborts: "Data coordinate coincides with model
    grid boundary ... Adjust the model grid!"); without this probe the
    matrix-free path would instead propagate silent NaNs into the solve."""
    from tomofastx_tpu.config.parfile import MagParams
    from tomofastx_tpu.ops import prism

    if par.compression_type > 0:
        raise ValueError("matrix-free mode requires forward.matrixCompression.type = 0")

    # Compensated-f32 physics for the general per-cell operator (the
    # lattice/BTTB fast paths below have their own precision stories: the
    # BTTB table is f64-built, and the corner-lattice operator is only
    # selected where its cancellation behavior is pinned by tests).
    far_quad = bool(
        getattr(par, "far_field_quad", 1) and jnp.dtype(dtype) == jnp.float32
    )
    if isinstance(par, MagParams):
        from tomofastx_tpu.ops.sensitivity import observation_inside_grid

        phys = _Physics(
            problem="magn", data_type=1, nmc=par.nmodel_components,
            ndc=par.ndata_components, magv=prism.dircos(par.mi, par.md, par.theta),
            intensity=par.intensity,
            handle_inside=observation_inside_grid(grid, data),
            far_quad=far_quad,
        )
    else:
        phys = _Physics(
            problem="grav", data_type=par.data_type, nmc=1,
            ndc=par.ndata_components, magv=(0.0, 0.0, 1.0), intensity=0.0,
            handle_inside=False, far_quad=far_quad,
        )

    # FFT/BTTB fast path: exact physics (f64-built offset table) at
    # O(nz P log P) per matvec. No cell padding needed for a mesh — the
    # operator shards over z-layers (parallel/mesh.py::shard_kernel).
    if not force_generic and not force_no_fft:
        from tomofastx_tpu.ops.bttb import detect_bttb, make_bttb_kernel

        geom = detect_bttb(grid, data, nmc=phys.nmc, ndc=phys.ndc)
        if geom is not None:
            return make_bttb_kernel(
                phys, geom, grid, column_weight, problem_weight,
                data_weight, dtype,
            )

    N = grid.nelements_total
    nd = par.ndata
    if chunk is None:
        # The round-5 quad+patch blend pays ONE full-size rows array per
        # chunk (like the unblended operator), so no blended-chunk
        # halving: the round-4 evaluate-both blend that needed it (two
        # full-grid row arrays; TPU worker crash at 4M cells, CLAUDE.md)
        # is gone. Cap 128: the bench-shape chunk sweep (round 5, v5e)
        # measured 32:318 / 64:316 / 128:268 / 256:275 / 512:283 /
        # 1024:287 ms per LSQR iteration.
        chunk = max(8, min(128, (1 << 26) // max(N * phys.nmc * phys.ndc, 1)))
    nd_pad = ((nd + chunk - 1) // chunk) * chunk

    # Padding rows must evaluate to finite numbers (a corner-touching
    # observation point yields log(0) and 0 * nan = nan), so park them far
    # outside the model volume.
    far = (
        float(np.max(grid.X2)) + 1.0e6,
        float(np.max(grid.Y2)) + 1.0e6,
        float(np.min(grid.Z1)) - 1.0e6,
    )

    def pad(a, fill):
        out = np.full(nd_pad, fill)
        out[:nd] = a
        return jnp.asarray(out, dtype)

    row_w = np.zeros((nd_pad, phys.ndc))
    row_w[:nd] = problem_weight * np.asarray(data_weight).reshape(nd, phys.ndc)

    # Corner-lattice fast path: on a tensor-product grid the closed
    # forms factor into one antiderivative per lattice corner (~8x fewer
    # transcendentals per matvec). force_generic (tests) keeps the
    # general operator. Under a device mesh (pad_cells_to > 1) the
    # lattice operator needs NO cell padding — it shards over the
    # observation axis instead (parallel/mesh.py::shard_kernel sets
    # op.mesh), so the fast path is kept for meshed runs too.
    lattice_ok = (
        not force_generic
        and (
            (phys.problem == "grav" and phys.nmc == 1)  # g_z and FTG
            # Magnetics: every nmc/ndc combo; the 6-subprism borehole
            # branch is per-cell and cannot share corners.
            or (phys.problem == "magn" and not phys.handle_inside)
        )
    )
    # History: the round-4 evaluate-both blend crashed the TPU worker
    # above ~2M cells inside composed solver programs and was gated off
    # at that scale (commit 1335351's diagnosis). The round-5 quad+patch
    # structure pays one full-grid evaluation (the flat per-cell
    # formulation proven crash-free at 4M) plus a tiny static near
    # window, and the gate is removed — re-validated on hardware at
    # 4M/8M cells (scripts/run_4m_matrixfree.py, round 5).
    if lattice_ok:
        lat = detect_lattice(grid)
        if lat is not None:
            xe, ye, ze = lat
            xd_p, yd_p, zd_p = pad(data.X, far[0]), pad(data.Y, far[1]), pad(data.Z, far[2])
            win = wi0 = None
            if phys.far_quad:
                # Window sized for the TIERED blend: it must reach the
                # tier-2 radius (where the cheap 2^3 base rule becomes
                # accurate), not just the closed-form near radius. The
                # 1/r^5 tensor kernels need the larger one (calibration
                # table at prism.FAR_QUAD2_RADIUS_*).
                r2q = tier2_radius(phys.problem, phys.data_type)
                win, wi0 = lattice_near_window(
                    xe, ye, ze, np.asarray(xd_p), np.asarray(yd_p),
                    np.asarray(zd_p), radius=r2q,
                )
                wi0 = jnp.asarray(wi0)
            op = LatticeMatrixFreeKernel(
                xe=jnp.asarray(xe, dtype),
                ye=jnp.asarray(ye, dtype),
                ze=jnp.asarray(ze, dtype),
                xd=xd_p,
                yd=yd_p,
                zd=zd_p,
                cw=jnp.asarray(column_weight, dtype),
                row_w=jnp.asarray(row_w, dtype),
                chunk=chunk,
                nrows=nd,
                nx=grid.nx, ny=grid.ny, nz=grid.nz,
                problem=phys.problem, magv=phys.magv,
                intensity=phys.intensity, nmc=phys.nmc, ndc=phys.ndc,
                data_type=phys.data_type, far_quad=phys.far_quad,
                win=win, wi0=wi0,
            )
            if validate:
                probe = np.asarray(op.matvec(jnp.ones((op.ncols,), dtype)))
                if not np.all(np.isfinite(probe)):
                    raise ValueError(
                        "Data coordinate coincides with model grid boundary. "
                        "Adjust the model grid! (non-finite matrix-free probe "
                        "matvec; reference aborts here, gravity_field.f90:99-107)"
                    )
            return op

    # GENERIC-operator blend gate: the K-candidate correction crashes the
    # TPU worker above ~2M cells inside COMPOSED solver programs (4M
    # reproduced 3x live in round 5 — with the batched (B,K) gather +
    # scatter form AND with both einsums made sequential per-point;
    # standalone blended programs and the blend-off composed solve run
    # clean, the same composed-only signature as the lattice operator's
    # round-4 crash whose fix — windowed dynamic_slice corrections — has
    # no arbitrary-index gather/scatter and does NOT transfer to
    # irregular grids). scripts/probe_generic_4m.py is the reproducer.
    gate_max = int(os.environ.get(
        "TOMOFASTX_GENERIC_BLEND_MAX_CELLS", GENERIC_BLEND_MAX_CELLS))
    if (phys.far_quad and N > gate_max
            and jax.default_backend() != "cpu"):
        # CPU backends are exempt: the gate guards a TPU-runtime defect,
        # and gating there would silently degrade CPU runs' far field
        # (round-5 review finding). The env override exists so the
        # reproducer scripts can still reach the crashing configuration.
        import warnings

        warnings.warn(
            f"far-field quadrature blend DISABLED for the generic "
            f"matrix-free operator at {N} cells (> {gate_max}): its "
            f"candidate-correction program crashes the TPU worker in "
            f"composed solves (round-5 reproducer: "
            f"scripts/probe_generic_4m.py with "
            f"TOMOFASTX_GENERIC_BLEND_MAX_CELLS=999999999). The "
            f"operator's f32 far field carries cancellation noise at "
            f"this scale — prefer a tensor-product (lattice) grid, "
            f"which blends at any size, or a stored-kernel build.",
            stacklevel=2,
        )
        phys = dataclasses.replace(phys, far_quad=False)

    # Cell-axis padding: dummy unit prisms far outside the model volume
    # (finite closed forms for every real observation point) with cw = 0.
    N_pad = ((N + pad_cells_to - 1) // pad_cells_to) * pad_cells_to
    ncpad = N_pad - N

    def pad_cells(a, base):
        if ncpad == 0:
            return jnp.asarray(a, dtype)
        out = np.empty(N_pad)
        out[:N] = a
        # Spread the dummies along x so no two coincide.
        out[N:] = base + 10.0 * np.arange(ncpad)
        return jnp.asarray(out, dtype)

    fx = float(np.max(grid.X2)) + 2.0e6
    fy = float(np.max(grid.Y2)) + 2.0e6
    fz = float(np.max(grid.Z2)) + 2.0e6
    grid6 = (
        pad_cells(grid.X1, fx),
        pad_cells(grid.X2, fx + 1.0),
        pad_cells(grid.Y1, fy),
        pad_cells(grid.Y2, fy + 1.0),
        pad_cells(grid.Z1, fz),
        pad_cells(grid.Z2, fz + 1.0),
    )
    cw_pad = np.zeros(N_pad)
    cw_pad[:N] = np.asarray(column_weight)

    xd_p, yd_p, zd_p = pad(data.X, far[0]), pad(data.Y, far[1]), pad(data.Z, far[2])
    near_idx = None
    if phys.far_quad:
        near_idx = jnp.asarray(near_cell_indices(grid6, xd_p, yd_p, zd_p))
    op = MatrixFreeKernel(
        grid6=grid6,
        xd=xd_p,
        yd=yd_p,
        zd=zd_p,
        cw=jnp.asarray(cw_pad, dtype),
        row_w=jnp.asarray(row_w, dtype),
        phys=phys,
        chunk=chunk,
        nrows=nd,
        N_true=N,
        near_idx=near_idx,
    )

    if validate:
        probe = np.asarray(op.matvec(jnp.ones((op.ncols,), dtype)))
        if not np.all(np.isfinite(probe)):
            raise ValueError(
                "Data coordinate coincides with model grid boundary. "
                "Adjust the model grid! (non-finite matrix-free probe matvec; "
                "reference aborts here, gravity_field.f90:99-107)"
            )
    return op
