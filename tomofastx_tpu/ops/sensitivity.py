"""Sensitivity-kernel construction: depth weighting + dense kernel build +
wavelet-domain thresholding ("compression").

TPU-native counterpart of the reference forward layer
(sensitivity_gravmag.F90, weights_gravmag.f90). Design shift, not a port:

- The kernel is built as one dense array S of shape
  (ndata, ndata_components, nmodel_components, N) by a batched/vmapped
  closed-form prism evaluation — the whole "hot loop" of the reference
  (sensitivity_gravmag.F90:189-318) becomes a single XLA program per data
  chunk, with no disk round-trip.
- "Compression" keeps the reference's exact operator semantics — depth
  weight, 3-D wavelet transform of each row, per-row threshold at the
  (nel_kept+1)-th largest |coefficient| with a 1e-30 floor
  (sensitivity_gravmag.F90:237-272) — but realises it as a dense
  wavelet-domain matrix with the discarded entries zeroed.  On the MXU a
  dense matmul with structured zeros beats any gather-based sparse kernel at
  these row densities; a packed top-k layout is kept for the disk cache and
  for very large models.
- The per-row compression-error metric r = sqrt(discarded/full) after
  Li & Oldenburg (2003) is returned for parity with the reference's printout
  (sensitivity_gravmag.F90:282-285, 346-355).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial

from tomofastx_tpu.config.parfile import MagParams

import jax
import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import prism
from tomofastx_tpu.ops import wavelet as W


# =============================================================================
# Depth weighting (reference: weights_gravmag.f90:46-250)
# =============================================================================


def calculate_depth_weight(
    par, grid: Grid, data: SurveyData, dtype=jnp.float64
) -> np.ndarray:
    """Normalized depth/distance weight per cell, inverted into the matrix
    *column weight* W^-1 (reference: calculate_depth_weight,
    weights_gravmag.f90:46-199). Returns the full (N,) column weight."""
    hx, hy, hz = grid.cell_sizes()
    dV = grid.cell_volume()

    if par.depth_weighting_type == 1:
        # Empirical (z + z0)^(-power/2) at the cell center
        # (weights_gravmag.f90:71-79, 204-223).
        _, _, zc = grid.cell_centers()
        depth = zc + par.Z0
        if np.any(depth <= 0.0):
            raise ValueError("Error: non-positive depth in depth weighting type 1!")
        w = depth ** (-par.depth_weighting_power / 2.0)

    elif par.depth_weighting_type == 2:
        # Integrated distance weighting, Li & Oldenburg (2000) Eq. 19,
        # 8-point in-cell quadrature (weights_gravmag.f90:81-138).
        w = np.asarray(
            _distance_weight(
                jnp.asarray(grid.X1, dtype),
                jnp.asarray(grid.X2, dtype),
                jnp.asarray(grid.Y1, dtype),
                jnp.asarray(grid.Y2, dtype),
                jnp.asarray(grid.Z1, dtype),
                jnp.asarray(grid.Z2, dtype),
                jnp.asarray(data.X, dtype),
                jnp.asarray(data.Y, dtype),
                jnp.asarray(data.Z, dtype),
                par.depth_weighting_power,
                par.depth_weighting_beta,
            )
        )

    elif par.depth_weighting_type == 3:
        # Minimum-distance weighting (weights_gravmag.f90:140-161).
        xc, yc, zc = grid.cell_centers()
        R0 = 0.01
        d2 = (
            (xc[:, None] - data.X[None, :]) ** 2
            + (yc[:, None] - data.Y[None, :]) ** 2
            + (zc[:, None] - data.Z[None, :]) ** 2
        )
        mindist = np.sqrt(d2.min(axis=1))
        w = np.sqrt(1.0 / (mindist + R0) ** par.depth_weighting_power)

    else:
        raise ValueError(f"Not known depth weight type {par.depth_weighting_type}!")

    # Scale by sqrt(cell volume), normalize by the global max, then invert
    # into the column weight (weights_gravmag.f90:170-195).
    w = w * np.sqrt(dV)
    norm = w.max()
    if norm == 0.0:
        raise ValueError("Zero depth weight norm!")
    w = w / norm
    if np.any(w == 0.0):
        raise ValueError("Zero damping weight!")
    return 1.0 / w


@partial(jax.jit, static_argnames=("power", "beta"))
def _distance_weight(X1, X2, Y1, Y2, Z1, Z2, xd, yd, zd, power: float, beta: float):
    R0 = 0.1
    dfactor = 0.25
    dhx = dfactor * jnp.abs(X2 - X1)
    dhy = dfactor * jnp.abs(Y2 - Y1)
    dhz = dfactor * jnp.abs(Z2 - Z1)
    dV = jnp.abs((X2 - X1) * (Y2 - Y1) * (Z2 - Z1))

    # 8 quadrature points per cell: corners moved inside by dfactor*h.
    px = jnp.stack([X1 + dhx, X2 - dhx])  # (2, N)
    py = jnp.stack([Y1 + dhy, Y2 - dhy])
    pz = jnp.stack([Z1 + dhz, Z2 - dhz])

    def per_data(xj, yj, zj):
        dx2 = (px - xj) ** 2  # (2, N)
        dy2 = (py - yj) ** 2
        dz2 = (pz - zj) ** 2
        # Sum over the 8 combinations (ii, jj, kk).
        integral = 0.0
        for ii in range(2):
            for jj in range(2):
                for kk in range(2):
                    Rij = jnp.sqrt(dx2[ii] + dy2[jj] + dz2[kk])
                    integral = integral + 1.0 / (Rij + R0) ** power
        integral = integral * dV / 8.0
        return integral**2

    # Accumulate over data points in chunks: a plain vmap materializes an
    # (ndata, N) intermediate before the reduction — 64 GB at the 4M-cell
    # x 2k-data scale. Chunked map keeps memory at chunk x N while
    # preserving a deterministic reduction order.
    N = X1.shape[0]
    nd = xd.shape[0]
    chunk = max(1, min(nd, (1 << 26) // max(N, 1)))
    nchunks = -(-nd // chunk)
    nd_pad = nchunks * chunk
    # Far-away dummy points contribute ~(1/R0_far)^2p ~ 0 to the sum.
    fill = jnp.max(jnp.abs(px)) + jnp.max(jnp.abs(py)) + jnp.max(jnp.abs(pz)) + 1.0e9
    xp = jnp.full((nd_pad,), fill, xd.dtype).at[:nd].set(xd)
    yp = jnp.full((nd_pad,), fill, yd.dtype).at[:nd].set(yd)
    zp = jnp.full((nd_pad,), fill, zd.dtype).at[:nd].set(zd)

    parts = jax.lax.map(
        lambda args: jnp.sum(jax.vmap(per_data)(*args), axis=0),
        (xp.reshape(nchunks, chunk), yp.reshape(nchunks, chunk),
         zp.reshape(nchunks, chunk)),
    )  # (nchunks, N)
    wr = jnp.sum(parts, axis=0)
    return (1.0 / jnp.sqrt(dV)) * wr ** (beta / 4.0)


def apply_local_depth_weighting(par, column_weight: np.ndarray) -> np.ndarray:
    """Divide column weights by per-cell local weights from file
    (reference: weights_gravmag.f90:255-311)."""
    if par.apply_local_weight > 0:
        from tomofastx_tpu.io.model_io import read_local_weights

        local = read_local_weights(par.local_weight_file, column_weight.shape[0])
        out = np.where(local != 0.0, column_weight / np.where(local != 0.0, local, 1.0), 0.0)
        return out
    return column_weight


# =============================================================================
# Dense kernel build (reference: calculate_and_write_sensit,
# sensitivity_gravmag.F90:82-410)
# =============================================================================


@dataclass
class SensitKernel:
    """Dense sensitivity operator for one problem.

    S has shape (ndata * ndata_components, nmodel_components * N), stored in
    MATRIX_PRECISION (float32 by default, like the reference's stored kernel,
    global_typedefs.F90:42), with the problem weight and data weights baked
    in at "read" time (sensitivity_gravmag.F90:836-843). In compressed mode
    the columns live in the wavelet domain."""

    S: jax.Array  # (nrows, ncols)
    ndata: int
    ndata_components: int
    nmodel_components: int
    nx: int
    ny: int
    nz: int
    compression_type: int  # 0 none, 1 Haar, 2 Daubechies D4
    comp_error: float = 0.0
    nnz: int = 0

    @property
    def nrows(self) -> int:
        return self.ndata * self.ndata_components

    @property
    def N(self) -> int:
        return self.nx * self.ny * self.nz

    def to_solver_domain(self, xm: jax.Array) -> jax.Array:
        """Model-scaled space -> matrix column space (wavelet if compressed).
        xm: (..., ncomp*N) flat."""
        if self.compression_type > 0:
            shape = xm.shape
            cube = xm.reshape(*shape[:-1], self.nmodel_components, self.nz, self.ny, self.nx)
            cube = W.forward_wavelet_3d(cube, self.compression_type)
            return cube.reshape(shape)
        return xm

    def from_solver_domain(self, xw: jax.Array) -> jax.Array:
        """Matrix column space -> model-scaled space (inverse wavelet)."""
        if self.compression_type > 0:
            shape = xw.shape
            cube = xw.reshape(*shape[:-1], self.nmodel_components, self.nz, self.ny, self.nx)
            cube = W.inverse_wavelet_3d(cube, self.compression_type)
            return cube.reshape(shape)
        return xw


def forward_rows(
    problem: str, data_type: int, nmc: int, ndc: int, magv, intensity,
    handle_inside: bool, grid_arrays, xd, yd, zd, far_quad: bool = False,
):
    """Raw physics rows for one observation point →
    (N, nmodel_components, ndata_components). The single physics dispatch
    shared by the stored-kernel builder and the matrix-free operator
    (reference: sensitivity_gravmag.F90:193-219).

    far_quad=True enables the compensated-f32 blend: cells farther than
    prism.FAR_QUAD_RADIUS half-diagonals are evaluated by 27-point
    Gauss-Legendre quadrature of the smooth point-source integrand — the
    closed-form 8-corner alternating sums amplify f32 rounding by
    ~(R/h)^3 and are pure noise in the far field (measured: up to 3e+3
    relative error at R/h ~ 100, vs ~1e-5 for the quadrature). Meant for
    f32 physics; the f64 closed forms carry enough mantissa everywhere."""
    X1, X2, Y1, Y2, Z1, Z2 = grid_arrays
    if problem == "magn":
        rows = prism.magprism_row(
            xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2, magv, intensity,
            nmodel_components=nmc, ndata_components=ndc,
            handle_inside=handle_inside,
        )
    elif data_type == 1:
        rows = prism.gravi_z(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)[:, None, None]
    elif ndc == 1:
        rows = prism.gradi_zz(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)[:, None, None]
    elif ndc != 6:
        # Reference: sensitivity_gravmag.F90:211.
        raise ValueError("Wrong number of gravity gradiometry data components! (use 1 or 6)")
    else:
        comps = prism.gradi_full(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)
        rows = jnp.stack(comps, axis=-1)[:, None, :]
    if far_quad:
        quad = _forward_rows_quad(
            problem, data_type, nmc, ndc, magv, intensity, grid_arrays,
            xd, yd, zd,
        )
        mask = prism.far_mask(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)
        rows = jnp.where(mask[:, None, None], quad, rows)
    return rows


def _forward_rows_quad(
    problem: str, data_type: int, nmc: int, ndc: int, magv, intensity,
    grid_arrays, xd, yd, zd,
):
    """Far-field quadrature counterpart of forward_rows (same shapes)."""
    X1, X2, Y1, Y2, Z1, Z2 = grid_arrays
    if problem == "magn":
        tx, ty, tz = prism.magnetic_tensor_quad(
            xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2
        )
        return prism.combine_mag_tensor(tx, ty, tz, magv, intensity, nmc, ndc)
    if data_type == 1:
        return prism.gravi_z_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)[:, None, None]
    if ndc == 1:
        return prism.gradi_zz_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)[:, None, None]
    comps = prism.gradi_full_quad(xd, yd, zd, X1, X2, Y1, Y2, Z1, Z2)
    return jnp.stack(comps, axis=-1)[:, None, :]


def observation_inside_grid(grid, data) -> bool:
    """Static check whether any observation point lies inside the model
    volume (decides the magnetic 6-subprism borehole branch,
    magnetic_field.f90:139-141)."""
    (xmin, xmax), (ymin, ymax), (zmin, zmax) = grid.bounds()
    return bool(
        np.any(
            (data.X > xmin) & (data.X < xmax)
            & (data.Y > ymin) & (data.Y < ymax)
            & (data.Z > zmin) & (data.Z < zmax)
        )
    )


def _compress_lines(lines, nx, ny, nz, compression_type, nel_compressed, store_dtype):
    """Wavelet-transform + threshold a batch of weighted rows.

    lines: (B, ..., N) in model domain (already column-weighted).
    Returns (compressed (B, ..., N) in store_dtype, per-observation nnz
    counts (B,), per-observation summed compression errors r_i (B,)) —
    per-observation so callers can exclude padding rows added for mesh
    divisibility."""
    N = nx * ny * nz
    cost_full = jnp.sum(lines.astype(jnp.float64) ** 2, axis=-1) if lines.dtype == jnp.float64 else jnp.sum(lines**2, axis=-1)

    wl = W.forward_wavelet_flat(lines, nx, ny, nz, compression_type)
    absw = jnp.abs(wl)

    if nel_compressed >= N:
        threshold = jnp.full(absw.shape[:-1], -1.0, absw.dtype)
    elif absw.dtype == jnp.float32 and THRESHOLD_SELECT == "bisect":
        threshold = _kth_largest_bisect_f32(absw, nel_compressed + 1)
    else:
        # (nel_compressed + 1)-th largest |coefficient| per row
        # (= sorted_ascending[N - nel_compressed], sensitivity_gravmag.F90:248-249).
        topk = jax.lax.top_k(absw, nel_compressed + 1)[0]
        threshold = topk[..., -1]
    threshold = jnp.maximum(threshold, 1.0e-30)

    mask = absw > threshold[..., None]
    compressed = jnp.where(mask, wl, 0.0).astype(store_dtype)

    cost_discarded = jnp.sum(jnp.where(mask, 0.0, wl) ** 2, axis=-1)
    err = jnp.sqrt(cost_discarded / jnp.where(cost_full > 0, cost_full, 1.0))
    inner = tuple(range(1, lines.ndim - 1))
    nnz = jnp.sum(mask, axis=inner + (-1,))
    return compressed, nnz, jnp.sum(err, axis=inner)


# Mixed-build compression precision: True runs the wavelet/top_k stage in
# f32 when the kernel is stored at <= 32 bits (TPU f64 is emulated and ~20x
# slower); False keeps the f64 pipeline end-to-end. Module-level so the
# precision study (BASELINE.md) can toggle it.
MIXED_BUILD_F32_COMPRESS = True

# Threshold selection algorithm for the wavelet compression's K-th
# largest |coefficient| per row: "topk" = lax.top_k (lowers to a sort on
# TPU — O(N log N) with poor constants at N = 262k); "bisect" = exact
# 32-step binary search on the f32 BIT PATTERN (non-negative floats are
# order-isomorphic to their int32 representations), 32 masked
# count-reductions — pure VPU elementwise work. Both return the identical
# threshold (pinned by test_matrixfree.py::test_threshold_bisect_*).
# Default bisect since the TPU A/B (TOPK_AB.json): the full compressed
# bench-shape build went 225 -> 655 rows/s (2.9x) with bit-identical
# kernel checksums; the isolated compression stage is 1.59x. f64
# pipelines are unaffected (the bitcast trick is f32-only and they keep
# lax.top_k). Override with TOMOFASTX_TOPK=topk.
THRESHOLD_SELECT = os.environ.get("TOMOFASTX_TOPK", "bisect")


def _kth_largest_bisect_f32(absw, k: int):
    """Exact k-th largest value along the last axis of a NON-NEGATIVE f32
    array, by binary search on the int32 bit pattern. Returns the same
    value as lax.top_k(absw, k)[0][..., -1] (ties included: bisecting on
    the strictly-greater count pins the exact k-th order statistic)."""
    bits = jax.lax.bitcast_convert_type(absw, jnp.int32)

    def body(i, state):
        lo, hi = state  # k-th largest bit pattern is in (lo, hi]
        mid = lo + (hi - lo) // 2
        # Elements strictly greater than pattern `mid`.
        cnt = jnp.sum(bits > mid[..., None], axis=-1)
        # If >= k elements exceed mid, the k-th largest is above mid.
        above = cnt >= k
        return jnp.where(above, mid, lo), jnp.where(above, hi, mid)

    # Invariant: count(> lo) >= k and count(> hi) < k, so the k-th
    # largest bit pattern stays in (lo, hi]; 32 halvings pin hi to it
    # exactly. lo = -1 (< +0.0's pattern 0) and hi = the row max are
    # valid initial bounds for any 1 <= k <= N.
    lo0 = jnp.full(absw.shape[:-1], -1, jnp.int32)
    hi0 = jax.lax.bitcast_convert_type(jnp.max(absw, axis=-1), jnp.int32)
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def _chunk_plan(nd: int, batch: int):
    """Split nd rows into chunks of at most `batch` rows using as few
    DISTINCT chunk sizes as possible — build_chunk is shape-specialized, and
    a ragged last chunk costs a full second XLA compile (minutes over the
    tunneled TPU). Prefers an exact divisor of nd in (batch/2, batch] (one
    compile); otherwise falls back to near-equal sizes differing by one row
    (two compiles). Returns [(start, size), ...]."""
    if nd <= batch:
        return [(0, nd)]
    for b in range(batch, batch // 2, -1):
        if nd % b == 0:
            return [(s, b) for s in range(0, nd, b)]
    nchunks = -(-nd // batch)
    base, extra = divmod(nd, nchunks)
    plan = []
    s = 0
    for c in range(nchunks):
        nb = base + (1 if c < extra else 0)
        plan.append((s, nb))
        s += nb
    return plan


def _effective_batch_size(par, grid, batch_size, compute_dtype,
                          store_dtype, near_field_f64, lattice=False):
    """Clamp the requested build chunk: manual TOMOFASTX_BUILD_BATCH
    override, the emulated-f64 compile-size auto-cap, and the TPU chunk
    working-set cap (see each block). Extracted for direct unit testing
    of the batch decision (round-3 verdict item 4)."""
    import jax as _jax

    N = grid.nelements_total
    # Manual override for the build chunk size (takes precedence over the
    # automatic emulated-f64 program-size cap below). 0/unset = automatic.
    env_cap = int(os.environ.get("TOMOFASTX_BUILD_BATCH", "0") or 0)
    if env_cap > 0:
        batch_size = min(batch_size, env_cap)
    elif (_jax.default_backend() == "tpu"
          and jnp.dtype(compute_dtype) == jnp.float64):
        # Auto-cap emulated-f64 program size: XLA's compile time for the
        # double-double prism programs grows super-linearly with program
        # size, and past a threshold the remote compiler effectively hangs
        # (measured at 262k/1M cells: B*N = 3.4e7 f64 row-elements
        # compiles in the ~4 min class; B*N = 1.2e8 hung 26+ min and was
        # killed — BASELINE.md round-3 follow-up 3). Cap B so each build
        # program stays at or below the known-good size; the cached
        # program then costs nothing on reruns.
        # The magnetic tensor evaluates ~2x the transcendentals of the
        # gravity forms per corner (5 log/atan2 channels vs 3); halve its
        # budget — the calibration points were gravity builds.
        cap = _f64_build_batch_cap(N, lattice)
        if isinstance(par, MagParams):
            cap = max(8, cap // 2 // 8 * 8)
        batch_size = min(batch_size, cap)

    if _jax.default_backend() == "tpu":
        # Working-set cap: each chunk materializes ~N*(8 f64-patched rows
        # + 4 f32 rows + store bytes) per row next to the device-resident
        # kernel. At 2M cells the default B=225 needs ~6.5 GB of temps on
        # top of an 8.3 GB bf16 kernel and RESOURCE_EXHAUSTs the 16 GB
        # chip; budget ~2.5 GB of chunk temps.
        if near_field_f64 > 0:
            # Mixed build: f32 physics rows + the f64 patched/weighted copy.
            row_bytes = N * (8 + 4)
        else:
            # Pure-dtype build: physics rows + weighted product, both in
            # compute_dtype (a full-f64 build is 8-byte temps throughout).
            row_bytes = N * 2 * jnp.dtype(compute_dtype).itemsize
        row_bytes += N * jnp.dtype(store_dtype).itemsize
        mem_cap = max(8, int(2.5e9 // max(row_bytes, 1)) // 8 * 8)
        batch_size = min(batch_size, mem_cap)
    return batch_size


def _f64_build_batch_cap(n_cells: int, lattice: bool = True) -> int:
    """Max rows per emulated-f64 build program for a safe XLA compile.

    Calibrated on hardware (BASELINE.md) for the CORNER-LATTICE build
    (~1 corner evaluation per cell): 3.4e7 f64 row-elements per program
    compiled in ~4 min worst case (B=128 at 262k cells, B=32 at 1M
    cells), while 1.2e8 (B=112 at 1M cells) hung the remote compiler
    26+ min. The per-cell build evaluates 8 corners per element — 8x the
    emulated-f64 transcendentals per row-element — so its cap is 8x
    smaller (B=32 at 262k cells = 6.7e7 corner evals is its proven
    point, round-3 bench_build_ab). Returns a multiple of 8, at least 8."""
    # Lattice budget: 3.4e7 corner evals (~= row-elements). Per-cell
    # budget: 8.4e6 row-elements = 6.7e7 corner evals — exactly the
    # proven B=32-at-262k point.
    budget = 3.4e7 if lattice else 8.4e6
    return max(8, int(budget // max(n_cells, 1)) // 8 * 8)


def compute_sensitivity(
    par,
    grid: Grid,
    data: SurveyData,
    column_weight: np.ndarray,
    compute_dtype=jnp.float64,
    store_dtype=jnp.float32,
    batch_size: int = 256,
    near_field_f64: int = 0,
    mesh=None,
    progress=None,
    row_sink=None,
) -> SensitKernel:
    """Build the dense (optionally wavelet-compressed) sensitivity kernel.

    Mirrors calculate_and_write_sensit (sensitivity_gravmag.F90:82-410):
    physics row -> multiply by column weight -> (wavelet + threshold) ->
    cast to storage precision. Data/problem weights are NOT applied here;
    see apply_row_weights (the reference applies them when re-reading the
    kernel, sensitivity_gravmag.F90:836-843).

    near_field_f64 > 0 enables the mixed-precision build: rows are computed
    in compute_dtype (f32) and the K cells nearest each observation point —
    where the closed forms lose digits to cancellation — are recomputed in
    f64 and patched in. This restores f64-build inversion quality at f32
    build speed (important on TPUs where f64 is emulated).

    mesh: optional jax.sharding.Mesh — the observation axis of every chunk
    is sharded across the mesh devices, so the build uses all chips (the
    reference's data-row parallel phase 1, sensitivity_gravmag.F90:179-189;
    each device computes an equal slice of rows). Chunks are padded with
    far-away dummy points to divide the mesh; padding rows are dropped and
    excluded from the nnz/error statistics. Per-row results are bitwise
    identical to the unsharded build (rows are computed independently).

    progress: optional callable(done_rows, total_rows) invoked after each
    chunk (the reference's 10%% ticker, sensitivity_gravmag.F90:313-316).

    row_sink: optional callable(chunk (B, ndc, nmc, N) float32, start_row).
    When given, chunks STREAM to the sink (e.g. a SensitStreamWriter) and
    are not accumulated — host memory stays one chunk, and the returned
    SensitKernel has S = None (capacity mode: reload through
    io/sensit_cache.read_kernel_cache_packed). This is the build-side
    counterpart of the reference's write-inside-the-hot-loop streaming
    (sensitivity_gravmag.F90:306-309)."""
    N = grid.nelements_total
    nd, ndc, nmc = par.ndata, par.ndata_components, par.nmodel_components

    is_mag = isinstance(par, MagParams)
    problem = "magn" if is_mag else "grav"
    magv = prism.dircos(par.mi, par.md, par.theta) if is_mag else (0.0, 0.0, 1.0)
    intensity = par.intensity if is_mag else 0.0
    # Static decision: only pay for the 6-subprism in-cell branch when some
    # observation point actually lies inside the grid volume.
    handle_inside = is_mag and observation_inside_grid(grid, data)

    # Corner-lattice fast build: on a tensor-product grid evaluate the
    # corner antiderivatives ONCE per lattice node per observation and
    # difference into per-cell rows (ops/matrixfree.py::
    # lattice_rows_for_point) — ~8x fewer transcendentals than the
    # reference's per-cell 8-corner loops (gravity_field.f90:131-195,
    # magnetic_field.f90:321-457). Same corner expressions, so values agree
    # to summation-order rounding (pinned by
    # test_matrixfree.py::test_lattice_build_matches_percell). The
    # 6-subprism borehole branch is per-cell and cannot share corners;
    # opt out with tpu.latticeBuild = 0.
    # Only for f64 physics: the corner sharing pays ~8x where the
    # emulated-f64 transcendentals dominate (702 vs 145 rows/s at the
    # bench shape, BASELINE.md round 3); in f32 builds the physics stage
    # is ~5% of a chunk and the lattice variant measured consistently
    # ~15% SLOWER than per-cell (round-3 A/B) — so f32/mixed builds keep
    # the per-cell path.
    lattice_edges = None
    if getattr(par, "lattice_build", 1) and compute_dtype == jnp.float64 and (
        problem == "grav" or not handle_inside
    ):
        from tomofastx_tpu.ops.matrixfree import detect_lattice

        lattice_edges = detect_lattice(grid)
    lat = (
        tuple(jnp.asarray(e, compute_dtype) for e in lattice_edges)
        if lattice_edges is not None
        else ()
    )

    batch_size = _effective_batch_size(
        par, grid, batch_size, compute_dtype, store_dtype, near_field_f64,
        lattice=lattice_edges is not None,
    )

    if par.compression_type > 0 and jax.default_backend() == "tpu":
        # The 3-D wavelet lifting lowers to a strided scatter whose scoped
        # VMEM scales with batch x (cells / longest axis); B = 256 at 64^3
        # cells exceeds the 16 MB scoped limit (measured: 24 MB requested).
        # Cap the chunk so the first compile succeeds — the adaptive OOM
        # shrink below remains as the backstop, but a failed XLA compile
        # costs ~80 s over the tunnel and is never cached.
        inner = max(N // max(grid.nx, grid.ny, grid.nz), 1)
        cap = max(8, (128 * 4096 // inner) // 8 * 8)
        batch_size = min(batch_size, cap)

    grid_arrays = tuple(
        jnp.asarray(a, compute_dtype)
        for a in (grid.X1, grid.X2, grid.Y1, grid.Y2, grid.Z1, grid.Z2)
    )
    # Column weights stay f64 in the mixed build so the patched rows keep
    # full precision.
    cw_dtype = jnp.float64 if near_field_f64 > 0 else compute_dtype
    cw = jnp.asarray(column_weight, cw_dtype)


    if par.compression_type > 0:
        nel_compressed = int(par.compression_rate * N)
    else:
        nel_compressed = N

    f32_pipeline = bool(getattr(par, "f64_build_f32_compress", 0))
    # Compensated-f32 physics (tpu.farFieldQuad, default on): blend in
    # far-field quadrature whenever the closed forms run in f32 — their
    # 8-corner cancellation makes far elements pure noise in f32 (the
    # round-3 precision study's 0.724-vs-0.8142 truth-corr collapse).
    far_quad = bool(
        getattr(par, "far_field_quad", 1)
        and jnp.dtype(compute_dtype) == jnp.float32
    )
    K = min(near_field_f64, N) if near_field_f64 > 0 else 0
    if K > 0:
        grid_arrays64 = tuple(
            jnp.asarray(a, jnp.float64)
            for a in (grid.X1, grid.X2, grid.Y1, grid.Y2, grid.Z1, grid.Z2)
        )
        xc = jnp.asarray(0.5 * (grid.X1 + grid.X2), compute_dtype)
        yc = jnp.asarray(0.5 * (grid.Y1 + grid.Y2), compute_dtype)
        zc = jnp.asarray(0.5 * (grid.Z1 + grid.Z2), compute_dtype)

    # The grid/center/weight arrays are ARGUMENTS, not closure captures:
    # closed-over device arrays are baked into the HLO as constants
    # (~19 MB at 262k cells), which bloats every build_chunk compile and
    # its persistent-cache key (CLAUDE.md gotcha, measured round 2).
    def _chunk_body(ga, ga64, cwa, centers, la, xd, yd, zd):
        def one(x, y, z):
            if la:
                from tomofastx_tpu.ops.matrixfree import lattice_rows_for_point

                rows = lattice_rows_for_point(
                    *la, x, y, z, problem, par.data_type, magv, intensity,
                    nmc, ndc,
                ).reshape(N, nmc, ndc)
            else:
                rows = forward_rows(
                    problem, par.data_type, nmc, ndc, magv, intensity,
                    handle_inside, ga, x, y, z, far_quad=far_quad,
                )
            if K > 0:
                # f64 patch of the K nearest cells (cancellation zone).
                xc_, yc_, zc_ = centers
                d2 = (xc_ - x) ** 2 + (yc_ - y) ** 2 + (zc_ - z) ** 2
                _, idx = jax.lax.top_k(-d2, K)
                sub64 = tuple(a[idx] for a in ga64)
                rows64 = forward_rows(
                    problem, par.data_type, nmc, ndc, magv, intensity,
                    handle_inside, sub64, x.astype(jnp.float64),
                    y.astype(jnp.float64), z.astype(jnp.float64),
                )
                rows = rows.astype(jnp.float64).at[idx].set(rows64)
                if MIXED_BUILD_F32_COMPRESS and jnp.dtype(store_dtype).itemsize <= 4:
                    # Mixed build with f32 (or bf16) storage: the f64
                    # digits only need to survive until the storage
                    # rounding, so round right after the (f64) depth
                    # weighting and run the wavelet + top_k in f32 — on
                    # TPU f64 is software-emulated and made the
                    # compression stage ~20x slower than the physics
                    # (round-2 build profile, BASELINE.md). The full-f64
                    # build (compute_dtype=f64) and f64-storage paths keep
                    # the reference's double-precision wavelet/threshold
                    # pipeline (sensitivity_gravmag.F90:237-272) unless
                    # tpu.f64BuildF32Compress opts into the same rounding.
                    return (rows * cwa[:, None, None]).astype(compute_dtype)
            out = rows * cwa[:, None, None].astype(rows.dtype)  # depth weighting
            if (
                f32_pipeline
                and out.dtype == jnp.float64
                and jnp.dtype(store_dtype).itemsize <= 4
            ):
                # tpu.f64BuildF32Compress: full-f64 physics + weighting,
                # f32 compression pipeline (see config/parfile.py).
                out = out.astype(jnp.float32)
            return out

        rows = jax.vmap(one)(xd, yd, zd)  # (B, N, nmc, ndc)
        rows = jnp.moveaxis(rows, 1, -1)  # (B, nmc, ndc, N) -> lines over N
        rows = jnp.swapaxes(rows, 1, 2)  # (B, ndc, nmc, N)
        if par.compression_type > 0:
            comp, nnz, err_sum = _compress_lines(
                rows, grid.nx, grid.ny, grid.nz, par.compression_type, nel_compressed, store_dtype
            )
            return comp, nnz, err_sum
        comp = rows.astype(store_dtype)
        per_obs = ndc * nmc * N
        return (
            comp,
            jnp.full((comp.shape[0],), per_obs),
            jnp.zeros((comp.shape[0],), compute_dtype),
        )

    build_chunk = jax.jit(_chunk_body)

    xs = np.asarray(data.X, np.float64)
    ys = np.asarray(data.Y, np.float64)
    zs = np.asarray(data.Z, np.float64)

    big_args = (
        grid_arrays,
        grid_arrays64 if K > 0 else (),
        cw,
        (xc, yc, zc) if K > 0 else (),
        lat,
    )

    n_mesh = mesh.devices.size if mesh is not None else 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # The build shards its observation chunks over ALL mesh axes (on a
        # 1-D cells mesh that is the cells axis doing double duty for the
        # build's data-row split; on a 2-D mesh it is every device).
        obs_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        # Dummy points far outside the volume: finite closed forms, rows
        # discarded after the chunk.
        far = (
            float(np.max(grid.X2)) + 1.0e6,
            float(np.max(grid.Y2)) + 1.0e6,
            float(np.min(grid.Z1)) - 1.0e6,
        )

    def to_device(a, fill, e_pad, nb):
        buf = np.full(e_pad, fill)
        buf[:nb] = a
        arr = jnp.asarray(buf, compute_dtype)
        if mesh is not None:
            arr = jax.device_put(arr, obs_sharding)
        return arr

    # Device-resident accumulation (single-device dense path): the finished
    # kernel NEVER round-trips through the host. Round-2 build profile
    # (BASELINE.md): the tunneled device->host link runs at 0.13 GB/s, so
    # the old per-chunk pull + final re-upload dominated the build by ~10x
    # over the prism/wavelet/top_k compute. Chunks are written into a
    # preallocated HBM buffer via a donated dynamic_update_slice; the cache
    # writer (io/sensit_cache) pulls the kernel once only if asked to.
    device_accum = mesh is None and row_sink is None
    if device_accum:
        # Single-dispatch chunks: each chunk is ONE jitted program that
        # slices its observation coordinates out of device-resident
        # full-survey arrays, computes the rows, and writes them into the
        # donated kernel buffer. The previous shape (3 host->device
        # coordinate uploads + a build dispatch + an accumulate dispatch
        # per chunk) paid ~5 tunnel round-trips per chunk — at 50-100 ms
        # RTT that overhead, not compute, dominated the measured build
        # (162 rows/s steady vs a ~780 rows/s stage sum, BASELINE.md).
        #
        # Chunks are a UNIFORM B rows plus (at most) one exact-size tail
        # program — two compiled programs, NO padding: padding the kernel
        # buffer to a row multiple needs a device-side slice copy at the
        # end, which doubles peak HBM and RESOURCE_EXHAUSTs a 7.9 GB
        # kernel on the 16 GB chip (measured at the 1M-cell demo).
        #
        # Accumulate directly in the FINAL 2-D solver layout. A 4-D
        # (nd, ndc, nmc, N) device buffer with unit middle dims gets a
        # TPU-tiled physical layout that breaks the later pull (measured:
        # RESOURCE_EXHAUSTED relayout on an 8 GB kernel); the 2-D layout
        # accumulates, reshapes, slices, and pulls cleanly.
        S_dev = jnp.zeros((nd * ndc, nmc * N), store_dtype)

        xs_dev = jnp.asarray(xs, compute_dtype)
        ys_dev = jnp.asarray(ys, compute_dtype)
        zs_dev = jnp.asarray(zs, compute_dtype)

        fused_cache = {}

        def make_fused(B):
            if B in fused_cache:
                return fused_cache[B]

            @partial(jax.jit, donate_argnums=(0,))
            def fused(S_dev, start, ga, ga64, cwa, centers, la,
                      xs_all, ys_all, zs_all):
                xd = jax.lax.dynamic_slice(xs_all, (start,), (B,))
                yd = jax.lax.dynamic_slice(ys_all, (start,), (B,))
                zd = jax.lax.dynamic_slice(zs_all, (start,), (B,))
                comp, nnz, err_sum = _chunk_body(
                    ga, ga64, cwa, centers, la, xd, yd, zd
                )
                comp2 = comp.reshape(B * ndc, nmc * N)
                S_dev = jax.lax.dynamic_update_slice(
                    S_dev, comp2, (start * ndc, start * 0)
                )
                # One chunk's nnz sum stays well under 2^31 (the memory
                # cap bounds B*N); the cross-chunk total is summed on the
                # host in int64.
                nnz_s = jnp.sum(nnz.astype(jnp.int32))
                err_s = jnp.sum(err_sum)
                return S_dev, nnz_s, err_s

            fused_cache[B] = fused
            return fused

    chunks = []
    nnz_parts, err_parts = [], []
    nnz_total = 0
    err_total = 0.0
    batch_cur = batch_size
    if device_accum:
        # Uniform chunk shape (+ one exact-size tail program): at most two
        # compiled programs, no padding anywhere.
        plan = [(s0, min(batch_cur, nd - s0)) for s0 in range(0, nd, batch_cur)]
    else:
        plan = _chunk_plan(nd, batch_size)
    ci = 0
    while ci < len(plan):
        s, nb = plan[ci]
        e = s + nb
        try:
            if device_accum:
                S_dev, nnz_s, err_s = make_fused(nb)(
                    S_dev, np.int32(s), *big_args,
                    xs_dev, ys_dev, zs_dev,
                )
            elif mesh is not None:
                b_pad = ((nb + n_mesh - 1) // n_mesh) * n_mesh
                comp, nnz, err_sum = build_chunk(
                    *big_args,
                    to_device(xs[s:e], far[0], b_pad, nb),
                    to_device(ys[s:e], far[1], b_pad, nb),
                    to_device(zs[s:e], far[2], b_pad, nb),
                )
            else:
                comp, nnz, err_sum = build_chunk(
                    *big_args,
                    jnp.asarray(xs[s:e], compute_dtype),
                    jnp.asarray(ys[s:e], compute_dtype),
                    jnp.asarray(zs[s:e], compute_dtype),
                )
            if ci == 0:
                # Force the first chunk to EXECUTE inside this try: with
                # async dispatch a runtime OOM would otherwise surface at
                # the final stats sync, past the adaptive shrink below.
                # Chunks are memory-identical, so first-chunk success
                # predicts the rest. (Host fetch, not block_until_ready —
                # the axon tunnel's block_until_ready returns early.)
                _ = float(err_s if device_accum else jnp.sum(nnz))
        except Exception as exc:  # adaptive chunk shrink on XLA OOM
            # Some shape/precision combinations exceed TPU scoped VMEM in
            # the wavelet lifting scatter (observed: B=256 at 64^3 cells
            # with the x64 near-field patch). Halve the chunk for the
            # remaining rows and keep building instead of aborting.
            msg = str(exc)
            resource = any(
                t in msg
                for t in ("RESOURCE_EXHAUSTED", "Ran out of memory", "vmem",
                          "out of memory", "OOM")
            )
            if not resource or nb <= 8:
                raise
            new_batch = max(8, nb // 2)
            print(
                f"  build chunk B={nb} hit a resource limit; retrying at "
                f"B={new_batch} (failed compiles are never cached — "
                f"see CLAUDE.md)", flush=True,
            )
            if device_accum:
                # The failed call may have consumed the donated kernel
                # buffer, so restart the whole plan at the smaller uniform
                # chunk. Uniform chunks are memory-identical, so this
                # normally fires at ci == 0 (nothing built yet); the tail
                # chunk compiles a second, smaller-B program that could in
                # principle fail too — the full restart then discards the
                # completed prefix, which is correct but wasteful. A
                # tail-only rebuild is not worth the complexity until a
                # tail compile failure is actually observed (ADVICE r03).
                S_dev = jnp.zeros((nd * ndc, nmc * N), store_dtype)
                nnz_parts, err_parts = [], []
                nnz_total, err_total = 0, 0.0
                batch_cur = new_batch
                plan = [
                    (s0, min(batch_cur, nd - s0))
                    for s0 in range(0, nd, batch_cur)
                ]
                ci = 0
            else:
                plan = plan[:ci] + [
                    (s + off, n) for off, n in _chunk_plan(nd - s, new_batch)
                ]
            continue
        if device_accum:
            # No host sync per chunk: the fused program returns queued
            # device scalars (masked nnz/err sums) that are stacked and
            # pulled ONCE after the loop, so the host races ahead
            # dispatching chunks while the device works. Uncompressed nnz
            # is deterministic (every entry kept): count on the host —
            # a device int32 total would overflow past ~2^31 entries.
            if par.compression_type > 0:
                nnz_parts.append(nnz_s)
            else:
                nnz_total += nb * ndc * nmc * N
            err_parts.append(err_s)
        else:
            chunk_np = np.asarray(comp)[:nb]
            if row_sink is not None:
                prism.validate_finite("sensitivity kernel chunk", chunk_np)
                row_sink(chunk_np, s)
            else:
                chunks.append(chunk_np)
            nnz_total += int(np.sum(np.asarray(nnz)[:nb]))
            err_total += float(np.sum(np.asarray(err_sum)[:nb]))
        if progress is not None:
            progress(e, nd)
        ci += 1
    if device_accum:
        if nnz_parts:
            nnz_total = int(
                np.sum(np.asarray(jnp.stack(nnz_parts), np.int64))
            )
        if err_parts:
            err_total = float(np.sum(np.asarray(jnp.stack(err_parts))))

    comp_error = err_total / (nd * ndc * nmc) if par.compression_type > 0 else 0.0
    if row_sink is not None:
        return SensitKernel(
            S=None,
            ndata=nd,
            ndata_components=ndc,
            nmodel_components=nmc,
            nx=grid.nx,
            ny=grid.ny,
            nz=grid.nz,
            compression_type=par.compression_type,
            comp_error=comp_error,
            nnz=nnz_total,
        )

    if device_accum:
        prism.validate_finite_device("sensitivity kernel", S_dev)
        S = S_dev  # already in the 2-D solver layout
    else:
        S4 = np.concatenate(chunks, axis=0)  # (nd, ndc, nmc, N)
        prism.validate_finite("sensitivity kernel", S4)
        S = jnp.asarray(S4.reshape(nd * ndc, nmc * N))

    return SensitKernel(
        S=S,
        ndata=nd,
        ndata_components=ndc,
        nmodel_components=nmc,
        nx=grid.nx,
        ny=grid.ny,
        nz=grid.nz,
        compression_type=par.compression_type,
        comp_error=comp_error,
        nnz=nnz_total,
    )


@partial(jax.jit, donate_argnums=(0,))
def _scale_rows_donated(S, w):
    # Donated S: XLA aliases the output onto the input buffer, so weighting
    # a multi-GB kernel does not hold two copies in HBM (a 1M-cell kernel
    # is 8.5 GB on a 16 GB chip — the 2x peak OOMed at compile time).
    return S * w[:, None]


def apply_row_weights(kernel: SensitKernel, problem_weight: float, data_weight: np.ndarray) -> SensitKernel:
    """Bake problem_weight * data_weight into the matrix rows, in storage
    precision (reference: read_sensitivity_kernel,
    sensitivity_gravmag.F90:836-843). data_weight: (ndata, ndc).

    The input kernel's S buffer is DONATED (freed); kernel.S is set to None
    so stale references cannot be used."""
    wrow = (problem_weight * np.asarray(data_weight)).reshape(-1).astype(np.float32)
    S = _scale_rows_donated(kernel.S, jnp.asarray(wrow, kernel.S.dtype))
    kernel.S = None
    return SensitKernel(
        S=S,
        ndata=kernel.ndata,
        ndata_components=kernel.ndata_components,
        nmodel_components=kernel.nmodel_components,
        nx=kernel.nx,
        ny=kernel.ny,
        nz=kernel.nz,
        compression_type=kernel.compression_type,
        comp_error=kernel.comp_error,
        nnz=kernel.nnz,
    )


@partial(jax.jit, static_argnames=("ct", "nx", "ny", "nz", "nmc", "solve_dtype"))
def _forward_stored(S, x, ct, nx, ny, nz, nmc, solve_dtype):
    """One jitted program for the host-side forward d = S W(x): unjitted,
    the 3-D wavelet lifting dispatched ~100 tiny eager ops per call — each
    a separate XLA compile on a cold start and a tunnel round-trip on
    every call over the remote TPU."""
    if ct:
        x = W.forward_wavelet_flat(
            x.reshape(nmc, -1), nx, ny, nz, ct
        ).reshape(-1)
    return S.astype(solve_dtype) @ x


def calculate_data(
    kernel: SensitKernel,
    model_val: np.ndarray,
    column_weight: np.ndarray,
    problem_weight: float,
    data_weight: np.ndarray,
    solve_dtype=jnp.float64,
) -> np.ndarray:
    """Forward d = S m using the stored (weighted) kernel
    (reference: model_calculate_data, model.F90:220-307): scale the model by
    1/column_weight, wavelet-transform if compressed, multiply, then undo the
    problem and data weights. Returns (ndata, ndc)."""
    cw = np.asarray(column_weight)
    m = np.asarray(model_val).reshape(kernel.nmodel_components, -1)
    m_scaled = np.where(cw != 0.0, m / np.where(cw != 0.0, cw, 1.0), 0.0)
    x = jnp.asarray(m_scaled.reshape(-1), solve_dtype)
    d = _forward_stored(
        kernel.S, x, kernel.compression_type, kernel.nx, kernel.ny,
        kernel.nz, kernel.nmodel_components, jnp.dtype(solve_dtype),
    )
    d = np.asarray(d).reshape(kernel.ndata, kernel.ndata_components)
    if problem_weight == 0.0:
        raise ValueError("Zero problem weight in calculate_data!")
    d = d / problem_weight
    d = d / np.asarray(data_weight)
    return d
