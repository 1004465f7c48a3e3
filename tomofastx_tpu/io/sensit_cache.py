"""Sensitivity-kernel disk cache, byte-compatible with the reference.

File set (reference: sensitivity_gravmag.F90:139-183, 305-392, 644-883):
- ``sensit_{grav|magn}_<nbproc>_<rank>``: stream binary; header of 5 int32
  (ndata_loc, ndata, nelements_total, myrank, nbproc); then per data row and
  per (data component d, model component k): int32 (idata, nel, k, d)
  followed by int32 columns[nel] (1-based cell indices) and float32
  values[nel];
- ``sensit_{}_meta.txt``: text metadata;
- ``sensit_{}_nnz``: int32 N + int32 per-cell nnz histogram;
- ``sensit_{}_weight``: int32 N + float64 column weights.

This makes kernels produced by the Fortran reference directly loadable
(``sensit.readFromFiles = 1``) and vice versa. We always write a single
"rank" file (nbproc = 1); the reader accepts any rank count.

Two reader paths:
- ``try_read_kernel_cache``: materializes the dense kernel (small problems,
  the dense MXU execution mode);
- ``read_kernel_cache_packed``: streams rows directly into the packed
  top-k layout (ops/sparse_kernel.py) without EVER allocating the dense
  (nd, N) array — the counterpart of the reference's row-streamed re-read
  into distributed CSR (sensitivity_gravmag.F90:723-862), whose memory is
  nnz-bound, not dense-bound.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

_SUFFIX = ("grav", "magn")
_MATRIX_PRECISION_BYTES = 4  # float32 storage, like the reference default


def _suffix_for(par) -> str:
    from tomofastx_tpu.config.parfile import MagParams

    return _SUFFIX[1] if isinstance(par, MagParams) else _SUFFIX[0]


class SensitStreamWriter:
    """Row-streaming cache writer: rows go to disk as they are built, so
    the writer's memory footprint is one chunk, never the full kernel
    (reference: per-rank file written inside the build hot loop,
    sensitivity_gravmag.F90:306-309)."""

    def __init__(self, cache_dir: str, par, grid, column_weight: np.ndarray,
                 compression_type: int):
        os.makedirs(cache_dir, exist_ok=True)
        self.cache_dir = cache_dir
        self.sfx = _suffix_for(par)
        self.par = par
        self.nx, self.ny, self.nz = grid.nx, grid.ny, grid.nz
        self.N = grid.nelements_total
        self.nd = par.ndata
        self.ndc = par.ndata_components
        self.nmc = par.nmodel_components
        self.compression_type = compression_type
        self.column_weight = np.asarray(column_weight, np.float64)
        self.nnz_per_cell = np.zeros(self.N, np.int32)
        self.nnz_total = 0
        self._rows_written = 0
        self._f = open(os.path.join(cache_dir, f"sensit_{self.sfx}_1_0"), "wb")
        np.array([self.nd, self.nd, self.N, 0, 1], np.int32).tofile(self._f)

    def write_chunk(self, chunk: np.ndarray, start_row: int):
        """chunk: (B, ndc, nmc, N) float32 rows for observations
        [start_row, start_row + B)."""
        assert start_row == self._rows_written, "rows must stream in order"
        B = chunk.shape[0]
        for b in range(B):
            idata = start_row + b + 1  # 1-based
            for d in range(self.ndc):
                for k in range(self.nmc):
                    row = chunk[b, d, k]
                    if self.compression_type == 0:
                        # Uncompressed rows store every element, including
                        # zeros (sensitivity_gravmag.F90:287-294).
                        cols = np.arange(self.N, dtype=np.int32)
                        vals = row
                    else:
                        cols = np.nonzero(row)[0].astype(np.int32)
                        vals = row[cols]
                    self.nnz_per_cell[cols] += 1
                    self.nnz_total += cols.size
                    np.array([idata, cols.size, k + 1, d + 1], np.int32).tofile(self._f)
                    if cols.size:
                        (cols + 1).tofile(self._f)  # 1-based cell indices
                        vals.astype(np.float32).tofile(self._f)
        self._rows_written += B

    def finalize(self, comp_error: float):
        """Close the row file and write meta + nnz + weight files."""
        self._f.close()
        if self._rows_written != self.nd:
            raise ValueError(
                f"sensit cache incomplete: {self._rows_written}/{self.nd} rows"
            )
        with open(os.path.join(self.cache_dir, f"sensit_{self.sfx}_meta.txt"), "w") as f:
            f.write(f" {self.nx} {self.ny} {self.nz} {self.nd}\n")
            f.write(f" 1 {_MATRIX_PRECISION_BYTES} {self.par.depth_weighting_type}\n")
            f.write(f" {self.compression_type} {comp_error:.9E}\n")
            f.write(f" {self.nmc} {self.ndc}\n")
            f.write(f" {self.nnz_total}\n")
        with open(os.path.join(self.cache_dir, f"sensit_{self.sfx}_nnz"), "wb") as f:
            np.array([self.N], np.int32).tofile(f)
            self.nnz_per_cell.tofile(f)
        with open(os.path.join(self.cache_dir, f"sensit_{self.sfx}_weight"), "wb") as f:
            np.array([self.N], np.int32).tofile(f)
            self.column_weight.tofile(f)


def write_kernel_cache(cache_dir: str, par, kernel, column_weight: np.ndarray):
    """Write a dense SensitKernel through the stream writer.

    The kernel is pulled from the device in ROW CHUNKS: a single
    np.asarray of the whole array forces a device-side relayout copy
    (TPU-tiled -> host-linear) of the full kernel — at 8.5 GB that second
    copy RESOURCE_EXHAUSTEDs the 16 GB chip (observed on the million-cell
    run). A sliced pull relayouts only one chunk at a time."""
    nd, ndc, nmc = kernel.ndata, kernel.ndata_components, kernel.nmodel_components

    class _Grid:
        pass

    g = _Grid()
    g.nx, g.ny, g.nz = kernel.nx, kernel.ny, kernel.nz
    g.nelements_total = kernel.N

    w = SensitStreamWriter(cache_dir, par, g, column_weight, kernel.compression_type)
    # <= ~256 MB of f32 per pulled chunk.
    chunk = max(1, min(nd, (1 << 26) // max(ndc * nmc * kernel.N, 1)))
    for s in range(0, nd, chunk):
        e = min(s + chunk, nd)
        block = np.asarray(kernel.S[s * ndc : e * ndc], np.float32)
        w.write_chunk(block.reshape(e - s, ndc, nmc, kernel.N), s)
    w.finalize(kernel.comp_error)


def read_cache_meta(cache_dir: str, par, grid) -> Optional[dict]:
    """Read + validate the metadata file. Returns None when absent; raises
    on inconsistency (the reference's consistency checks,
    sensitivity_gravmag.F90:974-1037)."""
    sfx = _suffix_for(par)
    meta_path = os.path.join(cache_dir, f"sensit_{sfx}_meta.txt")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        nx, ny, nz, nd = (int(t) for t in f.readline().split())
        nbproc, precision, weight_type = (int(t) for t in f.readline().split())
        toks = f.readline().split()
        compression_type, comp_error = int(toks[0]), float(toks[1])
        nmc, ndc = (int(t) for t in f.readline().split())
        nnz_total = int(f.readline().split()[0])

    if (nx, ny, nz) != (grid.nx, grid.ny, grid.nz) or nd != par.ndata:
        raise ValueError("Sensitivity metadata file info does not match the Parfile!")
    if weight_type != par.depth_weighting_type:
        raise ValueError("Sensitivity metadata depth weighting type mismatch!")
    if compression_type != par.compression_type:
        raise ValueError("Compression type is inconsistent!")
    if nmc != par.nmodel_components or ndc != par.ndata_components:
        raise ValueError("Sensitivity metadata component counts mismatch!")
    if precision != _MATRIX_PRECISION_BYTES:
        raise ValueError("Matrix precision is not consistent!")
    return dict(
        nx=nx, ny=ny, nz=nz, nd=nd, nbproc=nbproc,
        compression_type=compression_type, comp_error=comp_error,
        nmc=nmc, ndc=ndc, nnz_total=nnz_total, sfx=sfx,
    )


def iter_cache_rows(cache_dir: str, meta: dict) -> Iterator[Tuple[int, int, int, np.ndarray, np.ndarray]]:
    """Stream (idata_0based, d, k, cols_0based, vals) over all rank files in
    global row order — the reference's per-row re-read loop
    (sensitivity_gravmag.F90:755-830). Memory: one row at a time."""
    nd, N, ndc, nmc = meta["nd"], meta["nx"] * meta["ny"] * meta["nz"], meta["ndc"], meta["nmc"]
    nbproc, sfx = meta["nbproc"], meta["sfx"]
    idata_glob = 0
    for rank in range(nbproc):
        path = os.path.join(cache_dir, f"sensit_{sfx}_{nbproc}_{rank}")
        with open(path, "rb") as f:
            hdr = np.fromfile(f, np.int32, 5)
            ndata_loc, ndata_read, N_read, rank_read, nbproc_read = (int(v) for v in hdr)
            if ndata_read != nd or N_read != N or rank_read != rank or nbproc_read != nbproc:
                raise ValueError("Wrong file header in sensitivity cache!")
            for _ in range(ndata_loc):
                idata_glob += 1
                for d in range(ndc):
                    for k in range(nmc):
                        idata, nel, k_read, d_read = (
                            int(v) for v in np.fromfile(f, np.int32, 4)
                        )
                        if idata != idata_glob or k_read != k + 1 or d_read != d + 1:
                            raise ValueError("Wrong data ordering in sensitivity cache!")
                        if nel > 0:
                            cols = np.fromfile(f, np.int32, nel) - 1
                            vals = np.fromfile(f, np.float32, nel)
                        else:
                            cols = np.empty(0, np.int32)
                            vals = np.empty(0, np.float32)
                        yield idata - 1, d, k, cols, vals
    if idata_glob != nd:
        raise ValueError("Sensitivity cache row count mismatch across ranks!")


def try_read_kernel_cache(cache_dir: str, par, grid) -> Optional["SensitKernel"]:
    """Read a reference-format kernel cache into a dense SensitKernel.
    Returns None when the cache is absent."""
    import jax.numpy as jnp

    from tomofastx_tpu.ops.sensitivity import SensitKernel

    meta = read_cache_meta(cache_dir, par, grid)
    if meta is None:
        return None
    nd, ndc, nmc = meta["nd"], meta["ndc"], meta["nmc"]
    N = meta["nx"] * meta["ny"] * meta["nz"]

    S = np.zeros((nd, ndc, nmc, N), np.float32)
    nnz = 0
    for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
        S[idata, d, k, cols] = vals
        nnz += cols.size

    return SensitKernel(
        S=jnp.asarray(S.reshape(nd * ndc, nmc * N)),
        ndata=nd,
        ndata_components=ndc,
        nmodel_components=nmc,
        nx=meta["nx"],
        ny=meta["ny"],
        nz=meta["nz"],
        compression_type=meta["compression_type"],
        comp_error=meta["comp_error"],
        nnz=nnz,
    )


def read_kernel_cache_packed(
    cache_dir: str, par, grid,
    pad_multiple: int = 8,
    col_cap_factor: float = 4.0,
):
    """Stream a reference-format cache directly into the packed top-k
    layout (PackedKernel), never materializing the dense (nd, N) array.

    Two streaming passes over the row files:
    1. header scan -> per-row nnz (row pack width K) — the per-cell column
       histogram comes from the ``_nnz`` file the cache already carries
       (the reference's load-balancing input, sensitivity_gravmag.F90:378-392);
    2. fill the row pack + adjoint (heavy dense block / light column pack).

    Host memory: nnz*(4+4) for the packs + the heavy dense block — the same
    asymptotic footprint as the reference's compressed CSR.
    Returns (PackedKernel, meta dict)."""
    import jax.numpy as jnp

    from tomofastx_tpu.ops.sparse_kernel import PackedKernel

    meta = read_cache_meta(cache_dir, par, grid)
    if meta is None:
        return None, None
    nd, ndc, nmc = meta["nd"], meta["ndc"], meta["nmc"]
    N = meta["nx"] * meta["ny"] * meta["nz"]
    nrows, ncols = nd * ndc, nmc * N
    sfx = meta["sfx"]

    # Column histogram over matrix columns (k * N + cell). The _nnz file is
    # summed over model components, so for nmc > 1 we rebuild it in pass 1.
    row_counts = np.zeros(nrows, np.int64)
    if nmc == 1:
        with open(os.path.join(cache_dir, f"sensit_{sfx}_nnz"), "rb") as f:
            N_read = int(np.fromfile(f, np.int32, 1)[0])
            if N_read != N:
                raise ValueError("nnz histogram size mismatch!")
            col_counts = np.fromfile(f, np.int32, N).astype(np.int64)
        for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
            row_counts[idata * ndc + d] += cols.size
    else:
        col_counts = np.zeros(ncols, np.int64)
        for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
            row_counts[idata * ndc + d] += cols.size
            np.add.at(col_counts, k * N + cols, 1)

    nnz = int(row_counts.sum())

    def pad_to(n):
        return max(pad_multiple, ((n + pad_multiple - 1) // pad_multiple) * pad_multiple)

    K = pad_to(int(row_counts.max()) if nrows else 1)
    row_vals = np.zeros((nrows, K), np.float32)
    row_idx = np.zeros((nrows, K), np.int32)

    mean_pop = max(nnz / max(ncols, 1), 1.0)
    cap = col_cap_factor * mean_pop
    heavy = np.nonzero(col_counts > cap)[0].astype(np.int32)
    light = np.nonzero((col_counts <= cap) & (col_counts > 0))[0].astype(np.int32)
    # Map matrix column -> position in heavy block / light pack (-1 = none).
    heavy_pos = np.full(ncols, -1, np.int64)
    heavy_pos[heavy] = np.arange(heavy.size)
    light_pos = np.full(ncols, -1, np.int64)
    light_pos[light] = np.arange(light.size)

    dense_block = np.zeros((nrows, heavy.size), np.float32)
    KT = pad_to(int(col_counts[light].max()) if light.size else 1)
    light_vals = np.zeros((light.size, KT), np.float32)
    light_idx = np.zeros((light.size, KT), np.int32)
    light_cursor = np.zeros(light.size, np.int64)
    row_cursor = np.zeros(nrows, np.int64)

    for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
        r = idata * ndc + d
        mcols = k * N + cols.astype(np.int64)
        # Row pack.
        p = row_cursor[r]
        row_vals[r, p : p + mcols.size] = vals
        row_idx[r, p : p + mcols.size] = mcols
        row_cursor[r] += mcols.size
        # Heavy columns -> dense block.
        hp = heavy_pos[mcols]
        hsel = hp >= 0
        dense_block[r, hp[hsel]] = vals[hsel]
        # Light columns -> column pack (append per column).
        lp = light_pos[mcols]
        lsel = lp >= 0
        lcols = lp[lsel]
        pos = light_cursor[lcols]
        light_vals[lcols, pos] = vals[lsel]
        light_idx[lcols, pos] = r
        light_cursor[lcols] += 1

    pk = PackedKernel(
        row_vals=jnp.asarray(row_vals),
        row_idx=jnp.asarray(row_idx),
        dense_cols=jnp.asarray(heavy),
        dense_block=jnp.asarray(dense_block),
        light_cols=jnp.asarray(light),
        light_vals=jnp.asarray(light_vals),
        light_idx=jnp.asarray(light_idx),
        nrows=nrows,
        ncols=ncols,
    )
    meta["nnz"] = nnz
    return pk, meta
