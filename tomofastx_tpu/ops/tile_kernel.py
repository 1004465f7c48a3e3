"""Tile-union block-sparse sensitivity operator (capacity mode v2).

Both LSQR directions as tile-union contractions (see ops/pallas_kernels.py
for the layout and the TPU kernel):

- forward (S @ x): row tiles over observations, 128-blocks over the
  wavelet-column axis;
- adjoint (S^T @ u): row tiles over wavelet columns, 128-blocks over the
  observation axis — a second pack of S^T, so both directions are
  gather-free streaming reads (the reference's column-sharded adjoint is
  similarly "free by construction", lsqr_solver2.F90:228-245).

Memory is nnz-bound (block-fill overhead ~2-4x over raw nnz for wavelet
kernels), NOT dense-bound: a 8192 x 1M kernel that is 34 GB dense fits in
a few GB packed — the TPU counterpart of the reference's compressed-CSR
memory model (sparse_matrix.f90).

Packing is streaming: `TileKernelBuilder` consumes (nd, ndc, nmc, N) row
chunks (from the build loop or the sensit cache reader) in two passes and
never materializes the dense matrix.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.ops.pallas_kernels import BLOCK, tile_matvec, tile_matvec_xla

TM = 8  # rows per tile


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


@dataclass
class TileKernel:
    """Block-sparse operator (nrows x ncols), tile-union packed both ways."""

    uvals: jax.Array  # (ntiles_r, TM, BU, 128) forward values
    ubidx: jax.Array  # (ntiles_r, BU) int32 column-block ids
    uvalsT: jax.Array  # (ntiles_c, TM, BUT, 128) adjoint values
    ubidxT: jax.Array  # (ntiles_c, BUT) int32 row-block ids
    nrows: int
    ncols: int

    def _contract(self, uvals, ubidx, x, n_in, n_out):
        npad = (-n_in) % BLOCK
        if npad:
            x = jnp.pad(x, (0, npad))
        if _use_pallas() and x.dtype == jnp.float32:
            y = tile_matvec(uvals, ubidx, x)
        else:
            # Contract in the solver dtype (f64 CPU tests accumulate in
            # f64, like the dense path's f32-values x f64-vector GEMV).
            NB = x.shape[0] // BLOCK
            xb = x.reshape(NB, BLOCK)
            g = xb[ubidx]  # (ntiles, BU, 128)
            y = jnp.einsum("tmbk,tbk->tm", uvals.astype(x.dtype), g).reshape(-1)
        return y[:n_out]

    def matvec(self, x: jax.Array) -> jax.Array:
        dt = x.dtype
        return self._contract(self.uvals, self.ubidx, x, self.ncols, self.nrows).astype(dt)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        dt = u.dtype
        return self._contract(self.uvalsT, self.ubidxT, u, self.nrows, self.ncols).astype(dt)

    @property
    def nbytes(self) -> int:
        return sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in (self.uvals, self.ubidx, self.uvalsT, self.ubidxT)
        )


def _tk_flatten(k: TileKernel):
    return (k.uvals, k.ubidx, k.uvalsT, k.ubidxT), (k.nrows, k.ncols)


def _tk_unflatten(aux, children):
    return TileKernel(*children, nrows=aux[0], ncols=aux[1])


jax.tree_util.register_pytree_node(TileKernel, _tk_flatten, _tk_unflatten)


class TileKernelBuilder:
    """Two-pass streaming packer.

    Pass 1 (`scan_chunk` per chunk, then `finalize_scan`): block-usage
    bitmaps for both orientations -> tile widths + slot index maps.
    Pass 2 (`fill_chunk` per chunk, then `build`): write values.

    Chunks are (B, nrows_like...) slices of rows in order; the same chunks
    must be replayed identically in both passes (e.g. two passes over the
    sensit cache, or two build sweeps — for the build case prefer caching
    to disk first, then streaming the cache).
    """

    def __init__(self, nrows: int, ncols: int):
        self.nrows, self.ncols = nrows, ncols
        self.ntr = (nrows + TM - 1) // TM
        self.ntc = (ncols + TM - 1) // TM
        self.nbr = (nrows + BLOCK - 1) // BLOCK  # row blocks (adjoint axis)
        self.nbc = (ncols + BLOCK - 1) // BLOCK  # col blocks (forward axis)
        self.used_f = np.zeros((self.ntr, self.nbc), bool)
        self.used_a = np.zeros((self.ntc, self.nbr), bool)
        self._scanned = False

    # ---- pass 1 ----
    def scan_chunk(self, rows: np.ndarray, start_row: int):
        """rows: (B, ncols) dense row slab (transient); records block usage."""
        B = rows.shape[0]
        ncpad = (-self.ncols) % BLOCK
        rb = np.pad(rows != 0.0, ((0, 0), (0, ncpad)))
        rb = rb.reshape(B, self.nbc, BLOCK).any(axis=2)  # (B, nbc)
        for b in range(B):
            self.used_f[(start_row + b) // TM] |= rb[b]
        # Adjoint: column c uses row-block (start_row + b) // 128.
        cols_used = (rows != 0.0)  # (B, ncols)
        for b in range(B):
            r = start_row + b
            cu = np.nonzero(cols_used[b])[0]
            self.used_a[cu // TM, r // BLOCK] = True

    def finalize_scan(self):
        self.BU = max(1, int(self.used_f.sum(axis=1).max()))
        self.BUT = max(1, int(self.used_a.sum(axis=1).max()))
        # Slot index maps: (tile, block) -> slot position or -1.
        self.slot_f = np.full((self.ntr, self.nbc), -1, np.int32)
        self.ubidx = np.zeros((self.ntr, self.BU), np.int32)
        for t in range(self.ntr):
            blocks = np.nonzero(self.used_f[t])[0]
            self.slot_f[t, blocks] = np.arange(blocks.size)
            self.ubidx[t, : blocks.size] = blocks
        self.slot_a = np.full((self.ntc, self.nbr), -1, np.int32)
        self.ubidxT = np.zeros((self.ntc, self.BUT), np.int32)
        for t in range(self.ntc):
            blocks = np.nonzero(self.used_a[t])[0]
            self.slot_a[t, blocks] = np.arange(blocks.size)
            self.ubidxT[t, : blocks.size] = blocks
        self.uvals = np.zeros((self.ntr, TM, self.BU, BLOCK), np.float32)
        self.uvalsT = np.zeros((self.ntc, TM, self.BUT, BLOCK), np.float32)
        self._scanned = True

    # ---- pass 2 ----
    def fill_chunk(self, rows: np.ndarray, start_row: int):
        assert self._scanned
        B = rows.shape[0]
        for b in range(B):
            r = start_row + b
            cols = np.nonzero(rows[b])[0]
            vals = rows[b, cols].astype(np.float32)
            # Forward: row r -> tile r//TM lane r%TM, slot of block c//128,
            # lane c%128.
            t = r // TM
            self.uvals[t, r % TM, self.slot_f[t, cols // BLOCK], cols % BLOCK] = vals
            # Adjoint: column c -> tile c//TM lane c%TM, slot of row-block
            # r//128, lane r%128.
            self.uvalsT[cols // TM, cols % TM, self.slot_a[cols // TM, r // BLOCK], r % BLOCK] = vals

    def build(self) -> TileKernel:
        return TileKernel(
            uvals=jnp.asarray(self.uvals),
            ubidx=jnp.asarray(self.ubidx),
            uvalsT=jnp.asarray(self.uvalsT),
            ubidxT=jnp.asarray(self.ubidxT),
            nrows=self.nrows,
            ncols=self.ncols,
        )


def pack_tiles(S: np.ndarray) -> TileKernel:
    """Convenience non-streaming pack from a dense matrix (tests, bench)."""
    S = np.asarray(S)
    b = TileKernelBuilder(S.shape[0], S.shape[1])
    b.scan_chunk(S, 0)
    b.finalize_scan()
    b.fill_chunk(S, 0)
    return b.build()


def tile_kernel_from_cache(cache_dir: str, par, grid) -> tuple:
    """Stream a sensit cache (any nbproc) into a TileKernel — two streamed
    passes, dense matrix never materialized. Returns (TileKernel, meta)."""
    from tomofastx_tpu.io.sensit_cache import iter_cache_rows, read_cache_meta

    meta = read_cache_meta(cache_dir, par, grid)
    if meta is None:
        return None, None
    nd, ndc, nmc = meta["nd"], meta["ndc"], meta["nmc"]
    N = meta["nx"] * meta["ny"] * meta["nz"]
    nrows, ncols = nd * ndc, nmc * N

    b = TileKernelBuilder(nrows, ncols)
    row = np.zeros((1, ncols), np.float32)
    for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
        row[:] = 0.0
        row[0, k * N + cols] = vals
        b.scan_chunk(row, idata * ndc + d)
    b.finalize_scan()
    nnz = 0
    for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
        row[:] = 0.0
        row[0, k * N + cols] = vals
        nnz += cols.size
        b.fill_chunk(row, idata * ndc + d)
    meta["nnz"] = nnz
    return b.build(), meta


def apply_row_weights_tiled(tk: TileKernel, wrow: np.ndarray) -> TileKernel:
    """Bake per-row weights into both packs (sensitivity_gravmag.F90:836-843
    semantics). wrow: (nrows,)."""
    w = np.asarray(wrow, np.float32).reshape(-1)
    assert w.shape[0] == tk.nrows
    ntr = tk.uvals.shape[0]
    w_pad = np.zeros(ntr * TM, np.float32)
    w_pad[: tk.nrows] = w
    wf = jnp.asarray(w_pad.reshape(ntr, TM, 1, 1))
    # Adjoint values are indexed (col tile, col lane, row-block slot, row
    # lane): weight by the ROW id = ubidxT * 128 + lane.
    nbr_pad = ((tk.nrows + BLOCK - 1) // BLOCK) * BLOCK
    w_rows = np.zeros(nbr_pad, np.float32)
    w_rows[: tk.nrows] = w
    w_blocks = jnp.asarray(w_rows.reshape(-1, BLOCK))  # (nbr, 128)
    wa = w_blocks[tk.ubidxT][:, None, :, :]  # (ntc, 1, BUT, 128)
    return TileKernel(
        uvals=tk.uvals * wf,
        ubidx=tk.ubidx,
        uvalsT=tk.uvalsT * wa,
        ubidxT=tk.ubidxT,
        nrows=tk.nrows,
        ncols=tk.ncols,
    )
