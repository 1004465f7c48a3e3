"""Tile-union block-sparse sensitivity operator (capacity mode v2).

Both LSQR directions as tile-union contractions (see ops/pallas_kernels.py
for the layout and the TPU kernel):

- forward (S @ x): row tiles over observations, 128-blocks over the
  wavelet-column axis;
- adjoint (S^T @ u): row tiles over wavelet columns, 128-blocks over the
  observation axis — a second pack of S^T, so both directions are
  gather-free streaming reads (the reference's column-sharded adjoint is
  similarly "free by construction", lsqr_solver2.F90:228-245).

MEASURED CAVEAT (BASELINE.md round-2 shootout): on real wavelet-compressed
sensitivity kernels the keep-set scatters uniformly (~rate per 128-block,
no clustering in flat or Mallat order), so this layout stores ~the dense
matrix and its matvec loses to the dense GEMV by 7-20x. It remains the
right structure for genuinely block-sparse operators and as the
cache-interop streaming reader; for capacity beyond HBM use the
matrix-free operator (ops/matrixfree.py), the reference's compressed-CSR
memory model (sparse_matrix.f90) re-expressed as recompute-on-the-fly.

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
    """Block-sparse operator (nrows x ncols), tile-union packed both ways.

    sharded=True marks a mesh-placed kernel (parallel/mesh.py::shard_kernel:
    both packs sharded over their tile axis). When `mesh` is also set and
    the backend is TPU, the contraction runs the Pallas kernel PER DEVICE
    under shard_map over the tile axis (x/u replicated in, tile-local
    outputs concatenated by the out_spec) — the reference's row/column
    sharded CSR (lsqr_solver2.F90:228-245) with the fast kernel intact.
    Otherwise a sharded kernel uses the XLA lowering, which GSPMD
    partitions the same way (pallas_call is a custom call GSPMD cannot
    split, hence the explicit shard_map wrapper)."""

    uvals: jax.Array  # (ntiles_r, BU, TM, 128) forward values
    ubidx: jax.Array  # (ntiles_r, BU) int32 column-block ids
    uvalsT: jax.Array  # (ntiles_c, BUT, TM, 128) adjoint values
    ubidxT: jax.Array  # (ntiles_c, BUT) int32 row-block ids
    nrows: int
    ncols: int
    sharded: bool = False
    mesh: "jax.sharding.Mesh | None" = None

    def _shard_map_pallas(self, uvals, ubidx, x, interpret=False):
        """Per-device tile_matvec under shard_map: each device contracts
        its tile slice against the replicated vector; out_specs
        concatenates the tile-local outputs. Requires the tile axis to
        divide the mesh (pad_tiles_for_mesh guarantees it)."""
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map

            # pallas_call outputs carry no varying-mesh-axes metadata.
            kw = {"check_vma": False}
        except ImportError:  # older JAX: experimental API
            from jax.experimental.shard_map import shard_map

            kw = {"check_rep": False}

        ax = self.mesh.axis_names[0]
        return shard_map(
            lambda uv, ub, xx: tile_matvec(uv, ub, xx, interpret=interpret),
            mesh=self.mesh,
            in_specs=(P(ax), P(ax), P()),
            out_specs=P(ax),
            **kw,
        )(uvals, ubidx, x)

    def _contract(self, uvals, ubidx, x, n_in, n_out):
        npad = (-n_in) % BLOCK
        if npad:
            x = jnp.pad(x, (0, npad))
        use_pallas = _use_pallas() and x.dtype == jnp.float32
        if use_pallas and self.mesh is not None:
            y = self._shard_map_pallas(uvals, ubidx, x)
        elif use_pallas and not self.sharded:
            y = tile_matvec(uvals, ubidx, x)
        else:
            # Contract in the solver dtype (f64 CPU tests accumulate in
            # f64, like the dense path's f32-values x f64-vector GEMV).
            NB = x.shape[0] // BLOCK
            xb = x.reshape(NB, BLOCK)
            g = xb[ubidx]  # (ntiles, BU, 128)
            y = jnp.einsum("tbmk,tbk->tm", uvals.astype(x.dtype), g).reshape(-1)
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
    return (k.uvals, k.ubidx, k.uvalsT, k.ubidxT), (
        k.nrows, k.ncols, k.sharded, k.mesh,
    )


def _tk_unflatten(aux, children):
    return TileKernel(
        *children, nrows=aux[0], ncols=aux[1], sharded=aux[2], mesh=aux[3],
    )


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
    def scan_coo(self, r: np.ndarray, c: np.ndarray):
        """Record block usage for nonzeros at (row r[i], col c[i]) —
        vectorized over an arbitrary batch of entries (any order).
        Shifts instead of // : numpy integer division is ~10x slower and
        TM = 8, BLOCK = 128 are powers of two."""
        r = np.asarray(r, np.int64)
        c = np.asarray(c, np.int64)
        self.used_f[r >> 3, c >> 7] = True
        self.used_a[c >> 3, r >> 7] = True

    def scan_chunk(self, rows: np.ndarray, start_row: int):
        """rows: (B, ncols) dense row slab (transient); records block usage."""
        rr, cc = np.nonzero(rows)
        self.scan_coo(start_row + rr, cc)

    def finalize_scan(self):
        counts_f = self.used_f.sum(axis=1)
        counts_a = self.used_a.sum(axis=1)
        self.BU = max(1, int(counts_f.max()))
        self.BUT = max(1, int(counts_a.max()))
        # Slot index maps: (tile, block) -> slot position or -1. Stable
        # argsort of ~used puts each tile's used block ids first, ascending.
        self.slot_f, self.ubidx = _slots_from_usage(self.used_f, counts_f, self.BU)
        self.slot_a, self.ubidxT = _slots_from_usage(self.used_a, counts_a, self.BUT)
        self.uvals = np.zeros((self.ntr, self.BU, TM, BLOCK), np.float32)
        self.uvalsT = np.zeros((self.ntc, self.BUT, TM, BLOCK), np.float32)
        self._scanned = True

    # ---- pass 2 ----
    def fill_coo(self, r: np.ndarray, c: np.ndarray, v: np.ndarray):
        """Write values for nonzeros at (r[i], c[i]) — vectorized; entries
        must be unique (each (r, c) written once), any order.

        Flat-index scatter with shift/mask arithmetic: ~25x faster than the
        equivalent 4-d fancy assignment (measured 22s -> <1s per 40M nnz;
        numpy multi-axis fancy indexing re-derives flat offsets with slow
        int64 division)."""
        assert self._scanned
        v = v.astype(np.float32, copy=False)
        r = np.asarray(r, np.int64)
        c = np.asarray(c, np.int64)
        # Forward: row r -> (tile r//8, slot of col block c//128, lane r%8,
        # lane c%128).
        t = r >> 3
        slot = self.slot_f[t, c >> 7].astype(np.int64)
        flat = ((t * self.BU + slot) << 3 | (r & 7)) << 7 | (c & 127)
        self.uvals.ravel()[flat] = v
        # Adjoint: column c -> (tile c//8, slot of row block r//128, lane
        # c%8, lane r%128).
        tc = c >> 3
        slota = self.slot_a[tc, r >> 7].astype(np.int64)
        flata = ((tc * self.BUT + slota) << 3 | (c & 7)) << 7 | (r & 127)
        self.uvalsT.ravel()[flata] = v

    def fill_chunk(self, rows: np.ndarray, start_row: int):
        rr, cc = np.nonzero(rows)
        self.fill_coo(start_row + rr, cc, rows[rr, cc])

    def build(self) -> TileKernel:
        return TileKernel(
            uvals=jnp.asarray(self.uvals),
            ubidx=jnp.asarray(self.ubidx),
            uvalsT=jnp.asarray(self.uvalsT),
            ubidxT=jnp.asarray(self.ubidxT),
            nrows=self.nrows,
            ncols=self.ncols,
        )


def _slots_from_usage(used: np.ndarray, counts: np.ndarray, width: int):
    """(ntiles, nblocks) usage bitmap -> (slot map (ntiles, nblocks) int32
    with -1 for unused, ubidx (ntiles, width) int32 padded with 0)."""
    ntiles, nblocks = used.shape
    order = np.argsort(~used, axis=1, kind="stable")  # used ids first, asc
    pos = np.arange(nblocks)
    mask = pos[None, :] < counts[:, None]
    slot = np.full((ntiles, nblocks), -1, np.int32)
    tiles = np.broadcast_to(np.arange(ntiles)[:, None], order.shape)
    posb = np.broadcast_to(pos[None, :], order.shape)
    slot[tiles[mask], order[mask]] = posb[mask]
    ubidx = np.where(mask[:, :width], order[:, :width], 0).astype(np.int32)
    return slot, ubidx


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

    # COO-buffered streaming (no dense row materialization): records are
    # batched into ~4M-entry triplet buffers and flushed vectorized.
    FLUSH = 4 << 20
    b = TileKernelBuilder(nrows, ncols)

    def stream(consume, with_vals):
        buf_r, buf_c, buf_v, size = [], [], [], 0
        nnz = 0
        for idata, d, k, cols, vals in iter_cache_rows(cache_dir, meta):
            nnz += cols.size
            buf_r.append(np.full(cols.size, idata * ndc + d, np.int64))
            buf_c.append(k * N + cols.astype(np.int64))
            if with_vals:
                buf_v.append(vals)
            size += cols.size
            if size >= FLUSH:
                consume(np.concatenate(buf_r), np.concatenate(buf_c),
                        np.concatenate(buf_v) if with_vals else None)
                buf_r, buf_c, buf_v, size = [], [], [], 0
        if size:
            consume(np.concatenate(buf_r), np.concatenate(buf_c),
                    np.concatenate(buf_v) if with_vals else None)
        return nnz

    stream(lambda r, c, v: b.scan_coo(r, c), with_vals=False)
    b.finalize_scan()
    meta["nnz"] = stream(lambda r, c, v: b.fill_coo(r, c, v), with_vals=True)
    return b.build(), meta


def pad_tiles_for_mesh(tk: TileKernel, n: int) -> TileKernel:
    """Pad both packs' tile axes to a multiple of n devices.

    Padding tiles have ubidx 0 and zero values; their output rows land
    beyond nrows/ncols and are sliced off by the y[:n_out] in _contract —
    the tile-layout counterpart of pad-to-multiple sharding
    (parallel_tools.f90:46-63 arbitrary-N partition). Returns tk unchanged
    when both tile axes already divide."""

    def padn(x):
        pad = (-x.shape[0]) % n
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    if tk.uvals.shape[0] % n == 0 and tk.uvalsT.shape[0] % n == 0:
        return tk
    return TileKernel(
        uvals=padn(tk.uvals),
        ubidx=padn(tk.ubidx),
        uvalsT=padn(tk.uvalsT),
        ubidxT=padn(tk.ubidxT),
        nrows=tk.nrows,
        ncols=tk.ncols,
        sharded=tk.sharded,
        mesh=tk.mesh,
    )


def apply_row_weights_tiled(tk: TileKernel, wrow: np.ndarray) -> TileKernel:
    """Bake per-row weights into both packs (sensitivity_gravmag.F90:836-843
    semantics). wrow: (nrows,)."""
    w = np.asarray(wrow, np.float32).reshape(-1)
    assert w.shape[0] == tk.nrows
    ntr = tk.uvals.shape[0]
    w_pad = np.zeros(ntr * TM, np.float32)
    w_pad[: tk.nrows] = w
    wf = jnp.asarray(w_pad.reshape(ntr, 1, TM, 1))
    # Adjoint values are indexed (col tile, row-block slot, col lane, row
    # lane): weight by the ROW id = ubidxT * 128 + lane.
    nbr_pad = ((tk.nrows + BLOCK - 1) // BLOCK) * BLOCK
    w_rows = np.zeros(nbr_pad, np.float32)
    w_rows[: tk.nrows] = w
    w_blocks = jnp.asarray(w_rows.reshape(-1, BLOCK))  # (nbr, 128)
    wa = w_blocks[tk.ubidxT][:, :, None, :]  # (ntc, BUT, 1, 128)
    return TileKernel(
        uvals=tk.uvals * wf,
        ubidx=tk.ubidx,
        uvalsT=tk.uvalsT * wa,
        ubidxT=tk.ubidxT,
        nrows=tk.nrows,
        ncols=tk.ncols,
        sharded=tk.sharded,
        mesh=tk.mesh,
    )
