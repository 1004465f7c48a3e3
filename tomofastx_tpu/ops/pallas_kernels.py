"""Pallas TPU kernels for the block-sparse sensitivity matvec.

The wavelet-compressed kernel in *block* form keeps, per row, the 128-wide
coefficient blocks that contain surviving coefficients (a TPU-native
re-design of the reference's per-element threshold,
sensitivity_gravmag.F90:237-272 — same compression-rate semantics,
lane-aligned support). XLA's gather lowering materializes the gathered
intermediate in HBM, so per-element or per-row gathers lose to a dense
GEMV; these kernels keep x resident in VMEM and stream only the packed
values + indices from HBM.

Two layouts:

1. Row layout (``blocked_matvec``, round-1): per row, its top-B blocks.
   The kernel walks TM rows' block lists with TM scalar-indexed (1, 128)
   loads per block slot — measured 14x SLOWER than dense on v5e (the
   serialized scalar loads dominate; BASELINE.md round-1 table).

2. Tile-union layout (``tile_matvec``, round-2): rows are grouped in tiles
   of TM; each tile stores the UNION of its rows' block lists once
   (ubidx (ntiles, BU)) and the values per row per union block
   (uvals (ntiles, BU, TM, 128), zero where a row does not use a block).
   Wavelet rows of nearby observation points share most blocks (coarse
   scales are kept by every row — the same heavy-tail the reference's nnz
   histogram shows, sensitivity_gravmag.F90:378-392), so BU ~ B.

   The kernel uses a scalar-prefetched grid (PrefetchScalarGridSpec): the
   block-id table ubidx lives in SMEM and drives the *index maps* of the
   x and uvals operands, so every load is a pipeline-issued, double-
   buffered DMA (no scalar-indexed loads inside the body at all — the
   round-1 kernel's failure mode). Per grid step (tile i, union slot b)
   the body is one (TM, 128) FMA into a VMEM accumulator.

MEASURED OUTCOME (v5e, real 4096 x 262k rate-0.15 kernel — BASELINE.md
round-2 table): the real wavelet keep-set scatters ~19 nonzeros per
128-block with NO block clustering in any ordering, so the tile-union pack
stores ~the dense matrix, and the 4 KB-per-step DMA granularity bounds the
kernel at 22 GB/s vs the dense GEMV's 495 GB/s. These kernels are kept as
measured evidence and for genuinely block-structured operators; the
production speed path is the dense GEMV and the production capacity path
is the matrix-free operator (ops/matrixfree.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


# =============================================================================
# Round-1 row layout (kept for comparison benchmarks; see module docstring)
# =============================================================================


def _blocked_matvec_kernel(bidx_ref, bvals_ref, x_ref, out_ref):
    """bidx_ref: (TM, B) int32 SMEM tile; bvals_ref: (TM, B, 128) VMEM
    tile; x_ref: (NB, 128) VMEM (whole vector); out_ref: (TM, 1)."""
    TM, B, _ = bvals_ref.shape

    def body(b, acc):
        rows = []
        for r in range(TM):  # static unroll over the row tile
            blk = bidx_ref[r, b]
            rows.append(x_ref[pl.ds(blk, 1), :])  # (1, 128)
        xblk = jnp.concatenate(rows, axis=0)  # (TM, 128)
        return acc + jnp.sum(
            bvals_ref[:, b, :].astype(jnp.float32) * xblk, axis=1, keepdims=True
        )

    acc = jax.lax.fori_loop(0, B, body, jnp.zeros((TM, 1), jnp.float32))
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("tm",))
def blocked_matvec(bvals: jax.Array, bidx: jax.Array, x: jax.Array, tm: int = 8) -> jax.Array:
    """y[r] = sum_b <bvals[r, b, :], x_block[bidx[r, b]]> via Pallas.

    nrows must be a multiple of tm; N a multiple of 128."""
    nrows, B, bs = bvals.shape
    assert bs == BLOCK
    N = x.shape[0]
    assert N % BLOCK == 0 and nrows % tm == 0
    NB = N // BLOCK

    grid_spec = pl.GridSpec(
        grid=(nrows // tm,),
        in_specs=[
            pl.BlockSpec((tm, B), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, B, BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, BLOCK), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _blocked_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((nrows, 1), jnp.float32),
        grid_spec=grid_spec,
    )(bidx, bvals, x.astype(jnp.float32).reshape(NB, BLOCK))
    return out[:, 0]


def blocked_matvec_xla(bvals, bidx, x):
    """XLA reference lowering of the same contraction (for correctness
    checks and as a CPU fallback)."""
    NB = x.shape[0] // BLOCK
    xb = x.reshape(NB, BLOCK)
    return jnp.einsum("rbk,rbk->r", bvals, xb[bidx].astype(bvals.dtype)).astype(jnp.float32)


# =============================================================================
# Round-2 tile-union layout
# =============================================================================


def pack_tile_union(S: np.ndarray, tm: int = 8):
    """Pack a dense (nrows, N) matrix into the tile-union block layout.

    Returns (uvals (ntiles, BU, tm, 128) f32, ubidx (ntiles, BU) i32,
    nrows). Rows are tiled in natural order (neighboring observation rows
    share wavelet support); each tile's block list is the union of its
    rows' nonzero 128-blocks, padded to the max tile width BU with
    repeats of block 0 and zero values."""
    S = np.asarray(S)
    nrows, N = S.shape
    assert N % BLOCK == 0
    nrows_pad = ((nrows + tm - 1) // tm) * tm
    if nrows_pad != nrows:
        S = np.vstack([S, np.zeros((nrows_pad - nrows, N), S.dtype)])
    ntiles = nrows_pad // tm
    NB = N // BLOCK

    Sb = S.reshape(ntiles, tm, NB, BLOCK)
    used = np.any(Sb != 0.0, axis=(1, 3))  # (ntiles, NB) blocks used by tile
    counts = used.sum(axis=1)
    BU = max(1, int(counts.max()))

    ubidx = np.zeros((ntiles, BU), np.int32)
    uvals = np.zeros((ntiles, BU, tm, BLOCK), np.float32)
    for t in range(ntiles):
        blocks = np.nonzero(used[t])[0]
        ubidx[t, : blocks.size] = blocks
        uvals[t, : blocks.size] = Sb[t, :, blocks, :]  # (nb_t, tm, 128)
    return uvals, ubidx, nrows


def _tile_matvec_kernel(ubidx_ref, uvals_ref, x_ref, out_ref, acc_ref):
    """Grid (ntiles, BU); ubidx is scalar-prefetched (drives the index
    maps — every operand block is a pipeline-issued DMA). Per step: one
    (TM, 128) FMA into the VMEM accumulator; the lane reduction happens
    once per tile on the last union slot."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += uvals_ref[0, 0].astype(jnp.float32) * x_ref[0, 0, :][None, :]

    @pl.when(b == pl.num_programs(1) - 1)
    def _reduce():
        out_ref[0, 0, :] = jnp.sum(acc_ref[...], axis=1)


# SMEM budget for the prefetched ubidx table per pallas_call; larger tables
# chunk the tile axis and lax.map over groups (one compile, same kernel).
_SMEM_IDX_BUDGET = 1 << 19  # 512 KiB


@functools.partial(jax.jit, static_argnames=("interpret", "smem_budget"))
def tile_matvec(uvals: jax.Array, ubidx: jax.Array, x: jax.Array,
                interpret: bool = False, smem_budget: int = None) -> jax.Array:
    """y = S @ x through the tile-union layout. Returns (ntiles * TM,)
    (caller slices off row padding). interpret=True runs the Pallas
    interpreter (CPU tests)."""
    ntiles, BU, TM, bs = uvals.shape
    assert bs == BLOCK
    N = x.shape[0]
    assert N % BLOCK == 0
    NB = N // BLOCK
    xb = x.astype(jnp.float32).reshape(NB, 1, BLOCK)

    def call(uv, ub):
        nt = uv.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, BU),
            in_specs=[
                pl.BlockSpec((1, 1, TM, BLOCK), lambda i, b, ubr: (i, b, 0, 0)),
                pl.BlockSpec((1, 1, BLOCK), lambda i, b, ubr: (ubr[i, b], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, TM), lambda i, b, ubr: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((TM, BLOCK), jnp.float32)],
        )
        return pl.pallas_call(
            _tile_matvec_kernel,
            out_shape=jax.ShapeDtypeStruct((nt, 1, TM), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(ub, uv, xb)

    idx_bytes = ntiles * BU * 4
    groups = int(np.ceil(idx_bytes / (smem_budget or _SMEM_IDX_BUDGET)))
    while ntiles % groups:  # need an even tile split
        groups += 1
    if groups == 1:
        out = call(uvals, ubidx)
    else:
        out = jax.lax.map(
            lambda args: call(*args),
            (
                uvals.reshape(groups, ntiles // groups, BU, TM, BLOCK),
                ubidx.reshape(groups, ntiles // groups, BU),
            ),
        )
    return out.reshape(-1)


def tile_matvec_xla(uvals, ubidx, x):
    """XLA lowering of the tile-union contraction (correctness oracle and
    CPU fallback). The gathered intermediate is (ntiles, BU, 128) — TM x
    smaller than the round-1 per-row gather."""
    NB = x.shape[0] // BLOCK
    xb = x.reshape(NB, BLOCK)
    g = xb[ubidx]  # (ntiles, BU, 128)
    return jnp.einsum("tbmk,tbk->tm", uvals, g.astype(uvals.dtype)).reshape(-1).astype(jnp.float32)
