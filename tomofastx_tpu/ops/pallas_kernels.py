"""Pallas TPU kernels for the block-sparse sensitivity matvec.

The wavelet-compressed kernel in *block* form keeps, per row, the top-B
128-wide coefficient blocks by energy (a TPU-native re-design of the
reference's per-element threshold, sensitivity_gravmag.F90:237-272 — same
compression-rate semantics, lane-aligned support). XLA's gather lowering
moves the full gathered intermediate through HBM, so a dense GEMV is as
fast as its own block-sparse gather; this kernel keeps x resident in VMEM
and walks each row's block list with scalar-prefetched indices, so HBM
traffic is just the packed values + indices.

Layout:
- bvals: (nrows, B, 128) float32/bfloat16 — kept blocks per row
- bidx:  (nrows, B) int32 — block ids into x viewed as (N/128, 128)
- x:     (N,) — fits VMEM for N up to ~3M f32 on v5e (16 MB/core)

Grid: one program per row tile (TM rows); per block-slot b, the TM rows'
blocks are fetched by scalar-indexed dynamic slices from the VMEM-resident
x and accumulated with one (TM, 128) FMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _blocked_matvec_kernel(bidx_ref, bvals_ref, x_ref, out_ref):
    """bidx_ref: (TM, B) int32 VMEM tile; bvals_ref: (TM, B, 128) VMEM
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
