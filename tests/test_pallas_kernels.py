"""Pallas blocked-matvec kernel, interpreter mode (CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tomofastx_tpu.ops import pallas_kernels as pk


def _fixture(nd=16, NB=32, B=6, seed=0):
    rng = np.random.default_rng(seed)
    bidx = np.sort(rng.integers(0, NB, size=(nd, B)).astype(np.int32), axis=1)
    bvals = rng.normal(size=(nd, B, pk.BLOCK)).astype(np.float32)
    x = rng.normal(size=NB * pk.BLOCK).astype(np.float32)
    return jnp.asarray(bvals), jnp.asarray(bidx), jnp.asarray(x)


def test_blocked_matvec_xla_matches_dense():
    bv, bi, x = _fixture()
    nd, B, BS = bv.shape
    N = x.shape[0]
    S = np.zeros((nd, N), np.float32)
    for r in range(nd):
        for b in range(B):
            c = int(bi[r, b]) * BS
            S[r, c : c + BS] += np.asarray(bv[r, b])
    y = np.asarray(pk.blocked_matvec_xla(bv, bi, x))
    np.testing.assert_allclose(y, S @ np.asarray(x), rtol=1e-5)


def test_blocked_matvec_pallas_interpret():
    """The Pallas kernel under the interpreter must match the XLA lowering."""
    from functools import partial

    from jax.experimental import pallas as pl

    bv, bi, x = _fixture()
    nd, B, BS = bv.shape
    NB = x.shape[0] // BS
    tm = 8

    grid_spec = pl.GridSpec(
        grid=(nd // tm,),
        in_specs=[
            pl.BlockSpec((tm, B), lambda i: (i, 0)),
            pl.BlockSpec((tm, B, BS), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, BS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0)),
    )
    out = pl.pallas_call(
        pk._blocked_matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((nd, 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=True,
    )(bi, bv, x.reshape(NB, BS))

    expected = pk.blocked_matvec_xla(bv, bi, x)
    np.testing.assert_allclose(out[:, 0], expected, rtol=1e-5)


def test_tile_union_pack_and_xla_matvec():
    """Tile-union layout reproduces the dense product (CPU/XLA oracle)."""
    import numpy as np

    from tomofastx_tpu.ops.pallas_kernels import pack_tile_union, tile_matvec_xla

    rng = np.random.default_rng(4)
    nrows, N = 27, 512  # uneven rows -> tile padding
    S = rng.normal(size=(nrows, N)).astype(np.float32)
    S[rng.random(S.shape) > 0.15] = 0.0
    uvals, ubidx, nr = pack_tile_union(S, tm=8)
    assert nr == nrows and uvals.shape[0] == 4  # ceil(27/8)
    x = rng.normal(size=(N,))
    y = np.asarray(tile_matvec_xla(jnp.asarray(uvals), jnp.asarray(ubidx), jnp.asarray(x)))[:nrows]
    np.testing.assert_allclose(y, S.astype(np.float64) @ x, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nrows", [16, 512])
def test_tile_union_pallas_interpret(nrows):
    """Pallas tile-union kernel (scalar-prefetched index maps) == XLA
    oracle under the interpreter; nrows=512 exceeds the SMEM index budget
    when shrunk, so also exercise the lax.map group-chunking with a
    temporarily tiny budget."""
    import numpy as np

    from tomofastx_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(6)
    N = 384
    S = rng.normal(size=(nrows, N)).astype(np.float32)
    S[rng.random(S.shape) > 0.3] = 0.0
    uvals, ubidx, nr = pk.pack_tile_union(S, tm=8)
    x = rng.normal(size=(N,)).astype(np.float32)
    uv, ub, xj = jnp.asarray(uvals), jnp.asarray(ubidx), jnp.asarray(x)

    y_ref = np.asarray(pk.tile_matvec_xla(uv, ub, xj))
    out = np.asarray(pk.tile_matvec(uv, ub, xj, interpret=True))
    np.testing.assert_allclose(out.reshape(-1), y_ref, rtol=1e-4, atol=1e-4)

    if nrows == 512:
        # Force multiple lax.map groups (tiny SMEM budget).
        out2 = np.asarray(pk.tile_matvec(uv, ub, xj, interpret=True, smem_budget=64))
        np.testing.assert_allclose(out2.reshape(-1), y_ref, rtol=1e-4, atol=1e-4)
