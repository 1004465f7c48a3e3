"""Packed sparse kernel: matvec/rmatvec must equal the dense operator."""

import numpy as np

import jax.numpy as jnp

from tomofastx_tpu.ops.sparse_kernel import pack_dense


def _random_compressed(nrows, ncols, rate, seed=0):
    """Dense matrix with reference-like structured sparsity: a few heavy
    columns present in every row + random per-row support."""
    rng = np.random.default_rng(seed)
    S = np.zeros((nrows, ncols), np.float32)
    n_heavy = max(1, ncols // 50)
    S[:, :n_heavy] = rng.normal(size=(nrows, n_heavy))
    k = int(rate * ncols)
    for r in range(nrows):
        cols = rng.choice(np.arange(n_heavy, ncols), size=k, replace=False)
        S[r, cols] = rng.normal(size=k)
    return S


def test_pack_matvec_equals_dense():
    S = _random_compressed(37, 400, 0.15)
    pk = pack_dense(S, pad_multiple=8)
    x = np.random.default_rng(1).normal(size=400)
    np.testing.assert_allclose(
        np.asarray(pk.matvec(jnp.asarray(x, jnp.float64))), S @ x, rtol=1e-6
    )


def test_pack_rmatvec_equals_dense():
    S = _random_compressed(37, 400, 0.15)
    pk = pack_dense(S, pad_multiple=8)
    u = np.random.default_rng(2).normal(size=37)
    np.testing.assert_allclose(
        np.asarray(pk.rmatvec(jnp.asarray(u, jnp.float64))), S.T @ u, rtol=1e-6
    )


def test_pack_covers_all_entries():
    S = _random_compressed(10, 64, 0.2)
    pk = pack_dense(S, pad_multiple=8)
    nnz = int((S != 0).sum())
    assert int((np.asarray(pk.row_vals) != 0).sum()) == nnz
    adjoint_nnz = int((np.asarray(pk.dense_block) != 0).sum()) + int(
        (np.asarray(pk.light_vals) != 0).sum()
    )
    assert adjoint_nnz == nnz


def test_pack_memory_smaller_than_dense():
    S = _random_compressed(64, 2048, 0.1)
    pk = pack_dense(S)
    assert pk.nbytes < S.nbytes
