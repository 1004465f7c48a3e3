"""Tile-union operator (capacity mode v2): pack, stream, adjoint, weights."""

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.ops.tile_kernel import (
    TileKernelBuilder,
    apply_row_weights_tiled,
    pack_tiles,
    tile_kernel_from_cache,
)


def _rand_sparse(rng, nrows, ncols, keep=0.2):
    S = rng.normal(size=(nrows, ncols)).astype(np.float32)
    S[rng.random(S.shape) > keep] = 0.0
    return S


def test_pack_tiles_matvec_rmatvec():
    rng = np.random.default_rng(0)
    nrows, ncols = 27, 333  # uneven vs TM=8 and BLOCK=128
    S = _rand_sparse(rng, nrows, ncols)
    tk = pack_tiles(S)
    Sd = S.astype(np.float64)
    x = rng.normal(size=(ncols,))
    u = rng.normal(size=(nrows,))
    np.testing.assert_allclose(
        np.asarray(tk.matvec(jnp.asarray(x))), Sd @ x, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tk.rmatvec(jnp.asarray(u))), Sd.T @ u, rtol=1e-4, atol=1e-4
    )


def test_streaming_pack_equals_one_shot():
    rng = np.random.default_rng(1)
    nrows, ncols = 40, 256
    S = _rand_sparse(rng, nrows, ncols)
    one = pack_tiles(S)

    b = TileKernelBuilder(nrows, ncols)
    for s in range(0, nrows, 7):  # ragged chunks
        b.scan_chunk(S[s : s + 7], s)
    b.finalize_scan()
    for s in range(0, nrows, 7):
        b.fill_chunk(S[s : s + 7], s)
    streamed = b.build()

    for a, c in zip(
        (one.uvals, one.ubidx, one.uvalsT, one.ubidxT),
        (streamed.uvals, streamed.ubidx, streamed.uvalsT, streamed.ubidxT),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_tile_kernel_from_cache(tmp_path):
    """Cache -> TileKernel streaming path == dense, incl. multicomponent."""
    from tomofastx_tpu.config.parfile import MagParams
    from tomofastx_tpu.io.sensit_cache import write_kernel_cache
    from tomofastx_tpu.ops.sensitivity import SensitKernel

    rng = np.random.default_rng(3)
    nd, ndc, nmc, nx, ny, nz = 6, 3, 3, 4, 3, 2
    N = nx * ny * nz
    S = _rand_sparse(rng, nd * ndc, nmc * N, keep=0.4)
    kern = SensitKernel(
        S=jnp.asarray(S), ndata=nd, ndata_components=ndc, nmodel_components=nmc,
        nx=nx, ny=ny, nz=nz, compression_type=1, comp_error=0.0,
    )
    par = MagParams(nx=nx, ny=ny, nz=nz, ndata=nd, compression_type=1,
                    depth_weighting_type=1, nmodel_components=nmc,
                    ndata_components=ndc)
    cache = str(tmp_path / "SENSIT")
    write_kernel_cache(cache, par, kern, np.ones(N))
    grid = type("G", (), dict(nx=nx, ny=ny, nz=nz))()
    tk, meta = tile_kernel_from_cache(cache, par, grid)
    assert meta["nnz"] == np.count_nonzero(S)
    Sd = S.astype(np.float64)
    x = rng.normal(size=(nmc * N,))
    u = rng.normal(size=(nd * ndc,))
    np.testing.assert_allclose(np.asarray(tk.matvec(jnp.asarray(x))), Sd @ x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tk.rmatvec(jnp.asarray(u))), Sd.T @ u, rtol=1e-4, atol=1e-4)


def test_apply_row_weights_tiled():
    rng = np.random.default_rng(5)
    nrows, ncols = 20, 200
    S = _rand_sparse(rng, nrows, ncols)
    w = (1.0 + rng.random(nrows)).astype(np.float32)
    tk = apply_row_weights_tiled(pack_tiles(S), w)
    Sw = (S * w[:, None]).astype(np.float64)
    x = rng.normal(size=(ncols,))
    u = rng.normal(size=(nrows,))
    np.testing.assert_allclose(np.asarray(tk.matvec(jnp.asarray(x))), Sw @ x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tk.rmatvec(jnp.asarray(u))), Sw.T @ u, rtol=1e-4, atol=1e-4)


def test_tiled_workflow_matches_dense(tmp_path):
    """tpu.kernelFormat = tiled reproduces the dense Mansfield solve."""
    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    REF = "/root/reference"
    cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
    cfg.path_output = str(tmp_path) + "/tiled/"
    cfg.inversion.ninversions = 3
    cfg.grav.kernel_format = "tiled"
    cfg.magn.kernel_format = "tiled"
    res_t = solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)

    cfg2 = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
    cfg2.path_output = str(tmp_path) + "/dense/"
    cfg2.inversion.ninversions = 3
    res_d = solve_problem_joint_gravmag(cfg2, base_dir=REF, verbose=False)

    # f32 tile values vs f32 dense values, different summation order.
    np.testing.assert_allclose(res_t.models[0].val, res_d.models[0].val, atol=2e-6)
