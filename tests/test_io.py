"""I/O readers/writers: model grid, model values, data points, sensit cache."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.config.parfile import GravParams
from tomofastx_tpu.io import data_io, model_io
from tomofastx_tpu.io.sensit_cache import try_read_kernel_cache, write_kernel_cache
from tomofastx_tpu.models.model import ModelState
from tomofastx_tpu.ops.sensitivity import SensitKernel

MANSF = "/root/reference/data/gravmag/mansf_slice"


def test_read_model_grid_mansf():
    g = model_io.read_model_grid(f"{MANSF}/true_model_grav_3litho-grid.txt", 2, 128, 32)
    assert g.nelements_total == 8192
    assert np.all(g.X2 > g.X1) and np.all(g.Z2 > g.Z1)
    # Structured spacings exist.
    assert g.dX().shape == (2,) and g.dY().shape == (128,) and g.dZ().shape == (32,)
    np.testing.assert_allclose(g.dX(), 127.0)


def test_read_model_values_mansf():
    vals = model_io.read_model_values(f"{MANSF}/true_model_grav_3litho-values.txt", 8192, 1)
    assert vals.shape == (1, 8192)


def test_read_data_grid_mansf():
    d = data_io.read_data_points(f"{MANSF}/data_grid.txt", 256, 1, grid_only=True)
    assert d.X.shape == (256,)
    assert np.all(d.Z == -0.1)  # 0.1 m above surface in depth space


def test_data_roundtrip(tmp_path):
    d = data_io.read_data_points(f"{MANSF}/data_grid.txt", 256, 1, grid_only=True)
    d.val_calc = np.random.default_rng(0).normal(size=(256, 1))
    path = str(tmp_path / "data" / "out.txt")
    data_io.write_data_points(d, path, which=2)
    d2 = data_io.read_data_points(path, 256, 1, grid_only=False)
    np.testing.assert_allclose(d2.val_meas, d.val_calc, rtol=1e-8)


def test_model_ascii_roundtrip(tmp_path):
    g = model_io.read_model_grid(f"{MANSF}/true_model_grav_3litho-grid.txt", 2, 128, 32)
    m = ModelState(grid=g, ncomponents=1)
    m.val = np.random.default_rng(1).normal(size=(1, 8192))
    path = str(tmp_path / "model.txt")
    model_io.write_model_ascii(m, path)
    back = model_io.read_model_values(path, 8192, 1)
    np.testing.assert_allclose(back, m.val, rtol=1e-8)


def test_bounds_file(tmp_path):
    g = model_io.read_model_grid(f"{MANSF}/true_model_grav_3litho-grid.txt", 2, 128, 32)
    m = ModelState(grid=g)
    m.allocate_bound_arrays(3)
    model_io.read_bound_constraints(m, f"{MANSF}/grav_bound_constraints_3litho.txt")
    assert m.min_bound.shape == (3, 8192)
    assert np.all(m.min_bound <= m.max_bound)
    assert m.bound_weight.shape == (8192,)


def test_sensit_cache_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    nd, ndc, nmc, nx, ny, nz = 5, 1, 1, 4, 3, 2
    N = nx * ny * nz
    S = rng.normal(size=(nd * ndc, nmc * N)).astype(np.float32)
    S[np.abs(S) < 0.7] = 0.0  # sparsify like a compressed kernel
    kern = SensitKernel(
        S=jnp.asarray(S), ndata=nd, ndata_components=ndc, nmodel_components=nmc,
        nx=nx, ny=ny, nz=nz, compression_type=1, comp_error=0.125,
    )
    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, compression_type=1,
                     depth_weighting_type=1)
    cw = rng.random(N) + 1.0
    cache = str(tmp_path / "SENSIT")
    write_kernel_cache(cache, par, kern, cw)

    kern2 = try_read_kernel_cache(cache + "/", par, type("G", (), dict(nx=nx, ny=ny, nz=nz))())
    assert kern2 is not None
    np.testing.assert_array_equal(np.asarray(kern2.S), S)
    assert kern2.comp_error == pytest.approx(0.125)

    # Depth weight file roundtrip.
    from tomofastx_tpu.inversion.workflow import _read_depth_weight_file

    w = _read_depth_weight_file(cache, 0)
    np.testing.assert_allclose(w, cw)


def test_vtk_files_written(tmp_path):
    from tomofastx_tpu.io import vtk

    g = model_io.read_model_grid(f"{MANSF}/true_model_grav_3litho-grid.txt", 2, 128, 32)
    val = np.random.default_rng(3).normal(size=(8192, 1))
    p1 = str(tmp_path / "m.vtk")
    vtk.write_struct_grid(p1, val, g.X1, g.Y1, g.Z1, g.X2, g.Y2, g.Z2, g.nx, g.ny, g.nz)
    head = open(p1, "rb").read(80)
    assert head.startswith(b"# vtk DataFile Version 3.0\nTomofast-x\nBINARY\nDATASET STRUCTURED_GRID\n")
    p2 = str(tmp_path / "lego.vtk")
    vtk.write_lego_grid(p2, val, g.X1, g.Y1, g.Z1, g.X2, g.Y2, g.Z2, g.nx, g.ny, g.nz,
                        i1=2, i2=2)
    assert os.path.getsize(p2) > 0
    p3 = str(tmp_path / "pts.vtk")
    vtk.write_points(p3, val[:256], g.X1[:256], g.Y1[:256], g.Z1[:256])
    assert os.path.getsize(p3) > 0


def test_sensit_cache_roundtrip_multicomponent(tmp_path):
    """Cache format with nmodel_components = 3 and ndata_components = 3
    (row blocks ordered per data point: d-major, then k,
    sensitivity_gravmag.F90:221-311)."""
    rng = np.random.default_rng(5)
    nd, ndc, nmc, nx, ny, nz = 4, 3, 3, 4, 3, 2
    N = nx * ny * nz
    S = rng.normal(size=(nd * ndc, nmc * N)).astype(np.float32)
    S[np.abs(S) < 0.8] = 0.0
    kern = SensitKernel(
        S=jnp.asarray(S), ndata=nd, ndata_components=ndc, nmodel_components=nmc,
        nx=nx, ny=ny, nz=nz, compression_type=1, comp_error=0.0,
    )
    from tomofastx_tpu.config.parfile import MagParams

    par = MagParams(nx=nx, ny=ny, nz=nz, ndata=nd, compression_type=1,
                    depth_weighting_type=1, nmodel_components=nmc,
                    ndata_components=ndc)
    cache = str(tmp_path / "SENSIT")
    write_kernel_cache(cache, par, kern, np.ones(N))
    kern2 = try_read_kernel_cache(cache + "/", par, type("G", (), dict(nx=nx, ny=ny, nz=nz))())
    np.testing.assert_array_equal(np.asarray(kern2.S), S)


def _write_multirank_cache(cache, par, S4, cw, nbproc, row_split):
    """Synthesize a reference-style multi-rank cache file set: contiguous
    row blocks per rank (sensitivity_gravmag.F90:141-153, 179-189), global
    idata indices, shared meta/nnz/weight files."""
    os.makedirs(cache, exist_ok=True)
    nd, ndc, nmc, N = S4.shape[0], S4.shape[1], S4.shape[2], S4.shape[3]
    nnz_per_cell = np.zeros(N, np.int32)
    nnz_total = 0
    row0 = 0
    for rank in range(nbproc):
        nloc = row_split[rank]
        with open(f"{cache}/sensit_grav_{nbproc}_{rank}", "wb") as f:
            np.array([nloc, nd, N, rank, nbproc], np.int32).tofile(f)
            for b in range(nloc):
                idata = row0 + b + 1
                for d in range(ndc):
                    for k in range(nmc):
                        row = S4[idata - 1, d, k]
                        cols = np.nonzero(row)[0].astype(np.int32)
                        nnz_per_cell[cols] += 1
                        nnz_total += cols.size
                        np.array([idata, cols.size, k + 1, d + 1], np.int32).tofile(f)
                        if cols.size:
                            (cols + 1).tofile(f)
                            row[cols].astype(np.float32).tofile(f)
        row0 += nloc
    with open(f"{cache}/sensit_grav_meta.txt", "w") as f:
        f.write(f" {par.nx} {par.ny} {par.nz} {nd}\n")
        f.write(f" {nbproc} 4 {par.depth_weighting_type}\n")
        f.write(f" {par.compression_type} 1.000000000E-01\n")
        f.write(f" {nmc} {ndc}\n")
        f.write(f" {nnz_total}\n")
    with open(f"{cache}/sensit_grav_nnz", "wb") as f:
        np.array([N], np.int32).tofile(f)
        nnz_per_cell.tofile(f)
    with open(f"{cache}/sensit_grav_weight", "wb") as f:
        np.array([N], np.int32).tofile(f)
        np.asarray(cw, np.float64).tofile(f)


def test_sensit_cache_multirank_readers(tmp_path):
    """A synthesized nbproc = 3 file set (what a 3-rank Fortran run writes,
    sensitivity_gravmag.F90:141-153) must load identically through the
    dense reader AND the streamed packed reader."""
    from tomofastx_tpu.io.sensit_cache import read_kernel_cache_packed

    rng = np.random.default_rng(9)
    nd, ndc, nmc, nx, ny, nz = 5, 1, 1, 4, 3, 2
    N = nx * ny * nz
    S4 = rng.normal(size=(nd, ndc, nmc, N)).astype(np.float32)
    S4[np.abs(S4) < 0.6] = 0.0
    cw = rng.random(N) + 1.0
    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, compression_type=1,
                     depth_weighting_type=1)
    cache = str(tmp_path / "SENSIT")
    _write_multirank_cache(cache, par, S4, cw, nbproc=3, row_split=[2, 2, 1])

    grid = type("G", (), dict(nx=nx, ny=ny, nz=nz))()
    dense = try_read_kernel_cache(cache, par, grid)
    np.testing.assert_array_equal(
        np.asarray(dense.S), S4.reshape(nd * ndc, nmc * N)
    )

    pk, meta = read_kernel_cache_packed(cache, par, grid)
    assert meta["nbproc"] == 3 and meta["nnz"] == np.count_nonzero(S4)
    x = rng.normal(size=(nmc * N,))
    u = rng.normal(size=(nd * ndc,))
    Sd = S4.reshape(nd * ndc, nmc * N).astype(np.float64)
    np.testing.assert_allclose(np.asarray(pk.matvec(jnp.asarray(x))), Sd @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pk.rmatvec(jnp.asarray(u))), Sd.T @ u, rtol=1e-12)


def test_sensit_cache_packed_reader_multicomponent(tmp_path):
    """Packed streamed reader with nmc = 3, ndc = 3 (matrix columns are
    k * N + cell; the _nnz histogram no longer equals the column histogram,
    so the reader rebuilds it)."""
    from tomofastx_tpu.config.parfile import MagParams
    from tomofastx_tpu.io.sensit_cache import read_kernel_cache_packed

    rng = np.random.default_rng(12)
    nd, ndc, nmc, nx, ny, nz = 4, 3, 3, 4, 3, 2
    N = nx * ny * nz
    S = rng.normal(size=(nd * ndc, nmc * N)).astype(np.float32)
    S[np.abs(S) < 0.8] = 0.0
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
    pk, meta = read_kernel_cache_packed(cache, par, grid)
    Sd = S.astype(np.float64)
    x = rng.normal(size=(nmc * N,))
    u = rng.normal(size=(nd * ndc,))
    np.testing.assert_allclose(np.asarray(pk.matvec(jnp.asarray(x))), Sd @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pk.rmatvec(jnp.asarray(u))), Sd.T @ u, rtol=1e-12)


def test_streamed_build_cache_reload_solve(tmp_path):
    """Capacity-mode invariant: build with row_sink (the dense (nd, N)
    array is never allocated), cache, reload packed, and the packed matvec
    equals the dense build's matvec (VERDICT round-1 item 4)."""
    from tests.util_fixtures import make_base_config
    from tomofastx_tpu.config.parfile import GRAV
    from tomofastx_tpu.io.sensit_cache import (
        SensitStreamWriter,
        read_kernel_cache_packed,
    )
    from tomofastx_tpu.ops import sensitivity as sens

    cfg, grid_path, data_path = make_base_config(str(tmp_path), 6, 5, 4, ndata=11)
    par = cfg.problem_params(GRAV)
    par.compression_type = 1
    par.compression_rate = 0.3
    grid = model_io.read_model_grid(grid_path, 6, 5, 4)
    data = data_io.read_data_points(data_path, 11, 1, grid_only=True)
    cw = sens.calculate_depth_weight(par, grid, data)

    k_dense = sens.compute_sensitivity(par, grid, data, cw, batch_size=4)

    cache = str(tmp_path / "SENSIT")
    w = SensitStreamWriter(cache, par, grid, cw, par.compression_type)
    k_meta = sens.compute_sensitivity(
        par, grid, data, cw, batch_size=4, row_sink=w.write_chunk
    )
    assert k_meta.S is None
    w.finalize(k_meta.comp_error)
    assert k_meta.nnz == k_dense.nnz and k_meta.comp_error == k_dense.comp_error

    pk, meta = read_kernel_cache_packed(cache, par, grid)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(pk.ncols,)))
    u = jnp.asarray(rng.normal(size=(pk.nrows,)))
    Sd = np.asarray(k_dense.S, np.float64)
    np.testing.assert_allclose(np.asarray(pk.matvec(x)), Sd @ np.asarray(x), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(pk.rmatvec(u)), Sd.T @ np.asarray(u), rtol=1e-12)


def test_chunk_plan_shapes():
    """_chunk_plan must cover [0, nd) exactly, stay within the batch bound,
    and use at most two distinct chunk sizes (each distinct size is a
    separate XLA compile of build_chunk — minutes over the TPU tunnel)."""
    from tomofastx_tpu.ops.sensitivity import _chunk_plan

    for nd, batch in [(1, 256), (255, 256), (256, 256), (257, 256),
                      (2025, 256), (4096, 256), (113, 32), (57057, 256),
                      (10007, 64), (8, 8)]:
        plan = _chunk_plan(nd, batch)
        starts = [s for s, _ in plan]
        sizes = [n for _, n in plan]
        assert starts[0] == 0
        assert all(starts[i + 1] == starts[i] + sizes[i] for i in range(len(plan) - 1))
        assert starts[-1] + sizes[-1] == nd
        assert max(sizes) <= batch
        assert len(set(sizes)) <= 2
    # Exact-divisor preference: 2025 = 9 x 225 picks one shape.
    assert len({n for _, n in _chunk_plan(2025, 256)}) == 1


def test_sensit_write_cache_opt_out(tmp_path):
    """tpu.sensitWriteCache = 0 skips persisting the kernel cache (the
    full-kernel device->host pull) but the inversion still runs."""
    import os

    from tomofastx_tpu.config.parfile import GRAV, read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    REF = "/root/reference"
    cfg = read_parfile(f"{REF}/parfiles/hamersley/Parfile_hamersley_grav.txt")
    cfg.path_output = str(tmp_path) + "/"
    cfg.inversion.ninversions = 2
    cfg.grav.sensit_write = 0
    res = solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)
    assert res.cost_data[GRAV] < 0.5
    sensit_dir = os.path.join(str(tmp_path), "SENSIT")
    assert not os.path.exists(sensit_dir) or not any(
        f.startswith("sensit_grav") for f in os.listdir(sensit_dir)
    )
