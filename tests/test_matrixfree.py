"""Matrix-free sensitivity operator: must match the stored dense kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.util_fixtures import make_base_config, write_values_file
from tomofastx_tpu.config.parfile import GRAV, MAGN
from tomofastx_tpu.io import data_io, model_io
from tomofastx_tpu.ops import sensitivity as sens
from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

NX, NY, NZ = 5, 6, 4
N = NX * NY * NZ


def _setup(tmp_path, problem="grav", data_type=1):
    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=20, problem=problem)
    par = cfg.problem_params(GRAV if problem == "grav" else MAGN)
    par.data_type = data_type
    grid = model_io.read_model_grid(grid_path, NX, NY, NZ)
    data = data_io.read_data_points(data_path, 20, 1, grid_only=True)
    cw = sens.calculate_depth_weight(par, grid, data)
    return par, grid, data, cw


@pytest.mark.parametrize(
    "problem,data_type,nmc,ndc",
    [
        ("grav", 1, 1, 1),
        ("grav", 2, 1, 1),
        ("grav", 2, 1, 6),
        ("magn", 1, 1, 1),
        ("magn", 1, 1, 3),
        ("magn", 1, 3, 1),
        ("magn", 1, 3, 3),
    ],
)
def test_matrixfree_equals_dense(tmp_path, problem, data_type, nmc, ndc):
    par, grid, data, cw = _setup(tmp_path, problem, data_type)
    par.nmodel_components = nmc
    par.ndata_components = ndc
    data.ncomponents = ndc
    # Exactly f32-representable weights so the stored path's float32
    # combined-weight rounding (sensitivity_gravmag.F90:837) is lossless and
    # the two operators agree to f64 ulp.
    pw = 1.25
    dw = 1.0 + np.random.default_rng(3).integers(0, 256, size=(20, ndc)) / 256.0

    dense = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    dense = sens.apply_row_weights(dense, pw, dw)
    mf = make_matrixfree_kernel(par, grid, data, cw, pw, dw, jnp.float64, chunk=8)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=nmc * N))
    u = jnp.asarray(rng.normal(size=20 * ndc))

    # The stored path rounds problem*data weights to float32 (reference:
    # combined_weight is MATRIX_PRECISION, sensitivity_gravmag.F90:837);
    # matrix-free applies them at solver precision -> f32-level agreement.
    np.testing.assert_allclose(
        np.asarray(mf.matvec(x)), np.asarray(dense.S.astype(jnp.float64) @ x), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(mf.rmatvec(u)), np.asarray(dense.S.astype(jnp.float64).T @ u), rtol=1e-10
    )


def test_matrixfree_e2e(tmp_path):
    """Full inversion with tpu.kernelFormat = matrixfree matches dense."""
    import os

    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=20)
    synth = os.path.join(tmp, "synth.txt")
    vals = np.zeros((N, 1))
    vals[30:50] = 250.0
    write_values_file(synth, vals)
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 2

    cfg.grav.kernel_format = "matrixfree"
    res_mf = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    cfg.path_output = tmp + "/out_dense/"
    cfg.grav.kernel_format = "dense"
    res_d = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    # The dense path rounds the stored kernel to float32
    # (global_typedefs.F90:42); matrix-free regenerates rows at solver
    # precision — so agreement is at the f32-kernel level, not bitwise.
    np.testing.assert_allclose(
        res_mf.models[GRAV].val, res_d.models[GRAV].val, rtol=1e-4, atol=1e-3
    )


def test_matrixfree_e2e_meshed_lattice(tmp_path):
    """Full matrix-free inversion on the 8-device mesh keeps the
    corner-lattice fast operator (observation-sharded, not the general
    per-cell fallback) and matches the unsharded solve."""
    import os

    import jax

    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel
    from tomofastx_tpu.parallel.mesh import make_mesh, shard_kernel

    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=20)
    synth = os.path.join(tmp, "synth.txt")
    vals = np.zeros((N, 1))
    vals[30:50] = 250.0
    write_values_file(synth, vals)
    cfg.grav.use_synthetic_model = 1
    cfg.grav.synthetic_model_file = synth
    cfg.inversion.ninversions = 2
    cfg.grav.kernel_format = "matrixfree"

    res_plain = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)

    # The meshed build keeps the lattice fast path (pad_cells_to is
    # irrelevant to it: it shards over observations, not cells).
    from tomofastx_tpu.config.parfile import GRAV as _G
    from tomofastx_tpu.io import data_io, model_io
    from tomofastx_tpu.ops import sensitivity as sens
    from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

    par = cfg.problem_params(_G)
    grid = model_io.read_model_grid(grid_path, NX, NY, NZ)
    data = data_io.read_data_points(data_path, 20, 1, grid_only=True)
    cw = sens.calculate_depth_weight(par, grid, data)
    dw = np.ones((par.ndata, 1))
    op = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, dw, pad_cells_to=8
    )
    assert isinstance(op, LatticeMatrixFreeKernel)
    assert shard_kernel(op, make_mesh(8)).mesh is not None

    cfg.path_output = tmp + "/out_mesh/"
    mesh = make_mesh(8)
    res_mesh = solve_problem_joint_gravmag(
        cfg, base_dir="/", verbose=False, mesh=mesh
    )
    np.testing.assert_allclose(
        res_mesh.models[GRAV].val, res_plain.models[GRAV].val,
        rtol=1e-8, atol=1e-10,
    )


def test_mixed_precision_build(tmp_path):
    """near_field_f64 K-nearest patching: equals the full-f64 kernel for the
    patched cells, f32-level elsewhere."""
    par, grid, data, cw = _setup(tmp_path, "grav", 1)
    k64 = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    kmx = sens.compute_sensitivity(
        par, grid, data, cw, jnp.float32, jnp.float64, near_field_f64=16
    )
    S64 = np.asarray(k64.S)
    Smx = np.asarray(kmx.S)
    # Identify per-row nearest-16 cells and check exact agreement there.
    xc = 0.5 * (grid.X1 + grid.X2)
    yc = 0.5 * (grid.Y1 + grid.Y2)
    zc = 0.5 * (grid.Z1 + grid.Z2)
    for r in range(data.ndata):
        d2 = (xc - data.X[r]) ** 2 + (yc - data.Y[r]) ** 2 + (zc - data.Z[r]) ** 2
        # Distance ties at the cut make the exact top-16 set ambiguous; only
        # cells strictly inside the cut are guaranteed patched.
        cut = np.sort(d2)[15]
        near = np.nonzero(d2 < cut)[0]
        np.testing.assert_allclose(Smx[r, near], S64[r, near], rtol=1e-12)
    # Everywhere: far-field entries are heavily cancelled in f32, so their
    # *relative* error is large while the absolute error stays negligible
    # against the row scale — which is exactly why the near-field is the
    # part that needs the f64 patch. The operator-level metric is the
    # Frobenius error.
    assert np.linalg.norm(Smx - S64) < 1e-3 * np.linalg.norm(S64)


def test_matrixfree_e2e_magnetization_vector(tmp_path):
    """Regression: matrix-free mode with nModelComponents = 3 used to crash
    in _calculate_data on a (3N,)/(N,) broadcast."""
    import os

    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    tmp = str(tmp_path)
    cfg, grid_path, data_path = make_base_config(tmp, NX, NY, NZ, ndata=20, problem="magn")
    cfg.magn.nmodel_components = 3
    cfg.inversion.nmodel_components = 3
    synth = os.path.join(tmp, "synth3.txt")
    vals = np.zeros((N, 3))
    vals[30:50] = 2.0
    write_values_file(synth, vals)
    cfg.magn.use_synthetic_model = 1
    cfg.magn.synthetic_model_file = synth
    cfg.magn.kernel_format = "matrixfree"
    cfg.inversion.ninversions = 2

    res = solve_problem_joint_gravmag(cfg, base_dir="/", verbose=False)
    assert np.all(np.isfinite(res.models[MAGN].val))
    assert res.cost_data[MAGN] < 0.5


def test_matrixfree_boundary_guard(tmp_path):
    """An observation point coinciding with a model-grid corner must abort
    at operator construction with the reference's message
    (gravity_field.f90:99-107), not propagate NaNs into the solve."""
    par, grid, data, cw = _setup(tmp_path, "grav", 1)
    # Park one observation point exactly on the first cell's corner.
    data.X[0] = float(np.asarray(grid.X1[0]))
    data.Y[0] = float(np.asarray(grid.Y1[0]))
    data.Z[0] = float(np.asarray(grid.Z1[0]))
    dw = np.ones((par.ndata, par.ndata_components))
    with pytest.raises(ValueError, match="Adjust the model grid"):
        make_matrixfree_kernel(par, grid, data, cw, 1.0, dw, jnp.float64)


def test_matrixfree_padded_cells_equal_unpadded(tmp_path):
    """Cell-axis padding (dummy far prisms, cw = 0) must not change the
    operator."""
    par, grid, data, cw = _setup(tmp_path)
    dw = np.ones((par.ndata, par.ndata_components))
    # force_generic: padding invariance is a property of the general
    # per-cell operator (the lattice fast path never pads cells and its
    # different summation order is covered by its own parity test).
    op = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, dw, jnp.float64, force_generic=True
    )
    opp = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, dw, jnp.float64, pad_cells_to=7,
        force_generic=True,
    )
    assert opp.N % 7 == 0 and opp.ncols == op.ncols
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(op.ncols,)))
    u = jnp.asarray(rng.normal(size=(par.ndata,)))
    np.testing.assert_allclose(np.asarray(opp.matvec(x)), np.asarray(op.matvec(x)), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(opp.rmatvec(u)), np.asarray(op.rmatvec(u)), rtol=1e-13)


def test_lattice_kernel_matches_generic(tmp_path):
    """The corner-lattice factorization (LatticeMatrixFreeKernel) must
    reproduce the general per-cell operator: same corner values (wrapped
    atan2 / armored logs) summed in a different order."""
    from tomofastx_tpu.ops.matrixfree import (
        LatticeMatrixFreeKernel,
        MatrixFreeKernel,
    )

    par, grid, data, cw = _setup(tmp_path)
    fast = make_matrixfree_kernel(
        par, grid, data, cw, 2.0, data.weight, jnp.float64
    )
    slow = make_matrixfree_kernel(
        par, grid, data, cw, 2.0, data.weight, jnp.float64, force_generic=True
    )
    assert isinstance(fast, LatticeMatrixFreeKernel)
    assert isinstance(slow, MatrixFreeKernel)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N,)))
    u = jnp.asarray(rng.normal(size=(data.ndata,)))
    np.testing.assert_allclose(
        np.asarray(fast.matvec(x)), np.asarray(slow.matvec(x)), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(fast.rmatvec(u)), np.asarray(slow.rmatvec(u)),
        rtol=1e-9, atol=1e-24,
    )
    # Adjointness of the lattice pair itself.
    lhs = float(jnp.dot(fast.matvec(x), u))
    rhs = float(jnp.dot(x, fast.rmatvec(u)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize(
    "problem,data_type,nmc,ndc",
    [
        ("grav", 1, 1, 1),
        ("grav", 2, 1, 6),
        ("magn", 1, 1, 1),
        ("magn", 1, 3, 3),
    ],
)
def test_lattice_build_matches_percell(tmp_path, problem, data_type, nmc, ndc):
    """The corner-lattice dense kernel build (tpu.latticeBuild = 1, the
    default on tensor-product grids) reproduces the per-cell build: same
    corner expressions, different summation order, so f64-built values
    agree to summation rounding and nearly all f32-stored entries are
    bitwise identical."""
    par, grid, data, cw = _setup(tmp_path, problem, data_type)
    par.nmodel_components = nmc
    par.ndata_components = ndc
    data.ncomponents = ndc

    k_lat = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    par.lattice_build = 0
    k_pc = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)

    A = np.asarray(k_lat.S)
    B = np.asarray(k_pc.S)
    scale = np.max(np.abs(B), axis=1, keepdims=True)
    np.testing.assert_allclose(A / scale, B / scale, rtol=0, atol=1e-11)


def test_lattice_build_observation_on_lattice_line(tmp_path):
    """Observations exactly above a lattice node are VALID geometry (they
    touch no cell face) and must build finite magnetic kernels. Regression
    for the round-3 convention fix: with obs-minus-corner arguments the
    Sharma log(R + rz) antiderivative was singular on the ray pointing
    DOWN through the grid, so such points produced inf (the per-cell
    sharmbox uses corner-minus-obs, magnetic_field.f90:330-335, whose
    singular ray points up, away from the model)."""
    par, grid, data, cw = _setup(tmp_path, "magn")
    data.X = data.X.copy()
    data.Y = data.Y.copy()
    # Place points exactly above interior lattice nodes (cell size 100).
    data.X[:4] = 200.0
    data.Y[:4] = 100.0 * np.arange(1, 5)
    cw = sens.calculate_depth_weight(par, grid, data)

    k_lat = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    assert np.all(np.isfinite(np.asarray(k_lat.S)))
    par.lattice_build = 0
    k_pc = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    scale = np.max(np.abs(np.asarray(k_pc.S)), axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(k_lat.S) / scale, np.asarray(k_pc.S) / scale, rtol=0, atol=1e-11
    )
    # The lattice OPERATOR handles these points too (same corner fields).
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight, jnp.float64)
    assert np.all(np.isfinite(np.asarray(op.matvec(jnp.ones((op.ncols,))))))


def test_lattice_detection_rejects_irregular(tmp_path):
    """A grid with one shifted cell is NOT a tensor-product lattice; the
    factory must fall back to the general per-cell operator."""
    from tomofastx_tpu.ops.matrixfree import MatrixFreeKernel, detect_lattice

    par, grid, data, cw = _setup(tmp_path)
    assert detect_lattice(grid) is not None
    grid.Z1 = grid.Z1.copy()
    grid.Z1[3] += 1.0  # break the lattice
    assert detect_lattice(grid) is None
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight, jnp.float64)
    assert isinstance(op, MatrixFreeKernel)


def test_lattice_kernel_boundary_guard(tmp_path):
    """A corner-coincident observation point must abort at construction
    (gravity_field.f90:99-107), same as the general operator."""
    par, grid, data, cw = _setup(tmp_path)
    data.X = data.X.copy()
    data.Y = data.Y.copy()
    data.Z = data.Z.copy()
    data.X[0], data.Y[0], data.Z[0] = 0.0, 0.0, 0.0  # grid corner
    with pytest.raises(ValueError, match="Adjust the model grid"):
        make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight, jnp.float64)


def test_lattice_kernel_magnetic_matches_generic(tmp_path):
    """Magnetic corner-lattice factorization (5 Sharma antiderivative
    channels) vs the general per-cell sharmbox operator."""
    from tomofastx_tpu.ops.matrixfree import (
        LatticeMatrixFreeKernel,
        MatrixFreeKernel,
    )

    par, grid, data, cw = _setup(tmp_path, problem="magn")
    par.nmodel_components, par.ndata_components = 3, 3
    dw = np.ones((par.ndata, 3))
    fast = make_matrixfree_kernel(par, grid, data, cw, 1.5, dw, jnp.float64)
    slow = make_matrixfree_kernel(
        par, grid, data, cw, 1.5, dw, jnp.float64, force_generic=True
    )
    assert isinstance(fast, LatticeMatrixFreeKernel)
    assert isinstance(slow, MatrixFreeKernel)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3 * N,)))
    u = jnp.asarray(rng.normal(size=(3 * data.ndata,)))
    # The f64 generic path computes log-RATIOS (reference literal form);
    # the lattice differences per-corner logs — equal up to ~1 ulp of the
    # log magnitudes, so parity is tight but not bitwise.
    np.testing.assert_allclose(
        np.asarray(fast.matvec(x)), np.asarray(slow.matvec(x)),
        rtol=1e-8, atol=1e-12,
    )
    ref = np.asarray(slow.rmatvec(u))
    np.testing.assert_allclose(
        np.asarray(fast.rmatvec(u)), ref,
        rtol=1e-7, atol=1e-8 * float(np.max(np.abs(ref))),
    )
    lhs = float(jnp.dot(fast.matvec(x), u))
    rhs = float(jnp.dot(x, fast.rmatvec(u)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_lattice_magnetic_borehole_falls_back(tmp_path):
    """An observation point inside the grid (borehole) needs the
    6-subprism branch — the factory must keep the general operator."""
    from tomofastx_tpu.ops.matrixfree import MatrixFreeKernel

    par, grid, data, cw = _setup(tmp_path, problem="magn")
    data.Z = data.Z.copy()
    data.Z[0] = 75.0  # inside the volume
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight, jnp.float64)
    assert isinstance(op, MatrixFreeKernel)


def test_lattice_selected_for_ftg_and_magnetics(tmp_path):
    """The corner-lattice fast path covers gravity g_z, FTG (Gzz/full
    tensor) and all magnetic combos on lattice grids."""
    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel

    for problem, data_type, nmc, ndc in [
        ("grav", 1, 1, 1), ("grav", 2, 1, 1), ("grav", 2, 1, 6),
        ("magn", 1, 1, 1), ("magn", 1, 3, 3),
    ]:
        par, grid, data, cw = _setup(tmp_path, problem, data_type)
        par.nmodel_components, par.ndata_components = nmc, ndc
        dw = np.ones((par.ndata, ndc))
        op = make_matrixfree_kernel(par, grid, data, cw, 1.0, dw, jnp.float64)
        assert isinstance(op, LatticeMatrixFreeKernel), (problem, data_type, nmc, ndc)


def test_refine_forward_mixed_formats(tmp_path):
    """Joint run with one matrix-free and one stored-kernel problem +
    tpu.refineForward: the stored-kernel problem must still get an
    exact-physics refinement forward (previously one matrix-free problem
    silently disabled refinement for BOTH)."""
    import os

    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    REF = "/root/reference"
    par = f"{REF}/parfiles/hamersley/Parfile_hamersley_xgrad_joint.txt"
    cfg = read_parfile(par)
    cfg.path_output = str(tmp_path) + "/mixed/"
    cfg.inversion.ninversions = 2
    cfg.grav.kernel_format = "matrixfree"
    cfg.grav.compression_type = 0
    cfg.inversion.compression_type = 0
    cfg.magn.compression_type = 0
    cfg.grav.refine_forward = 1
    cfg.magn.refine_forward = 1
    res = solve_problem_joint_gravmag(cfg, base_dir=REF, verbose=False)
    assert np.all(np.isfinite(res.models[GRAV].val))
    assert np.all(np.isfinite(res.models[MAGN].val))
    assert res.cost_data[GRAV] < 0.5 and res.cost_data[MAGN] < 0.5


def test_f64_build_f32_compress_pipeline(tmp_path):
    """tpu.f64BuildF32Compress = 1: a full-f64 build with <=32-bit storage
    rounds rows to f32 AFTER the f64 physics + depth weighting and runs
    the wavelet + threshold pipeline in f32 (on TPU the emulated-f64
    compression stage is ~20x slower while storage rounds to f32 anyway).
    The stored kernels must agree to f32 rounding of the pipeline; the
    default (0) keeps the reference's f64 pipeline semantics
    (sensitivity_gravmag.F90:237-272)."""
    par, grid, data, cw = _setup(tmp_path, "grav")
    par.compression_type = 1
    par.compression_rate = 0.3

    ref = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float32)
    par.f64_build_f32_compress = 1
    fast = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float32)

    A, B = np.asarray(fast.S), np.asarray(ref.S)
    assert A.dtype == np.float32 and B.dtype == np.float32
    # On the common support the surviving wavelet coefficients agree to
    # f32 pipeline rounding.
    common = (A != 0) & (B != 0)
    scale = np.max(np.abs(B), axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.where(common, A, 0.0) / scale, np.where(common, B, 0.0) / scale,
        rtol=0, atol=2e-6,
    )
    # Structural differences are only threshold TIE-SWAPS: rare (the f32
    # pipeline reorders near-equal coefficients at the selection boundary)
    # and bounded in magnitude by the row's own threshold (~ the smallest
    # kept coefficient).
    mism = (A != 0) != (B != 0)
    assert mism.sum() <= max(4, 0.01 * (B != 0).sum())
    thresh = np.where(
        (B != 0).any(axis=1),
        np.min(np.abs(np.where(B != 0, B, np.inf)), axis=1),
        0.0,
    )
    bad = np.abs(np.where(mism, A + B, 0.0)) > 2.0 * thresh[:, None]
    assert not bad.any()
    # The flag must be inert for f64 storage (pipeline stays f64).
    ref64 = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    par.f64_build_f32_compress = 0
    base64 = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float64)
    np.testing.assert_array_equal(np.asarray(ref64.S), np.asarray(base64.S))


def test_f64_build_f32_compress_parfile_key(tmp_path):
    from tests.util_fixtures import make_base_config
    from tomofastx_tpu.config.parfile import read_parfile

    cfg, _, _ = make_base_config(str(tmp_path), NX, NY, NZ, ndata=4)
    path = tmp_path / "Parfile_key.txt"
    base = open(cfg.source_parfile).read() if getattr(cfg, "source_parfile", None) else ""
    path.write_text(base + "\ntpu.f64BuildF32Compress = 1\n")
    c2 = read_parfile(str(path), warn_unknown=False)
    assert c2.grav.f64_build_f32_compress == 1
    assert c2.magn.f64_build_f32_compress == 1


def test_build_adaptive_oom_restart(tmp_path, monkeypatch):
    """The device-accumulation build's adaptive shrink: when the fused
    chunk program fails with a resource error (TPU scoped-VMEM OOM at
    large B — CLAUDE.md gotcha), the build must restart with a halved
    uniform chunk and produce the identical kernel. The donated kernel
    buffer may have been consumed by the failed call, so the restart
    recreates it from scratch."""
    par, grid, data, cw = _setup(tmp_path, "grav")
    par.lattice_build = 0  # the per-cell path goes through forward_rows
    ref = sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float32)

    real = sens.forward_rows
    calls = {"n": 0, "raised": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["raised"] == 0:
            calls["raised"] = 1
            raise RuntimeError("RESOURCE_EXHAUSTED: fake scoped-vmem OOM")
        return real(*args, **kwargs)

    monkeypatch.setattr(sens, "forward_rows", flaky)
    got = sens.compute_sensitivity(
        par, grid, data, cw, jnp.float64, jnp.float32, batch_size=16
    )
    assert calls["raised"] == 1 and calls["n"] >= 1
    np.testing.assert_array_equal(np.asarray(got.S), np.asarray(ref.S))
    assert got.nnz == ref.nnz


def test_f64_build_batch_auto_cap():
    """Emulated-f64 build programs are auto-capped (round-3 verdict item
    4): XLA compile time for the double-double prism programs blows up
    past ~3.4e7 f64 row-elements per program — B=112 at 1M cells hung the
    remote compiler 26+ min while B=32 compiled in ~4 min, and B=128 at
    262k cells compiled fine (BASELINE.md). The cap reproduces those
    known-good batch sizes without TOMOFASTX_BUILD_BATCH tuning."""
    cap = sens._f64_build_batch_cap
    assert cap(262144) == 128      # 64^3 lattice build: B=128 known-good
    assert cap(1048576) == 32      # 1M lattice: B=32 good, B=112 hung
    assert cap(4194304) == 8       # 4M cells: floor
    # Per-cell build: 8 corner evals per element -> 8x smaller cap
    # (B=32 at 262k is its proven point, round-3 bench_build_ab).
    assert cap(262144, lattice=False) == 32
    assert cap(1048576, lattice=False) == 8
    assert cap(8192) % 8 == 0 and cap(8192) >= 8
    # Monotone non-increasing in N.
    caps = [cap(n) for n in (1, 10_000, 100_000, 1_000_000, 10_000_000)]
    assert caps == sorted(caps, reverse=True)


def test_lattice_f32_far_quad_blend(tmp_path):
    """The f32 corner-lattice operator inherits the closed forms'
    ~(R/h)^3 far-field cancellation noise; with the compensated blend
    (far_quad, round 4) its matvec must track the f64 exact operator to
    ~1e-5 while the unblended f32 operator is orders worse on an
    elongated grid."""
    import dataclasses

    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel

    nx, ny, nz = 96, 4, 4
    n = nx * ny * nz
    h = 100.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid

    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * h, X2=(i + 1) * h,
                Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
    nd = 8
    data = SurveyData(ndata=nd, ncomponents=1)
    # Observations clustered over one end: most cells are far field.
    data.X = (np.arange(nd) + 0.5) * h / 2.0
    data.Y = np.full(nd, 2 * h)
    data.Z = np.full(nd, -1.0)

    from tomofastx_tpu.config.parfile import GravParams

    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    cw = sens.calculate_depth_weight(par, grid, data)

    exact = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, data.weight, jnp.float64,
        force_generic=True, validate=False,
    )
    lat32 = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, data.weight, jnp.float32,
        force_no_fft=True, validate=False,
    )
    assert isinstance(lat32, LatticeMatrixFreeKernel) and lat32.far_quad
    lat32_raw = dataclasses.replace(lat32, far_quad=False)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(n,))
    ref = np.asarray(exact.matvec(jnp.asarray(x)))
    got = np.asarray(lat32.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    raw = np.asarray(lat32_raw.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    err_blend = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    err_raw = np.linalg.norm(raw - ref) / np.linalg.norm(ref)
    assert err_blend < 5e-5, f"blended f32 lattice op deviates {err_blend:.2e}"
    assert err_raw > 10 * err_blend, (
        f"blend no longer matters ({err_raw:.2e} vs {err_blend:.2e}) — "
        "far_quad wiring broken?"
    )


def test_threshold_bisect_matches_topk():
    """The bit-pattern bisection threshold (TOMOFASTX_TOPK=bisect) must
    equal lax.top_k's k-th largest EXACTLY — random rows, heavy ties,
    k at both extremes, zeros."""
    import jax

    rng = np.random.default_rng(11)
    cases = []
    a = np.abs(rng.normal(size=(5, 1000))).astype(np.float32)
    cases.append((a, 150))
    cases.append((a, 1))
    cases.append((a, 999))
    tied = np.repeat(
        np.abs(rng.normal(size=(3, 100))).astype(np.float32), 10, axis=1
    )
    cases.append((tied, 37))
    withz = a.copy()
    withz[:, ::3] = 0.0
    cases.append((withz, 500))
    for arr, k in cases:
        absw = jnp.asarray(arr)
        want = np.asarray(jax.lax.top_k(absw, k)[0][..., -1])
        got = np.asarray(sens._kth_largest_bisect_f32(absw, k))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_compress_lines_bisect_identical(monkeypatch):
    """_compress_lines output (values, nnz, error) is bit-identical under
    either threshold algorithm on an f32 pipeline."""
    rng = np.random.default_rng(5)
    lines = jnp.asarray(rng.normal(size=(4, 1, 1, 8 * 8 * 4)).astype(np.float32))
    ref = sens._compress_lines(lines, 8, 8, 4, 1, 100, jnp.float32)
    monkeypatch.setattr(sens, "THRESHOLD_SELECT", "bisect")
    got = sens._compress_lines(lines, 8, 8, 4, 1, 100, jnp.float32)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_f64_auto_cap_applies_in_build(tmp_path, monkeypatch):
    """The batch decision (_effective_batch_size) must apply
    _f64_build_batch_cap on the TPU backend for emulated-f64 physics,
    honor the TOMOFASTX_BUILD_BATCH override, and leave f32 physics
    uncapped (compile-size-wise) at small N."""
    import jax

    par, grid, data, cw = _setup(tmp_path, "grav")
    n = grid.nelements_total
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    got = sens._effective_batch_size(par, grid, 10_000, jnp.float64,
                                     jnp.float32, 0)
    assert got == min(10_000, sens._f64_build_batch_cap(n))

    monkeypatch.setenv("TOMOFASTX_BUILD_BATCH", "16")
    got = sens._effective_batch_size(par, grid, 10_000, jnp.float64,
                                     jnp.float32, 0)
    assert got == 16
    monkeypatch.delenv("TOMOFASTX_BUILD_BATCH")

    # f32 physics: the f64 compile cap must NOT apply — at this tiny
    # fixture the memory cap is far above the request, so it passes
    # through unchanged.
    got = sens._effective_batch_size(par, grid, 10_000, jnp.float32,
                                     jnp.float32, 0)
    assert got == 10_000
    # ...while a million-cell f64 LATTICE request is capped to the
    # known-good 32, and the per-cell build (8 corner evaluations per
    # element = 8x the emulated-f64 transcendentals) to 8.
    class _BigGrid:
        nelements_total = 1_048_576

    got = sens._effective_batch_size(par, _BigGrid(), 10_000, jnp.float64,
                                     jnp.float32, 0, lattice=True)
    assert got == 32
    got = sens._effective_batch_size(par, _BigGrid(), 10_000, jnp.float64,
                                     jnp.float32, 0, lattice=False)
    assert got == 8

    # And compute_sensitivity actually routes through it.
    seen = {}
    real = sens._effective_batch_size

    def spy(*a, **k):
        seen["got"] = real(*a, **k)
        return seen["got"]

    monkeypatch.setattr(sens, "_effective_batch_size", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    sens.compute_sensitivity(par, grid, data, cw, jnp.float64, jnp.float32,
                             batch_size=24)
    assert seen["got"] == 24


@pytest.mark.parametrize("problem,data_type,nmc,ndc", [
    ("magn", 1, 1, 1),
    ("magn", 1, 3, 3),
    ("grav", 2, 1, 6),
])
def test_lattice_f32_far_quad_blend_families(problem, data_type, nmc, ndc):
    """The lattice far-quad blend must agree with the general per-cell
    blended operator for every physics family (the two paths share the
    quadrature kernels; near cells compare lattice-diff vs closed forms)."""
    from tomofastx_tpu.config.parfile import GravParams, MagParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel

    nx, ny, nz = 48, 4, 4
    n = nx * ny * nz
    h = 100.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * h, X2=(i + 1) * h,
                Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
    nd = 4
    data = SurveyData(ndata=nd, ncomponents=ndc)
    data.X = (np.arange(nd) + 0.5) * h / 2.0
    data.Y = np.full(nd, 2 * h)
    data.Z = np.full(nd, -1.0)

    cls = MagParams if problem == "magn" else GravParams
    par = cls(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
              Z0=0.1, depth_weighting_power=2.0)
    par.data_type = data_type
    par.nmodel_components = nmc
    par.ndata_components = ndc
    cw = sens.calculate_depth_weight(par, grid, data)

    lat = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                 jnp.float32, force_no_fft=True,
                                 validate=False)
    gen = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                 jnp.float32, force_generic=True,
                                 validate=False)
    assert isinstance(lat, LatticeMatrixFreeKernel) and lat.far_quad

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(nmc * n,)), jnp.float32)
    a = np.asarray(lat.matvec(x), np.float64)
    b = np.asarray(gen.matvec(x), np.float64)
    # Far cells: identical quadrature values; near: lattice-vs-closed
    # rounding only.
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-12 * np.abs(b).max())


def test_lattice_blend_stays_on_at_huge_n():
    """Round 5 removed the >2M blend gate: the quad+patch structure pays
    ONE full-grid evaluation (the flat formulation proven crash-free at
    4M cells) plus a tiny near window, and hardware re-validation at
    4M/8M passed (scripts/run_4m_matrixfree.py) — the factory must
    keep far_quad ON at any size and attach the window geometry."""
    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel

    def build(nx, ny, nz, fused=False):
        n = nx * ny * nz
        h = 100.0
        i = np.tile(np.arange(nx), ny * nz)
        j = np.tile(np.repeat(np.arange(ny), nx), nz)
        k = np.repeat(np.arange(nz), nx * ny)
        grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * h, X2=(i + 1) * h,
                    Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
        nd = 4
        data = SurveyData(ndata=nd, ncomponents=1)
        data.X = (np.arange(nd) + 0.5) * h
        data.Y = np.full(nd, 1.5 * h)
        data.Z = np.full(nd, -1.0)
        par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd,
                         depth_weighting_type=1, Z0=0.1,
                         depth_weighting_power=2.0)
        cw = np.ones(n)
        return make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                      jnp.float32, force_no_fft=True,
                                      validate=False, in_fused_program=fused)

    small = build(32, 32, 8)
    assert isinstance(small, LatticeMatrixFreeKernel) and small.far_quad
    assert small.win is not None and small.wi0 is not None
    assert small.wi0.shape[1] == 3

    big = build(160, 160, 100)  # 2.56M cells — above the removed gate
    assert isinstance(big, LatticeMatrixFreeKernel) and big.far_quad
    assert big.win is not None and big.wi0 is not None

def _mk_lattice(nx, ny, nz, hx=100.0, hy=130.0, stretch=False, nd=6):
    """Tensor-product lattice fixture (optionally z-stretched) + a small
    clustered survey so most cells are far field."""
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid

    xe = np.arange(nx + 1) * hx
    ye = np.arange(ny + 1) * hy
    if stretch:
        ze = np.concatenate([[0.0], np.cumsum(50.0 * 1.3 ** np.arange(nz))])
    else:
        ze = np.arange(nz + 1) * 80.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=xe[i], X2=xe[i + 1],
                Y1=ye[j], Y2=ye[j + 1], Z1=ze[k], Z2=ze[k + 1])
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X = (np.arange(nd) + 0.37) * hx / 2.0
    data.Y = np.full(nd, 1.6 * hy)
    data.Z = np.full(nd, -1.0)
    return grid, data, (xe, ye, ze)


@pytest.mark.parametrize("problem,data_type,nmc,ndc,stretch", [
    ("grav", 1, 1, 1, False),
    ("grav", 1, 1, 1, True),
    ("grav", 2, 1, 6, False),
    ("magn", 1, 1, 1, True),
    ("magn", 1, 3, 3, False),
])
def test_lattice_quad_patch_equals_select(problem, data_type, nmc, ndc, stretch):
    """The round-5 quad-everywhere + windowed-correction operator must
    reproduce the evaluate-both-then-select blend reference (quadrature
    on far cells, closed forms on near cells) through matvec AND rmatvec
    — for every physics family and on a non-uniform (z-stretched) lattice
    where the window sizes differ per axis. The correction form computes
    closed = quad + (closed - quad), so agreement is to f32
    rounding of that reassociation, not bitwise."""
    from tomofastx_tpu.config.parfile import GravParams, MagParams
    from tomofastx_tpu.ops import prism as P
    from tomofastx_tpu.ops.matrixfree import (
        LatticeMatrixFreeKernel,
        _lattice_closed_rows,
        _lattice_quad_rows,
        make_matrixfree_kernel,
    )

    grid, data, (xe, ye, ze) = _mk_lattice(24, 5, 4, stretch=stretch)
    n = grid.nelements_total
    cls = MagParams if problem == "magn" else GravParams
    par = cls(nx=grid.nx, ny=grid.ny, nz=grid.nz, ndata=data.ndata,
              depth_weighting_type=1, Z0=0.1, depth_weighting_power=2.0)
    par.data_type = data_type
    par.nmodel_components = nmc
    par.ndata_components = ndc
    data.ncomponents = ndc
    cw = np.ones(n)
    dw = np.ones((data.ndata, ndc))
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, dw, jnp.float32,
                                force_no_fft=True, validate=False)
    assert isinstance(op, LatticeMatrixFreeKernel) and op.far_quad
    assert op.win is not None and all(w >= 1 for w in op.win)

    dtype = jnp.float32
    xej, yej, zej = op.xe, op.ye, op.ze
    magv, intensity = op.magv, op.intensity

    # Dense select-form reference rows per observation point (f32 values,
    # f64 accumulation).
    shp = (grid.nz, grid.ny, grid.nx)
    ga = (
        jnp.broadcast_to(xej[:-1][None, None, :], shp).reshape(-1),
        jnp.broadcast_to(xej[1:][None, None, :], shp).reshape(-1),
        jnp.broadcast_to(yej[:-1][None, :, None], shp).reshape(-1),
        jnp.broadcast_to(yej[1:][None, :, None], shp).reshape(-1),
        jnp.broadcast_to(zej[:-1][:, None, None], shp).reshape(-1),
        jnp.broadcast_to(zej[1:][:, None, None], shp).reshape(-1),
    )
    rng = np.random.default_rng(5)
    xvec = rng.normal(size=(nmc * n,))
    uvec = rng.normal(size=(data.ndata * ndc,))
    rows_all = []
    for p in range(data.ndata):
        x, y, z = (dtype(data.X[p]), dtype(data.Y[p]), dtype(data.Z[p]))
        closed = np.asarray(_lattice_closed_rows(
            xej, yej, zej, x, y, z, problem, data_type, magv, intensity,
            nmc, ndc))
        quad = np.asarray(_lattice_quad_rows(
            xej, yej, zej, x, y, z, problem, data_type, magv, intensity,
            nmc, ndc))
        far = np.asarray(P.far_mask(x, y, z, *ga)).reshape(shp)
        rows_all.append(np.where(far[..., None, None], quad, closed))
        assert far.any() and (~far).any()
    rows_all = np.asarray(rows_all, np.float64)  # (nd, nz, ny, nx, nmc, ndc)

    xw = xvec.reshape(nmc, n).reshape(nmc, *shp)
    want_d = np.einsum("bzyxkd,kzyx->bd", rows_all, xw).reshape(-1)
    got_d = np.asarray(op.matvec(jnp.asarray(xvec, dtype)), np.float64)
    np.testing.assert_allclose(got_d, want_d, rtol=2e-4,
                               atol=1e-4 * np.abs(want_d).max())

    u2 = uvec.reshape(data.ndata, ndc)
    want_g = np.einsum("bd,bzyxkd->kzyx", u2, rows_all).reshape(-1)
    got_g = np.asarray(op.rmatvec(jnp.asarray(uvec, dtype)), np.float64)
    np.testing.assert_allclose(got_g, want_g, rtol=2e-4,
                               atol=1e-4 * np.abs(want_g).max())


def test_generic_quad_patch_equals_select(tmp_path):
    """The generic operator's quad-everywhere + K-nearest correction must
    reproduce forward_rows(far_quad=True)'s evaluate-both select through
    matvec AND rmatvec (same selection set; values to f32 reassociation
    rounding) — including on the padded dummy cells/rows."""
    from tomofastx_tpu.ops.matrixfree import MatrixFreeKernel
    from tomofastx_tpu.ops.sensitivity import forward_rows

    par, grid, data, cw = _setup(tmp_path, "grav")
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                jnp.float32, force_generic=True,
                                force_no_fft=True, validate=False)
    assert isinstance(op, MatrixFreeKernel)
    assert op.phys.far_quad and op.near_idx is not None
    assert op.near_idx.shape[0] == op.xd.shape[0]

    # Dense select-form reference (the build's blend semantics) applied
    # through the same weights/padding as the operator.
    rows = []
    for p in range(op.xd.shape[0]):
        rows.append(np.asarray(forward_rows(
            op.phys.problem, op.phys.data_type, op.phys.nmc, op.phys.ndc,
            op.phys.magv, op.phys.intensity, op.phys.handle_inside,
            op.grid6, op.xd[p], op.yd[p], op.zd[p], far_quad=True,
        )))
    rows = np.asarray(rows, np.float64)  # (nd_pad, N, nmc, ndc)
    cwn = np.asarray(op.cw, np.float64)
    row_w = np.asarray(op.row_w, np.float64)

    rng = np.random.default_rng(4)
    xvec = rng.normal(size=(op.ncols,))
    uvec = rng.normal(size=(op.nrows * op.phys.ndc,))

    xw = cwn[None, :] * xvec.reshape(op.phys.nmc, -1)
    want_d = (np.einsum("bnkd,kn->bd", rows, xw)
              * row_w)[: op.nrows].reshape(-1)
    got_d = np.asarray(op.matvec(jnp.asarray(xvec, jnp.float32)), np.float64)
    np.testing.assert_allclose(got_d, want_d, rtol=2e-4,
                               atol=1e-4 * np.abs(want_d).max())

    u_pad = np.zeros((op.xd.shape[0], op.phys.ndc))
    u_pad[: op.nrows] = uvec.reshape(op.nrows, op.phys.ndc)
    u_pad *= row_w
    want_g = (cwn[None, :] * np.einsum("bnkd,bd->kn", rows, u_pad)).reshape(-1)
    got_g = np.asarray(op.rmatvec(jnp.asarray(uvec, jnp.float32)), np.float64)
    np.testing.assert_allclose(got_g, want_g, rtol=2e-4,
                               atol=1e-4 * np.abs(want_g).max())


def test_generic_patch_matvec_accuracy(tmp_path):
    """Matvec-level: the patched generic f32 operator must track the f64
    exact operator as well as the round-4 evaluate-both blend did
    (~1e-5 relative) on an elongated grid with far-field-dominated rows."""
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.config.parfile import GravParams

    grid, data, _ = _mk_lattice(96, 4, 4, stretch=True, nd=8)
    n = grid.nelements_total
    par = GravParams(nx=grid.nx, ny=grid.ny, nz=grid.nz, ndata=data.ndata,
                     depth_weighting_type=1, Z0=0.1,
                     depth_weighting_power=2.0)
    cw = sens.calculate_depth_weight(par, grid, data)
    exact = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                   jnp.float64, force_generic=True,
                                   validate=False)
    f32 = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                 jnp.float32, force_generic=True,
                                 force_no_fft=True, validate=False)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(n,))
    ref = np.asarray(exact.matvec(jnp.asarray(x)))
    got = np.asarray(f32.matvec(jnp.asarray(x, jnp.float32)), np.float64)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 5e-5, f"patched generic f32 operator deviates {err:.2e}"


def test_generic_blend_gated_off_at_huge_n(monkeypatch):
    """Round 5: the GENERIC operator's candidate-correction blend crashes
    the TPU worker in composed solves above ~2M cells (4M reproduced 3x,
    incl. with sequential per-point einsums — scripts/probe_generic_4m.py)
    so the factory gates it off there with a loud warning; the lattice
    operator (slice-windowed correction) has no such gate."""
    import warnings

    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops.matrixfree import MatrixFreeKernel, make_matrixfree_kernel

    def build(nx, ny, nz):
        n = nx * ny * nz
        h = 100.0
        i = np.tile(np.arange(nx), ny * nz)
        j = np.tile(np.repeat(np.arange(ny), nx), nz)
        k = np.repeat(np.arange(nz), nx * ny)
        # z-dependent shear on the x edges breaks the tensor-product
        # lattice -> the generic per-cell operator is selected.
        grid = Grid(nx=nx, ny=ny, nz=nz,
                    X1=i * h + 3.0 * k, X2=(i + 1) * h + 3.0 * k,
                    Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
        nd = 4
        data = SurveyData(ndata=nd, ncomponents=1)
        data.X = (np.arange(nd) + 0.5) * h
        data.Y = np.full(nd, 1.5 * h)
        data.Z = np.full(nd, -1.0)
        par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd,
                         depth_weighting_type=1, Z0=0.1,
                         depth_weighting_power=2.0)
        cw = np.ones(n)
        return make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                      jnp.float32, force_no_fft=True,
                                      validate=False)

    small = build(16, 16, 8)
    assert isinstance(small, MatrixFreeKernel)
    assert small.phys.far_quad and small.near_idx is not None

    # The gate guards a TPU-runtime defect: it must NOT fire on the CPU
    # backend (tests run on CPU, so >2M keeps the blend here)...
    big_cpu = build(160, 160, 100)  # 2.56M cells
    assert big_cpu.phys.far_quad

    # ...and must fire (with the loud warning) off-CPU, unless the env
    # override used by the reproducer scripts raises the bound.
    import jax as _jax

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        big = build(160, 160, 100)
    assert isinstance(big, MatrixFreeKernel)
    assert not big.phys.far_quad and big.near_idx is None
    assert any("crashes the TPU worker" in str(x.message) for x in w)

    monkeypatch.setenv("TOMOFASTX_GENERIC_BLEND_MAX_CELLS", "999999999")
    forced = build(160, 160, 100)
    assert forced.phys.far_quad and forced.near_idx is not None


def test_tiered_blend_row_accuracy_vs_f64_outside_window():
    """The tiered operator's full row (8-pt base + windowed correction)
    must track the f64 closed forms even on cells far OUTSIDE the tier-2
    window, where the cheap 2^3 rule is the final value (the
    quad-patch-equals-select test's small grid is fully window-covered,
    so the outside-window tier is only exercised here). Also pins that
    the raw-f32 closed rows are WORSE than the blend on the same
    geometry — the premise of the whole compensated-f32 design."""
    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops.matrixfree import (
        LatticeMatrixFreeKernel,
        _lattice_closed_rows,
        make_matrixfree_kernel,
    )

    nx, ny, nz = 96, 6, 4
    hx, hy, hz = 100.0, 130.0, 80.0
    n = nx * ny * nz
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * hx, X2=(i + 1) * hx,
                Y1=j * hy, Y2=(j + 1) * hy, Z1=k * hz, Z2=(k + 1) * hz)
    nd = 3
    data = SurveyData(ndata=nd, ncomponents=1)
    # Obs clustered at the low-x end: the high-x half of the grid is far
    # outside the tier-2 window (window wx ~ 23 cells at this spacing).
    data.X = np.array([150.0, 250.0, 420.0])
    data.Y = np.full(nd, 2.5 * hy)
    data.Z = np.full(nd, -1.0)
    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    op = make_matrixfree_kernel(par, grid, data, np.ones(n), 1.0,
                                np.ones((nd, 1)), jnp.float32,
                                force_no_fft=True, validate=False)
    assert isinstance(op, LatticeMatrixFreeKernel) and op.far_quad
    assert op.win[2] < nx // 2  # the far half is genuinely outside

    xe64 = jnp.asarray(np.arange(nx + 1) * hx)
    ye64 = jnp.asarray(np.arange(ny + 1) * hy)
    ze64 = jnp.asarray(np.arange(nz + 1) * hz)
    for p in range(nd):
        row = np.asarray(
            op.rmatvec(jnp.zeros(nd, jnp.float32).at[p].set(1.0)), np.float64)
        ref = np.asarray(_lattice_closed_rows(
            xe64, ye64, ze64, jnp.float64(data.X[p]), jnp.float64(data.Y[p]),
            jnp.float64(data.Z[p]), "grav", 1, (0.0, 0.0, 1.0), 0.0, 1, 1,
        ), np.float64).reshape(-1)
        closed32 = np.asarray(_lattice_closed_rows(
            op.xe, op.ye, op.ze, jnp.float32(data.X[p]),
            jnp.float32(data.Y[p]), jnp.float32(data.Z[p]),
            "grav", 1, (0.0, 0.0, 1.0), 0.0, 1, 1,
        ), np.float64).reshape(-1)
        nrm = np.linalg.norm(ref)
        rel_blend = np.linalg.norm(row - ref) / nrm
        rel_raw = np.linalg.norm(closed32 - ref) / nrm
        assert rel_blend < 2e-5, rel_blend
        assert rel_blend < 0.2 * rel_raw, (rel_blend, rel_raw)
