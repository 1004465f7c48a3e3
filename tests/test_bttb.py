"""FFT/BTTB sensitivity operator (ops/bttb.py): parity against the
per-cell matrix-free operator for every physics family, f32 accuracy vs
f64 truth, adjointness, lattice detection + fallbacks, LSQR solve parity,
and layer-sharded mesh parity.

The operator itself is beyond-reference (the reference always materializes
kernel rows, sensitivity_gravmag.F90:189-318); parity is therefore against
this package's own exact-physics operators, which are themselves
oracle-tested against the closed forms (tests/test_prism.py,
tests/test_matrixfree.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tomofastx_tpu.config.parfile import GravParams, MagParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops.bttb import BTTBKernel, detect_bttb
from tomofastx_tpu.ops.matrixfree import (
    LatticeMatrixFreeKernel,
    MatrixFreeKernel,
    make_matrixfree_kernel,
)


def make_grid(nx, ny, nz, hx=100.0, hy=80.0, variable_z=True):
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    if variable_z:
        hz = 50.0 + 10.0 * k
        z1 = 50.0 * k + 5.0 * k * (k - 1)
    else:
        hz = np.full_like(k, 50.0, dtype=float)
        z1 = 50.0 * k
    return Grid(nx=nx, ny=ny, nz=nz, X1=i * hx, X2=(i + 1) * hx,
                Y1=j * hy, Y2=(j + 1) * hy, Z1=z1, Z2=z1 + hz)


def make_data(no_x, no_y, mx, my, hx, hy, ox, oy, zd, shuffle=True, ndc=1):
    xs = ox + np.arange(no_x) * mx * hx
    ys = oy + np.arange(no_y) * my * hy
    X, Y = np.meshgrid(xs, ys, indexing="xy")
    nd = no_x * no_y
    d = SurveyData(ndata=nd, ncomponents=ndc)
    idx = np.arange(nd)
    if shuffle:
        idx = np.random.default_rng(3).permutation(nd)
    d.X, d.Y, d.Z = X.ravel()[idx], Y.ravel()[idx], np.full(nd, zd)
    return d


CASES = ["grav_gz", "grav_zz", "grav_ftg", "mag_tmi", "mag_3c", "mag_vec"]


def _problem(case, nx, ny, nz, nd):
    if case.startswith("grav"):
        ndc = {"grav_gz": 1, "grav_zz": 1, "grav_ftg": 6}[case]
        dt = 1 if case == "grav_gz" else 2
        par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, data_type=dt,
                         ndata_components=ndc)
    else:
        nmc = 3 if case == "mag_vec" else 1
        ndc = 3 if case == "mag_3c" else 1
        par = MagParams(nx=nx, ny=ny, nz=nz, ndata=nd,
                        nmodel_components=nmc, ndata_components=ndc,
                        mi=55.0, md=12.0, theta=3.0, intensity=50000.0)
    return par, par.ndata_components


@pytest.mark.parametrize("case", CASES)
def test_bttb_matches_generic_f64(case):
    """BTTB matvec/rmatvec equal the per-cell operator to f64 rounding
    for every physics family, with strided (mx=2) shuffled observations
    on an offset lattice over a variable-layer-thickness grid."""
    rng = np.random.default_rng(0)
    nx, ny, nz = 6, 5, 4
    g = make_grid(nx, ny, nz)
    d = make_data(4, 3, 2, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    nd = d.ndata
    par, ndc = _problem(case, nx, ny, nz, nd)
    d.ncomponents = ndc
    d.weight = 1.0 + rng.random((nd, ndc))
    cw = 1.0 + rng.random(nx * ny * nz)
    pw = 1.7
    op_f = make_matrixfree_kernel(par, g, d, cw, pw, d.weight, jnp.float64,
                                  validate=False)
    op_g = make_matrixfree_kernel(par, g, d, cw, pw, d.weight, jnp.float64,
                                  validate=False, force_generic=True)
    assert isinstance(op_f, BTTBKernel)
    x = jnp.asarray(rng.normal(size=(op_g.ncols,)))
    u = jnp.asarray(rng.normal(size=(nd * ndc,)))
    mv_f, mv_g = np.asarray(op_f.matvec(x)), np.asarray(op_g.matvec(x))
    rv_f, rv_g = np.asarray(op_f.rmatvec(u)), np.asarray(op_g.rmatvec(u))
    assert np.linalg.norm(mv_f - mv_g) <= 1e-11 * np.linalg.norm(mv_g)
    assert np.linalg.norm(rv_f - rv_g) <= 1e-11 * np.linalg.norm(rv_g)
    # Adjointness of the FFT pair itself.
    lhs = float(jnp.vdot(jnp.asarray(mv_f), u))
    rhs = float(jnp.vdot(x, jnp.asarray(rv_f)))
    assert abs(lhs - rhs) <= 1e-11 * (np.linalg.norm(mv_f) * np.linalg.norm(np.asarray(u)))


def test_bttb_f32_more_accurate_than_f32_matrixfree():
    """The f64-built table makes the f32 BTTB operator dramatically more
    accurate than the f32 per-cell/lattice operators (whose 8-corner
    cancellation happens in f32) — pin at least a 10x advantage."""
    rng = np.random.default_rng(0)
    nx, ny, nz = 6, 5, 4
    g = make_grid(nx, ny, nz)
    d = make_data(4, 3, 2, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    par, _ = _problem("grav_gz", nx, ny, nz, d.ndata)
    d.weight = 1.0 + rng.random((d.ndata, 1))
    cw = 1.0 + rng.random(nx * ny * nz)
    truth = make_matrixfree_kernel(par, g, d, cw, 1.7, d.weight, jnp.float64,
                                   validate=False, force_generic=True)
    x = rng.normal(size=(truth.ncols,))
    mv_t = np.asarray(truth.matvec(jnp.asarray(x)))

    def relerr(**kw):
        op = make_matrixfree_kernel(par, g, d, cw, 1.7, d.weight, jnp.float32,
                                    validate=False, **kw)
        mv = np.asarray(op.matvec(jnp.asarray(x, jnp.float32)))
        return np.linalg.norm(mv - mv_t) / np.linalg.norm(mv_t)

    e_fft = relerr()
    e_gen = relerr(force_generic=True)
    assert e_fft < 1e-5
    assert e_fft * 10.0 < e_gen


def test_detection_positive_cases():
    g = make_grid(6, 5, 4)
    # single observation row (no_y = 1)
    d = make_data(5, 1, 1, 1, 100.0, 80.0, 0.0, 40.0, -2.0)
    assert detect_bttb(g, d) is not None
    # coarse strides both axes
    d = make_data(3, 2, 2, 3, 100.0, 80.0, 50.0, 40.0, -2.0)
    geom = detect_bttb(g, d)
    assert geom is not None and (geom.mx, geom.my) == (2, 3)
    # observations BELOW the volume (zd > zmax) also qualify
    d = make_data(3, 2, 1, 1, 100.0, 80.0, 50.0, 40.0, 1.0e5)
    assert detect_bttb(g, d) is not None
    # spectrum-size guard counts the component axes and FFT padding:
    # the same geometry falls back when the byte cap is exceeded, and a
    # multi-component table needs nmc*ndc more room.
    d = make_data(4, 3, 1, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    # Lx = 3*1+6 = 9 -> Px = 9, Pxr = 5; Ly = 2+5 = 7 -> Py = 8; nz = 4.
    bytes_1c = 4 * 1 * 1 * 8 * 5 * 8
    assert detect_bttb(g, d, max_table_bytes=bytes_1c) is not None
    assert detect_bttb(g, d, max_table_bytes=bytes_1c - 1) is None
    assert detect_bttb(g, d, nmc=3, ndc=3, max_table_bytes=bytes_1c) is None
    assert detect_bttb(g, d, nmc=3, ndc=3,
                       max_table_bytes=9 * bytes_1c) is not None


def test_detection_fallbacks():
    """Every violated condition falls back (returns None -> the factory
    yields a lattice/generic operator instead)."""
    g = make_grid(6, 5, 4)
    base = dict(no_x=4, no_y=3, mx=1, my=1, hx=100.0, hy=80.0,
                ox=37.0, oy=-11.0, zd=-3.3)

    def data_with(**over):
        kw = dict(base)
        kw.update(over)
        return make_data(kw["no_x"], kw["no_y"], kw["mx"], kw["my"],
                         kw["hx"], kw["hy"], kw["ox"], kw["oy"], kw["zd"])

    assert detect_bttb(g, data_with()) is not None  # control

    # scattered observations
    d = data_with()
    d.X = d.X + np.random.default_rng(1).normal(0, 1.0, d.ndata)
    assert detect_bttb(g, d) is None
    # two heights
    d = data_with()
    d.Z[0] = -5.0
    assert detect_bttb(g, d) is None
    # height inside the volume z-range (borehole-adjacent case)
    assert detect_bttb(g, data_with(zd=100.0)) is None
    # incommensurate spacing (not an integer multiple of hx)
    assert detect_bttb(g, data_with(hx=137.0)) is None
    # missing lattice point (not a full grid)
    d = data_with()
    d.X, d.Y, d.Z = d.X[1:], d.Y[1:], d.Z[1:]
    d.ndata -= 1
    assert detect_bttb(g, d) is None
    # duplicate observation point
    d = data_with()
    d.X[1], d.Y[1] = d.X[0], d.Y[0]
    assert detect_bttb(g, d) is None
    # valid tensor-product lattice but NON-UNIFORM x spacing
    xe = np.array([0.0, 100.0, 250.0, 350.0, 450.0, 550.0, 650.0])
    i = np.tile(np.arange(6), 5 * 4)
    j = np.tile(np.repeat(np.arange(5), 6), 4)
    k = np.repeat(np.arange(4), 6 * 5)
    g2 = Grid(nx=6, ny=5, nz=4, X1=xe[i], X2=xe[i + 1],
              Y1=j * 80.0, Y2=(j + 1) * 80.0, Z1=k * 50.0, Z2=(k + 1) * 50.0)
    from tomofastx_tpu.ops.matrixfree import detect_lattice

    assert detect_lattice(g2) is not None  # still a lattice ...
    assert detect_bttb(g2, data_with()) is None  # ... but not BTTB
    # irregular (non-tensor-product) grid
    g3 = make_grid(6, 5, 4)
    g3.X1 = g3.X1.copy()
    g3.X1[7] += 1.0
    assert detect_bttb(g3, data_with()) is None


def test_factory_fallback_chain():
    """Scattered observations on a lattice grid -> lattice operator;
    force_no_fft on a BTTB-eligible problem -> lattice operator."""
    rng = np.random.default_rng(2)
    g = make_grid(6, 5, 4)
    nd = 7
    d = SurveyData(ndata=nd, ncomponents=1)
    d.X = rng.uniform(0, 600, nd)
    d.Y = rng.uniform(0, 400, nd)
    d.Z = np.full(nd, -1.0)
    par, _ = _problem("grav_gz", 6, 5, 4, nd)
    cw = np.ones(g.nelements_total)
    op = make_matrixfree_kernel(par, g, d, cw, 1.0, d.weight, jnp.float64,
                                validate=False)
    assert isinstance(op, LatticeMatrixFreeKernel)

    d2 = make_data(4, 3, 1, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    par2, _ = _problem("grav_gz", 6, 5, 4, d2.ndata)
    op2 = make_matrixfree_kernel(par2, g, d2, cw, 1.0, d2.weight,
                                 jnp.float64, validate=False,
                                 force_no_fft=True)
    assert isinstance(op2, LatticeMatrixFreeKernel)
    op3 = make_matrixfree_kernel(par2, g, d2, cw, 1.0, d2.weight,
                                 jnp.float64, validate=False,
                                 force_generic=True)
    assert isinstance(op3, MatrixFreeKernel)


def test_bttb_lsqr_solve_parity():
    """A damped LSQR solve through the BTTB operator matches the same
    solve through the per-cell operator (f64)."""
    from tomofastx_tpu.ops.lsqr import lsqr_solve

    rng = np.random.default_rng(5)
    nx, ny, nz = 6, 5, 4
    g = make_grid(nx, ny, nz)
    d = make_data(5, 4, 1, 1, 100.0, 80.0, 20.0, 10.0, -2.0)
    nd = d.ndata
    par, _ = _problem("grav_gz", nx, ny, nz, nd)
    d.weight = np.ones((nd, 1))
    cw = 1.0 + rng.random(nx * ny * nz)
    b = jnp.asarray(rng.normal(size=(nd,)))
    alpha = 1e-4

    def solve(op):
        def matvec(x):
            return jnp.concatenate([op.matvec(x), alpha * x])

        def rmatvec(u):
            return op.rmatvec(u[:nd]) + alpha * u[nd:]

        bb = jnp.concatenate([b, jnp.zeros(op.ncols)])
        res = jax.jit(
            lambda op, bb: lsqr_solve(matvec, rmatvec, bb, op.ncols,
                                      niter=30, rmin=0.0)
        )(op, bb)
        return np.asarray(res.x)

    op_f = make_matrixfree_kernel(par, g, d, cw, 1.0, d.weight, jnp.float64,
                                  validate=False)
    op_g = make_matrixfree_kernel(par, g, d, cw, 1.0, d.weight, jnp.float64,
                                  validate=False, force_generic=True)
    assert isinstance(op_f, BTTBKernel)
    x_f, x_g = solve(op_f), solve(op_g)
    assert np.linalg.norm(x_f - x_g) <= 1e-9 * np.linalg.norm(x_g)


def test_bttb_sharded_parity_and_layer_sharding():
    """shard_kernel places the table layer-sharded on an 8-device mesh
    (nz = 8) and the meshed matvec/rmatvec match the unmeshed ones."""
    from tomofastx_tpu.parallel.mesh import make_mesh, shard_kernel

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(7)
    nx, ny, nz = 6, 5, 8
    g = make_grid(nx, ny, nz)
    d = make_data(4, 3, 1, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    nd = d.ndata
    par, _ = _problem("grav_gz", nx, ny, nz, nd)
    cw = 1.0 + rng.random(nx * ny * nz)
    op = make_matrixfree_kernel(par, g, d, cw, 1.3, d.weight, jnp.float64,
                                validate=False)
    assert isinstance(op, BTTBKernel)
    x = jnp.asarray(rng.normal(size=(op.ncols,)))
    u = jnp.asarray(rng.normal(size=(nd,)))
    mv0 = np.asarray(jax.jit(lambda o, x: o.matvec(x))(op, x))
    rv0 = np.asarray(jax.jit(lambda o, u: o.rmatvec(u))(op, u))

    mesh = make_mesh(8)
    with mesh:
        ops = shard_kernel(op, mesh)
        assert ops.mesh is mesh
        mv1 = np.asarray(jax.jit(lambda o, x: o.matvec(x))(ops, x))
        rv1 = np.asarray(jax.jit(lambda o, u: o.rmatvec(u))(ops, u))
    assert np.allclose(mv0, mv1, rtol=1e-12, atol=0)
    assert np.allclose(rv0, rv1, rtol=1e-12, atol=0)


def test_layer_blocked_parity():
    """layer_block (capacity mode: lax.map over z-layer blocks) is
    bit-identical to the unblocked matvec/rmatvec — same FFTs, same
    summation tree per block row."""
    import dataclasses

    rng = np.random.default_rng(11)
    nx, ny, nz = 6, 5, 8
    g = make_grid(nx, ny, nz)
    d = make_data(4, 3, 1, 1, 100.0, 80.0, 37.0, -11.0, -3.3)
    par, _ = _problem("grav_gz", nx, ny, nz, d.ndata)
    cw = 1.0 + rng.random(nx * ny * nz)
    op = make_matrixfree_kernel(par, g, d, cw, 1.3, d.weight, jnp.float64,
                                validate=False)
    assert isinstance(op, BTTBKernel) and op.layer_block is None
    opb = dataclasses.replace(op, layer_block=2)
    x = jnp.asarray(rng.normal(size=(op.ncols,)))
    u = jnp.asarray(rng.normal(size=(d.ndata,)))
    mv0 = np.asarray(jax.jit(lambda o, x: o.matvec(x))(op, x))
    mv1 = np.asarray(jax.jit(lambda o, x: o.matvec(x))(opb, x))
    rv0 = np.asarray(jax.jit(lambda o, u: o.rmatvec(u))(op, u))
    rv1 = np.asarray(jax.jit(lambda o, u: o.rmatvec(u))(opb, u))
    assert np.allclose(mv0, mv1, rtol=1e-13, atol=0)
    assert np.allclose(rv0, rv1, rtol=1e-13, atol=0)


def test_auto_kernel_format_capacity_fallback(tmp_path):
    """tpu.kernelFormat = auto with compression off routes to the
    matrix-free chain when the dense kernel would not share the chip
    (1.05M cells x 4,096 data = 17 GB dense > 55% of the 16 GB budget);
    the gridded survey then picks the BTTB operator and the inversion
    converges."""
    from tomofastx_tpu.config.parfile import parse_parfile_lines
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tomofastx_tpu.io.tableio import save_table

    nx, ny, nz = 128, 128, 64
    h = 100.0
    N = nx * ny * nz
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    cols = np.column_stack([
        i * h, (i + 1) * h, j * h, (j + 1) * h, k * h, (k + 1) * h,
        i + 1, j + 1, k + 1,
    ])
    save_table(str(tmp_path / "grid.txt"), cols,
               fmt="%.1f %.1f %.1f %.1f %.1f %.1f %d %d %d", header=f"{N}")
    val = np.zeros(N)
    val[(i // 32 == 1) & (j // 32 == 1) & (k // 16 == 1)] = 500.0
    save_table(str(tmp_path / "true.txt"), val[:, None], fmt="%.2f",
               header=f"{N}")
    nside = 64
    xs = 0.5 * h + np.arange(nside) * 2 * h
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    nd = nside * nside
    save_table(
        str(tmp_path / "data.txt"),
        np.column_stack([X.ravel(), Y.ravel(), np.full(nd, -0.1),
                         np.zeros(nd)]),
        fmt="%.2f %.2f %.2f %.1f", header=f"{nd}",
    )
    cfg = parse_parfile_lines([
        f"global.outputFolderPath = {tmp_path}/out/\n",
        f"modelGrid.size = {nx} {ny} {nz}\n",
        f"modelGrid.grav.file = {tmp_path}/grid.txt\n",
        f"forward.data.grav.nData = {nd}\n",
        f"forward.data.grav.dataGridFile = {tmp_path}/data.txt\n",
        "forward.data.grav.useSyntheticModelForDataValues = 1\n",
        f"forward.data.grav.syntheticModelFile = {tmp_path}/true.txt\n",
        "forward.depthWeighting.type = 1\n",
        "forward.depthWeighting.grav.Z0 = 0.1\n",
        "inversion.nMajorIterations = 1\n",
        "inversion.nMinorIterations = 3\n",
        "inversion.modelDamping.grav.weight = 1e-11\n",
        "tpu.kernelFormat = auto\n",
    ])
    res = solve_problem_joint_gravmag(
        cfg, base_dir=str(tmp_path), verbose=False,
        solve_dtype=jnp.float32,
    )
    # auto -> matrix-free -> BTTB: converged below the starting cost 1.0
    # (a dense 17 GB kernel build here would fail/thrash long before).
    assert res.cost_data[0] < 0.5
