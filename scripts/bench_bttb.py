"""Benchmark the FFT/BTTB operator on the real TPU vs the lattice
matrix-free operator and the dense GEMV at matched shapes.

Shapes: the bench fixture (64^3 = 262,144 cells, 64x64 gridded survey)
plus million-cell-class grids. LSQR s/iter measured through the jitted
while-loop with a host-fetch fence (axon block_until_ready returns early).

Usage: python scripts/bench_bttb.py [ncells_exponents...]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from tomofastx_tpu.utils.compile_cache import enable as enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from tomofastx_tpu.config.parfile import GravParams, MagParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import sensitivity as sens
from tomofastx_tpu.ops.lsqr import lsqr_solve
from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel


def make_case(nx, ny, nz, n_side, stride, problem="grav"):
    h = 100.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * h, X2=(i + 1) * h,
                Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
    nd = n_side * n_side
    xs = 0.5 * h + np.arange(n_side) * stride * h  # on-lattice, offset h/2
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(nd, -0.1)
    if problem == "grav":
        par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd,
                         depth_weighting_type=1, Z0=0.1,
                         depth_weighting_power=2.0)
    else:
        par = MagParams(nx=nx, ny=ny, nz=nz, ndata=nd,
                        depth_weighting_type=1, Z0=0.1,
                        mi=65.0, md=10.0, intensity=50000.0)
    return par, grid, data


def time_lsqr(op, nd, niter=200, label=""):
    """niter large enough that the ~30 ms tunnel dispatch+fetch overhead
    amortizes below the per-iteration cost (matters for the ms-scale BTTB
    iterations; harmless for the slow operators)."""
    b = jnp.asarray(np.random.default_rng(1).normal(size=(nd,)).astype(np.float32))

    @jax.jit
    def solve(op, b):
        return lsqr_solve(op.matvec, op.rmatvec, b, op.ncols,
                          niter=niter, rmin=0.0)

    t0 = time.time()
    res = solve(op, b)
    _ = float(res.r)
    compile_s = time.time() - t0
    t0 = time.time()
    res = solve(op, b)
    _ = float(res.r)
    dt = time.time() - t0
    s_it = dt / int(res.iters)
    print(f"  {label}: {s_it * 1e3:.2f} ms/LSQR-iter "
          f"({int(res.iters)} iters, compile {compile_s:.0f}s)", flush=True)
    return s_it


def main():
    print("backend:", jax.default_backend(), flush=True)
    cases = [
        ("262k grav (64^3, 64x64 obs)", dict(nx=64, ny=64, nz=64, n_side=64, stride=1, problem="grav")),
        ("262k magn TMI", dict(nx=64, ny=64, nz=64, n_side=64, stride=1, problem="magn")),
        ("1.05M grav (128x128x64, 64x64 obs @2h)", dict(nx=128, ny=128, nz=64, n_side=64, stride=2, problem="grav")),
        ("4.19M grav (256x256x64, 128x128 obs @2h)", dict(nx=256, ny=256, nz=64, n_side=128, stride=2, problem="grav")),
        ("8.39M grav (256x256x128, 128x128 obs @2h)", dict(nx=256, ny=256, nz=128, n_side=128, stride=2, problem="grav")),
    ]
    only = set(sys.argv[1:])
    for name, kw in cases:
        if only and not any(s in name for s in only):
            continue
        par, grid, data = make_case(**kw)
        print(f"{name}: N={grid.nelements_total}, nd={data.ndata}", flush=True)
        cw = sens.calculate_depth_weight(par, grid, data, jnp.float32)
        t0 = time.time()
        op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                    jnp.float32, validate=False)
        print(f"  operator: {type(op).__name__} built in {time.time() - t0:.1f}s "
              f"(table {getattr(op, 'nbytes', 0) / 1e6:.1f} MB)", flush=True)
        time_lsqr(op, data.ndata, label="bttb")
        if grid.nelements_total <= (1 << 21):
            lat = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                         jnp.float32, validate=False,
                                         force_no_fft=True)
            time_lsqr(lat, data.ndata, niter=10,
                      label=f"lattice ({type(lat).__name__})")


if __name__ == "__main__":
    main()
