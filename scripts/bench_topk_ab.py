"""A/B the wavelet-compression threshold algorithms on the real TPU.

lax.top_k (the (K+1)-th largest |coefficient| per row) lowers to a sort;
the bit-pattern bisection (ops/sensitivity.py::_kth_largest_bisect_f32,
TOMOFASTX_TOPK=bisect) does 32 masked count-reductions instead — both
produce bit-identical thresholds (pinned by tests). This measures the
REAL compressed build at the bench shape under both algorithms, plus the
isolated _compress_lines stage, and prints a JSON verdict for flipping
the default.

Run on the TPU:  python scripts/bench_topk_ab.py
"""

import json
import time

import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import GravParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import sensitivity as sens

NX = NY = NZ = 64
ND = 1024
H = 100.0
OUT = {}


def fixture():
    i = np.tile(np.arange(NX), NY * NZ)
    j = np.tile(np.repeat(np.arange(NY), NX), NZ)
    k = np.repeat(np.arange(NZ), NX * NY)
    grid = Grid(nx=NX, ny=NY, nz=NZ, X1=i * H, X2=(i + 1) * H,
                Y1=j * H, Y2=(j + 1) * H, Z1=k * H, Z2=(k + 1) * H)
    n_side = int(np.sqrt(ND))
    xs = (np.arange(n_side) + 0.5) * (NX * H / n_side)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    data = SurveyData(ndata=ND, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(ND, -1.0)
    return grid, data


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    t0 = time.time()
    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    print(f"first dispatch {time.time() - t0:.1f}s", flush=True)

    grid, data = fixture()
    par = GravParams(nx=NX, ny=NY, nz=NZ, ndata=ND, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    par.compression_type = 1
    par.compression_rate = 0.15
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float64)

    checks = {}
    for algo in ("topk", "bisect"):
        sens.THRESHOLD_SELECT = algo
        t0 = time.time()
        kern = sens.compute_sensitivity(
            par, grid, data, cw, compute_dtype=jnp.float32,
            store_dtype=jnp.float32, batch_size=256,
        )
        _ = float(jnp.sum(kern.S[:1]))
        cold = time.time() - t0
        t0 = time.time()
        kern = sens.compute_sensitivity(
            par, grid, data, cw, compute_dtype=jnp.float32,
            store_dtype=jnp.float32, batch_size=256,
        )
        checks[algo] = float(jnp.sum(jnp.abs(kern.S).astype(jnp.float64)))
        warm = time.time() - t0
        OUT[f"build_{algo}"] = {"cold_s": round(cold, 2),
                                "warm_s": round(warm, 2),
                                "rows_per_s": round(ND / warm, 1)}
        print(f"build[{algo}]: cold {cold:.1f}s warm {warm:.1f}s "
              f"({ND / warm:.0f} rows/s)", flush=True)
        del kern

    OUT["checksum_identical"] = checks["topk"] == checks["bisect"]

    # Isolated compression stage: B x N random rows through
    # _compress_lines under both algorithms (jitted, fenced).
    B = 256
    N = NX * NY * NZ
    nel = int(0.15 * N)
    rows = jax.random.normal(jax.random.PRNGKey(0), (B, 1, 1, N), jnp.float32)

    for algo in ("topk", "bisect"):
        sens.THRESHOLD_SELECT = algo

        fn = jax.jit(lambda r: sens._compress_lines(
            r, NX, NY, NZ, 1, nel, jnp.float32))
        out = fn(rows)
        _ = float(out[1][0])
        t0 = time.time()
        for _i in range(5):
            out = fn(rows)
            _ = float(out[1][0])
        dt = (time.time() - t0) / 5
        OUT[f"compress_stage_{algo}_s"] = round(dt, 4)
        print(f"compress stage[{algo}]: {dt:.3f}s per {B}x{N} chunk",
              flush=True)

    OUT["stage_speedup_bisect"] = round(
        OUT["compress_stage_topk_s"] / OUT["compress_stage_bisect_s"], 2)
    print(json.dumps(OUT), flush=True)
    with open("TOPK_AB.json", "w") as f:
        json.dump(OUT, f, indent=1)


if __name__ == "__main__":
    main()
