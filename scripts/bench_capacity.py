"""Capacity-mode matvec shootout on the real TPU (VERDICT round-1 item 5).

Builds a REAL wavelet-compressed gravity kernel (64x64x64 cells = 262,144,
4,096 surface observations, rate 0.15 — the bench.py shape, but with the
true wavelet block structure instead of a random dense matrix), then times:

  1. dense f32 GEMV (the round-1 production mode, ~88% HBM SoL)
  2. tile-union Pallas matvec (round-2 layout)
  3. tile-union XLA lowering (gather intermediate TM x smaller)
  4. row-layout Pallas matvec (round-1 kernel, known 14x slower)

and prints storage + effective-bandwidth numbers for BASELINE.md.

Run on the TPU: python scripts/bench_capacity.py  (~5-10 min, dominated by
kernel build + compiles; persistent compile cache enabled).
All timings fence with a host fetch (axon block_until_ready caveat).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import GravParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import pallas_kernels as pk
from tomofastx_tpu.ops import sensitivity as sens

NX = NY = 64
NZ = 64
ND = 4096
RATE = 0.15
TM = 8


def make_grid():
    h = 100.0
    i = np.tile(np.arange(NX), NY * NZ)
    j = np.tile(np.repeat(np.arange(NY), NX), NZ)
    k = np.repeat(np.arange(NZ), NX * NY)
    return Grid(
        nx=NX, ny=NY, nz=NZ,
        X1=i * h, X2=(i + 1) * h,
        Y1=j * h, Y2=(j + 1) * h,
        Z1=k * h, Z2=(k + 1) * h,
    )


def make_data():
    n_side = int(np.sqrt(ND))
    assert n_side * n_side == ND
    xs = (np.arange(n_side) + 0.5) * (NX * 100.0 / n_side)
    ys = (np.arange(n_side) + 0.5) * (NY * 100.0 / n_side)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    d = SurveyData(ndata=ND, ncomponents=1)
    d.X = X.ravel()
    d.Y = Y.ravel()
    d.Z = np.full(ND, -0.1)
    return d


def timeit(fn, n=10):
    fn()  # warmup/compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    # host fetch fences remote execution (axon tunnel caveat, CLAUDE.md)
    np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    return (time.time() - t0) / n


def main():
    backend = jax.default_backend()
    print(f"backend = {backend}", flush=True)
    grid = make_grid()
    data = make_data()
    par = GravParams(
        nx=NX, ny=NY, nz=NZ, ndata=ND, depth_weighting_type=1,
        compression_type=1, compression_rate=RATE, Z0=0.1,
        depth_weighting_power=2.0,
    )
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float32)

    print("building compressed kernel (f32, rate 0.15)...", flush=True)
    t0 = time.time()
    kern = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=jnp.float32, store_dtype=jnp.float32,
        batch_size=256,
    )
    build_s = time.time() - t0
    S = np.asarray(kern.S, np.float32)
    N = S.shape[1]
    nnz = int(kern.nnz)
    print(f"built in {build_s:.1f}s: shape {S.shape}, nnz = {nnz} "
          f"(rate {nnz / S.size:.4f}), comp_error = {kern.comp_error:.3e}", flush=True)

    results = {"shape": list(S.shape), "nnz": nnz, "build_s": round(build_s, 1),
               "backend": backend}

    # ---- dense GEMV ----
    Sd = jnp.asarray(S)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(N,)).astype(np.float32))
    dense_mv = jax.jit(lambda S_, x_: S_ @ x_)
    t_dense = timeit(lambda: dense_mv(Sd, x))
    results["dense_ms"] = round(t_dense * 1e3, 3)
    results["dense_GBps"] = round(S.nbytes / t_dense / 1e9, 1)
    print(f"dense GEMV: {t_dense * 1e3:.3f} ms ({S.nbytes / t_dense / 1e9:.0f} GB/s eff)", flush=True)

    # ---- tile-union layout ----
    t0 = time.time()
    uvals, ubidx, nrows = pk.pack_tile_union(S, tm=TM)
    print(f"tile-union packed in {time.time() - t0:.1f}s: "
          f"uvals {uvals.shape} = {uvals.nbytes / 1e9:.2f} GB "
          f"(dense {S.nbytes / 1e9:.2f} GB, nnz-bound {nnz * 4 / 1e9:.2f} GB); "
          f"BU = {uvals.shape[1]}, block fill = {nnz / (uvals.size):.3f}", flush=True)
    results["tile_bytes"] = int(uvals.nbytes)
    results["BU"] = int(uvals.shape[1])

    uv = jnp.asarray(uvals)
    ub = jnp.asarray(ubidx)
    if backend != "cpu":
        t_tile = timeit(lambda: pk.tile_matvec(uv, ub, x))
        results["tile_pallas_ms"] = round(t_tile * 1e3, 3)
        results["tile_pallas_GBps"] = round(uvals.nbytes / t_tile / 1e9, 1)
        print(f"tile-union Pallas: {t_tile * 1e3:.3f} ms "
              f"({uvals.nbytes / t_tile / 1e9:.0f} GB/s eff, "
              f"{t_dense / t_tile:.2f}x vs dense)", flush=True)

    t_tile_xla = timeit(lambda: pk.tile_matvec_xla(uv, ub, x))
    results["tile_xla_ms"] = round(t_tile_xla * 1e3, 3)
    print(f"tile-union XLA: {t_tile_xla * 1e3:.3f} ms "
          f"({t_dense / t_tile_xla:.2f}x vs dense)", flush=True)

    # ---- round-1 row layout (for the record) ----
    if backend != "cpu":
        Sb = S.reshape(S.shape[0], N // pk.BLOCK, pk.BLOCK)
        used = np.any(Sb != 0.0, axis=2)
        B = int(used.sum(axis=1).max())
        bidx = np.zeros((S.shape[0], B), np.int32)
        bvals = np.zeros((S.shape[0], B, pk.BLOCK), np.float32)
        for r in range(S.shape[0]):
            blocks = np.nonzero(used[r])[0]
            bidx[r, : blocks.size] = blocks
            bvals[r, : blocks.size] = Sb[r, blocks]
        bv = jnp.asarray(bvals)
        bi = jnp.asarray(bidx)
        t_row = timeit(lambda: pk.blocked_matvec(bv, bi, x), n=3)
        results["row_pallas_ms"] = round(t_row * 1e3, 3)
        print(f"row-layout Pallas (round 1): {t_row * 1e3:.3f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
