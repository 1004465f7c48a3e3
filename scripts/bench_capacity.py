"""Capacity-mode matvec shootout on the real TPU (VERDICT round-1 item 5).

Builds a REAL wavelet-compressed gravity kernel (64x64x64 cells = 262,144,
4,096 surface observations, rate 0.15 — the bench.py shape, but with the
true wavelet block structure instead of a random dense matrix), then times:

  1. dense f32 GEMV (the round-1 production mode)
  2. tile-union Pallas matvec (round-2 scalar-prefetch kernel)
  3. tile-union XLA lowering (gather intermediate TM x smaller)
  4. hybrid packed top-k (PackedKernel) matvec + rmatvec — the
     nnz-bound capacity layout

and prints storage + effective-bandwidth numbers for BASELINE.md.

Memory hygiene: the v5e has 16 GB HBM and a 4.3 GB kernel; at most ONE
large representation is device-resident at a time (a previous version kept
the build product + dense + tile packs alive simultaneously -> paging made
the dense GEMV read 1000x slow, then RESOURCE_EXHAUSTED). The built kernel
is cached to /tmp/bench_kernel_<shape>.npy and reused across runs (also by
scripts/analyze_kernel_structure.py).

Run on the TPU: python scripts/bench_capacity.py  (~5-10 min first time,
dominated by kernel build + compiles; persistent compile cache enabled).
All timings fence with a host fetch (axon block_until_ready caveat).
"""

import gc
import json
import os
import sys
import time

# Persistent compile cache: the env var is IGNORED on this JAX build —
# must go through jax.config (tomofastx_tpu/utils/compile_cache.py).
import jax  # noqa: E402

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import GravParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import pallas_kernels as pk
from tomofastx_tpu.ops import sensitivity as sens
from tomofastx_tpu.ops.sparse_kernel import pack_dense
from tomofastx_tpu.ops.tile_kernel import pack_tiles

NX = NY = 64
NZ = 64
ND = 4096
RATE = 0.15
KERNEL_CACHE = f"/tmp/bench_kernel_{ND}x{NX * NY * NZ}_r{RATE}.npy"


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


def get_kernel() -> np.ndarray:
    """Build (or load the disk-cached) real compressed kernel, returned as
    a HOST array; no device buffers stay alive."""
    if os.path.exists(KERNEL_CACHE):
        print(f"loading cached kernel {KERNEL_CACHE}", flush=True)
        return np.load(KERNEL_CACHE)
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
    S = np.asarray(kern.S, np.float32)
    print(f"built in {time.time() - t0:.1f}s, comp_error = {kern.comp_error:.3e}", flush=True)
    del kern, cw
    gc.collect()
    np.save(KERNEL_CACHE, S)
    return S


def hbm_gb():
    try:
        st = jax.local_devices()[0].memory_stats()
        return round(st["bytes_in_use"] / 1e9, 2)
    except Exception:
        return -1.0


def timeit(fn, n=10):
    out = fn()  # warmup/compile
    # host fetch fences remote execution (axon tunnel caveat, CLAUDE.md)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.time()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    return (time.time() - t0) / n


def main():
    backend = jax.default_backend()
    print(f"backend = {backend}", flush=True)
    S = get_kernel()
    N = S.shape[1]
    nnz = int(np.count_nonzero(S))
    print(f"kernel {S.shape}, nnz = {nnz} (rate {nnz / S.size:.4f})", flush=True)

    results = {"shape": list(S.shape), "nnz": nnz, "backend": backend}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(S.shape[0],)).astype(np.float32))

    # ---- dense GEMV ----
    Sd = jnp.asarray(S)
    dense_mv = jax.jit(lambda S_, x_: S_ @ x_)
    t_dense = timeit(lambda: dense_mv(Sd, x))
    results["dense_ms"] = round(t_dense * 1e3, 3)
    results["dense_GBps"] = round(S.nbytes / t_dense / 1e9, 1)
    print(f"dense GEMV: {t_dense * 1e3:.3f} ms "
          f"({S.nbytes / t_dense / 1e9:.0f} GB/s eff; HBM in use {hbm_gb()} GB)", flush=True)
    del Sd
    gc.collect()

    # ---- tile-union layout ----
    t0 = time.time()
    tk = pack_tiles(S)
    print(f"tile-union packed in {time.time() - t0:.1f}s: "
          f"uvals {tk.uvals.shape} fwd+adj = {tk.nbytes / 1e9:.2f} GB "
          f"(dense {S.nbytes / 1e9:.2f} GB, nnz-bound {nnz * 4 / 1e9:.2f} GB); "
          f"BU = {tk.uvals.shape[1]}, block fill = {nnz / tk.uvals.size:.3f}", flush=True)
    results["tile_bytes_both"] = int(tk.nbytes)
    results["BU"] = int(tk.uvals.shape[1])

    # Keep only the forward pack on device for the matvec timings.
    uv, ub = tk.uvals, tk.ubidx
    del tk
    gc.collect()
    if backend != "cpu":
        t_tile = timeit(lambda: pk.tile_matvec(uv, ub, x))
        results["tile_pallas_ms"] = round(t_tile * 1e3, 3)
        results["tile_pallas_GBps"] = round(int(np.prod(uv.shape)) * 4 / t_tile / 1e9, 1)
        print(f"tile-union Pallas: {t_tile * 1e3:.3f} ms "
              f"({results['tile_pallas_GBps']:.0f} GB/s eff, "
              f"{t_dense / t_tile:.2f}x vs dense; HBM {hbm_gb()} GB)", flush=True)

    t_tile_xla = timeit(lambda: pk.tile_matvec_xla(uv, ub, x))
    results["tile_xla_ms"] = round(t_tile_xla * 1e3, 3)
    print(f"tile-union XLA: {t_tile_xla * 1e3:.3f} ms "
          f"({t_dense / t_tile_xla:.2f}x vs dense)", flush=True)
    del uv, ub
    gc.collect()

    # ---- hybrid packed top-k (nnz-bound capacity layout) ----
    t0 = time.time()
    hk = pack_dense(S)
    print(f"packed in {time.time() - t0:.1f}s: {hk.nbytes / 1e9:.2f} GB "
          f"(heavy block {hk.dense_block.shape})", flush=True)
    results["packed_bytes"] = int(hk.nbytes)
    mv = jax.jit(lambda k, v: k.matvec(v))
    rmv = jax.jit(lambda k, v: k.rmatvec(v))
    t_pmv = timeit(lambda: mv(hk, x), n=3)
    t_prmv = timeit(lambda: rmv(hk, u), n=3)
    results["packed_matvec_ms"] = round(t_pmv * 1e3, 3)
    results["packed_rmatvec_ms"] = round(t_prmv * 1e3, 3)
    print(f"packed matvec: {t_pmv * 1e3:.3f} ms ({t_dense / t_pmv:.2f}x vs dense); "
          f"rmatvec: {t_prmv * 1e3:.3f} ms (HBM {hbm_gb()} GB)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
