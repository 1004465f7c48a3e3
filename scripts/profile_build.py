"""Profile the sensitivity-build pipeline stages on the real TPU.

The 4096 x 262k rate-0.15 build takes ~500 s (bench_capacity) = 8 rows/s;
the kernel-build phase dominates one-shot product runs (the fused solve is
4.7 s). This times each stage of build_chunk separately at the bench shape
to target optimization:

  1. prism physics rows only (vmap gravi_z over a 256-row chunk)
  2. + f64 near-field patch (the --fast-build mixed mode)
  3. + 3-D wavelet transform
  4. + top_k threshold (the suspected cost: XLA sorts 262k per row)
  5. host transfer of the finished chunk (tunnel bandwidth)

Prints one JSON line for BASELINE.md.
"""

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

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_capacity import NX, NY, NZ, ND, RATE, make_data, make_grid

from tomofastx_tpu.ops import prism
from tomofastx_tpu.ops import wavelet as W

B = 256  # chunk rows


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return (time.time() - t0) / n


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    grid = make_grid()
    data = make_data()
    N = grid.nelements_total
    nel = int(RATE * N)

    ga32 = tuple(jnp.asarray(a, jnp.float32)
                 for a in (grid.X1, grid.X2, grid.Y1, grid.Y2, grid.Z1, grid.Z2))
    ga64 = tuple(jnp.asarray(a, jnp.float64)
                 for a in (grid.X1, grid.X2, grid.Y1, grid.Y2, grid.Z1, grid.Z2))
    xc = jnp.asarray(0.5 * (grid.X1 + grid.X2), jnp.float32)
    yc = jnp.asarray(0.5 * (grid.Y1 + grid.Y2), jnp.float32)
    zc = jnp.asarray(0.5 * (grid.Z1 + grid.Z2), jnp.float32)

    xd = jnp.asarray(data.X[:B], jnp.float32)
    yd = jnp.asarray(data.Y[:B], jnp.float32)
    zd = jnp.asarray(data.Z[:B], jnp.float32)

    res = {"chunk_rows": B, "ncells": N}

    @jax.jit
    def rows_only(xd, yd, zd):
        return jax.vmap(lambda x, y, z: prism.gravi_z(x, y, z, *ga32))(xd, yd, zd)

    t = timeit(rows_only, xd, yd, zd)
    res["prism_f32_s"] = round(t, 3)
    print(f"prism f32 rows: {t:.3f} s/chunk ({B / t:.0f} rows/s)", flush=True)

    K = 1024

    @jax.jit
    def rows_patched(xd, yd, zd):
        def one(x, y, z):
            r = prism.gravi_z(x, y, z, *ga32)
            d2 = (xc - x) ** 2 + (yc - y) ** 2 + (zc - z) ** 2
            _, idx = jax.lax.top_k(-d2, K)
            sub64 = tuple(a[idx] for a in ga64)
            r64 = prism.gravi_z(x.astype(jnp.float64), y.astype(jnp.float64),
                                z.astype(jnp.float64), *sub64)
            return r.astype(jnp.float64).at[idx].set(r64)
        return jax.vmap(one)(xd, yd, zd)

    t = timeit(rows_patched, xd, yd, zd)
    res["prism_patched_s"] = round(t, 3)
    print(f"prism + f64 patch: {t:.3f} s/chunk ({B / t:.0f} rows/s)", flush=True)

    @jax.jit
    def rows_f64(xd, yd, zd):
        return jax.vmap(lambda x, y, z: prism.gravi_z(
            x.astype(jnp.float64), y.astype(jnp.float64),
            z.astype(jnp.float64), *ga64))(xd, yd, zd)

    # Full-f64 at B=256 OOMs the 16 GB chip (emulated-f64 temps); time a
    # smaller chunk and report the per-row rate.
    B64 = 32
    t = timeit(rows_f64, xd[:B64], yd[:B64], zd[:B64])
    res["prism_f64_s_per_row"] = round(t / B64, 4)
    print(f"prism full f64: {t:.3f} s/{B64}-chunk ({B64 / t:.1f} rows/s)", flush=True)

    lines = jnp.asarray(np.random.default_rng(0).normal(size=(B, N)).astype(np.float32))

    wav = jax.jit(lambda L: W.forward_wavelet_flat(L, NX, NY, NZ, 1))
    t = timeit(wav, lines)
    res["wavelet_s"] = round(t, 3)
    print(f"wavelet transform: {t:.3f} s/chunk", flush=True)

    topk = jax.jit(lambda L: jax.lax.top_k(jnp.abs(L), nel + 1)[0][..., -1])
    t = timeit(topk, lines)
    res["topk_s"] = round(t, 3)
    print(f"top_k threshold: {t:.3f} s/chunk", flush=True)

    # Alternative exact selection: full sort (what top_k lowers to anyway?)
    srt = jax.jit(lambda L: jnp.sort(jnp.abs(L), axis=-1)[..., N - (nel + 1)])
    t = timeit(srt, lines)
    res["sort_s"] = round(t, 3)
    print(f"full sort threshold: {t:.3f} s/chunk", flush=True)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        _ = np.asarray(lines)
    t = (time.time() - t0) / reps
    res["host_transfer_s"] = round(t, 3)
    res["host_transfer_GBps"] = round(lines.nbytes / t / 1e9, 2)
    print(f"host transfer: {t:.3f} s/chunk ({res['host_transfer_GBps']} GB/s)", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
