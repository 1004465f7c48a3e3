"""bf16 stored-kernel GEMV experiment (round-1 measured only 1.3x with
the default jnp promotion path; this isolates WHERE the upconversion
happens and whether MXU-native bf16 reaches the expected ~2x HBM win).

Times, on the real cached bench kernel (scripts/bench_capacity.py cache):
  1. f32 S @ f32 x                      (baseline, 495 GB/s measured)
  2. bf16 S @ f32 x via jnp promotion   (XLA may materialize f32(S))
  3. bf16 S @ bf16 x, preferred f32     (native MXU bf16 path)
  4. same three for the adjoint S^T @ u
plus the max relative matvec error of the bf16 paths vs f32.

Prints one JSON line for BASELINE.md.
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_capacity import get_kernel


def timeit(fn, n=10):
    out = fn()
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return (time.time() - t0) / n


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    S = get_kernel()
    nd, N = S.shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(nd,)).astype(np.float32))
    res = {"shape": [nd, N]}

    f32_mv = jax.jit(lambda S_, x_: S_ @ x_)
    bf16_dot = jax.jit(
        lambda S_, x_: jax.lax.dot_general(
            S_, x_.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    bf16_dot_T = jax.jit(
        lambda S_, u_: jax.lax.dot_general(
            S_, u_.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )

    # ---- f32 baseline (kernel resident alone) ----
    Sd = jnp.asarray(S)
    t = timeit(lambda: f32_mv(Sd, x))
    res["f32_ms"] = round(t * 1e3, 3)
    res["f32_GBps"] = round(S.nbytes / t / 1e9, 1)
    y_ref = np.asarray(f32_mv(Sd, x), np.float64)
    tT = timeit(lambda: f32_mv(Sd.T, u))
    res["f32_T_ms"] = round(tT * 1e3, 3)
    print(f"f32:  S@x {t * 1e3:.3f} ms ({res['f32_GBps']} GB/s), S.T@u {tT * 1e3:.3f} ms", flush=True)
    del Sd
    gc.collect()

    # ---- bf16 kernel ----
    Sb = jnp.asarray(S).astype(jnp.bfloat16)
    float(jnp.sum(Sb.astype(jnp.float32)[:1, :1]))  # materialize
    gc.collect()

    t = timeit(lambda: f32_mv(Sb, x))  # jnp promotion path
    res["bf16_promoted_ms"] = round(t * 1e3, 3)
    print(f"bf16 jnp-promoted S@x: {t * 1e3:.3f} ms", flush=True)

    t = timeit(lambda: bf16_dot(Sb, x))
    res["bf16_native_ms"] = round(t * 1e3, 3)
    res["bf16_native_GBps"] = round(S.nbytes / 2 / t / 1e9, 1)
    y_bf = np.asarray(bf16_dot(Sb, x), np.float64)
    err = float(np.max(np.abs(y_bf - y_ref)) / np.max(np.abs(y_ref)))
    res["bf16_matvec_relerr"] = round(err, 6)
    print(f"bf16 native S@x: {t * 1e3:.3f} ms ({res['bf16_native_GBps']} GB/s eff, "
          f"{res['f32_ms'] / res['bf16_native_ms']:.2f}x vs f32; relerr {err:.2e})", flush=True)

    tT = timeit(lambda: bf16_dot_T(Sb, u))
    res["bf16_native_T_ms"] = round(tT * 1e3, 3)
    print(f"bf16 native S.T@u: {tT * 1e3:.3f} ms "
          f"({res['f32_T_ms'] / res['bf16_native_T_ms']:.2f}x vs f32)", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())
