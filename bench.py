"""Benchmark: LSQR hot loop on a production-scale dense sensitivity kernel.

Primary perf metric (BASELINE.json): sensitivity matvec GFLOP/s/chip,
measured through the real solver path — a jitted LSQR solve (damped system)
whose per-iteration cost is one S@v and one S^T@u GEMV over the stored f32
kernel, exactly the inner loop of every inversion this framework runs.

Baseline (vs_baseline): the Fortran reference cannot be built in this image
(no gfortran/MPI), so the comparison point is the estimated 48-core CPU CSR
matvec throughput of the reference's LSQR loop, ~8 GFLOP/s effective
(2-socket server-class memory bandwidth ~200 GB/s over 8 bytes/flop CSR with
f32 values + int32 indices, plus MPI_Allreduce latency per iteration) —
documented in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    # Persistent compilation cache: the LSQR while-loop compile costs
    # minutes over a tunneled TPU; cache it across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tomofastx_tpu.ops.lsqr import lsqr_solve

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    if small:
        ndata, N = 512, 32768
    else:
        ndata, N = 4096, 262144  # 4.3 GB f32 kernel (64^3 cells, 4096 rows)
    niter = 100
    alpha = 1e-3

    t_gen = time.time()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    S = jax.random.normal(k1, (ndata, N), jnp.float32) * (1.0 / np.sqrt(N))
    b = jax.random.normal(k2, (ndata,), jnp.float32)
    bb = jnp.concatenate([b, jnp.zeros((N,), jnp.float32)])
    jax.block_until_ready((S, bb))
    _log(f"[bench] data generated in {time.time() - t_gen:.1f}s "
         f"({ndata}x{N} f32, {ndata * N * 4 / 1e9:.2f} GB)")

    @jax.jit
    def solve(S, bb):
        # S must be an argument (NOT a closure capture) so it is not baked
        # into the program as a multi-GB constant.
        def matvec(x):
            return jnp.concatenate([S @ x, alpha * x])

        def rmatvec(u):
            return S.T @ u[:ndata] + alpha * u[ndata:]

        return lsqr_solve(matvec, rmatvec, bb, N, niter=niter, rmin=0.0)

    # Warm-up / compile. NOTE: on the tunneled axon backend
    # block_until_ready can return before remote execution completes, so all
    # timing fences use an explicit host fetch of a result scalar.
    t_comp = time.time()
    res = solve(S, bb)
    _ = float(res.r)
    _log(f"[bench] compile + first solve in {time.time() - t_comp:.1f}s")

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        res = solve(S, bb)
        _ = float(res.r)  # host fetch = completion fence
    dt = (time.time() - t0) / reps

    iters = int(res.iters)
    # 2 GEMVs per iteration, 2*ndata*N flops each.
    flops = iters * 2 * (2.0 * ndata * N)
    gflops = flops / dt / 1e9
    iters_per_s = iters / dt

    baseline_gflops = 8.0  # estimated 48-core MPI reference (see BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "sensit_matvec_gflops_per_chip",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(gflops / baseline_gflops, 2),
                "detail": {
                    "ndata": ndata,
                    "ncells": N,
                    "lsqr_iters": iters,
                    "lsqr_iters_per_s": round(iters_per_s, 2),
                    "solve_wall_s": round(dt, 4),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
