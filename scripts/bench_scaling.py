"""Scaling-efficiency harness: LSQR matvec throughput vs mesh size.

On a real multi-chip slice this measures the matvec scaling efficiency
(target >= 80%, BASELINE.json). On a single-host CPU run with
--xla_force_host_platform_device_count it merely validates the harness
(virtual devices share the same silicon, so efficiency numbers are
meaningless there — the point is that the sharded program compiles and
runs at every mesh size).

Usage: python scripts/bench_scaling.py [max_devices]
"""

import json
import os
import sys
import time

import numpy as np


def main():
    max_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 0

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tomofastx_tpu.ops.lsqr import lsqr_solve
    from tomofastx_tpu.parallel.mesh import CELLS_AXIS, make_mesh

    devices = jax.devices()
    n_all = len(devices)
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= (max_dev or n_all)]

    ndata = int(os.environ.get("SCALE_NDATA", 2048))
    N = int(os.environ.get("SCALE_NCELLS", 262144))
    niter = int(os.environ.get("SCALE_NITER", 50))
    alpha = 1e-3
    key = jax.random.PRNGKey(0)
    S_host = jax.random.normal(key, (ndata, N), jnp.float32) / np.sqrt(N)
    b = jax.random.normal(jax.random.PRNGKey(1), (ndata,), jnp.float32)
    bb = jnp.concatenate([b, jnp.zeros((N,), jnp.float32)])

    results = []
    t0_ref = None
    for n in sizes:
        mesh = make_mesh(n)
        with mesh:
            S = jax.device_put(S_host, NamedSharding(mesh, P(None, CELLS_AXIS)))

            @jax.jit
            def solve(S, bb):
                def matvec(x):
                    return jnp.concatenate([S @ x, alpha * x])

                def rmatvec(u):
                    return S.T @ u[:ndata] + alpha * u[ndata:]

                return lsqr_solve(matvec, rmatvec, bb, N, niter=niter, rmin=0.0)

            res = solve(S, bb)
            _ = float(res.r)  # completion fence (see CLAUDE.md)
            t0 = time.time()
            res = solve(S, bb)
            _ = float(res.r)
            dt = time.time() - t0

        if t0_ref is None:
            t0_ref = dt
        eff = t0_ref / (dt * n)
        row = {
            "mesh": n,
            "solve_wall_s": round(dt, 4),
            "iters_per_s": round(int(res.iters) / dt, 1),
            "scaling_efficiency": round(eff, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    return results


if __name__ == "__main__":
    main()
