"""Decompose the fresh-process cost of the 1M-cell kernel build.

Round-4 finding (TODO.md): the in-process build streams at ~845 rows/s
(~2.4 s of compute for 2025 rows) but a FRESH process with a warm
persistent compile cache pays ~131 s wall — ~100+ s of cross-process
overhead somewhere between trace, XLA compile/cache-load, and the
worker-side executable load. This probe runs the exact production build
(compensated-f32, 128x128x64 = 1,048,576 cells, 45x45 survey) with
per-phase timestamps and compile-cache counters:

  t_handshake   first tiny dispatch (tunnel health)
  t_weights     depth weighting (small programs)
  t_build       compute_sensitivity wall
  pc hits/misses + jax_log_compiles lines with timestamps on stderr

Run it twice in fresh processes: the first may genuinely compile (cache
cold for these shapes), the second measures the warm fresh-process path.

    python scripts/probe_exec_load.py          # -> one JSON line
"""

import json
import logging
import os
import sys
import time

import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_log_compiles", True)

import numpy as np

T0 = time.time()


def _ts(msg):
    print(f"[probe +{time.time() - T0:7.1f}s] {msg}", flush=True)


class StampHandler(logging.Handler):
    """Prints every jax compile/cache log line with a wall timestamp."""

    def emit(self, record):
        msg = record.getMessage()
        if ("compil" in msg.lower() or "cache" in msg.lower()):
            _ts(f"jaxlog: {msg[:160]}")


def main():
    import jax.numpy as jnp

    h = StampHandler()
    h.setLevel(logging.DEBUG)
    for name in ("jax._src.compiler", "jax._src.interpreters.pxla",
                 "jax._src.dispatch"):
        lg = logging.getLogger(name)
        lg.addHandler(h)
        if lg.level > logging.DEBUG or lg.level == 0:
            lg.setLevel(logging.DEBUG)
        lg.propagate = False

    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    t_handshake = time.time() - T0
    _ts(f"handshake done ({t_handshake:.1f}s)")

    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops import sensitivity as sens

    nx, ny, nz, nside = 128, 128, 64, 45
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * hx, X2=(i + 1) * hx,
                Y1=j * hy, Y2=(j + 1) * hy, Z1=k * hz, Z2=(k + 1) * hz)
    xs = (np.arange(nside) + 0.5) * (nx * hx / nside)
    ys = (np.arange(nside) + 0.5) * (ny * hy / nside)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(nd, -0.1)
    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    par.compression_type = 1
    par.compression_rate = 0.15

    t0 = time.time()
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float32)
    cw = np.asarray(cw)
    t_weights = time.time() - t0
    _ts(f"depth weights done ({t_weights:.1f}s)")

    t0 = time.time()
    kern = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=jnp.float32,
        store_dtype=jnp.float32,
    )
    # Fence with a host fetch (block_until_ready lies over the tunnel).
    _ = float(jnp.sum(kern.S[:1, :8]))
    t_build = time.time() - t0
    _ts(f"build done ({t_build:.1f}s, {nd / t_build:.0f} rows/s)")

    print(json.dumps({
        "ncells": N, "ndata": nd,
        "t_handshake_s": round(t_handshake, 1),
        "t_weights_s": round(t_weights, 1),
        "t_build_s": round(t_build, 1),
        "rows_per_s": round(nd / t_build, 1),
        "total_s": round(time.time() - T0, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
