"""Quantify the TPU f32-solve misfit floor on Mansfield (round-5 verdict
item 3) — one process, three configs:

  f32        : production config (f32 solve, compensated-f32-capable f64
               build as shipped) — the 9.4e-07-class floor.
  refined    : f32 inner solves + tpu.refineForward with
               refineForwardPrecision=double (emulated-f64 exact-physics
               residuals each major = mixed-precision iterative
               refinement).
  f64        : fully emulated-f64 solve — what misfit floor the chip can
               actually reach (reference solves in CUSTOM_REAL=double,
               global_typedefs.F90:39; CPU-f64 floor 9.34e-11).

Prints one JSON line -> MANSF_FLOOR.json. Run on the TPU:
    python scripts/run_mansf_floor.py
"""

import json
import os
import sys
import time

import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()
jax.config.update("jax_enable_x64", True)

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARFILE = os.path.join(REF, "parfiles/Parfile_mansf_slice.txt")


def run_one(tag, solve_dtype, refine, compress=True):
    import tempfile

    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    cfg = read_parfile(PARFILE)
    tmp = tempfile.mkdtemp()
    cfg.path_output = tmp + "/"
    if not compress:
        # Compression error (~1e-5 class rows) dominates the refined
        # floor on the shipped config; the uncompressed A/B isolates the
        # refinement's own fixed point.
        cfg.grav.compression_type = cfg.magn.compression_type = 0
        cfg.inversion.compression_type = 0
    if refine:
        cfg.grav.refine_forward = cfg.magn.refine_forward = 1
        cfg.grav.refine_forward_precision = "double"
        cfg.magn.refine_forward_precision = "double"
    t0 = time.time()
    res = solve_problem_joint_gravmag(
        cfg, base_dir=REF, verbose=False,
        solve_dtype=getattr(jnp, solve_dtype),
    )
    wall = time.time() - t0
    out = {
        "tag": tag,
        "solve_dtype": solve_dtype,
        "refine_forward_double": bool(refine),
        "final_cost_grav": float(res.cost_data[0]),
        "wall_s": round(wall, 1),
    }
    print(f"[floor] {tag}: cost {out['final_cost_grav']:.3e} "
          f"wall {wall:.1f}s", flush=True)
    return out


def main():
    import jax.numpy as jnp

    t0 = time.time()
    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    print(f"[floor] handshake {time.time() - t0:.1f}s "
          f"backend={jax.default_backend()}", flush=True)

    results = {
        "backend": jax.default_backend(),
        "cpu_f64_reference_floor": 9.34e-11,
        "runs": [
            run_one("f32", "float32", refine=False),
            run_one("refined", "float32", refine=True),
            run_one("f64", "float64", refine=False),
            # Uncompressed A/B: true mixed-precision iterative refinement
            # (f32 LSQR inner + emulated-f64 exact residuals per major)
            # without the compression-error floor in the way.
            run_one("f32_nocomp", "float32", refine=False, compress=False),
            run_one("refined_nocomp", "float32", refine=True, compress=False),
        ],
    }
    with open(os.path.join(REPO, "MANSF_FLOOR.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
