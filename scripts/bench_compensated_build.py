"""TPU measurement session for the compensated-f32 build (round-4).

One process (the tunnel handshake costs minutes when degraded — pay it
once). Phases:

  A. tunnel health probe (per CLAUDE.md every wall number is confounded
     without it);
  B. lattice bench shape (64^3 = 262,144 cells, 1024 rows, compression
     rate 0.15): compensated-f32 build vs raw-f32 vs the mixed production
     build vs the round-3 f64+f32pipe lattice quality build — rows/s;
  C. NON-lattice (topography) shape, same size: compensated-f32 vs the
     per-cell f64+f32pipe build — the round-3 verdict item 3 gate is
     compensated-f32 >= 3x the per-cell-f64 rows/s (plus CPU-pinned
     quality within 1e-3 of the f64 anchor, test_e2e_synthetic.py);
  D. full Mansfield inversion with the compensated-f32 build on the TPU:
     wall + truth correlation + misfit floor (the CPU anchor is
     0.814161 / 9.35e-11 — identical to full f64) + the WAVELET_DOMAIN
     log line (the Mansfield config IS the wavelet-domain solve mode,
     joint_inverse_problem.F90:189-200 — hardware receipt for the
     round-3 verdict item 7).

Writes COMPENSATED_BUILD_TPU.json.
"""

import json
import os
import time

import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import GravParams, read_parfile
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import sensitivity as sens

if os.environ.get("BENCH_COMP_SMALL", "0") == "1":
    NX = NY = NZ = 16
    ND = 64
else:
    NX = NY = NZ = 64
    ND = 1024
RATE = 0.15
H = 100.0
OUT = {}


def log(msg):
    print(msg, flush=True)


def checkpoint():
    """Write partial results after every phase — the axon tunnel can
    stall for an hour mid-session; whatever completed must survive."""
    with open("COMPENSATED_BUILD_TPU.json", "w") as f:
        json.dump(OUT, f, indent=1)


def make_fixture(topo=False):
    i = np.tile(np.arange(NX), NY * NZ)
    j = np.tile(np.repeat(np.arange(NY), NX), NZ)
    k = np.repeat(np.arange(NZ), NX * NY)
    if topo:
        # Smooth per-column z offset: breaks the tensor-product lattice,
        # forcing the general per-cell build (the irregular-grid case).
        off = 15.0 + 14.0 * np.sin(0.4 * i) * np.cos(0.3 * j)
    else:
        off = np.zeros(NX * NY * NZ)
    grid = Grid(nx=NX, ny=NY, nz=NZ, X1=i * H, X2=(i + 1) * H,
                Y1=j * H, Y2=(j + 1) * H,
                Z1=off + k * H, Z2=off + (k + 1) * H)
    n_side = int(np.sqrt(ND))
    xs = (np.arange(n_side) + 0.5) * (NX * H / n_side)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    data = SurveyData(ndata=ND, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(ND, -1.0)
    return grid, data


def one_build(tag, grid, data, compute_dtype, near_field=0, batch=256,
              far_quad=1, f32pipe=0, lattice=1):
    par = GravParams(nx=NX, ny=NY, nz=NZ, ndata=ND, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    par.compression_type = 1
    par.compression_rate = RATE
    par.lattice_build = lattice
    par.far_field_quad = far_quad
    par.f64_build_f32_compress = f32pipe
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float64)
    t0 = time.time()
    kern = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=compute_dtype,
        store_dtype=jnp.float32, batch_size=batch,
        near_field_f64=near_field,
    )
    _ = float(jnp.sum(kern.S[:1]))
    cold = time.time() - t0
    t0 = time.time()
    kern = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=compute_dtype,
        store_dtype=jnp.float32, batch_size=batch,
        near_field_f64=near_field,
    )
    checksum = float(jnp.sum(jnp.abs(kern.S).astype(jnp.float64)))
    warm = time.time() - t0
    del kern
    rec = {"cold_s": round(cold, 2), "warm_s": round(warm, 2),
           "rows_per_s_warm": round(ND / warm, 1), "checksum": checksum}
    OUT[tag] = rec
    checkpoint()
    log(f"{tag}: cold {cold:.1f}s, warm {warm:.1f}s "
        f"({ND / warm:.0f} rows/s), checksum {checksum:.6e}")
    return rec


def main():
    log(f"backend = {jax.default_backend()}")
    t0 = time.time()
    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    first = time.time() - t0
    lat = []
    for i in range(10):
        t0 = time.time()
        _ = float(jnp.float32(float(i)) + jnp.float32(1.0))
        lat.append(time.time() - t0)
    OUT["tunnel"] = {"first_dispatch_s": round(first, 1),
                     "warm_per_dispatch_s": round(float(np.median(lat)), 4)}
    checkpoint()
    log(f"tunnel: first {first:.1f}s, per-dispatch "
        f"{np.median(lat) * 1e3:.0f}ms")

    # --- B: lattice bench shape --------------------------------------
    grid, data = make_fixture(topo=False)
    one_build("lattice_f32quad", grid, data, jnp.float32)
    one_build("lattice_f32plain", grid, data, jnp.float32, far_quad=0)
    one_build("lattice_mixed_k1024", grid, data, jnp.float32,
              near_field=1024)
    one_build("lattice_f64_f32pipe_B128", grid, data, jnp.float64,
              batch=128, f32pipe=1)
    if "lattice_f64_f32pipe_B128" in OUT:
        OUT["lattice_speedup_f32quad_vs_f64pipe"] = round(
            OUT["lattice_f64_f32pipe_B128"]["warm_s"]
            / OUT["lattice_f32quad"]["warm_s"], 2)

    # --- C: non-lattice (topography) shape ---------------------------
    gridT, dataT = make_fixture(topo=True)
    one_build("topo_f32quad", gridT, dataT, jnp.float32)
    # Per-cell f64 build with the f32 compression pipeline — the best
    # irregular-grid quality build before this round (batch auto-capped
    # by _f64_build_batch_cap).
    one_build("topo_f64_f32pipe", gridT, dataT, jnp.float64,
              batch=256, f32pipe=1)
    OUT["topo_speedup_f32quad_vs_percell_f64"] = round(
        OUT["topo_f64_f32pipe"]["warm_s"] / OUT["topo_f32quad"]["warm_s"], 2)
    log(f"VERDICT GATE (>=3x): compensated-f32 is "
        f"{OUT['topo_speedup_f32quad_vs_percell_f64']}x the per-cell f64 "
        f"build on the non-lattice shape")

    # --- D: Mansfield full inversion, compensated-f32 build ----------
    import shutil
    import tempfile

    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag
    from tomofastx_tpu.io import model_io

    REF = "/root/reference"
    true_vals = model_io.read_model_values(
        f"{REF}/data/gravmag/mansf_slice/true_model_grav_3litho-values.txt",
        8192, 1)
    for attempt in ("cold", "warm"):
        cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
        tmp = tempfile.mkdtemp()
        cfg.path_output = tmp + "/"
        t0 = time.time()
        res = solve_problem_joint_gravmag(
            cfg, base_dir=REF, verbose=(attempt == "cold"), fused_chunk=60,
            solve_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
        wall = time.time() - t0
        corr = float(np.corrcoef(
            np.asarray(res.models[0].val).ravel(), true_vals.ravel())[0, 1])
        OUT[f"mansfield_f32quad_{attempt}"] = {
            "wall_s": round(wall, 2),
            "truth_corr": round(corr, 6),
            "cost": float(res.cost_data[0]),
        }
        checkpoint()
        log(f"mansfield compensated-f32 ({attempt}): {wall:.1f}s, "
            f"corr {corr:.6f}, cost {float(res.cost_data[0]):.2e}")
        shutil.rmtree(tmp, ignore_errors=True)

    with open("COMPENSATED_BUILD_TPU.json", "w") as f:
        json.dump(OUT, f, indent=1)
    log(json.dumps(OUT))


if __name__ == "__main__":
    main()
