"""A/B the corner-lattice dense kernel build against the per-cell build.

Round-2 verdict item 5: use the corner-lattice factorization (evaluate the
corner antiderivatives once per lattice node per observation, then
difference into per-cell rows — ops/matrixfree.py::lattice_rows_for_point)
in the DENSE build. This measures the real compute_sensitivity path on the
TPU at the bench shape (64^3 = 262,144 cells) for both build families:

  A. mixed production build (f32 physics + f64 K=1024 near-field patch,
     wavelet compression rate 0.15) — here the physics stage is only ~5%
     of the chunk (the patch + top_k dominate, BASELINE.md profile), so
     the lattice win is bounded.
  B. full-f64 quality build (compute_dtype = f64, no compression) — the
     highest-quality config (truth-corr 0.8142, CLAUDE.md policy), where
     the emulated-f64 per-cell physics dominates (4.1 ms/row measured
     round 2) and corner sharing pays ~8x fewer transcendentals.

Each config runs lattice ON vs OFF with identical shapes/chunks; walls are
reported for the warm second in-process call (first call includes compile;
persistent cache makes reruns cheap). All timings fence with a host fetch.

Run on the TPU: python scripts/bench_build_ab.py   (one process, ~minutes)
"""

import json
import sys
import time

import jax  # noqa: E402

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import GravParams
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.grid import Grid
from tomofastx_tpu.ops import sensitivity as sens

import os

if os.environ.get("BENCH_AB_SMALL", "0") == "1":
    NX = NY = NZ = 16
    ND = 64
else:
    NX = NY = NZ = 64
    ND = 1024  # build rows (enough to amortize per-chunk dispatch)
RATE = 0.15
H = 100.0


def make_fixture():
    i = np.tile(np.arange(NX), NY * NZ)
    j = np.tile(np.repeat(np.arange(NY), NX), NZ)
    k = np.repeat(np.arange(NZ), NX * NY)
    grid = Grid(nx=NX, ny=NY, nz=NZ, X1=i * H, X2=(i + 1) * H,
                Y1=j * H, Y2=(j + 1) * H, Z1=k * H, Z2=(k + 1) * H)
    n_side = int(np.sqrt(ND))
    assert n_side * n_side == ND
    xs = (np.arange(n_side) + 0.5) * (NX * H / n_side)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    data = SurveyData(ndata=ND, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(ND, -0.1)
    return grid, data


def one_build(par, grid, data, compute_dtype, near_field, batch_size):
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float64)
    t0 = time.time()
    kern = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=compute_dtype,
        store_dtype=jnp.float32, batch_size=batch_size,
        near_field_f64=near_field,
    )
    _ = float(jnp.sum(kern.S[:1]))  # completion fence (tunnel)
    cold = time.time() - t0
    t0 = time.time()
    kern2 = sens.compute_sensitivity(
        par, grid, data, cw, compute_dtype=compute_dtype,
        store_dtype=jnp.float32, batch_size=batch_size,
        near_field_f64=near_field,
    )
    checksum = float(jnp.sum(jnp.abs(kern2.S).astype(jnp.float64)))
    warm = time.time() - t0
    del kern, kern2
    return cold, warm, checksum


def main():
    print(f"backend = {jax.default_backend()}", flush=True)
    t0 = time.time()
    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    print(f"tunnel first dispatch: {time.time() - t0:.1f}s", flush=True)

    grid, data = make_fixture()
    out = {"ncells": NX * NY * NZ, "nrows": ND}

    configs = [
        # (tag, compute_dtype, near_field, compression, batch, f32pipe, lattices)
        # NOTE: compute_sensitivity gates the lattice build to f64 physics
        # (commit b8e3f4d), so for the mixed f32 config lattice 1 vs 0 take
        # the IDENTICAL per-cell path — run it once, no A/B pair.
        ("mixed_k1024_rate0.15", jnp.float32, 1024, 1, 256, 0, (1,)),
        ("full_f64_nocomp", jnp.float64, 0, 0, 32, 0, (1, 0)),
        # tpu.f64BuildF32Compress: f64 physics + f32 compression pipeline —
        # the f64-quality compressed build at f32 pipeline speed. (The f64-
        # pipeline compressed variant is omitted: emulated-f64 wavelet +
        # top_k is ~20x the physics and its program is a dead compile.)
        ("full_f64_rate0.15_f32pipe", jnp.float64, 0, 1, 32, 1, (1,)),
        # Larger batch for the lattice f64 build (per-cell f64 OOMs above
        # B=32, but the lattice corner-field temps are ~8x smaller), and
        # the compressed variant at the same batch.
        ("full_f64_nocomp_B128", jnp.float64, 0, 0, 128, 0, (1,)),
        ("full_f64_rate0.15_f32pipe_B128", jnp.float64, 0, 1, 128, 1, (1,)),
    ]
    for tag, cdt, nf, comp, bs, f32pipe, lattices in configs:
        for lattice in lattices:
            par = GravParams(nx=NX, ny=NY, nz=NZ, ndata=ND,
                             depth_weighting_type=1, Z0=0.1,
                             depth_weighting_power=2.0)
            par.compression_type = comp
            par.compression_rate = RATE
            par.lattice_build = lattice
            par.f64_build_f32_compress = f32pipe
            cold, warm, chk = one_build(par, grid, data, cdt, nf, bs)
            key = f"{tag}_lattice{lattice}"
            out[key] = {"cold_s": round(cold, 2), "warm_s": round(warm, 2),
                        "rows_per_s_warm": round(ND / warm, 1),
                        "checksum": chk}
            print(f"{key}: cold {cold:.1f}s, warm {warm:.1f}s "
                  f"({ND / warm:.0f} rows/s), checksum {chk:.6e}", flush=True)

    for tag in ("full_f64_nocomp",):
        a, b = out[f"{tag}_lattice1"], out[f"{tag}_lattice0"]
        out[f"{tag}_speedup"] = round(b["warm_s"] / a["warm_s"], 2)
        rel = abs(a["checksum"] - b["checksum"]) / max(abs(b["checksum"]), 1e-30)
        out[f"{tag}_checksum_rel_dev"] = rel
        print(f"{tag}: lattice speedup {out[f'{tag}_speedup']}x, "
              f"checksum rel dev {rel:.2e}", flush=True)
    if "full_f64_rate0.15_f32pipe_lattice1" in out:
        f64c = out["full_f64_rate0.15_f32pipe_lattice1"]
        mix = out["mixed_k1024_rate0.15_lattice1"]
        print(f"f64-quality compressed build vs mixed production build: "
              f"{f64c['rows_per_s_warm']} vs {mix['rows_per_s_warm']} rows/s",
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
