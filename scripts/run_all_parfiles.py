"""Run every runnable shipped parfile end-to-end (full iteration counts)
and record outcomes in RESULTS.md.

2-body and magbubble are skipped: their model-grid files are stripped from
the reference snapshot (data/.../*.MISSING equivalents)."""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", os.environ.get("RUN_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from tomofastx_tpu.config.parfile import read_parfile
from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

REF = "/root/reference"
PARFILES = [
    "parfiles/Parfile_mansf_slice.txt",
    "parfiles/hamersley/Parfile_hamersley_grav.txt",
    "parfiles/hamersley/Parfile_hamersley_mag.txt",
    "parfiles/hamersley/Parfile_hamersley_xgrad_joint.txt",
    "parfiles/noddy/Parfile_Noddy_grav_ellipsoid_simple.txt",
    "parfiles/noddy/Parfile_Noddy_grav_ellipsoid_simple_petro.txt",
    "parfiles/noddy/Parfile_Noddy_grav_ellipsoid_fault.txt",
    "parfiles/noddy/Parfile_Noddy_grav_ellipsoid_fault_petro.txt",
    "parfiles/noddy/Parfile_Noddy_mag_ellipsoid_simple.txt",
    "parfiles/noddy/Parfile_Noddy_mag_ellipsoid_simple_petro.txt",
    "parfiles/noddy/Parfile_Noddy_mag_ellipsoid_fault.txt",
    "parfiles/noddy/Parfile_Noddy_mag_ellipsoid_fault_petro.txt",
    "parfiles/noddy/Parfile_Noddy_mag_ellipsoid_alter.txt",
]


def main(out_root, solve_dtype):
    rows = []
    for rel in PARFILES:
        name = os.path.basename(rel).replace("Parfile_", "").replace(".txt", "")
        cfg = read_parfile(os.path.join(REF, rel))
        cfg.path_output = os.path.join(out_root, name) + "/"
        t0 = time.time()
        try:
            res = solve_problem_joint_gravmag(
                cfg, base_dir=REF, verbose=False,
                solve_dtype=solve_dtype, compute_dtype=jnp.float64,
            )
            dt = time.time() - t0
            row = {
                "parfile": rel,
                "grid": f"{cfg.grav.nx}x{cfg.grav.ny}x{cfg.grav.nz}",
                "ndata": max(cfg.grav.ndata, cfg.magn.ndata),
                "iters": cfg.inversion.ninversions,
                "cost_grav": res.cost_data[0],
                "cost_magn": res.cost_data[1],
                "wall_s": round(dt, 1),
                "status": "OK",
            }
        except Exception as e:  # record failures honestly
            row = {"parfile": rel, "status": f"FAIL: {e}", "wall_s": round(time.time() - t0, 1)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


if __name__ == "__main__":
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/run_all"
    rows = main(out_root, jnp.float64)
    # Rewrite ONLY the parfile table at the top of RESULTS.md — the file
    # also records TPU / million-cell / capacity sections that a sweep
    # must never clobber (a previous version overwrote the whole file).
    path = "/root/repo/RESULTS.md"
    tail = ""
    try:
        existing = open(path).read()
        i = existing.find("\n## ")
        if i >= 0:
            tail = existing[i + 1:]
    except FileNotFoundError:
        pass
    with open(path, "w") as f:
        f.write(
            "# RESULTS — full end-to-end runs of every runnable shipped parfile\n\n"
            "CPU backend, f64 solve + f64 kernel build, full shipped iteration\n"
            "counts. cost = relative data misfit ||d_calc - d_obs|| / ||d_obs||\n"
            "(reference: data_gravmag.f90:123-129). 2-body and magbubble model\n"
            "grids are stripped from this reference snapshot and cannot run.\n\n"
            "| Parfile | grid | ndata | major iters | final grav cost | final mag cost | wall |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if r.get("status") == "OK":
                f.write(
                    f"| {r['parfile']} | {r['grid']} | {r['ndata']} | {r['iters']} "
                    f"| {r['cost_grav']:.3e} | {r['cost_magn']:.3e} | {r['wall_s']}s |\n"
                )
            else:
                f.write(f"| {r['parfile']} | — | — | — | — | — | {r['status']} |\n")
        if tail:
            f.write("\n" + tail)
    print("wrote RESULTS.md (table only; kept trailing sections)")
