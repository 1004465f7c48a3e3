"""Multi-million-cell matrix-free demo: the no-storage, beyond-HBM mode.

Default: 200 x 200 x 100 = 4,000,000 cells with 2,025 observations on ONE
v5e — the dense kernel would be 30 GB f32 / 15 GB bf16, beyond the 16 GB
chip in any stored representation. `tpu.kernelFormat = matrixfree`
regenerates the closed-form prism rows inside every matvec (via the
corner-lattice operator), so kernel memory is ZERO and the model size is
bounded only by the (N,)-vector working set. This is the top rung of the
capacity ladder (BASELINE.md): dense f32 to ~1M cells, bf16 (+refinement)
to ~2M, matrix-free beyond.

Run on the TPU:
    python scripts/run_4m_matrixfree.py        # 4M cells -> CAPACITY_4M_MATRIXFREE.json
    MC_8M=1 python scripts/run_4m_matrixfree.py  # 8.19M cells (dense would
                                                 # be 62 GB) -> CAPACITY_8M_MATRIXFREE.json
    MC_SMALL=1 python scripts/run_4m_matrixfree.py  # smoke variant
"""

import json
import os
import sys
import time

import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_million_cell import write_grid_file_fast


def main():
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("MC_SMALL", "0") == "1"
    big = os.environ.get("MC_8M", "0") == "1"
    huge = os.environ.get("MC_16M", "0") == "1"
    huge32 = os.environ.get("MC_32M", "0") == "1"
    if small:
        nx, ny, nz, nside = 40, 40, 20, 20
        majors, minors = 2, 10
    elif huge32:
        # 32,000,000 cells (the dense kernel would be 241 GB f32): one
        # chip, zero storage, true-physics blended rows.
        nx, ny, nz, nside = 400, 400, 200, 45
        majors, minors = 3, 10
    elif huge:
        # 16,384,000 cells (286x the reference's largest shipped fixture;
        # the dense kernel would be 124 GB f32) — round-5 top rung of the
        # BLENDED (true-physics f32) matrix-free ladder, enabled by the
        # tiered quadrature's 3.4x flop cut.
        nx, ny, nz, nside = 320, 320, 160, 45
        majors, minors = 3, 12
    elif big:
        # 8,192,000 cells: the dense kernel would be 60 GB f32 / 30 GB
        # bf16 — pure matrix-free territory (143x the reference's largest
        # shipped fixture).
        nx, ny, nz, nside = 256, 250, 128, 45
        majors, minors = 3, 15
    else:
        nx, ny, nz, nside = 200, 200, 100, 45
        majors, minors = 3, 20
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    work = f"/tmp/four_m_mf_{nx}x{ny}x{nz}"
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    i, j, k = write_grid_file_fast(f"{work}/grid.txt", nx, ny, nz, hx, hy, hz)

    val = np.zeros(N)
    body = (
        (i >= nx // 4) & (i < nx // 4 + nx // 8)
        & (j >= ny // 4) & (j < ny // 4 + ny // 8)
        & (k >= nz // 4) & (k < nz // 4 + nz // 4)
    )
    val[body] = 500.0
    from tomofastx_tpu.io.tableio import save_table

    save_table(f"{work}/true_model.txt", val[:, None], fmt="%.2f",
               header=f"{N}")

    xs = (np.arange(nside) + 0.5) * (nx * hx / nside)
    ys = (np.arange(nside) + 0.5) * (ny * hy / nside)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    save_table(
        f"{work}/data.txt",
        np.column_stack([X.ravel(), Y.ravel(), np.full(nd, -0.1), np.zeros(nd)]),
        fmt="%.2f %.2f %.2f %.1f", header=f"{nd}",
    )
    print(f"fixtures written in {time.time() - t0:.0f}s", flush=True)

    from tomofastx_tpu.config.parfile import parse_parfile_lines
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    cfg = parse_parfile_lines([
        f"global.outputFolderPath = {work}/out/\n",
        f"modelGrid.size = {nx} {ny} {nz}\n",
        f"modelGrid.grav.file = {work}/grid.txt\n",
        f"forward.data.grav.nData = {nd}\n",
        f"forward.data.grav.dataGridFile = {work}/data.txt\n",
        "forward.data.grav.useSyntheticModelForDataValues = 1\n",
        f"forward.data.grav.syntheticModelFile = {work}/true_model.txt\n",
        "forward.depthWeighting.type = 1\n",
        "forward.depthWeighting.grav.power = 2.0\n",
        "forward.depthWeighting.grav.Z0 = 0.1\n",
        f"inversion.nMajorIterations = {majors}\n",
        f"inversion.nMinorIterations = {minors}\n",
        "inversion.minResidual = 1e-13\n",
        "inversion.modelDamping.grav.weight = 1e-11\n",
        "tpu.kernelFormat = matrixfree\n",
        # MF_FARQ=0 disables the compensated far-field blend in the
        # operator (A/B + crash isolation; default on).
        f"tpu.farFieldQuad = {os.environ.get('MF_FARQ', '1')}\n",
    ])

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "backend": jax.default_backend(),
           "dense_kernel_gb_would_be": round(N * nd * 4 / 1024**3, 2),
           "kernel_storage_gb": 0.0}

    t0 = time.time()
    res = solve_problem_joint_gravmag(
        cfg, base_dir=work, verbose=True, solve_dtype=jnp.float32,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["final_cost"] = float(res.cost_data[0])
    # Truth correlation of the recovered model — the honest quality
    # metric here: with the blended (true-physics) operator the data
    # misfit converges SLOWER than with the raw-f32 operator, because the
    # raw operator's depth-weighted far field is mostly rounding noise
    # that acts as an accidental regularizer and its low misfit measures
    # fit to that noise (round-5 analysis, BASELINE.md: the blended
    # 131k-cell model matches the f64-physics model to 1e-5 while the
    # raw-f32 model deviates by 6.7e-2).
    m_rec = np.asarray(res.models[0].val).ravel()
    out["truth_corr"] = round(float(np.corrcoef(m_rec, val)[0, 1]), 6)
    out["cost_history"] = [
        round(float(h["cost_data"][0]), 8) for h in res.costs_history
    ]
    out["lsqr_iters_per_major"] = minors

    from tomofastx_tpu.utils.memory import report as memory_report
    out["memory_report"] = memory_report("")

    path = os.path.join(
        REPO,
        "CAPACITY_32M_MATRIXFREE.json" if huge32
        else "CAPACITY_16M_MATRIXFREE.json" if huge
        else "CAPACITY_8M_MATRIXFREE.json" if big
        else "CAPACITY_4M_MATRIXFREE.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
