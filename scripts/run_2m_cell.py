"""2-million-cell capacity demo: bf16 stored kernel + exact-physics
iterative refinement on ONE TPU v5e.

160 x 160 x 80 = 2,048,000 cells with 2,025 surface observations: the f32
dense kernel would be 16.6 GB (over the 16 GB chip), the bf16 kernel is
8.3 GB — `tpu.kernelStoreDtype = bfloat16` builds it DIRECTLY in bf16 and
`tpu.refineForward = 1` measures residuals against the exact closed-form
physics, so the bf16 operator error is corrected by the major loop rather
than converged to. 36x the reference's largest shipped fixture.

Writes CAPACITY_2M.json at the repo root. Run on the TPU:
    python scripts/run_2m_cell.py
    MC_SMALL=1 python scripts/run_2m_cell.py   # small smoke variant
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
    # x64 before tracing: the mixed build patches near-field rows in f64.
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("MC_SMALL", "0") == "1"
    if small:
        nx, ny, nz, nside = 40, 40, 20, 20
        majors, minors = 4, 20
    else:
        nx, ny, nz, nside = 160, 160, 80, 45
        majors, minors = 20, 100
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    work = f"/tmp/two_m_cell_{nx}x{ny}x{nz}"
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    i, j, k = write_grid_file_fast(f"{work}/grid.txt", nx, ny, nz, hx, hy, hz)

    val = np.zeros(N)
    body1 = (
        (i >= nx // 4) & (i < nx // 4 + nx // 8)
        & (j >= ny // 4) & (j < ny // 4 + ny // 8)
        & (k >= nz // 4) & (k < nz // 4 + nz // 4)
    )
    body2 = (
        (i >= 5 * nx // 8) & (i < 5 * nx // 8 + nx // 8)
        & (j >= ny // 2) & (j < ny // 2 + ny // 8)
        & (k >= nz // 8) & (k < nz // 8 + nz // 4)
    )
    val[body1] = 500.0
    val[body2] = -300.0
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

    lines = [
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
        # The capacity mode under demo: bf16 kernel storage built directly
        # into bfloat16, residuals refined through exact physics, no cache
        # write (16.6 GB f32 cache pull has no place in a one-shot demo).
        "tpu.kernelStoreDtype = bfloat16\n",
        "tpu.refineForward = 1\n",
        "tpu.sensitWriteCache = 0\n",
    ]
    cfg = parse_parfile_lines(lines)

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "backend": jax.default_backend(),
           "kernel_gb_bf16": round(N * nd * 2 / 1024**3, 2),
           "kernel_gb_f32_would_be": round(N * nd * 4 / 1024**3, 2)}

    t0 = time.time()
    res = solve_problem_joint_gravmag(
        cfg, base_dir=work, verbose=True, fused_chunk=5, near_field_f64=1024,
        solve_dtype=jnp.float32,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["loop_mode"] = f"fused(5), bf16 kernel + refineForward"
    out["final_cost_exact_physics"] = float(res.cost_data[0])
    out["cost_history"] = [
        round(float(h["cost_data"][0]), 8) for h in res.costs_history
    ]
    out["truth_correlation"] = round(
        float(np.corrcoef(res.models[0].val.ravel(), val)[0, 1]), 4
    )

    from tomofastx_tpu.utils.memory import report as memory_report
    out["memory_report"] = memory_report("")

    path = os.path.join(REPO, "CAPACITY_2M.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
