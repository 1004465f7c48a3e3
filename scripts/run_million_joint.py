"""Million-cell JOINT inversion demo (round-3 verdict item 6).

Every >=1M-cell demo so far was gravity-only, damping-only. This runs the
FULL constraint stack at the million-cell scale on one TPU chip:

  - 128 x 128 x 64 = 1,048,576 cells, TWO problems (gravity density +
    magnetic TMI susceptibility), 1,600 observations each;
  - cross-gradient structural coupling (the 7-offset stencil operators,
    operators.py — never compiled at this scale on the chip before);
  - ADMM disjoint-interval bounds on both models (global bounds);
  - model damping; fused on-device major loop (host-driven fallback);
  - compensated-f32 kernel builds (tpu.farFieldQuad — f64-anchor quality
    at f32 speed, BASELINE.md round 4), bf16 kernel storage so the two
    million-cell kernels fit one 16 GB chip (2 x 3.35 GB at 1600 rows).

True models share one structure (a dense AND magnetic body) plus a
gravity-only body — the cross-gradient must couple the shared structure
without hallucinating the grav-only body into the susceptibility model.

Writes MILLION_JOINT.json at the repo root. Run on the TPU:
    python scripts/run_million_joint.py             # full demo
    MJ_SMALL=1 python scripts/run_million_joint.py  # small smoke test
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


def write_grid_file_fast(path, nx, ny, nz, hx, hy, hz):
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    cols = np.column_stack([
        i * hx, (i + 1) * hx, j * hy, (j + 1) * hy, k * hz, (k + 1) * hz,
        i + 1, j + 1, k + 1,
    ])
    from tomofastx_tpu.io.tableio import save_table

    save_table(path, cols, fmt="%.1f %.1f %.1f %.1f %.1f %.1f %d %d %d",
               header=f"{nx * ny * nz}")
    return i, j, k


def main():
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("MJ_SMALL", "0") == "1"
    if small:
        nx, ny, nz, nside = 32, 32, 16, 20
        majors, minors = 4, 20
    else:
        nx, ny, nz, nside = 128, 128, 64, 40
        majors, minors = 15, 60
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    work = f"/tmp/million_joint_{nx}x{ny}x{nz}"
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    i, j, k = write_grid_file_fast(f"{work}/grid.txt", nx, ny, nz, hx, hy, hz)

    # Shared structure: body A is BOTH dense and magnetic; body B is
    # gravity-only (tests that the cross-gradient couples structure
    # without copying amplitude).
    bodyA = (
        (i >= nx // 4) & (i < nx // 4 + nx // 8)
        & (j >= ny // 4) & (j < ny // 4 + ny // 8)
        & (k >= nz // 4) & (k < nz // 4 + nz // 4)
    )
    bodyB = (
        (i >= 5 * nx // 8) & (i < 5 * nx // 8 + nx // 8)
        & (j >= ny // 2) & (j < ny // 2 + ny // 8)
        & (k >= nz // 8) & (k < nz // 8 + nz // 4)
    )
    rho = np.zeros(N)
    rho[bodyA] = 400.0
    rho[bodyB] = -300.0
    chi = np.zeros(N)
    chi[bodyA] = 0.05

    from tomofastx_tpu.io.tableio import save_table

    save_table(f"{work}/true_rho.txt", rho[:, None], fmt="%.2f", header=f"{N}")
    save_table(f"{work}/true_chi.txt", chi[:, None], fmt="%.5f", header=f"{N}")

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
        f"modelGrid.magn.file = {work}/grid.txt\n",
        f"forward.data.grav.nData = {nd}\n",
        f"forward.data.grav.dataGridFile = {work}/data.txt\n",
        f"forward.data.magn.nData = {nd}\n",
        f"forward.data.magn.dataGridFile = {work}/data.txt\n",
        "forward.data.grav.useSyntheticModelForDataValues = 1\n",
        f"forward.data.grav.syntheticModelFile = {work}/true_rho.txt\n",
        "forward.data.magn.useSyntheticModelForDataValues = 1\n",
        f"forward.data.magn.syntheticModelFile = {work}/true_chi.txt\n",
        "forward.magneticField.inclination = 75.0\n",
        "forward.magneticField.declination = 10.0\n",
        "forward.magneticField.intensity_nT = 50000.0\n",
        "forward.depthWeighting.type = 1\n",
        "forward.depthWeighting.grav.power = 2.0\n",
        "forward.depthWeighting.grav.Z0 = 0.1\n",
        "forward.depthWeighting.magn.power = 3.0\n",
        "forward.depthWeighting.magn.Z0 = 0.1\n",
        f"inversion.nMajorIterations = {majors}\n",
        f"inversion.nMinorIterations = {minors}\n",
        "inversion.minResidual = 1e-13\n",
        # Joint weights: measured on the small fixture (row-norm ratio
        # mag/grav ~ 8.6e11 in these units) and swept: 1e-8 balances the
        # two blocks (both costs converge to ~9e-4 in 4x20 iters; larger
        # freezes grav, smaller freezes mag). MJ_WMAG overrides.
        "inversion.joint.grav.problemWeight = 1.0\n",
        f"inversion.joint.magn.problemWeight = {os.environ.get('MJ_WMAG', '1e-8')}\n",
        "inversion.modelDamping.grav.weight = 1e-11\n",
        "inversion.modelDamping.magn.weight = 1e-11\n",
        # Cross-gradient structural coupling (forward differences, the
        # Hamersley joint config's derivative type). Swept on the small
        # fixture: 0.01 lifts the susceptibility truth-corr 0.362 -> 0.475
        # by transferring the grav-resolved geometry, while both data
        # costs keep converging; 1.0 over-couples (mag misfit 0.24).
        f"inversion.crossGradient.weight = {os.environ.get('MJ_XG', '0.01')}\n",
        "inversion.crossGradient.derivativeType = 1\n",
        # ADMM disjoint-interval bounds on both models.
        "inversion.admm.enableADMM = 1\n",
        "inversion.admm.nLithologies = 2\n",
        "inversion.admm.grav.bounds = -350. -250. -1. 450.\n",
        "inversion.admm.grav.weight = 1e-7\n",
        "inversion.admm.magn.bounds = -0.001 0.001 0.04 0.06\n",
        "inversion.admm.magn.weight = 1e-7\n",
        # bf16 kernel storage: two million-cell kernels on one chip.
        "tpu.kernelStoreDtype = bfloat16\n",
        "tpu.sensitWriteCache = 0\n",
    ]
    cfg = parse_parfile_lines(lines)

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "build": "compensated_f32_quad", "store": "bfloat16",
           "constraints": "cross-gradient + ADMM(2 litho) + damping",
           "backend": jax.default_backend()}

    t0 = time.time()
    try:
        res = solve_problem_joint_gravmag(
            cfg, base_dir=work, verbose=True, fused_chunk=5,
            solve_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
        out["loop_mode"] = "fused(5)"
    except Exception as e:
        print(f"fused path failed ({str(e)[:160]}); retrying host-driven",
              flush=True)
        out["fused_error"] = str(e)[:200]
        out["loop_mode"] = "host-driven"
        t0 = time.time()
        res = solve_problem_joint_gravmag(
            cfg, base_dir=work, verbose=True,
            solve_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
    wall = time.time() - t0
    out["wall_s"] = round(wall, 1)
    out["final_cost_grav"] = float(res.cost_data[0])
    out["final_cost_magn"] = float(res.cost_data[1])
    out["cost_history_grav"] = [
        round(float(h["cost_data"][0]), 8) for h in res.costs_history
    ]
    out["cost_history_magn"] = [
        round(float(h["cost_data"][1]), 8) for h in res.costs_history
    ]

    m_rho = np.asarray(res.models[0].val).ravel()
    m_chi = np.asarray(res.models[1].val).ravel()
    out["truth_corr_grav"] = round(float(np.corrcoef(m_rho, rho)[0, 1]), 4)
    out["truth_corr_magn"] = round(float(np.corrcoef(m_chi, chi)[0, 1]), 4)
    # Structure-leak check: mean |chi| inside the grav-only body vs inside
    # the shared body — the cross-gradient must not copy body B into chi.
    out["chi_in_shared_body"] = float(np.mean(np.abs(m_chi[bodyA])))
    out["chi_in_grav_only_body"] = float(np.mean(np.abs(m_chi[bodyB])))

    from tomofastx_tpu.utils.memory import report as memory_report

    out["memory_report"] = memory_report("")

    with open(os.path.join(REPO, "MILLION_JOINT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
