"""Million-cell regime demo (VERDICT round-1 item 7).

End-to-end synthetic gravity inversion at 128 x 128 x 64 = 1,048,576 cells
with 2,025 surface observations — 18x the reference's largest shipped
fixture (Hamersley, 57,057 cells) — through the full product path:
Parfile -> readers -> mixed-precision kernel build (f32 + f64 near-field
patch) -> dense f32 stored kernel (8.5 GB HBM) -> fused on-device major
loop -> VTK/costs outputs. Also records the matrix-free (no-storage) mode's
s/LSQR-iteration at this scale.

Writes MILLION_CELL.json at the repo root. Run on the TPU:
    python scripts/run_million_cell.py            # full demo
    MC_SMALL=1 python scripts/run_million_cell.py # 16x smaller smoke test
"""

import json
import os
import sys
import time

# Persistent compile cache: the env var is IGNORED on this JAX build —
# must go through jax.config (tomofastx_tpu/utils/compile_cache.py).
import jax  # noqa: E402

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

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
    import jax

    # x64 before any tracing: the mixed-precision build patches the
    # near-field rows in f64 (cli.py:98-103 does the same for the CLI).
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("MC_SMALL", "0") == "1"
    if small:
        nx, ny, nz, nside = 32, 32, 16, 20
        majors, minors = 5, 20
    else:
        nx, ny, nz, nside = 128, 128, 64, 45
        majors, minors = 30, 100
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    # MC_BUILD selects the kernel build config (separate work dirs so a
    # different build's sensit cache is never silently reused):
    #   mixed   (default) f32 physics + f64 K=1024 near-field patch —
    #           since round 4 the f32 part carries the far-field
    #           quadrature blend, so this now holds the f64 anchor too;
    #   f64     full-f64 physics (corner-lattice, round 3; B auto-capped);
    #   f32quad pure compensated-f32 (round 4) — f64-anchor quality with
    #           zero emulated-f64 work, the fastest quality build.
    # MC_F64_BUILD=1 is the legacy alias for MC_BUILD=f64.
    mc_build = os.environ.get("MC_BUILD", "")
    if not mc_build:
        mc_build = "f64" if os.environ.get("MC_F64_BUILD", "0") == "1" else "mixed"
    assert mc_build in ("mixed", "f64", "f32quad"), mc_build
    f64_build = mc_build == "f64"
    near_field = 1024 if mc_build == "mixed" else 0
    suffix = {"mixed": "", "f64": "_f64", "f32quad": "_f32quad"}[mc_build]
    work = f"/tmp/million_cell_{nx}x{ny}x{nz}" + suffix
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    i, j, k = write_grid_file_fast(f"{work}/grid.txt", nx, ny, nz, hx, hy, hz)

    # True model: two buried prisms, +500 and -300 kg/m^3.
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
    ]
    # Reuse a kernel cache left by a previous (possibly failed) run: the
    # build is ~14 min on the tunnel, the cache read ~1 min.
    if os.path.exists(f"{work}/out/SENSIT/sensit_grav_meta.txt") and os.path.exists(
        f"{work}/out/SENSIT/sensit_grav_weight"
    ):  # a killed run can leave a partial cache (meta without payload)
        print("reusing existing sensitivity cache", flush=True)
        lines += ["sensit.readFromFiles = 1\n", "sensit.folderPath = out/SENSIT/\n"]
    cfg = parse_parfile_lines(lines)

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "build": {"mixed": "mixed_f32_k1024_farquad",
                     "f64": "full_f64_lattice",
                     "f32quad": "compensated_f32_quad"}[mc_build],
           "backend": jax.default_backend()}

    t0 = time.time()
    try:
        res = solve_problem_joint_gravmag(
            cfg, base_dir=work, verbose=True, fused_chunk=10, near_field_f64=near_field,
            solve_dtype=jnp.float32,
            compute_dtype=jnp.float32 if mc_build == "f32quad" else jnp.float64,
        )
        out["loop_mode"] = "fused(10)"
    except Exception as e:
        # The fused lax.scan program at 1M cells can overwhelm the axon
        # remote-compile helper (observed: HTTP 500, tpu_compile_helper
        # exit 1). Fall back to the host-driven major loop, reloading the
        # kernel from the cache the failed attempt already wrote.
        print(f"fused path failed ({str(e)[:120]}); retrying host-driven "
              f"with cached kernel", flush=True)
        out["fused_error"] = str(e)[:200]
        out["loop_mode"] = "host-driven"
        cfg2 = parse_parfile_lines(lines + [
            "sensit.readFromFiles = 1\n",
            "sensit.folderPath = out/SENSIT/\n",
        ])
        t0 = time.time()
        res = solve_problem_joint_gravmag(
            cfg2, base_dir=work, verbose=True, near_field_f64=near_field,
            solve_dtype=jnp.float32,
            compute_dtype=jnp.float32 if mc_build == "f32quad" else jnp.float64,
        )
    wall = time.time() - t0
    out["wall_s"] = round(wall, 1)
    out["final_cost_data"] = float(res.cost_data[0])
    out["cost_history"] = [
        round(float(h["cost_data"][0]), 8) for h in res.costs_history
    ]

    true_corr = float(np.corrcoef(res.models[0].val.ravel(), val)[0, 1])
    out["truth_correlation"] = round(true_corr, 4)

    from tomofastx_tpu.utils.memory import report as memory_report
    out["memory_report"] = memory_report("")

    # ---- matrix-free s/iter at the same scale ----
    try:
        from tomofastx_tpu.io import data_io, model_io
        from tomofastx_tpu.ops import sensitivity as sens
        from tomofastx_tpu.ops.lsqr import lsqr_solve
        from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

        grid = model_io.read_model_grid(f"{work}/grid.txt", nx, ny, nz)
        data = data_io.read_data_points(f"{work}/data.txt", nd, 1, grid_only=True)
        cw = sens.calculate_depth_weight(cfg.grav, grid, data, jnp.float32)
        op = make_matrixfree_kernel(cfg.grav, grid, data, cw, 1.0, data.weight,
                                    jnp.float32, validate=False)
        b = jnp.asarray(np.random.default_rng(0).normal(size=(nd,)).astype(np.float32))

        solve = jax.jit(lambda op_, b_: lsqr_solve(op_.matvec, op_.rmatvec, b_,
                                                   op_.ncols, niter=3, rmin=0.0))
        r = solve(op, b); _ = float(r.r)
        t0 = time.time()
        r = solve(op, b); _ = float(r.r)
        out["matrixfree_s_per_iter"] = round((time.time() - t0) / int(r.iters), 3)
    except Exception as e:
        out["matrixfree_error"] = str(e)[:200]

    path = os.path.join(
        REPO, {"mixed": "MILLION_CELL.json", "f64": "MILLION_CELL_F64.json",
               "f32quad": "MILLION_CELL_F32QUAD.json"}[mc_build]
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
