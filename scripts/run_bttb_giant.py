"""Giant-scale BTTB demo: full inversion at 33M-134M cells on ONE chip.

The FFT/BTTB operator (ops/bttb.py) does the forward/adjoint in
O(nz * P^2 log P) with zero kernel storage — the only O(N) objects are the
model-space vectors, so the cell count is bounded by HBM vector storage,
not by the kernel. A 33.5M-cell problem's dense kernel would be 8.6 TB
f32; the reference's largest shipped fixture is 57k cells.

Run on the TPU:
    python scripts/run_bttb_giant.py            # 512x512x128 = 33.5M cells
    BG_134M=1 python scripts/run_bttb_giant.py  # 512x512x512 = 134M cells
    BG_SMALL=1 python scripts/run_bttb_giant.py # smoke variant

Writes BTTB_GIANT.json (or BTTB_GIANT_134M.json).
"""

import json
import os
import sys
import time

import jax

if os.environ.get("BG_CPU", "0") == "1":  # CPU smoke (JAX_PLATFORMS=axon
    jax.config.update("jax_platforms", "cpu")  # cannot be overridden by env)

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_million_cell import write_grid_file_fast


def main():
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("BG_SMALL", "0") == "1"
    big = os.environ.get("BG_134M", "0") == "1"
    if small:
        nx, ny, nz, nside, stride = 64, 64, 32, 32, 2
        majors, minors = 2, 10
    elif big:
        nx, ny, nz, nside, stride = 512, 512, 512, 256, 2
        majors, minors = 5, 20
    else:
        nx, ny, nz, nside, stride = 512, 512, 128, 256, 2
        majors, minors = 10, 25
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    work = f"/tmp/bttb_giant_{nx}x{ny}x{nz}"
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    if not os.path.exists(f"{work}/.fixtures_ok"):  # ~10 min at 134M cells
        write_grid_file_fast(f"{work}/grid.txt", nx, ny, nz, hx, hy, hz)

        val = np.zeros(N)
        body = (
            (i >= nx // 4) & (i < nx // 4 + nx // 8)
            & (j >= ny // 4) & (j < ny // 4 + ny // 8)
            & (k >= nz // 8) & (k < nz // 8 + nz // 8)
        )
        val[body] = 500.0
        from tomofastx_tpu.io.tableio import save_table

        save_table(f"{work}/true_model.txt", val[:, None], fmt="%.2f",
                   header=f"{N}")

        # Survey on the cell lattice (offset h/2, stride*h spacing) at one
        # height -> detect_bttb engages the FFT operator.
        xs = 0.5 * hx + np.arange(nside) * stride * hx
        ys = 0.5 * hy + np.arange(nside) * stride * hy
        X, Y = np.meshgrid(xs, ys, indexing="ij")
        save_table(
            f"{work}/data.txt",
            np.column_stack(
                [X.ravel(), Y.ravel(), np.full(nd, -0.1), np.zeros(nd)]
            ),
            fmt="%.2f %.2f %.2f %.1f", header=f"{nd}",
        )
        open(f"{work}/.fixtures_ok", "w").write("ok\n")
    fixtures_s = time.time() - t0
    print(f"fixtures written in {fixtures_s:.0f}s", flush=True)

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
    ])

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "backend": jax.default_backend(),
           "dense_kernel_tb_would_be": round(N * nd * 4 / 1024**4, 3),
           "kernel_storage_gb": 0.0,
           "fixtures_io_s": round(fixtures_s, 1)}

    # BG_FUSED=1 runs the major loop on-device (lax.scan over majors):
    # the host-side per-major overhead (134 MB delta pulls over the
    # 0.13 GB/s tunnel + dispatch) disappears — only the final state and
    # cost rows return.
    fused = majors if os.environ.get("BG_FUSED", "0") == "1" else 0
    out["fused"] = bool(fused)
    t0 = time.time()
    res = solve_problem_joint_gravmag(
        cfg, base_dir=work, verbose=True, solve_dtype=jnp.float32,
        fused_chunk=fused,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["final_cost"] = float(res.cost_data[0])
    out["cost_history"] = [
        round(float(h["cost_data"][0]), 8) for h in res.costs_history
    ]

    from tomofastx_tpu.utils.memory import report as memory_report
    out["memory_report"] = memory_report("")

    path = os.path.join(
        REPO, "BTTB_GIANT_134M.json" if big else "BTTB_GIANT.json"
    )
    if small:
        path = "/tmp/bttb_giant_smoke.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
