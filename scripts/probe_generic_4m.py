"""Composed-solve probe for the GENERIC blended per-cell operator at 4M
cells (round-5 advisor item: the worker-crash evidence covered the
lattice operator and standalone generic programs, not a composed generic
solve at this scale).

Geometry defeats both fast paths: geometric z-spacing (non-tensor-lattice
in z would still be a lattice — so the X edges are irregular instead) and
jittered observation heights (no BTTB). 200x200x100 cells, 2 majors x 10
LSQR through the full workflow (damping + costs + outputs = a composed
solver program).

    python scripts/probe_generic_4m.py   # -> GENERIC_4M_PROBE.json

NOTE: on TPU the factory now gates the generic blend off above 2M cells
(the crash this script reproduced 3x), so the default run records the
GATED (blend-off) 4M solve. To reproduce the crash itself:
    TOMOFASTX_GENERIC_BLEND_MAX_CELLS=999999999 python scripts/probe_generic_4m.py
"""

import json
import os
import sys
import time

import jax

if os.environ.get("GP_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    small = os.environ.get("GP_SMALL", "0") == "1"
    if small:
        nx, ny, nz, nside = 40, 40, 20, 20
        majors, minors = 2, 10
    else:
        nx, ny, nz, nside = 200, 200, 100, 45
        majors, minors = 2, 10
    hx = hy = 100.0
    hz = 50.0
    N = nx * ny * nz
    nd = nside * nside

    work = f"/tmp/generic4m_{nx}x{ny}x{nz}"
    os.makedirs(work, exist_ok=True)

    # Irregular X edges (2% geometric growth): not a uniform lattice, and
    # detect_lattice requires tensor-product edges shared by ALL cells in
    # a column — a per-axis irregular spacing is still tensor-product, so
    # ALSO shear the grid: offset each z-layer's x-edges by 3 m * k. That
    # breaks the tensor-product factorization outright.
    xe = np.concatenate([[0.0], np.cumsum(hx * 1.02 ** np.arange(nx))])
    ye = np.arange(ny + 1) * hy
    ze = np.arange(nz + 1) * hz
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    shear = 3.0 * k
    X1 = xe[i] + shear
    X2 = xe[i + 1] + shear
    Y1, Y2 = ye[j], ye[j + 1]
    Z1, Z2 = ze[k], ze[k + 1]

    hdr = f"{N}"
    cols = np.column_stack([X1, X2, Y1, Y2, Z1, Z2, i + 1, j + 1, k + 1])
    from tomofastx_tpu.io.tableio import save_table

    t0 = time.time()
    save_table(f"{work}/grid.txt", cols,
               fmt="%.3f %.3f %.1f %.1f %.1f %.1f %d %d %d", header=hdr)

    val = np.zeros(N)
    body = (
        (i >= nx // 4) & (i < nx // 4 + nx // 8)
        & (j >= ny // 4) & (j < ny // 4 + ny // 8)
        & (k >= nz // 4) & (k < nz // 4 + nz // 4)
    )
    val[body] = 500.0
    save_table(f"{work}/true_model.txt", val[:, None], fmt="%.2f", header=hdr)

    rng = np.random.default_rng(11)
    span = xe[-1]
    xs = (np.arange(nside) + 0.5) * (span / nside)
    ys = (np.arange(nside) + 0.5) * (ny * hy / nside)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    zs = -0.1 - 0.05 * rng.uniform(size=nd)  # jittered heights: no BTTB
    save_table(
        f"{work}/data.txt",
        np.column_stack([X.ravel(), Y.ravel(), zs, np.zeros(nd)]),
        fmt="%.3f %.3f %.4f %.1f", header=f"{nd}",
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
        f"tpu.farFieldQuad = {os.environ.get('GP_FARQ', '1')}\n",
    ])

    out = {"ncells": N, "ndata": nd, "majors": majors, "minors": minors,
           "backend": jax.default_backend(), "grid": "sheared+geometric-x"}
    t0 = time.time()
    res = solve_problem_joint_gravmag(
        cfg, base_dir=work, verbose=True, solve_dtype=jnp.float32,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["final_cost"] = float(res.cost_data[0])
    m_rec = np.asarray(res.models[0].val).ravel()
    out["truth_corr"] = round(float(np.corrcoef(m_rec, val)[0, 1]), 6)
    with open(os.path.join(REPO, "GENERIC_4M_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
