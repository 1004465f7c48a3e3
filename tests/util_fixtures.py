"""Synthetic fixture builders for feature paths without shipped data
(the 2-body and magbubble model grids are stripped from this snapshot)."""

import os

import numpy as np


def write_grid_file(path, nx, ny, nz, h=(100.0, 100.0, 50.0), origin=(0.0, 0.0, 0.0)):
    """Write a reference-format 9-column model grid file, i-fastest order."""
    hx, hy, hz = h
    ox, oy, oz = origin
    N = nx * ny * nz
    with open(path, "w") as f:
        f.write(f"{N}\n")
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    x1, x2 = ox + i * hx, ox + (i + 1) * hx
                    y1, y2 = oy + j * hy, oy + (j + 1) * hy
                    z1, z2 = oz + k * hz, oz + (k + 1) * hz
                    f.write(
                        f"{x1:.3f} {x2:.3f} {y1:.3f} {y2:.3f} {z1:.3f} {z2:.3f} "
                        f"{i + 1} {j + 1} {k + 1}\n"
                    )


def write_data_grid_file(path, X, Y, Z, ncomponents=1):
    n = len(X)
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for i in range(n):
            vals = " ".join("0.0" for _ in range(ncomponents))
            f.write(f"{X[i]:.3f} {Y[i]:.3f} {Z[i]:.3f} {vals}\n")


def write_values_file(path, values):
    """Model values file: header N, then ncomp columns per row.
    values: (N,) or (N, ncomp)."""
    values = np.atleast_2d(values)
    if values.shape[0] == 1 and values.size > values.shape[1]:
        values = values.T
    if values.ndim == 1:
        values = values[:, None]
    with open(path, "w") as f:
        f.write(f"{values.shape[0]}\n")
        np.savetxt(f, values, fmt="%.9E")


def surface_data_points(nx, ny, h=(100.0, 100.0), z=-1.0, step=1):
    """Observation points above cell centers."""
    X, Y, Z = [], [], []
    for j in range(0, ny, step):
        for i in range(0, nx, step):
            X.append((i + 0.5) * h[0])
            Y.append((j + 0.5) * h[1])
            Z.append(z)
    return np.array(X), np.array(Y), np.array(Z)


def make_base_config(tmpdir, nx, ny, nz, ndata, problem="grav"):
    """A Config with a synthetic grid + surface data, ready to customize."""
    from tomofastx_tpu.config.parfile import parse_parfile_lines

    grid_path = os.path.join(tmpdir, "grid.txt")
    data_path = os.path.join(tmpdir, "data.txt")
    write_grid_file(grid_path, nx, ny, nz)

    X, Y, Z = surface_data_points(nx, ny)
    idx = np.linspace(0, len(X) - 1, ndata).astype(int)
    write_data_grid_file(data_path, X[idx], Y[idx], Z[idx])

    cfg = parse_parfile_lines(
        [
            f"global.outputFolderPath = {tmpdir}/out/\n",
            f"modelGrid.size = {nx} {ny} {nz}\n",
            f"modelGrid.{problem}.file = {grid_path}\n",
            f"forward.data.{problem}.nData = {ndata}\n",
            f"forward.data.{problem}.dataGridFile = {data_path}\n",
            "forward.depthWeighting.type = 1\n",
            "inversion.nMajorIterations = 3\n",
            "inversion.nMinorIterations = 40\n",
        ]
    )
    if problem == "magn":
        cfg.inversion.problem_weight = (0.0, 1.0)
    return cfg, grid_path, data_path
