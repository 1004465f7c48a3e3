"""Reconstruct the stripped 2-body / magbubble model-grid fixtures.

This reference snapshot strips four large files (.MISSING_LARGE_BLOBS):
the 2-body induced/remanent model grids + true-model values and the
magbubble grid. Their PROPERTIES.README and observation files survive and
(for the 2-body cases) fully specify the experiment:

  - core 41 x 41 x 20 cells of 50 m (PROPERTIES.README), observations at
    the 41 x 41 core cell centers (dummy.obs: 23..2023 m, spacing 50 m,
    z = -5 m) => core origin at x = y = -2 m, z = 0;
  - padding: 13 cells each side E-W/N-S, 10 below ("2depth" in the
    filename: the pad distance equals twice the 1000 m core depth
    laterally, and doubles the total depth vertically — RECONSTRUCTION
    ASSUMPTION, geometric cell growth, documented below);
  - single-cell bodies at core indices (21,15,3) and (21,25,3) with
    susceptibilities 0.05 / 0.1 SI over a 1e-5 SI background;
  - induced: magnetization vector M = chi * B / mu0 along the inducing
    field (incl -60, decl 2, 55000 nT); remanent: add a remanent
    component of Q * |M_induced| along the README's remanence direction
    (Q = 1, body 1: -60/2 i.e. parallel; body 2: incl 60 decl 90).

  - magbubble: 10 x 116 x 150 grid at 50 m x/y; the survey is a 50 m
    drape over topography (mag.obs z = -(terrain + 50) in this Z-down
    elevation-referenced frame), so the terrain under each column is
    recovered from the observation heights; cells extend 150 layers
    of 15 m below the terrain (RECONSTRUCTION ASSUMPTION: constant
    15 m layer thickness => 2250 m of section, covering the -1319 m
    highest-terrain column to below sea level).

The originals cannot be recovered bit-for-bit — every assumption above is
explicitly labeled. The point is to make the two shipped parfile families
RUNNABLE end-to-end (magnetization-vector inversion, type-2 distance
weighting, rate-0.3/0.03 compression, dynamic ADMM on real measured
magbubble data), not to claim parity against the stripped originals.

Usage:
    python scripts/reconstruct_fixtures.py [overlay_dir]

Creates overlay_dir (default /tmp/reference_overlay) mirroring
/root/reference via symlinks, with the four missing files materialized.
Run any parfile against it:   tomofastx -p <parfile> --base-dir <overlay>
"""

import math
import os
import sys

import numpy as np

REF = "/root/reference"
MU0 = 4.0e-7 * math.pi


def geometric_pad(h0, total, n):
    """n cell sizes starting near h0, geometrically growing, summing to
    `total` (solves for the ratio by bisection)."""
    if abs(n * h0 - total) < 1e-9:
        return [h0] * n

    def span(r):
        return h0 * sum(r ** (i + 1) for i in range(n))

    lo, hi = 1.0 + 1e-9, 4.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if span(mid) < total:
            lo = mid
        else:
            hi = mid
    r = 0.5 * (lo + hi)
    return [h0 * r ** (i + 1) for i in range(n)]


def edges_from_sizes(origin, sizes):
    e = [origin]
    for s in sizes:
        e.append(e[-1] + s)
    return e


def write_grid(path, xe, ye, ze):
    nx, ny, nz = len(xe) - 1, len(ye) - 1, len(ze) - 1
    with open(path, "w") as f:
        f.write(f"{nx * ny * nz}\n")
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    f.write(
                        f"{xe[i]:.6f} {xe[i + 1]:.6f} "
                        f"{ye[j]:.6f} {ye[j + 1]:.6f} "
                        f"{ze[k]:.6f} {ze[k + 1]:.6f} "
                        f"{i + 1} {j + 1} {k + 1}\n"
                    )


def dircos(incl, decl):
    d2r = math.pi / 180.0
    # Field direction in (x=E, y=N, z=down)? The reference's convention
    # (magnetic_field.f90:91-110) maps via mod(450 - decl, 360) with the
    # x-axis azimuth; for the TRUE-model magnetization vector we use the
    # same convention as prism.dircos with theta = 0.
    decl2 = math.fmod(450.0 - decl, 360.0)
    xi, xd = incl * d2r, decl2 * d2r
    return (
        math.cos(xi) * math.cos(xd),
        math.cos(xi) * math.sin(xd),
        math.sin(xi),
    )


def two_body_fixture(out_dir, variant):
    os.makedirs(out_dir, exist_ok=True)
    # Core geometry anchored to dummy.obs (centers 23..2023 m).
    h = 50.0
    core_n = (41, 41, 20)
    origin_xy = -2.0
    pad_lateral = geometric_pad(h, 2000.0, 13)  # "2depth" = 2 x 1000 m
    pad_depth = geometric_pad(h, 1000.0, 10)  # total depth 2000 = 2x core

    xe = [origin_xy - c for c in reversed(np.cumsum(pad_lateral))]
    xe += edges_from_sizes(origin_xy, [h] * core_n[0])
    xe += list(xe[-1] + np.cumsum(pad_lateral))
    ye = [origin_xy - c for c in reversed(np.cumsum(pad_lateral))]
    ye += edges_from_sizes(origin_xy, [h] * core_n[1])
    ye += list(ye[-1] + np.cumsum(pad_lateral))
    ze = edges_from_sizes(0.0, [h] * core_n[2])
    ze += list(ze[-1] + np.cumsum(pad_depth))

    nx, ny, nz = len(xe) - 1, len(ye) - 1, len(ze) - 1
    assert (nx, ny, nz) == (67, 67, 30), (nx, ny, nz)
    write_grid(os.path.join(out_dir, "meshgrid_padded_2depth_true-grid.txt"),
               xe, ye, ze)

    # True magnetization-vector model (A/m), 3 columns Mx My Mz.
    B = 55000.0e-9  # T
    H = B / MU0  # A/m
    field_dir = dircos(-60.0, 2.0)
    bg = 1.0e-5 * H
    M = np.zeros((nz, ny, nx, 3))
    for c in range(3):
        M[..., c] = bg * field_dir[c]

    def set_body(core_ij, chi, rem_dir=None, Q=0.0):
        ci, cj, ck = core_ij
        # Core index (1-based, README "does not include padding") ->
        # full-grid index with 13/13/0 pads before the core.
        i, j, k = ci - 1 + 13, cj - 1 + 13, ck - 1
        m_ind = chi * H
        vec = np.array(field_dir) * m_ind
        if Q > 0.0 and rem_dir is not None:
            vec = vec + Q * m_ind * np.array(dircos(*rem_dir))
        M[k, j, i, :] = vec

    if variant == "induced":
        set_body((21, 15, 3), 0.05)
        set_body((21, 25, 3), 0.10)
    else:  # remanent
        set_body((21, 15, 3), 0.05, rem_dir=(-60.0, 2.0), Q=1.0)
        set_body((21, 25, 3), 0.10, rem_dir=(60.0, 90.0), Q=1.0)

    vals = M.reshape(-1, 3)
    with open(os.path.join(out_dir, "meshgrid_padded_2depth_true-values.txt"),
              "w") as f:
        f.write(f"{len(vals)}\n")
        np.savetxt(f, vals, fmt="%.9E")


def magbubble_fixture(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    obs = np.loadtxt(os.path.join(REF, "data/gravmag/magbubble_slice/mag.obs"),
                     skiprows=1)
    X, Y, Z = obs[:, 0], obs[:, 1], obs[:, 2]
    xs = np.unique(X)  # 10 easting lines, 50 m
    ys = np.unique(Y)  # 116 northing lines, 50 m
    hx = xs[1] - xs[0]
    hy = ys[1] - ys[0]
    nx, ny, nz = len(xs), len(ys), 150
    hz = 15.0  # ASSUMPTION: constant layer thickness
    # Terrain under each column from the 50 m drape assumption.
    terrain = np.zeros((ny, nx))
    for j, y in enumerate(ys):
        for i, x in enumerate(xs):
            sel = (X == x) & (Y == y)
            terrain[j, i] = Z[sel][0] + 50.0  # z-down: ground 50 m below sensor
    with open(os.path.join(out_dir, "meshgrid-grid.txt"), "w") as f:
        f.write(f"{nx * ny * nz}\n")
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    x1 = xs[i] - hx / 2.0
                    y1 = ys[j] - hy / 2.0
                    z1 = terrain[j, i] + k * hz
                    f.write(
                        f"{x1:.6f} {x1 + hx:.6f} {y1:.6f} {y1 + hy:.6f} "
                        f"{z1:.6f} {z1 + hz:.6f} {i + 1} {j + 1} {k + 1}\n"
                    )


def build_overlay(overlay):
    """Mirror /root/reference into `overlay` with symlinks, then drop the
    reconstructed files in place of the stripped ones."""
    for root, dirs, files in os.walk(REF):
        rel = os.path.relpath(root, REF)
        dst = os.path.join(overlay, rel) if rel != "." else overlay
        os.makedirs(dst, exist_ok=True)
        for fn in files:
            link = os.path.join(dst, fn)
            if not os.path.exists(link):
                os.symlink(os.path.join(root, fn), link)
    for variant in ("induced", "remanent"):
        two_body_fixture(
            os.path.join(overlay, "data/gravmag/2body_magnet", variant),
            variant,
        )
    magbubble_fixture(os.path.join(overlay, "data/gravmag/magbubble_slice"))


def ensure_overlay(overlay="/tmp/reference_overlay_goldens"):
    """Idempotent overlay build for the golden runner/tests: builds once
    per machine (marker file), returns the overlay path. The
    reconstruction is deterministic (pure numpy from surviving reference
    files), so goldens pinned against it are stable."""
    marker = os.path.join(overlay, ".complete")
    if not os.path.exists(marker):
        build_overlay(overlay)
        with open(marker, "w") as f:
            f.write("ok\n")
    return overlay


def main():
    overlay = sys.argv[1] if len(sys.argv) > 1 else "/tmp/reference_overlay"
    # Replace stale symlinks-only overlay safely.
    build_overlay(overlay)
    print(f"overlay ready: {overlay}")
    print("run e.g.:")
    print(f"  tomofastx -p {overlay}/parfiles/Parfile_2body_induced.txt "
          f"--base-dir {overlay}")


if __name__ == "__main__":
    main()
