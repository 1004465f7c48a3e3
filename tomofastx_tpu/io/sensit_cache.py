"""Sensitivity-kernel disk cache, byte-compatible with the reference.

File set (reference: sensitivity_gravmag.F90:139-183, 305-392, 644-883):
- ``sensit_{grav|magn}_<nbproc>_<rank>``: stream binary; header of 5 int32
  (ndata_loc, ndata, nelements_total, myrank, nbproc); then per data row and
  per (data component d, model component k): int32 (idata, nel, k, d)
  followed by int32 columns[nel] (1-based cell indices) and float32
  values[nel];
- ``sensit_{}_meta.txt``: text metadata;
- ``sensit_{}_nnz``: int32 N + int32 per-cell nnz histogram;
- ``sensit_{}_weight``: int32 N + float64 column weights.

This makes kernels produced by the Fortran reference directly loadable
(``sensit.readFromFiles = 1``) and vice versa. We always write a single
"rank" file (nbproc = 1); the reader accepts any rank count.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_SUFFIX = ("grav", "magn")
_MATRIX_PRECISION_BYTES = 4  # float32 storage, like the reference default


def _suffix_for(par) -> str:
    from tomofastx_tpu.config.parfile import MagParams

    return _SUFFIX[1] if isinstance(par, MagParams) else _SUFFIX[0]


def write_kernel_cache(cache_dir: str, par, kernel, column_weight: np.ndarray):
    """Write the kernel + metadata + nnz + depth weight files."""
    os.makedirs(cache_dir, exist_ok=True)
    sfx = _suffix_for(par)
    nd, ndc, nmc = kernel.ndata, kernel.ndata_components, kernel.nmodel_components
    N = kernel.N

    S = np.asarray(kernel.S, np.float32).reshape(nd, ndc, nmc, N)

    nnz_per_cell = np.zeros(N, np.int32)
    nnz_total = 0

    with open(os.path.join(cache_dir, f"sensit_{sfx}_1_0"), "wb") as f:
        np.array([nd, nd, N, 0, 1], np.int32).tofile(f)
        for idata in range(nd):
            for d in range(ndc):
                for k in range(nmc):
                    row = S[idata, d, k]
                    if kernel.compression_type == 0:
                        # Uncompressed rows store every element, including
                        # zeros (sensitivity_gravmag.F90:287-294).
                        cols = np.arange(N, dtype=np.int32)
                    else:
                        cols = np.nonzero(row)[0].astype(np.int32)
                    vals = row[cols]
                    nnz_per_cell[cols] += 1
                    nnz_total += cols.size
                    np.array([idata + 1, cols.size, k + 1, d + 1], np.int32).tofile(f)
                    if cols.size:
                        (cols + 1).tofile(f)  # 1-based cell indices
                        vals.astype(np.float32).tofile(f)

    with open(os.path.join(cache_dir, f"sensit_{sfx}_meta.txt"), "w") as f:
        f.write(f" {kernel.nx} {kernel.ny} {kernel.nz} {nd}\n")
        f.write(f" 1 {_MATRIX_PRECISION_BYTES} {par.depth_weighting_type}\n")
        f.write(f" {kernel.compression_type} {kernel.comp_error:.9E}\n")
        f.write(f" {nmc} {ndc}\n")
        f.write(f" {nnz_total}\n")

    with open(os.path.join(cache_dir, f"sensit_{sfx}_nnz"), "wb") as f:
        np.array([N], np.int32).tofile(f)
        nnz_per_cell.tofile(f)

    with open(os.path.join(cache_dir, f"sensit_{sfx}_weight"), "wb") as f:
        np.array([N], np.int32).tofile(f)
        np.asarray(column_weight, np.float64).tofile(f)


def try_read_kernel_cache(cache_dir: str, par, grid) -> Optional["SensitKernel"]:
    """Read a reference-format kernel cache into a dense SensitKernel.
    Returns None when the cache is absent or inconsistent."""
    import jax.numpy as jnp

    from tomofastx_tpu.ops.sensitivity import SensitKernel

    sfx = _suffix_for(par)
    meta_path = os.path.join(cache_dir, f"sensit_{sfx}_meta.txt")
    if not os.path.exists(meta_path):
        return None

    with open(meta_path) as f:
        nx, ny, nz, nd = (int(t) for t in f.readline().split())
        nbproc, precision, weight_type = (int(t) for t in f.readline().split())
        toks = f.readline().split()
        compression_type, comp_error = int(toks[0]), float(toks[1])
        nmc, ndc = (int(t) for t in f.readline().split())
        nnz_total = int(f.readline().split()[0])

    if (nx, ny, nz) != (grid.nx, grid.ny, grid.nz) or nd != par.ndata:
        raise ValueError("Sensitivity metadata file info does not match the Parfile!")
    if weight_type != par.depth_weighting_type:
        raise ValueError("Sensitivity metadata depth weighting type mismatch!")
    if compression_type != par.compression_type:
        raise ValueError("Compression type is inconsistent!")
    if nmc != par.nmodel_components or ndc != par.ndata_components:
        raise ValueError("Sensitivity metadata component counts mismatch!")
    if precision != _MATRIX_PRECISION_BYTES:
        raise ValueError("Matrix precision is not consistent!")

    N = nx * ny * nz
    S = np.zeros((nd, ndc, nmc, N), np.float32)
    nnz = 0
    idata_glob = 0
    for rank in range(nbproc):
        path = os.path.join(cache_dir, f"sensit_{sfx}_{nbproc}_{rank}")
        with open(path, "rb") as f:
            hdr = np.fromfile(f, np.int32, 5)
            ndata_loc, ndata_read, N_read, rank_read, nbproc_read = (int(v) for v in hdr)
            if ndata_read != nd or N_read != N or rank_read != rank or nbproc_read != nbproc:
                raise ValueError("Wrong file header in sensitivity cache!")
            for _ in range(ndata_loc):
                idata_glob += 1
                for d in range(ndc):
                    for k in range(nmc):
                        idata, nel, k_read, d_read = (
                            int(v) for v in np.fromfile(f, np.int32, 4)
                        )
                        if idata != idata_glob or k_read != k + 1 or d_read != d + 1:
                            raise ValueError("Wrong data ordering in sensitivity cache!")
                        if nel > 0:
                            cols = np.fromfile(f, np.int32, nel) - 1
                            vals = np.fromfile(f, np.float32, nel)
                            S[idata - 1, d, k, cols] = vals
                            nnz += nel

    return SensitKernel(
        S=jnp.asarray(S.reshape(nd * ndc, nmc * N)),
        ndata=nd,
        ndata_components=ndc,
        nmodel_components=nmc,
        nx=nx,
        ny=ny,
        nz=nz,
        compression_type=compression_type,
        comp_error=comp_error,
        nnz=nnz,
    )
