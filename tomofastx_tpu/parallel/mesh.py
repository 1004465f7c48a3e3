"""Device mesh and sharding helpers.

The reference parallelizes with explicit MPI: data-row sharding for the
forward phase and model-column sharding for LSQR, stitched by a disk-based
repartition shuffle (SURVEY.md §2.6). Here the same layouts are *sharding
annotations* on a `jax.sharding.Mesh` with a single ``cells`` axis:

- the sensitivity matrix S (rows, ncomp*N) is sharded over its column axis,
- model-space vectors are sharded over cells,
- data-space vectors are replicated,

which reproduces the reference layout (lsqr_solver2.F90:208-214: column
slices local, row vectors Allreduce-summed) — except the Allreduce becomes
an XLA psum over ICI inserted by GSPMD, and the "repartition shuffle"
(sensitivity_gravmag.F90:723-862) disappears entirely: resharding is a
device_put.

Constraint coefficient cubes (nz, ny, nx) shard their leading (z) axis,
which is the same cells axis in flat i-fastest order; stencil rolls across
the shard boundary lower to ppermute halo exchanges.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CELLS_AXIS = "cells"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (CELLS_AXIS,))


def shard_system_arrays(arrays: dict, mesh: Mesh) -> dict:
    """Place the joint-system arrays with the cells-sharded layout.

    Expects the dict built by workflow/solve; tuples are per-problem.
    Shapes not divisible by the mesh size are left replicated (GSPMD will
    still partition the compute where profitable)."""
    n = mesh.devices.size

    def put(x, spec):
        # Replicate anything whose sharded dim does not divide.
        for dim, name in enumerate(spec):
            if name is not None and x.shape[dim] % n != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_tuple(t, spec):
        return tuple(put(x, spec) for x in t)

    out = dict(arrays)

    def put_kernel(k):
        from tomofastx_tpu.ops.sparse_kernel import DenseKernel

        if isinstance(k, DenseKernel):
            return DenseKernel(put(k.S, P(None, CELLS_AXIS)))
        # Packed kernels keep compiler-chosen layouts (their gather indices
        # are global); replicate for now.
        return jax.device_put(k, NamedSharding(mesh, P()))

    out["S"] = tuple(put_kernel(k) for k in arrays["S"])
    out["cw"] = put_tuple(arrays["cw"], P(CELLS_AXIS))
    out["model"] = put_tuple(arrays["model"], P(None, CELLS_AXIS))
    out["prior"] = put_tuple(arrays["prior"], P(None, CELLS_AXIS))
    if "residuals" in arrays:
        out["residuals"] = put_tuple(arrays["residuals"], P())
    for key in ("val_meas", "data_weight"):
        if key in arrays:
            out[key] = put_tuple(arrays[key], P())
    for key in ("admm_z", "admm_u", "bound_weight", "damping_weight"):
        if key in arrays:
            out[key] = put_tuple(arrays[key], P(CELLS_AXIS))
    for key in ("min_bound", "max_bound"):
        if key in arrays:
            out[key] = put_tuple(arrays[key], P(None, CELLS_AXIS))
    if "damping_grad_weight" in arrays:
        out["damping_grad_weight"] = put_tuple(arrays["damping_grad_weight"], P(None, CELLS_AXIS))
    for key in ("dX", "dY", "dZ", "rho_admm", "mixture_mu", "mixture_sigma"):
        if key in arrays:
            out[key] = put(arrays[key], P())
    for key in ("cell_weight", "mixture_max", "vec_field"):
        if key in arrays:
            spec = P(CELLS_AXIS) if arrays[key].ndim == 1 else P(CELLS_AXIS, None)
            out[key] = put(arrays[key], spec)
    return out
