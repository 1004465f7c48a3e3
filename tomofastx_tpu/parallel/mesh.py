"""Device mesh and sharding helpers.

The reference parallelizes with explicit MPI: data-row sharding for the
forward phase and model-column sharding for LSQR, stitched by a disk-based
repartition shuffle (SURVEY.md §2.6). Here the same layouts are *sharding
annotations* on a `jax.sharding.Mesh` with a single ``cells`` axis:

- the sensitivity operator is sharded over its cells (column) axis — this
  is the only memory- and FLOP-dominant object in the system;
- model-space vectors are replicated,
- data-space vectors are replicated,

which reproduces the reference layout (lsqr_solver2.F90:208-214: column
slices local, row vectors Allreduce-summed) — except the Allreduce becomes
an XLA psum over ICI inserted by GSPMD, and the "repartition shuffle"
(sensitivity_gravmag.F90:723-862) disappears entirely: resharding is a
device_put.

Arbitrary N (the reference's block partition handles any nelements,
parallel_tools.f90:46-63): kernels whose cells axis does not divide the
mesh are zero-padded to the next multiple before placement
(pad-to-multiple sharding); the operator classes mask the pad internally
(see ops/sparse_kernel.py::DenseKernel.ncols_true). The small (N,) cell
vectors are *deliberately replicated* — at N = 10^5..10^7 they are KB-to-MB
sized vs the GB kernel, every elementwise constraint op on them is
bandwidth-trivial, and replication avoids a reshard before each of the ~15
stencil/diagonal ops per LSQR iteration. This is a layout decision, not a
fallback: the per-iteration collectives are exactly the reference's two
(psum of u = S·v partials, all-reduce of the v norm).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CELLS_AXIS = "cells"
OBS_AXIS = "obs"


def make_mesh(n_devices=None) -> Mesh:
    """1-D cells mesh from a device count, or a 2-D (obs x cells) mesh from
    a (n_obs, n_cells) tuple / "2x4" string.

    The 2-D mesh shards the dense sensitivity kernel over BOTH axes (rows
    over obs, columns over cells) so per-device kernel HBM scales as
    1/(n_obs*n_cells) — the reference shards data rows in its forward
    phase AND model columns in its solve phase
    (sensitivity_gravmag.F90:179-189, lsqr_solver2.F90:208-245); the 2-D
    mesh runs both splits simultaneously. Data-space vectors shard over
    obs, model-space vectors over cells."""
    if isinstance(n_devices, str):
        n_devices = tuple(int(t) for t in n_devices.lower().split("x"))
        if len(n_devices) == 1:
            n_devices = n_devices[0]
    devices = jax.devices()
    if isinstance(n_devices, (tuple, list)):
        no, nc = n_devices
        return Mesh(
            np.array(devices[: no * nc]).reshape(no, nc), (OBS_AXIS, CELLS_AXIS)
        )
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (CELLS_AXIS,))


def obs_axis(mesh: Mesh):
    """The obs axis name when the mesh has one, else None (1-D cells mesh:
    data-space arrays replicate)."""
    return OBS_AXIS if OBS_AXIS in mesh.axis_names else None


def shard_kernel(k, mesh: Mesh):
    """Place a sensitivity operator with its cells axis sharded.

    - DenseKernel: column axis zero-padded to a mesh multiple and sharded
      (P(None, cells)); the contiguous transpose shards its leading axis.
    - PackedKernel: the row pack shards its slot (K) axis — each device
      holds a slice of every row's gather list, the matvec partial-sums
      over slots and GSPMD inserts the psum; the adjoint layouts shard by
      column id (heavy dense block over its column axis, light pack over
      its leading axis), the reference's free-by-construction column-sharded
      adjoint (lsqr_solver2.F90:228-245).
    - MatrixFreeKernel: grid prisms + column weight shard over cells (the
      model axis); observation arrays replicate. Requires the padded cell
      count to divide the mesh (see make_matrixfree_kernel pad_cells_to).
    """
    from tomofastx_tpu.ops.matrixfree import MatrixFreeKernel
    from tomofastx_tpu.ops.sparse_kernel import (
        DenseKernel,
        PackedKernel,
        pad_dense_columns,
        pad_packed_for_mesh,
    )
    from tomofastx_tpu.ops.tile_kernel import TileKernel, pad_tiles_for_mesh

    n = mesh.devices.size

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    if isinstance(k, DenseKernel):
        from tomofastx_tpu.ops.sparse_kernel import pad_dense_rows

        oax = obs_axis(mesh)
        k = pad_dense_columns(k, int(mesh.shape[CELLS_AXIS]))
        if oax is not None:
            # 2-D mesh: rows shard over obs, columns over cells —
            # per-device kernel HBM = total/(n_obs*n_cells).
            k = pad_dense_rows(k, int(mesh.shape[OBS_AXIS]))
        return DenseKernel(
            put(k.S, P(oax, CELLS_AXIS)),
            put(k.ST, P(CELLS_AXIS, oax)) if k.ST is not None else None,
            k.ncols_true,
            k.nrows_true,
        )

    if isinstance(k, PackedKernel):
        k = pad_packed_for_mesh(k, n)
        return PackedKernel(
            row_vals=put(k.row_vals, P(None, CELLS_AXIS)),
            row_idx=put(k.row_idx, P(None, CELLS_AXIS)),
            dense_cols=put(k.dense_cols, P(CELLS_AXIS)),
            dense_block=put(k.dense_block, P(None, CELLS_AXIS)),
            light_cols=put(k.light_cols, P(CELLS_AXIS)),
            light_vals=put(k.light_vals, P(CELLS_AXIS, None)),
            light_idx=put(k.light_idx, P(CELLS_AXIS, None)),
            nrows=k.nrows,
            ncols=k.ncols,
        )

    if isinstance(k, TileKernel):
        # Both tile-union packs shard over their tile axis: the forward
        # pack by observation-row tiles (the reference's data-row split,
        # sensitivity_gravmag.F90:179-189), the adjoint pack by cell-column
        # tiles (the column-sharded adjoint, lsqr_solver2.F90:228-245).
        # x/u replicate; GSPMD all-gathers the tile-local outputs.
        from tomofastx_tpu.ops.tile_kernel import TileKernel as TK

        k = pad_tiles_for_mesh(k, n)
        return TK(
            uvals=put(k.uvals, P(CELLS_AXIS)),
            ubidx=put(k.ubidx, P(CELLS_AXIS)),
            uvalsT=put(k.uvalsT, P(CELLS_AXIS)),
            ubidxT=put(k.ubidxT, P(CELLS_AXIS)),
            nrows=k.nrows,
            ncols=k.ncols,
            sharded=True,
            # On TPU the contraction runs the Pallas kernel per device
            # under shard_map over this tile axis (TileKernel._contract);
            # elsewhere the XLA lowering is GSPMD-partitioned the same way.
            mesh=mesh,
        )

    if isinstance(k, MatrixFreeKernel):
        if k.N % n != 0:
            raise ValueError(
                f"matrix-free kernel has {k.N} (padded) cells, not divisible by "
                f"the {n}-device mesh; build it with pad_cells_to={n}"
            )
        return MatrixFreeKernel(
            grid6=tuple(put(a, P(CELLS_AXIS)) for a in k.grid6),
            xd=put(k.xd, P()),
            yd=put(k.yd, P()),
            zd=put(k.zd, P()),
            cw=put(k.cw, P(CELLS_AXIS)),
            row_w=put(k.row_w, P()),
            phys=k.phys,
            chunk=k.chunk,
            nrows=k.nrows,
            N_true=k.N_true,
            # Replicated per-observation candidate indices; the gather /
            # scatter they drive runs against the cells-sharded arrays
            # (GSPMD inserts the collectives).
            near_idx=put(k.near_idx, P()) if k.near_idx is not None else None,
        )

    from tomofastx_tpu.ops.bttb import BTTBKernel

    if isinstance(k, BTTBKernel):
        # The FFT operator's only large array is the frequency-domain
        # offset table (nz, nmc, ndc, Py, Pxr): shard it over the z-layer
        # axis — each device convolves its own layers against the
        # replicated model (the model-axis split of lsqr_solver2.F90:
        # 228-245, blocks = z-slabs) and GSPMD psums the layer sum in
        # matvec. When nz does not divide the mesh the table is small
        # enough that replication is the right layout (it is ~4/nd of the
        # dense kernel).
        layered = k.nz % n == 0
        return BTTBKernel(
            Tf=put(k.Tf, P(CELLS_AXIS) if layered else P()),
            cw=put(k.cw, P()),
            row_w=put(k.row_w, P()),
            obs_flat=put(k.obs_flat, P()),
            nx=k.nx, ny=k.ny, nz=k.nz, nmc=k.nmc, ndc=k.ndc,
            no_x=k.no_x, no_y=k.no_y, mx=k.mx, my=k.my,
            nrows=k.nrows, Py=k.Py, Px=k.Px,
            mesh=mesh if layered else None,
            # Layer-sharded: each device transforms nz/n layers, so the
            # single-chip blocking is unnecessary (and _blocks() ignores
            # it under a mesh); the replicated fallback keeps it.
            layer_block=k.layer_block,
        )

    from tomofastx_tpu.ops.matrixfree import LatticeMatrixFreeKernel

    if isinstance(k, LatticeMatrixFreeKernel):
        # Observation-sharded layout: the lattice operator's big per-matvec
        # object is the per-observation corner field (nothing stored over
        # cells), so it shards over the DATA axis — the reference's
        # data-row split of the forward (sensitivity_gravmag.F90:179-189).
        # Model-space stays replicated; matvec/rmatvec apply per-chunk
        # sharding constraints (ops/matrixfree.py::_shard_obs) so each
        # device evaluates chunk/n observation points and GSPMD inserts the
        # all-gather (matvec) / psum (rmatvec). Rechunk to chunk*n — same
        # per-device corner-field footprint as unsharded, n x fewer scan
        # steps — and re-pad the observation arrays to the new multiple
        # (fill rows parked far outside the lattice, row_w = 0).
        new_chunk = k.chunk * n
        nd_pad = ((k.nrows + new_chunk - 1) // new_chunk) * new_chunk
        far = (
            float(np.max(np.asarray(k.xe))) + 1.0e6,
            float(np.max(np.asarray(k.ye))) + 1.0e6,
            float(np.min(np.asarray(k.ze))) - 1.0e6,
        )

        def repad(a, fill):
            a = np.asarray(a)
            out = np.full(nd_pad, fill, a.dtype)
            out[: k.nrows] = a[: k.nrows]
            return jnp.asarray(out)

        row_w = np.asarray(k.row_w)
        rw = np.zeros((nd_pad, k.ndc), row_w.dtype)
        rw[: k.nrows] = row_w[: k.nrows]

        xd_p, yd_p, zd_p = (repad(k.xd, far[0]), repad(k.yd, far[1]),
                            repad(k.zd, far[2]))
        win = wi0 = None
        if k.far_quad:
            # Re-derive the tier-2 window starts for the re-padded
            # observation set (pure host geometry; the window sizes are a
            # property of the lattice alone but recomputing keeps them
            # consistent with the starts). MUST use the same tier-2
            # radius as the factory: the default (near) radius 4.0 here
            # silently collapsed the 27-pt/closed mid tier on meshed
            # runs (round-5 review finding; pinned by
            # test_sharding's meshed f32 blend parity test).
            from tomofastx_tpu.ops.matrixfree import (
                lattice_near_window,
                tier2_radius,
            )

            win, wi0 = lattice_near_window(
                k.xe, k.ye, k.ze, xd_p, yd_p, zd_p,
                radius=tier2_radius(k.problem, k.data_type),
            )
            wi0 = jnp.asarray(wi0)

        rep = NamedSharding(mesh, P())
        return LatticeMatrixFreeKernel(
            xe=jax.device_put(k.xe, rep),
            ye=jax.device_put(k.ye, rep),
            ze=jax.device_put(k.ze, rep),
            xd=jax.device_put(jnp.asarray(xd_p), rep),
            yd=jax.device_put(jnp.asarray(yd_p), rep),
            zd=jax.device_put(jnp.asarray(zd_p), rep),
            cw=jax.device_put(k.cw, rep),
            row_w=jax.device_put(jnp.asarray(rw), rep),
            chunk=new_chunk,
            nrows=k.nrows,
            nx=k.nx, ny=k.ny, nz=k.nz,
            problem=k.problem, magv=k.magv, intensity=k.intensity,
            nmc=k.nmc, ndc=k.ndc, data_type=k.data_type,
            far_quad=k.far_quad, win=win,
            wi0=jax.device_put(wi0, rep) if wi0 is not None else None,
            mesh=mesh,
        )

    # Unknown operator type: replicate.
    return jax.device_put(k, NamedSharding(mesh, P()))


def shard_system_arrays(arrays: dict, mesh: Mesh) -> dict:
    """Place the joint-system arrays with the cells-sharded layout.

    The kernels (the only large arrays) are always cells-sharded — padded
    to a mesh multiple when N does not divide (no silent replication). The
    small per-cell vectors are sharded when their cells axis divides the
    mesh and replicated otherwise (deliberate, see module docstring: for
    vectors replication is the faster layout and costs KB). On a 2-D
    (obs x cells) mesh, data-space vectors additionally shard over obs."""

    def put(x, spec):
        for dim, name in enumerate(spec):
            if name is not None and x.shape[dim] % int(mesh.shape[name]) != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_tuple(t, spec):
        return tuple(put(x, spec) for x in t)

    out = dict(arrays)
    oax = obs_axis(mesh)

    out["S"] = tuple(shard_kernel(k, mesh) for k in arrays["S"])
    if "S_fwd" in arrays:
        out["S_fwd"] = tuple(shard_kernel(k, mesh) for k in arrays["S_fwd"])
    out["cw"] = put_tuple(arrays["cw"], P(CELLS_AXIS))
    out["model"] = put_tuple(arrays["model"], P(None, CELLS_AXIS))
    out["prior"] = put_tuple(arrays["prior"], P(None, CELLS_AXIS))
    if "residuals" in arrays:
        out["residuals"] = put_tuple(arrays["residuals"], P(oax))
    for key in ("val_meas", "data_weight"):
        if key in arrays:
            out[key] = put_tuple(arrays[key], P(oax, None) if oax else P())
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
