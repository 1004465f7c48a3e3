"""Matrix-free sensitivity operator: recompute prism responses on the fly.

The reference's answer to kernel memory is wavelet compression + disk cache
(sensitivity_gravmag.F90). On TPU there is a second answer the reference
cannot afford: do not store the kernel at all. The closed-form prism
integrals are a few hundred FLOPs per (data, cell) pair, embarrassingly
parallel, and free of memory traffic — so for problems where even the
packed kernel exceeds HBM, the matvec can regenerate its rows per tile.

This trades the dense GEMV's ~800 GB/s bandwidth bound for a VPU
transcendental-throughput bound; it is slower per iteration for kernels
that fit in HBM, and the only option for kernels that do not. Select with
``tpu.kernelFormat = matrixfree`` (requires compression off — compression
exists to shrink storage, which this mode eliminates).

Supported physics: gravity gz, gradiometry Gzz, magnetic TMI
(susceptibility). Depth weighting (column weight) and the baked-in
problem*data row weights are applied on the fly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.ops import prism


def _physics_fn(physics: str, magv, intensity):
    if physics == "gravi_z":
        return lambda x, y, z, g: prism.gravi_z(x, y, z, *g)
    if physics == "gradi_zz":
        return lambda x, y, z, g: prism.gradi_zz(x, y, z, *g)
    if physics == "mag_tmi":
        def tmi(x, y, z, g):
            row = prism.magprism_row(
                x, y, z, *g, magv, intensity,
                nmodel_components=1, ndata_components=1, handle_inside=False,
            )
            return row[:, 0, 0]

        return tmi
    raise ValueError(f"Unsupported matrix-free physics '{physics}'")


@dataclass
class MatrixFreeKernel:
    """Row-regenerating sensitivity operator (nrows x N)."""

    grid6: Tuple[jax.Array, ...]  # (X1, X2, Y1, Y2, Z1, Z2), each (N,)
    xd: jax.Array  # (nrows_padded,)
    yd: jax.Array
    zd: jax.Array
    cw: jax.Array  # (N,) column weight baked into rows
    row_w: jax.Array  # (nrows_padded,) problem*data weights; 0 on padding
    physics: str
    chunk: int
    nrows: int  # true row count (unpadded)
    magv: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    intensity: float = 50000.0

    @property
    def ncols(self) -> int:
        return self.grid6[0].shape[0]

    def _row_block(self, xs, ys, zs):
        fn = _physics_fn(self.physics, self.magv, self.intensity)
        return jax.vmap(lambda x, y, z: fn(x, y, z, self.grid6))(xs, ys, zs)

    def matvec(self, x: jax.Array) -> jax.Array:
        xw = self.cw * x

        def per_chunk(args):
            xs, ys, zs, w = args
            rows = self._row_block(xs, ys, zs)  # (chunk, N)
            return w * (rows @ xw)

        nchunks = self.xd.shape[0] // self.chunk
        parts = jax.lax.map(
            per_chunk,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                self.row_w.reshape(nchunks, self.chunk),
            ),
        )
        return parts.reshape(-1)[: self.nrows]

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u_pad = jnp.zeros_like(self.row_w).at[: self.nrows].set(u) * self.row_w
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(g, args):
            xs, ys, zs, uc = args
            rows = self._row_block(xs, ys, zs)  # (chunk, N)
            return g + rows.T @ uc, None

        g0 = jnp.zeros((self.ncols,), u.dtype)
        g, _ = jax.lax.scan(
            per_chunk,
            g0,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                u_pad.reshape(nchunks, self.chunk),
            ),
        )
        return self.cw * g


def _mfk_flatten(k: MatrixFreeKernel):
    children = (k.grid6, k.xd, k.yd, k.zd, k.cw, k.row_w)
    aux = (k.physics, k.chunk, k.nrows, k.magv, k.intensity)
    return children, aux


def _mfk_unflatten(aux, children):
    grid6, xd, yd, zd, cw, row_w = children
    physics, chunk, nrows, magv, intensity = aux
    return MatrixFreeKernel(
        grid6=grid6, xd=xd, yd=yd, zd=zd, cw=cw, row_w=row_w,
        physics=physics, chunk=chunk, nrows=nrows, magv=magv, intensity=intensity,
    )


jax.tree_util.register_pytree_node(MatrixFreeKernel, _mfk_flatten, _mfk_unflatten)


def make_matrixfree_kernel(
    par, grid, data, column_weight, problem_weight, data_weight, dtype=jnp.float32, chunk=None
) -> MatrixFreeKernel:
    """Build the operator from the problem description (no kernel storage).

    Mirrors the supported single-component physics of
    calculate_and_write_sensit (sensitivity_gravmag.F90:193-219)."""
    from tomofastx_tpu.config.parfile import MagParams

    if par.compression_type > 0:
        raise ValueError("matrix-free mode requires forward.matrixCompression.type = 0")
    if par.nmodel_components != 1 or par.ndata_components != 1:
        raise ValueError("matrix-free mode supports 1 model and 1 data component")

    if isinstance(par, MagParams):
        physics = "mag_tmi"
        magv = prism.dircos(par.mi, par.md, par.theta)
        intensity = par.intensity
    elif par.data_type == 2:
        physics = "gradi_zz"
        magv, intensity = (0.0, 0.0, 1.0), 0.0
    else:
        physics = "gravi_z"
        magv, intensity = (0.0, 0.0, 1.0), 0.0

    N = grid.nelements_total
    nd = par.ndata
    if chunk is None:
        chunk = max(8, min(256, (1 << 26) // max(N, 1)))
    nd_pad = ((nd + chunk - 1) // chunk) * chunk

    # Padding rows must evaluate to finite numbers (a corner-touching
    # observation point yields log(0) and 0 * nan = nan), so park them far
    # outside the model volume.
    far = (
        float(np.max(grid.X2)) + 1.0e6,
        float(np.max(grid.Y2)) + 1.0e6,
        float(np.min(grid.Z1)) - 1.0e6,
    )

    def pad(a, fill):
        out = np.full(nd_pad, fill)
        out[:nd] = a
        return jnp.asarray(out, dtype)

    row_w = np.zeros(nd_pad)
    row_w[:nd] = problem_weight * np.asarray(data_weight).reshape(-1)

    return MatrixFreeKernel(
        grid6=tuple(
            jnp.asarray(a, dtype)
            for a in (grid.X1, grid.X2, grid.Y1, grid.Y2, grid.Z1, grid.Z2)
        ),
        xd=pad(data.X, far[0]),
        yd=pad(data.Y, far[1]),
        zd=pad(data.Z, far[2]),
        cw=jnp.asarray(column_weight, dtype),
        row_w=jnp.asarray(row_w, dtype),
        physics=physics,
        chunk=chunk,
        nrows=nd,
        magv=magv,
        intensity=intensity,
    )
