"""Matrix-free sensitivity operator: recompute prism responses on the fly.

The reference's answer to kernel memory is wavelet compression + disk cache
(sensitivity_gravmag.F90). On TPU there is a second answer the reference
cannot afford: do not store the kernel at all. The closed-form prism
integrals are a few hundred FLOPs per (data, cell) pair, embarrassingly
parallel, and free of memory traffic — so for problems where even the
packed kernel exceeds HBM, the matvec regenerates its rows per data chunk.

This trades the dense GEMV's HBM bandwidth bound for a VPU transcendental
bound; it is slower per iteration for kernels that fit in HBM and the only
option for kernels that do not. Select with ``tpu.kernelFormat =
matrixfree`` (requires compression off — compression exists to shrink
storage, which this mode eliminates).

All forward families are supported (gravity gz, FTG Gzz/full tensor,
magnetic TMI / 3-component, susceptibility / magnetization vector), via the
same physics dispatch as the stored-kernel builder
(ops/sensitivity.py::_forward_rows). Depth weighting (column weight) and
the baked-in problem*data row weights are applied on the fly
(sensitivity_gravmag.F90:228, 836-843 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class _Physics:
    """Static physics description (hashable pytree aux data)."""

    problem: str  # "grav" | "magn"
    data_type: int  # gravity: 1 = g, 2 = gradiometry
    nmc: int  # model components
    ndc: int  # data components
    magv: Tuple[float, float, float]
    intensity: float
    handle_inside: bool
    # Compensated-f32 blend (tpu.farFieldQuad): far cells by Gauss
    # quadrature — the f32 closed forms are cancellation noise in the far
    # field (see ops/prism.py). Set for f32 general per-cell operators.
    far_quad: bool = False


def _rows_for_point(phys: _Physics, grid6, x, y, z):
    """(N, nmc, ndc) physics rows for one observation point — delegates to
    the shared dispatch (ops/sensitivity.py::forward_rows) so the stored
    and matrix-free paths cannot diverge."""
    from tomofastx_tpu.ops.sensitivity import forward_rows

    return forward_rows(
        phys.problem, phys.data_type, phys.nmc, phys.ndc, phys.magv,
        phys.intensity, phys.handle_inside, grid6, x, y, z,
        far_quad=phys.far_quad,
    )


@dataclass
class MatrixFreeKernel:
    """Row-regenerating sensitivity operator ((nrows*ndc) x (nmc*N_true)).

    The cell axis may be zero-padded (N >= N_true) so it divides a device
    mesh: padding cells are dummy prisms parked far outside the model
    volume with cw = 0, so their rows contribute nothing; matvec pads x and
    rmatvec slices the gradient back (the arbitrary-N block partition of
    parallel_tools.f90:46-63 as pad-to-multiple sharding)."""

    grid6: Tuple[jax.Array, ...]  # (X1, X2, Y1, Y2, Z1, Z2), each (N,)
    xd: jax.Array  # (nrows_padded,)
    yd: jax.Array
    zd: jax.Array
    cw: jax.Array  # (N,) column weight baked into rows; 0 on cell padding
    row_w: jax.Array  # (nrows_padded, ndc) problem*data weights; 0 on padding
    phys: _Physics
    chunk: int
    nrows: int  # true data count (unpadded)
    N_true: int = None  # logical cell count; None = no cell padding

    @property
    def N(self) -> int:
        return self.grid6[0].shape[0]

    @property
    def ncols(self) -> int:
        return self.phys.nmc * (self.N_true if self.N_true is not None else self.N)

    # NOTE: matvec/rmatvec share their chunking/padding/output-slicing
    # scaffold with LatticeMatrixFreeKernel below — a change to the
    # observation padding, row-weight application, or [:nrows] slicing
    # here must be mirrored there (and vice versa).
    def _chunk_rows(self, xs, ys, zs):
        return jax.vmap(lambda x, y, z: _rows_for_point(self.phys, self.grid6, x, y, z))(
            xs, ys, zs
        )  # (chunk, N, nmc, ndc)

    def matvec(self, x: jax.Array) -> jax.Array:
        x2 = x.reshape(self.phys.nmc, -1)
        npad = self.N - x2.shape[1]
        if npad:
            x2 = jnp.pad(x2, ((0, 0), (0, npad)))
        xw = self.cw[None, :] * x2  # (nmc, N); cell padding zeroed by cw = 0
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(args):
            xs, ys, zs, w = args
            rows = self._chunk_rows(xs, ys, zs)
            return w * jnp.einsum("bnkd,kn->bd", rows, xw)

        parts = jax.lax.map(
            per_chunk,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                self.row_w.reshape(nchunks, self.chunk, -1),
            ),
        )
        return parts.reshape(-1, self.phys.ndc)[: self.nrows].reshape(-1)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u2 = u.reshape(self.nrows, self.phys.ndc)
        u_pad = jnp.zeros((self.xd.shape[0], self.phys.ndc), u.dtype).at[: self.nrows].set(u2)
        u_pad = u_pad * self.row_w
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(g, args):
            xs, ys, zs, uc = args
            rows = self._chunk_rows(xs, ys, zs)
            return g + jnp.einsum("bnkd,bd->kn", rows, uc), None

        g0 = jnp.zeros((self.phys.nmc, self.N), u.dtype)
        g, _ = jax.lax.scan(
            per_chunk,
            g0,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                u_pad.reshape(nchunks, self.chunk, -1),
            ),
        )
        g = self.cw[None, :] * g
        if self.N_true is not None and self.N_true != self.N:
            g = g[:, : self.N_true]
        return g.reshape(-1)


def _mfk_flatten(k: MatrixFreeKernel):
    children = (k.grid6, k.xd, k.yd, k.zd, k.cw, k.row_w)
    aux = (k.phys, k.chunk, k.nrows, k.N_true)
    return children, aux


def _mfk_unflatten(aux, children):
    grid6, xd, yd, zd, cw, row_w = children
    phys, chunk, nrows, N_true = aux
    return MatrixFreeKernel(
        grid6=grid6, xd=xd, yd=yd, zd=zd, cw=cw, row_w=row_w,
        phys=phys, chunk=chunk, nrows=nrows, N_true=N_true,
    )


jax.tree_util.register_pytree_node(MatrixFreeKernel, _mfk_flatten, _mfk_unflatten)


def detect_lattice(grid):
    """Return (xe, ye, ze) edge vectors when the grid is a tensor-product
    lattice (every cell face shared exactly), else None. Exact float
    comparison: lattice grids written by the shipped tools repeat the
    same edge literals, and any mismatch safely falls back to the general
    per-cell operator."""
    nx, ny, nz = grid.nx, grid.ny, grid.nz

    def edges(lo, hi, axis):
        a = np.asarray(lo).reshape(nz, ny, nx)
        b = np.asarray(hi).reshape(nz, ny, nx)
        # lo must vary only along `axis` (0 = z, 1 = y, 2 = x).
        ref = [slice(0, 1)] * 3
        ref[axis] = slice(None)
        if not np.array_equal(a, np.broadcast_to(a[tuple(ref)], a.shape)):
            return None
        if not np.array_equal(b, np.broadcast_to(b[tuple(ref)], b.shape)):
            return None
        lo1 = a[tuple(ref)].reshape(-1)
        hi1 = b[tuple(ref)].reshape(-1)
        if not np.array_equal(lo1[1:], hi1[:-1]):
            return None
        return np.concatenate([lo1, hi1[-1:]])

    xe = edges(grid.X1, grid.X2, 2)
    ye = edges(grid.Y1, grid.Y2, 1)
    ze = edges(grid.Z1, grid.Z2, 0)
    if xe is None or ye is None or ze is None:
        return None
    return xe, ye, ze


def _diff3(F):
    """D[F](i,j,k) = sum_{K,L,M} (-1)^(K+L+M) F[i+K,j+L,k+M]
    (per axis out[i] = F[i] - F[i+1]): corners -> cells, keeping the
    cancellation LOCAL to each cell's own 8 corner values."""
    g = F
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, g.shape[ax] - 1)
        hi[ax] = slice(1, g.shape[ax])
        g = g[tuple(lo)] - g[tuple(hi)]
    return g


def lattice_rows_for_point(
    xe, ye, ze, x, y, z, problem, data_type, magv, intensity, nmc, ndc,
    far_quad: bool = False,
):
    """Per-cell sensitivity rows for one observation point via the
    corner-potential lattice: (nz, ny, nx, nmc, ndc). Each lattice corner's
    antiderivative is evaluated ONCE and shared by up to 8 cells (~8x fewer
    transcendentals than the per-cell 8-corner sums the reference loops,
    gravity_field.f90:131-195). Shared by the matrix-free operator and the
    dense kernel build (ops/sensitivity.py).

    far_quad=True (f32 operators): overwrite cells beyond the blend
    radius with far-field Gauss quadrature rows — the corner difference
    has the same ~(R/h)^3 f32 cancellation amplification as the per-cell
    closed forms (see ops/prism.py), so an f32 lattice operator's far
    field is noise without it."""
    from tomofastx_tpu.ops.prism import (
        G_GRAV,
        combine_mag_tensor,
        ftg_corner_potentials,
        gz_corner_potential,
        mag_corner_potentials,
    )

    def blend(rows):
        """rows: (nz, ny, nx, nmc, ndc) — overwrite far cells with the
        quadrature evaluation (elementwise kernels broadcast over the
        (1,1,nx)/(1,ny,1)/(nz,1,1) bound arrays at zero copy cost)."""
        if not far_quad:
            return rows
        from tomofastx_tpu.ops import prism as P

        # FLAT (N,) cell bounds, not the (1,1,nx)/(1,ny,1)/(nz,1,1)
        # broadcast triplets: the broadcast-structured blend program
        # hard-crashes the TPU worker above ~2M cells while the flat
        # per-cell program is proven at 4M (CLAUDE.md gotcha) — and the
        # element count is identical either way.
        nz_, ny_, nx_ = len(ze) - 1, len(ye) - 1, len(xe) - 1
        shp = (nz_, ny_, nx_)
        ga = (
            jnp.broadcast_to(xe[:-1][None, None, :], shp).reshape(-1),
            jnp.broadcast_to(xe[1:][None, None, :], shp).reshape(-1),
            jnp.broadcast_to(ye[:-1][None, :, None], shp).reshape(-1),
            jnp.broadcast_to(ye[1:][None, :, None], shp).reshape(-1),
            jnp.broadcast_to(ze[:-1][:, None, None], shp).reshape(-1),
            jnp.broadcast_to(ze[1:][:, None, None], shp).reshape(-1),
        )
        if problem == "magn":
            tq, uq, vq = P.magnetic_tensor_quad(x, y, z, *ga)
            quad = P.combine_mag_tensor(tq, uq, vq, magv, intensity, nmc, ndc)
        elif data_type == 1:
            quad = P.gravi_z_quad(x, y, z, *ga)[..., None, None]
        elif ndc == 1:
            quad = P.gradi_zz_quad(x, y, z, *ga)[..., None, None]
        else:
            quad = jnp.stack(
                P.gradi_full_quad(x, y, z, *ga), axis=-1
            )[..., None, :]
        quad = quad.reshape(shp + quad.shape[1:])
        mask = P.far_mask(x, y, z, *ga).reshape(shp)
        return jnp.where(mask[..., None, None], quad, rows)

    cx = (x - xe)[None, None, :]
    cy = (y - ye)[None, :, None]
    cz = (z - ze)[:, None, None]

    if problem == "grav" and data_type == 1:
        rows = -G_GRAV * _diff3(gz_corner_potential(cx, cy, cz))
        return blend(rows[..., None, None])

    if problem == "grav":  # data_type 2: FTG
        # The gradiprism kernels flip z internally (ZZ = -(zd - Z)).
        ps = ftg_corner_potentials(cx, cy, -cz)
        if ndc == 1:  # Gzz only
            rows = -G_GRAV * _diff3(ps[2])
            return blend(rows[..., None, None])
        rows = jnp.stack([-G_GRAV * _diff3(pc) for pc in ps], axis=-1)
        return blend(rows[..., None, :])

    # Magnetic corner potentials are evaluated at s = corner - obs (the
    # sharmbox convention, magnetic_field.f90:330-335), NOT obs - corner:
    # f3 = log(R + s_z) is singular on the ray {s_x = s_y = 0, s_z < 0},
    # and with s = corner - obs that ray points UP away from the grid
    # (s_z > 0 below the observation), whereas the obs - corner convention
    # put it straight DOWN through the model — any observation exactly
    # above a lattice node hit log(0) = -inf (caught by the round-3 dense
    # lattice build; the two conventions are D-equivalent where finite
    # since they differ by terms constant along one axis, which the
    # alternating corner difference annihilates).
    f1, f2, f3, f4, f5 = mag_corner_potentials(-cx, -cy, -cz)
    # The tensor-to-row combination is LINEAR with scalar coefficients
    # and the corner difference D is linear, so combine the corner
    # potentials FIRST and difference once per output channel: TMI +
    # susceptibility materializes ONE corner field instead of 5
    # channels + 6 tensor arrays (the memory-bound part of this
    # operator). Corner-space tensor derived term-by-term from sharmbox's
    # 8-corner sums (txx = D[f1], txy = -D[f3], tyz = -D[f4],
    # txz = -D[f5], tzz = -D[f1 + f2]; parity vs the dense sharmbox
    # kernel in tests::test_matrixfree_equals_dense).
    Fc = combine_mag_tensor(
        (f1, -f3, -f5), (-f3, f2, -f4), (-f5, -f4, -(f1 + f2)),
        magv, intensity, nmc, ndc,
    )  # (nz+1, ny+1, nx+1, nmc, ndc)
    return blend(_diff3(Fc))


@dataclass
class LatticeMatrixFreeKernel:
    """Corner-lattice factorization of the matrix-free operator (gravity
    g_z and the full magnetic family).

    On a tensor-product grid the prism closed forms are alternating
    2x2x2 corner sums of point antiderivatives (prism.gz_corner_potential
    for g_z; prism.mag_corner_potentials, 5 channels, for the Sharma
    tensor), and each corner is shared by up to 8 cells. Instead of evaluating 8
    corners per cell (the reference's per-cell loop,
    gravity_field.f90:131-195), evaluate f ONCE per lattice corner and
    difference the corner field back to per-cell rows:

        rows_obs   = -d3^T F_obs          (2x2x2 alternating stencil)
        S @ x      = sum_cells rows_obs * (cw*x)
        S^T u      = cw * sum_obs u_obs * rows_obs

    ~8x fewer transcendentals per matvec than the general operator, with
    the SAME local cancellation as the per-cell form (each cell value is
    a difference of its own 8 f32 corner values). NOTE a tempting
    alternative — moving the stencil onto the model vector and summing
    F * (-d3(cw*x)) over corners — is mathematically identical but
    numerically fatal in f32: F is O(1e5-1e6) while the result is many
    orders smaller, so the GLOBAL sum cancels past f32's mantissa
    (measured: data misfit floor 4e-3 instead of 1e-7 at 4M cells)."""

    xe: jax.Array  # (nx+1,)
    ye: jax.Array  # (ny+1,)
    ze: jax.Array  # (nz+1,)
    xd: jax.Array  # (nrows_padded,)
    yd: jax.Array
    zd: jax.Array
    cw: jax.Array  # (N,)
    row_w: jax.Array  # (nrows_padded, ndc)
    chunk: int
    nrows: int
    nx: int
    ny: int
    nz: int
    # Static physics: "grav" (g_z) or "magn" (Sharma tensor, all
    # susceptibility/vector x TMI/3-component combos; no borehole).
    problem: str = "grav"
    magv: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    intensity: float = 0.0
    nmc: int = 1
    ndc: int = 1
    data_type: int = 1  # gravity: 1 = g_z, 2 = gradiometry (FTG)
    # Compensated-f32 blend: far cells by Gauss quadrature (see
    # lattice_rows_for_point; set for f32 operators by the factory).
    far_quad: bool = False
    # Observation sharding (parallel/mesh.py::shard_kernel): when set, each
    # per-chunk batch of observation points is split across the mesh —
    # every device evaluates the corner fields for chunk/n points against
    # the REPLICATED model grid, GSPMD all-gathers the matvec data outputs
    # and psums the rmatvec gradient contraction. This is the reference's
    # data-row split of the forward (sensitivity_gravmag.F90:179-189)
    # composed with its Allreduce-summed adjoint (lsqr_solver2.F90:208-214),
    # re-expressed as sharding constraints. Requires chunk % mesh size == 0.
    mesh: "jax.sharding.Mesh | None" = None

    @property
    def N(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def ncols(self) -> int:
        return self.nmc * self.N

    def _rows_for_point(self, x, y, z):
        """Per-cell sensitivity rows for one observation point via the
        corner-potential lattice: (nz, ny, nx, nmc, ndc)."""
        return lattice_rows_for_point(
            self.xe, self.ye, self.ze, x, y, z, self.problem, self.data_type,
            self.magv, self.intensity, self.nmc, self.ndc,
            far_quad=self.far_quad,
        )

    def _shard_obs(self, xs, ys, zs, w):
        """Constrain one chunk's observation batch to split over the mesh
        (no-op when unmeshed)."""
        if self.mesh is None:
            return xs, ys, zs, w
        from jax.sharding import NamedSharding, PartitionSpec as P

        # All mesh axes together: on a 2-D (obs x cells) mesh the
        # observation batch splits across every device, not just one axis.
        ax = tuple(self.mesh.axis_names)
        s1 = NamedSharding(self.mesh, P(ax))
        s2 = NamedSharding(self.mesh, P(ax, None))
        c = jax.lax.with_sharding_constraint
        return c(xs, s1), c(ys, s1), c(zs, s1), c(w, s2)

    def matvec(self, x: jax.Array) -> jax.Array:
        x2 = x.reshape(self.nmc, self.N)
        y = (self.cw[None, :] * x2).reshape(self.nmc, self.nz, self.ny, self.nx)
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(args):
            xs, ys, zs, w = self._shard_obs(*args)
            d = jax.vmap(
                lambda xx, yy, zz: jnp.einsum(
                    "zyxkd,kzyx->d", self._rows_for_point(xx, yy, zz), y
                )
            )(xs, ys, zs)
            return w * d

        parts = jax.lax.map(
            per_chunk,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                self.row_w.reshape(nchunks, self.chunk, self.ndc),
            ),
        )
        return parts.reshape(-1, self.ndc)[: self.nrows].reshape(-1)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u2 = u.reshape(self.nrows, self.ndc)
        u_pad = (
            jnp.zeros((self.xd.shape[0], self.ndc), u.dtype)
            .at[: self.nrows]
            .set(u2)
        )
        u_pad = u_pad * self.row_w
        nchunks = self.xd.shape[0] // self.chunk

        def per_chunk(g, args):
            xs, ys, zs, uc = self._shard_obs(*args)
            rows = jax.vmap(self._rows_for_point)(xs, ys, zs)
            return g + jnp.einsum("bd,bzyxkd->kzyx", uc, rows), None

        g0 = jnp.zeros((self.nmc, self.nz, self.ny, self.nx), u.dtype)
        g3, _ = jax.lax.scan(
            per_chunk,
            g0,
            (
                self.xd.reshape(nchunks, self.chunk),
                self.yd.reshape(nchunks, self.chunk),
                self.zd.reshape(nchunks, self.chunk),
                u_pad.reshape(nchunks, self.chunk, self.ndc),
            ),
        )
        g = self.cw[None, :] * g3.reshape(self.nmc, self.N)
        return g.reshape(-1)


def _lmfk_flatten(k: LatticeMatrixFreeKernel):
    children = (k.xe, k.ye, k.ze, k.xd, k.yd, k.zd, k.cw, k.row_w)
    aux = (k.chunk, k.nrows, k.nx, k.ny, k.nz,
           k.problem, k.magv, k.intensity, k.nmc, k.ndc, k.data_type,
           k.far_quad, k.mesh)
    return children, aux


def _lmfk_unflatten(aux, children):
    xe, ye, ze, xd, yd, zd, cw, row_w = children
    (chunk, nrows, nx, ny, nz, problem, magv, intensity, nmc, ndc,
     data_type, far_quad, mesh) = aux
    return LatticeMatrixFreeKernel(
        xe=xe, ye=ye, ze=ze, xd=xd, yd=yd, zd=zd, cw=cw, row_w=row_w,
        chunk=chunk, nrows=nrows, nx=nx, ny=ny, nz=nz,
        problem=problem, magv=magv, intensity=intensity, nmc=nmc, ndc=ndc,
        data_type=data_type, far_quad=far_quad, mesh=mesh,
    )


jax.tree_util.register_pytree_node(
    LatticeMatrixFreeKernel, _lmfk_flatten, _lmfk_unflatten
)


def make_matrixfree_kernel(
    par, grid, data, column_weight, problem_weight, data_weight, dtype=jnp.float32,
    chunk=None, pad_cells_to: int = 1, validate: bool = True,
    force_generic: bool = False, force_no_fft: bool = False,
    in_fused_program: bool = False,
) -> "MatrixFreeKernel | LatticeMatrixFreeKernel":
    """Build the operator from the problem description (no kernel storage).

    Fastest applicable operator wins: the FFT/BTTB operator (ops/bttb.py,
    per-layer 2-D FFT convolutions; requires lattice grid with uniform
    x/y spacing + observations on a commensurate lattice at one height),
    then the corner-lattice fast operator (LatticeMatrixFreeKernel,
    2.1-3.5x) when the grid is a tensor-product lattice and the physics
    supports it; otherwise the general per-cell MatrixFreeKernel.
    force_no_fft skips the FFT operator (tests / A-B benchmarking).

    pad_cells_to > 1 zero-pads the cell axis to that multiple (dummy far
    prisms with cw = 0) so the operator shards over a device mesh of that
    size for any N (see parallel/mesh.py::shard_kernel).

    validate=True runs one probe matvec at construction and aborts on
    non-finite output — the stored-kernel build catches a
    boundary-coincident observation point at build time
    (gravity_field.f90:99-107 aborts: "Data coordinate coincides with model
    grid boundary ... Adjust the model grid!"); without this probe the
    matrix-free path would instead propagate silent NaNs into the solve."""
    from tomofastx_tpu.config.parfile import MagParams
    from tomofastx_tpu.ops import prism

    if par.compression_type > 0:
        raise ValueError("matrix-free mode requires forward.matrixCompression.type = 0")

    # Compensated-f32 physics for the general per-cell operator (the
    # lattice/BTTB fast paths below have their own precision stories: the
    # BTTB table is f64-built, and the corner-lattice operator is only
    # selected where its cancellation behavior is pinned by tests).
    far_quad = bool(
        getattr(par, "far_field_quad", 1) and jnp.dtype(dtype) == jnp.float32
    )
    if isinstance(par, MagParams):
        from tomofastx_tpu.ops.sensitivity import observation_inside_grid

        phys = _Physics(
            problem="magn", data_type=1, nmc=par.nmodel_components,
            ndc=par.ndata_components, magv=prism.dircos(par.mi, par.md, par.theta),
            intensity=par.intensity,
            handle_inside=observation_inside_grid(grid, data),
            far_quad=far_quad,
        )
    else:
        phys = _Physics(
            problem="grav", data_type=par.data_type, nmc=1,
            ndc=par.ndata_components, magv=(0.0, 0.0, 1.0), intensity=0.0,
            handle_inside=False, far_quad=far_quad,
        )

    # FFT/BTTB fast path: exact physics (f64-built offset table) at
    # O(nz P log P) per matvec. No cell padding needed for a mesh — the
    # operator shards over z-layers (parallel/mesh.py::shard_kernel).
    if not force_generic and not force_no_fft:
        from tomofastx_tpu.ops.bttb import detect_bttb, make_bttb_kernel

        geom = detect_bttb(grid, data, nmc=phys.nmc, ndc=phys.ndc)
        if geom is not None:
            return make_bttb_kernel(
                phys, geom, grid, column_weight, problem_weight,
                data_weight, dtype,
            )

    N = grid.nelements_total
    nd = par.ndata
    if chunk is None:
        chunk = max(8, min(256, (1 << 26) // max(N * phys.nmc * phys.ndc, 1)))
        if phys.far_quad:
            # The quad blend roughly doubles the per-chunk working set
            # (quad rows + mask next to the closed/lattice rows and the
            # 27-point accumulation temps). At the 4M-cell scale the
            # default chunk made the TPU worker CRASH outright (not a
            # graceful RESOURCE_EXHAUSTED — observed 2026-08-21); halve
            # the chunk for blended f32 operators.
            chunk = max(8, chunk // 2)
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

    row_w = np.zeros((nd_pad, phys.ndc))
    row_w[:nd] = problem_weight * np.asarray(data_weight).reshape(nd, phys.ndc)

    # Corner-lattice fast path: on a tensor-product grid the closed
    # forms factor into one antiderivative per lattice corner (~8x fewer
    # transcendentals per matvec). force_generic (tests) keeps the
    # general operator. Under a device mesh (pad_cells_to > 1) the
    # lattice operator needs NO cell padding — it shards over the
    # observation axis instead (parallel/mesh.py::shard_kernel sets
    # op.mesh), so the fast path is kept for meshed runs too.
    lattice_ok = (
        not force_generic
        and (
            (phys.problem == "grav" and phys.nmc == 1)  # g_z and FTG
            # Magnetics: every nmc/ndc combo; the 6-subprism borehole
            # branch is per-cell and cannot share corners.
            or (phys.problem == "magn" and not phys.handle_inside)
        )
    )
    # The blended LATTICE operator crashes the TPU worker above ~2M
    # cells inside the PRODUCT SOLVER programs — both the host-driven
    # per-major-iteration make_solver program and the fused scan
    # (reproduced at 200x200x100 with both the broadcast-triplet and the
    # flat-(N,) quad formulations, chunks 16 and 8, 2026-08-21) — while
    # standalone blended matvec/rmatvec AND a bare jitted 20-iteration
    # lsqr_solve while_loop over the same operator all run fine at 4M
    # (probed, 0.38-2.4 s warm). The trigger is the larger composed
    # solver program (LSQR + constraint operators + costs), not the
    # blend math. Until root-caused, gate the blend off for huge lattice
    # operators with a loud warning: the operator then carries the known
    # f32 far-field cancellation error (~3.5e-5 relerr vs f64) — on
    # gridded surveys prefer the BTTB operator, which is exact-f64-table
    # physics at any size. (in_fused_program is accepted for call-site
    # documentation but does not relax the gate — the host-driven solver
    # crashes too.)
    LATTICE_BLEND_MAX_CELLS = 2_000_000
    lattice_far_quad = phys.far_quad
    if lattice_far_quad and N > LATTICE_BLEND_MAX_CELLS:
        print(
            f"WARNING: disabling the far-field quadrature blend for the "
            f"corner-lattice operator at {N} cells (> "
            f"{LATTICE_BLEND_MAX_CELLS}: blended solver programs crash "
            f"the TPU worker at this scale); far-field f32 accuracy is "
            f"reduced — prefer the BTTB operator on gridded surveys.",
            flush=True,
        )
        lattice_far_quad = False
    if lattice_ok:
        lat = detect_lattice(grid)
        if lat is not None:
            xe, ye, ze = lat
            op = LatticeMatrixFreeKernel(
                xe=jnp.asarray(xe, dtype),
                ye=jnp.asarray(ye, dtype),
                ze=jnp.asarray(ze, dtype),
                xd=pad(data.X, far[0]),
                yd=pad(data.Y, far[1]),
                zd=pad(data.Z, far[2]),
                cw=jnp.asarray(column_weight, dtype),
                row_w=jnp.asarray(row_w, dtype),
                chunk=chunk,
                nrows=nd,
                nx=grid.nx, ny=grid.ny, nz=grid.nz,
                problem=phys.problem, magv=phys.magv,
                intensity=phys.intensity, nmc=phys.nmc, ndc=phys.ndc,
                data_type=phys.data_type, far_quad=lattice_far_quad,
            )
            if validate:
                probe = np.asarray(op.matvec(jnp.ones((op.ncols,), dtype)))
                if not np.all(np.isfinite(probe)):
                    raise ValueError(
                        "Data coordinate coincides with model grid boundary. "
                        "Adjust the model grid! (non-finite matrix-free probe "
                        "matvec; reference aborts here, gravity_field.f90:99-107)"
                    )
            return op

    # Cell-axis padding: dummy unit prisms far outside the model volume
    # (finite closed forms for every real observation point) with cw = 0.
    N_pad = ((N + pad_cells_to - 1) // pad_cells_to) * pad_cells_to
    ncpad = N_pad - N

    def pad_cells(a, base):
        if ncpad == 0:
            return jnp.asarray(a, dtype)
        out = np.empty(N_pad)
        out[:N] = a
        # Spread the dummies along x so no two coincide.
        out[N:] = base + 10.0 * np.arange(ncpad)
        return jnp.asarray(out, dtype)

    fx = float(np.max(grid.X2)) + 2.0e6
    fy = float(np.max(grid.Y2)) + 2.0e6
    fz = float(np.max(grid.Z2)) + 2.0e6
    grid6 = (
        pad_cells(grid.X1, fx),
        pad_cells(grid.X2, fx + 1.0),
        pad_cells(grid.Y1, fy),
        pad_cells(grid.Y2, fy + 1.0),
        pad_cells(grid.Z1, fz),
        pad_cells(grid.Z2, fz + 1.0),
    )
    cw_pad = np.zeros(N_pad)
    cw_pad[:N] = np.asarray(column_weight)

    op = MatrixFreeKernel(
        grid6=grid6,
        xd=pad(data.X, far[0]),
        yd=pad(data.Y, far[1]),
        zd=pad(data.Z, far[2]),
        cw=jnp.asarray(cw_pad, dtype),
        row_w=jnp.asarray(row_w, dtype),
        phys=phys,
        chunk=chunk,
        nrows=nd,
        N_true=N,
    )

    if validate:
        probe = np.asarray(op.matvec(jnp.ones((op.ncols,), dtype)))
        if not np.all(np.isfinite(probe)):
            raise ValueError(
                "Data coordinate coincides with model grid boundary. "
                "Adjust the model grid! (non-finite matrix-free probe matvec; "
                "reference aborts here, gravity_field.f90:99-107)"
            )
    return op
