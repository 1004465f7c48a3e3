"""BTTB sensitivity operator: exact prism forward via per-layer 2-D FFTs.

On a tensor-product grid with UNIFORM x/y spacing, the prism closed forms
depend on the observation point only through the displacement
(xd - xc, yd - yc, zd) to each cell center. When the observation points
also lie on a regular horizontal lattice commensurate with the cell grid
(spacing an integer multiple of the cell spacing, any constant offset) at
one constant height, every layer of the sensitivity matrix is
block-Toeplitz-with-Toeplitz-blocks (BTTB): row (iy, ix), column (jy, jx)
depends only on (iy*my - jy, ix*mx - jx). The whole operator is then nz
independent 2-D convolutions:

    S @ x  = gather_obs( sum_l  T_l (*) (cw * x)_l )
    S^T u  = cw * slice_cells( correlate(T_l, scatter_obs(u)) )

computed with 2-D real FFTs — O(nz * P log P) work and O(nz * P^2) memory
instead of O(nd * N) work (dense GEMV) or O(nd * N) transcendental
evaluations (matrix-free): typically 2-4 orders of magnitude faster than
either, with ZERO kernel storage beyond the (nz, Ly, Lx) offset table.

The offset table T is built ONCE through the exact f64 prism physics (the
same `forward_rows` dispatch as every other path — ~4N closed-form
evaluations total, vs nd*N for the dense build), so the per-cell 8-corner
cancellation happens entirely in f64: the f32 operator error is the f32
ROUNDING of exact entries (~1e-7 relative), better than the f32
matrix-free paths whose corner differences cancel in f32 (~1e-2 far-field
relerr, BASELINE.md).

This is a TPU-native capability with no counterpart in the reference
(which always materializes the kernel row-by-row,
sensitivity_gravmag.F90:189-318); the structured-matrix + 2-D FFT
formulation follows the published BTTB literature for potential-field
kernels (e.g. Hogue, Renaut & Vatankhah, arXiv:2004.13904; and the kernel
tutorial arXiv:1912.06976). Applicability is detected automatically
(`detect_bttb`); any violation — scattered observations, incommensurate
spacing, varying heights, non-uniform x/y grid, observations inside the
volume's z-range (incl. the magnetic borehole branch,
magnetic_field.f90:139-224) — falls back to the corner-lattice or general
matrix-free operator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth integer >= n (efficient XLA FFT sizes)."""
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


@dataclass(frozen=True)
class BTTBGeometry:
    """Detected lattice structure of (grid, observations)."""

    no_x: int  # observation lattice dims
    no_y: int
    mx: int  # observation spacing in cell-spacing units
    my: int
    hx: float  # uniform cell spacings
    hy: float
    dx0: float  # obs-lattice origin minus first cell-center (x)
    dy0: float
    zd: float  # the single observation height
    obs_flat: np.ndarray  # (nd,) int: iy * no_x + ix per data row
    xe: np.ndarray  # cell edge vectors (from detect_lattice)
    ye: np.ndarray
    ze: np.ndarray


def detect_bttb(grid, data, nmc: int = 1, ndc: int = 1,
                max_table_bytes: int = 4 << 30) -> Optional[BTTBGeometry]:
    """Return the BTTB geometry when (grid, data) qualify, else None.

    Conditions (each falls back silently):
    - tensor-product grid (detect_lattice) with uniform x and y spacing
      (z spacing may vary per layer);
    - all observation points at ONE height, strictly outside the volume's
      z-range (the offset table contains zero-horizontal-offset entries —
      points directly above/below a cell — which must be singularity-free;
      this also excludes the magnetic borehole case);
    - observation x/y positions form a FULL regular lattice whose spacing
      is a positive integer multiple of the cell spacing (any constant
      offset, any point order, single row/column allowed).
    """
    from tomofastx_tpu.ops.matrixfree import detect_lattice

    lat = detect_lattice(grid)
    if lat is None:
        return None
    xe, ye, ze = lat
    dx = np.diff(xe)
    dy = np.diff(ye)
    hx, hy = float(dx[0]), float(dy[0])
    if hx <= 0.0 or hy <= 0.0:
        return None
    if not np.allclose(dx, hx, rtol=1e-9, atol=0.0):
        return None
    if not np.allclose(dy, hy, rtol=1e-9, atol=0.0):
        return None

    Z = np.asarray(data.Z, np.float64)
    if Z.size == 0:
        return None
    zd = float(Z[0])
    if not np.all(Z == zd):
        return None
    if min(ze.min(), ze.max()) <= zd <= max(ze.min(), ze.max()):
        return None

    X = np.asarray(data.X, np.float64)
    Y = np.asarray(data.Y, np.float64)
    ux = np.unique(X)
    uy = np.unique(Y)
    if ux.size * uy.size != X.size:
        return None

    def lattice_step(u: np.ndarray, h: float) -> Optional[float]:
        if u.size == 1:
            return h  # single line: any commensurate stride works; use h
        du = np.diff(u)
        s = float(du[0])
        if s <= 0.0 or not np.allclose(du, s, rtol=1e-9, atol=0.0):
            return None
        return s

    sx = lattice_step(ux, hx)
    sy = lattice_step(uy, hy)
    if sx is None or sy is None:
        return None
    mx = int(round(sx / hx))
    my = int(round(sy / hy))
    if mx < 1 or abs(sx - mx * hx) > 1e-9 * abs(sx):
        return None
    if my < 1 or abs(sy - my * hy) > 1e-9 * abs(sy):
        return None

    # Map every data row to its lattice coordinates (exact float match —
    # unique() returned these exact values) and require bijectivity.
    ix = np.searchsorted(ux, X)
    iy = np.searchsorted(uy, Y)
    if not (np.array_equal(ux[ix], X) and np.array_equal(uy[iy], Y)):
        return None
    obs_flat = iy * ux.size + ix
    if np.unique(obs_flat).size != X.size:
        return None

    # The device-resident spectrum is (nz, nmc, ndc, Py, Px//2+1)
    # complex64 — account for the component axes AND the 5-smooth FFT
    # padding (the review caught an elems-only guard undercounting
    # magnetic vector/3-component tables by up to 9x). Default cap 4 GB:
    # an absurd stride/extent (or a table that cannot share a 16 GB chip
    # with the model vectors) falls back to the lattice operator.
    Lx = (ux.size - 1) * mx + grid.nx
    Ly = (uy.size - 1) * my + grid.ny
    spectrum_bytes = (
        grid.nz * nmc * ndc
        * _next_fast_len(Ly) * (_next_fast_len(Lx) // 2 + 1) * 8
    )
    if spectrum_bytes > max_table_bytes:
        return None

    return BTTBGeometry(
        no_x=ux.size,
        no_y=uy.size,
        mx=mx,
        my=my,
        hx=hx,
        hy=hy,
        dx0=float(ux[0] - (xe[0] + 0.5 * hx)),
        dy0=float(uy[0] - (ye[0] + 0.5 * hy)),
        zd=zd,
        obs_flat=obs_flat.astype(np.int32),
        xe=xe,
        ye=ye,
        ze=ze,
    )


@dataclass
class BTTBKernel:
    """FFT-convolution sensitivity operator ((nd*ndc) x (nmc*N)).

    Tf holds the rfft2 of the zero-padded per-layer offset tables,
    shape (nz, nmc, ndc, Py, Px//2+1); the matvec is
    gather(irfft2(sum_{z,k} Tf * rfft2(cw*x))) and the adjoint the exact
    transpose via the conjugate spectrum (circular correlation). Both are
    alias-free by construction: padded sizes satisfy
    P >= (no-1)*m + n, so every needed output index k - j stays in
    [0, P-1] (no wraparound term exists).

    mesh: when set, the layer (z) axis of the frequency-domain arrays is
    sharded across the device mesh — each device convolves its own layers
    (the model axis split of lsqr_solver2.F90:228-245) and GSPMD psums the
    data-side sum over layers.

    layer_block: when set (single-chip capacity mode, chosen by
    make_bttb_kernel from the temp-memory estimate), the per-layer FFTs
    run in lax.map blocks of this many z-layers: HBM peak drops from
    O(nz * Py * Px) transform temps to O(layer_block * Py * Px) while the
    table stays resident — this is what lets a 134M-cell problem
    (nz = 512 at Py = Px = 1024, whose full-nz transforms alone exceed
    the 16 GB chip) run at all. Must divide nz.
    """

    Tf: jax.Array  # (nz, nmc, ndc, Py, Pxr) complex
    cw: jax.Array  # (N,)
    row_w: jax.Array  # (nd, ndc)
    obs_flat: jax.Array  # (nd,) int32
    nx: int
    ny: int
    nz: int
    nmc: int
    ndc: int
    no_x: int
    no_y: int
    mx: int
    my: int
    nrows: int  # nd (data points)
    Py: int
    Px: int
    mesh: "jax.sharding.Mesh | None" = None
    layer_block: "int | None" = None

    @property
    def N(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def ncols(self) -> int:
        return self.nmc * self.N

    @property
    def nbytes(self) -> int:
        return self.Tf.nbytes

    def _shard_layers(self, a, axis_z: int):
        """Constrain an array's z-layer axis over the mesh (no-op unmeshed)."""
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = self.mesh.axis_names[0]
        spec = [None] * a.ndim
        spec[axis_z] = ax
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(self.mesh, P(*spec))
        )

    def _blocks(self):
        """(nblk, blk) split of the z axis; (1, nz) when unblocked."""
        blk = self.layer_block if self.mesh is None and self.layer_block else self.nz
        return self.nz // blk, blk

    def matvec(self, x: jax.Array) -> jax.Array:
        xw = (self.cw[None, :] * x.reshape(self.nmc, self.N)).reshape(
            self.nmc, self.nz, self.ny, self.nx
        )
        nblk, blk = self._blocks()
        if nblk == 1:
            Xf = jnp.fft.rfft2(xw, s=(self.Py, self.Px))  # (nmc, nz, Py, Pxr)
            Xf = self._shard_layers(Xf, 1)
            Df = jnp.einsum("zkdyx,kzyx->dyx", self.Tf, Xf)
        else:
            xb = jnp.moveaxis(
                xw.reshape(self.nmc, nblk, blk, self.ny, self.nx), 1, 0
            )  # (nblk, nmc, blk, ny, nx)
            Tb = self.Tf.reshape(
                nblk, blk, self.nmc, self.ndc, self.Py, self.Tf.shape[-1]
            )

            def per_block(args):
                tf, xw_b = args
                Xf = jnp.fft.rfft2(xw_b, s=(self.Py, self.Px))
                return jnp.einsum("zkdyx,kzyx->dyx", tf, Xf)

            Df = jnp.sum(jax.lax.map(per_block, (Tb, xb)), axis=0)
        dg = jnp.fft.irfft2(Df, s=(self.Py, self.Px))  # (ndc, Py, Px)
        dg = dg[
            :,
            self.ny - 1 : self.ny - 1 + self.no_y * self.my : self.my,
            self.nx - 1 : self.nx - 1 + self.no_x * self.mx : self.mx,
        ]
        dflat = dg.reshape(self.ndc, self.no_y * self.no_x)[:, self.obs_flat]
        return (dflat.T * self.row_w).reshape(-1)

    def rmatvec(self, u: jax.Array) -> jax.Array:
        u2 = u.reshape(self.nrows, self.ndc) * self.row_w
        ug = (
            jnp.zeros((self.ndc, self.no_y * self.no_x), u2.dtype)
            .at[:, self.obs_flat]
            .set(u2.T)
            .reshape(self.ndc, self.no_y, self.no_x)
        )
        up = (
            jnp.zeros((self.ndc, self.Py, self.Px), u2.dtype)
            .at[
                :,
                self.ny - 1 : self.ny - 1 + self.no_y * self.my : self.my,
                self.nx - 1 : self.nx - 1 + self.no_x * self.mx : self.mx,
            ]
            .set(ug)
        )
        Uf = jnp.fft.rfft2(up)  # (ndc, Py, Pxr)
        nblk, blk = self._blocks()
        if nblk == 1:
            Gf = jnp.einsum("zkdyx,dyx->kzyx", jnp.conj(self.Tf), Uf)
            Gf = self._shard_layers(Gf, 1)
            g = jnp.fft.irfft2(Gf, s=(self.Py, self.Px))[
                :, :, : self.ny, : self.nx
            ]
        else:
            Tb = self.Tf.reshape(
                nblk, blk, self.nmc, self.ndc, self.Py, self.Tf.shape[-1]
            )

            def per_block(tf):
                Gf = jnp.einsum("zkdyx,dyx->kzyx", jnp.conj(tf), Uf)
                return jnp.fft.irfft2(Gf, s=(self.Py, self.Px))[
                    :, :, : self.ny, : self.nx
                ]

            gb = jax.lax.map(per_block, Tb)  # (nblk, nmc, blk, ny, nx)
            g = jnp.moveaxis(gb, 0, 1).reshape(
                self.nmc, self.nz, self.ny, self.nx
            )
        g = g.reshape(self.nmc, self.N) * self.cw[None, :]
        return g.reshape(-1)


def _bttb_flatten(k: BTTBKernel):
    children = (k.Tf, k.cw, k.row_w, k.obs_flat)
    aux = (k.nx, k.ny, k.nz, k.nmc, k.ndc, k.no_x, k.no_y, k.mx, k.my,
           k.nrows, k.Py, k.Px, k.mesh, k.layer_block)
    return children, aux


def _bttb_unflatten(aux, children):
    Tf, cw, row_w, obs_flat = children
    (nx, ny, nz, nmc, ndc, no_x, no_y, mx, my, nrows, Py, Px, mesh,
     layer_block) = aux
    return BTTBKernel(
        Tf=Tf, cw=cw, row_w=row_w, obs_flat=obs_flat,
        nx=nx, ny=ny, nz=nz, nmc=nmc, ndc=ndc, no_x=no_x, no_y=no_y,
        mx=mx, my=my, nrows=nrows, Py=Py, Px=Px, mesh=mesh,
        layer_block=layer_block,
    )


jax.tree_util.register_pytree_node(BTTBKernel, _bttb_flatten, _bttb_unflatten)


def build_offset_table(phys, geom: BTTBGeometry, nx: int, ny: int,
                       nz: int) -> np.ndarray:
    """The per-layer offset table T, host f64, shape (nz, nmc, ndc, Ly, Lx).

    T[l, k, d, oy, ox] is the exact (f64) prism response of a cell in
    layer l whose center sits at horizontal displacement
    (dx0 + (ox - (nx-1))*hx, dy0 + (oy - (ny-1))*hy) from the observation
    point, evaluated through the SAME physics dispatch as the dense and
    matrix-free builders (ops/sensitivity.py::forward_rows) so the paths
    cannot diverge. Total cost ~ Ly*Lx*nz ~ 4*N closed-form evaluations —
    the work of ~4 dense-kernel rows.

    The evaluation runs on the HOST CPU backend under a local
    jax.enable_x64(): native f64 (the accuracy contract holds even when
    the caller runs with x64 off), and no device compile — a single f64
    prism program costs minutes of XLA compile on the TPU (emulated
    doubles, BASELINE.md) for what is a one-second CPU job."""
    from tomofastx_tpu.ops.sensitivity import forward_rows

    Lx = (geom.no_x - 1) * geom.mx + nx
    Ly = (geom.no_y - 1) * geom.my + ny

    # Virtual observation points realizing every lattice displacement
    # relative to the virtual cell center (hx/2, hy/2).
    vx = 0.5 * geom.hx + geom.dx0 + (np.arange(Lx) - (nx - 1)) * geom.hx
    vy = 0.5 * geom.hy + geom.dy0 + (np.arange(Ly) - (ny - 1)) * geom.hy
    VX, VY = np.meshgrid(vx, vy, indexing="xy")  # (Ly, Lx)
    pts_x = VX.reshape(-1)
    pts_y = VY.reshape(-1)
    npts = pts_x.size

    # Virtual one-column grid: one cell per layer at [0,hx] x [0,hy] with
    # the real layer z-extents.
    z1 = np.minimum(geom.ze[:-1], geom.ze[1:])
    z2 = np.maximum(geom.ze[:-1], geom.ze[1:])

    with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
        grid6 = (
            jnp.zeros(nz, jnp.float64),
            jnp.full((nz,), geom.hx, jnp.float64),
            jnp.zeros(nz, jnp.float64),
            jnp.full((nz,), geom.hy, jnp.float64),
            jnp.asarray(z1, jnp.float64),
            jnp.asarray(z2, jnp.float64),
        )

        @jax.jit
        def eval_chunk(xs, ys):
            return jax.vmap(
                lambda x, y: forward_rows(
                    phys.problem, phys.data_type, phys.nmc, phys.ndc,
                    phys.magv, phys.intensity, False, grid6, x, y,
                    jnp.asarray(geom.zd, jnp.float64),
                )
            )(xs, ys)  # (B, nz, nmc, ndc)

        chunk = max(
            64, min(npts, (1 << 22) // max(nz * phys.nmc * phys.ndc, 1))
        )
        parts = []
        for s in range(0, npts, chunk):
            e = min(npts, s + chunk)
            parts.append(np.asarray(eval_chunk(
                jnp.asarray(pts_x[s:e], jnp.float64),
                jnp.asarray(pts_y[s:e], jnp.float64),
            )))
    T = np.concatenate(parts, axis=0).reshape(Ly, Lx, nz, phys.nmc, phys.ndc)
    if not np.all(np.isfinite(T)):
        raise ValueError(
            "Data coordinate coincides with model grid boundary. "
            "Adjust the model grid! (non-finite BTTB offset table; the "
            "reference aborts here, gravity_field.f90:99-107)"
        )
    # (nz, nmc, ndc, Ly, Lx)
    return np.ascontiguousarray(T.transpose(2, 3, 4, 0, 1))


def make_bttb_kernel(
    phys, geom: BTTBGeometry, grid, column_weight, problem_weight,
    data_weight, dtype=jnp.float32,
) -> BTTBKernel:
    """Assemble the FFT operator: exact-f64 offset table (host CPU) ->
    storage dtype + zero-pad to 5-smooth FFT sizes on the host -> one 3-D
    host-to-device transfer -> rfft2 on device. (The axon tunnel cannot
    transfer complex arrays, so the spectrum is always formed on device.)"""
    nx, ny, nz = grid.nx, grid.ny, grid.nz
    nd = geom.obs_flat.shape[0]
    T = build_offset_table(phys, geom, nx, ny, nz)
    Lx = T.shape[-1]
    Ly = T.shape[-2]
    Px = _next_fast_len(Lx)
    Py = _next_fast_len(Ly)
    G = nz * phys.nmc * phys.ndc
    Tp = np.zeros((G, Py, Px), np.dtype(dtype))
    Tp[:, :Ly, :Lx] = T.reshape(G, Ly, Lx)

    @jax.jit
    def fft_table(Tp):
        return jnp.fft.rfft2(Tp).reshape(nz, phys.nmc, phys.ndc, Py, -1)

    Tf = fft_table(jnp.asarray(Tp))

    # Layer blocking: the full-nz transform temps are roughly
    # nmc * nz * Py * Px * ~20 bytes (padded real input + two complex
    # spectra); cap them at ~1.5 GB by mapping over the largest divisor
    # block of nz that fits (134M cells: nz = 512 at 1024^2 planes needs
    # ~10 GB unblocked — over the 16 GB chip next to the 2.15 GB table).
    plane = phys.nmc * Py * Px * 20
    layer_block = None
    if nz * plane > (3 << 30):
        blk = max(1, (3 << 29) // plane)
        while nz % blk:
            blk -= 1
        layer_block = blk

    row_w = problem_weight * np.asarray(data_weight).reshape(nd, phys.ndc)
    return BTTBKernel(
        Tf=Tf,
        cw=jnp.asarray(column_weight, dtype),
        row_w=jnp.asarray(row_w, dtype),
        obs_flat=jnp.asarray(geom.obs_flat),
        nx=nx, ny=ny, nz=nz, nmc=phys.nmc, ndc=phys.ndc,
        no_x=geom.no_x, no_y=geom.no_y, mx=geom.mx, my=geom.my,
        nrows=nd, Py=Py, Px=Px, layer_block=layer_block,
    )
