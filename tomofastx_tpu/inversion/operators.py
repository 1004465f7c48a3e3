"""Matrix-free constraint operators for the joint least-squares system.

The reference assembles every constraint into a CSR "constraints matrix"
each major iteration (joint_inverse_problem.F90:264-359, damping.F90,
damping_gradient.F90, cross_gradient.F90, clustering.F90).  Here each
constraint is a *linearized operator*: an assembly step (pure jnp, vectorized
over all cells) produces coefficient fields + RHS + cost, and matvec/rmatvec
are fused elementwise/stencil ops.  No sparse indices, no row bookkeeping —
and the whole assembly can live inside the jitted per-iteration solve.

Conventions:
- x segments are in the *scaled model* domain m~ = m / column_weight
  (or its wavelet transform when solving in the wavelet domain);
- all coefficient math follows the reference's exact weighting order, cited
  per function;
- "cube" means shape (nz, ny, nx) with the i-fastest flat order.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from tomofastx_tpu.ops import wavelet as W


# Axis index in a (nz, ny, nx) cube for direction 1=x, 2=y, 3=z.
_DIR_AXIS = {1: 2, 2: 1, 3: 0}


def shift(cube, offset: Tuple[int, int, int]):
    """shift(x, o)[p] = x[p + o] with zero fill; o = (di, dj, dk) cell offsets.
    Matches the reference's zero-padded out-of-grid lookups
    (gradient.F90:210-218)."""
    out = cube
    for axis, d in ((2, offset[0]), (1, offset[1]), (0, offset[2])):
        if d == 0:
            continue
        out = jnp.roll(out, -d, axis=axis)
        n = out.shape[axis]
        idx = [slice(None)] * 3
        if d > 0:
            idx[axis] = slice(n - d, n)
        else:
            idx[axis] = slice(0, -d)
        out = out.at[tuple(idx)].set(0.0)
    return out


# =============================================================================
# Damping (model prior term) — reference: damping.F90:97-234
# =============================================================================


class DampingOp(NamedTuple):
    """alpha * W * (m - m_prior) rows: diagonal in the scaled-model space."""

    dcoef: jax.Array  # (ncomp, N) diagonal coefficients
    rhs: jax.Array  # (ncomp, N)
    cost: jax.Array  # scalar

    def matvec(self, xseg):
        # xseg: (ncomp, N) scaled-model segment of this problem.
        return (self.dcoef * xseg).reshape(-1)

    def rmatvec(self, u):
        return self.dcoef * u.reshape(self.dcoef.shape)

    @property
    def nrows(self):
        return self.rhs.size


def make_damping(
    alpha: float,
    problem_weight: float,
    norm_power: float,
    model: jax.Array,  # (ncomp, N)
    model_prior: jax.Array,  # (ncomp, N)
    column_weight: jax.Array,  # (N,)
    local_weight: Optional[jax.Array],  # (N,) or None
    wavelet_domain: bool,
    compression_type: int,
    nx: int,
    ny: int,
    nz: int,
) -> DampingOp:
    """Assemble the damping block (reference: damping_add, damping.F90:97-201):
    matrix value = alpha*pw*(Lp multiplier)*(local weight) on the diagonal,
    RHS = -alpha*pw*diff*(Lp)*(local), diff = (m - m_prior)/column_weight,
    wavelet-transformed when solving in the wavelet domain
    (damping.F90:135-149)."""
    cw = column_weight[None, :]
    diff = jnp.where(cw != 0.0, (model - model_prior) / jnp.where(cw != 0.0, cw, 1.0), 0.0)

    if compression_type > 0 and wavelet_domain:
        diff = W.forward_wavelet_flat(diff, nx, ny, nz, compression_type)

    base = alpha * problem_weight
    if norm_power != 2.0:
        lp = jnp.where(diff != 0.0, jnp.abs(diff) ** (norm_power / 2.0 - 1.0), 1.0)
    else:
        lp = 1.0
    lw = 1.0 if local_weight is None else local_weight[None, :]
    dcoef = base * lp * lw * jnp.ones_like(diff)
    rhs = -base * diff * lp * lw
    cost = jnp.sum(rhs**2)
    return DampingOp(dcoef=dcoef, rhs=rhs, cost=cost)


# ADMM reuses DampingOp on a single-component slice; the system builder
# scatters the contribution into the right component (the reference adds the
# ADMM quadratic term through the same damping machinery,
# joint_inverse_problem.F90:497-527).


# =============================================================================
# Damping gradient (first-difference smoothing) —
# reference: damping_gradient.F90:94-205
# =============================================================================


class DampingGradientOp(NamedTuple):
    """Rows (pw*beta/delta) (m~_{p+1} w_{p+1} - m~_p w_p) per direction.

    coefA multiplies the shifted (next-cell) column, coefB the diagonal;
    both are cubes. axis/direction is static (kept in the system builder)."""

    coefA: jax.Array  # (nz, ny, nx)
    coefB: jax.Array  # (nz, ny, nx)
    rhs: jax.Array  # (N,)
    cost: jax.Array
    offset: Tuple[int, int, int]

    def matvec(self, x_comp_cube):
        return (self.coefA * shift(x_comp_cube, self.offset) + self.coefB * x_comp_cube).reshape(-1)

    def rmatvec(self, u):
        ucube = u.reshape(self.coefB.shape)
        neg = tuple(-o for o in self.offset)
        return self.coefB * ucube + shift(self.coefA * ucube, neg)

    @property
    def nrows(self):
        return self.rhs.size


def make_damping_gradient(
    beta: float,
    problem_weight: float,
    model_comp: jax.Array,  # (N,) actual model values of one component
    column_weight: jax.Array,  # (N,)
    local_weight: jax.Array,  # (N,) per-direction local weights
    dX: jax.Array,
    dY: jax.Array,
    dZ: jax.Array,
    nx: int,
    ny: int,
    nz: int,
    direction: int,  # 1=x, 2=y, 3=z
) -> DampingGradientOp:
    """Assemble one direction of the smoothing block (reference:
    damping_gradient_add, damping_gradient.F90:94-205). Boundary rows
    (last cell along the direction) are empty with zero RHS."""
    m = model_comp.reshape(nz, ny, nx)
    cw = column_weight.reshape(nz, ny, nx)
    lw = local_weight.reshape(nz, ny, nx)

    axis = _DIR_AXIS[direction]
    if direction == 1:
        delta = dX.reshape(1, 1, nx)
        offset = (1, 0, 0)
    elif direction == 2:
        delta = dY.reshape(1, ny, 1)
        offset = (0, 1, 0)
    else:
        delta = dZ.reshape(nz, 1, 1)
        offset = (0, 0, 1)

    n = m.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    interior = pos < (n - 1)

    grad = (shift(m, offset) - m) / delta  # forward difference (zero-padded)
    base = problem_weight * beta

    coefA = jnp.where(interior, base / delta * shift(cw, offset) * lw, 0.0)
    coefB = jnp.where(interior, -base / delta * cw * lw, 0.0)
    rhs = jnp.where(interior, -base * grad * lw, 0.0).reshape(-1)
    cost = jnp.sum(jnp.where(interior, grad, 0.0) ** 2)
    return DampingGradientOp(coefA=coefA, coefB=coefB, rhs=rhs, cost=cost, offset=offset)


# =============================================================================
# Cross-gradient coupling — reference: cross_gradient.F90:220-391
# =============================================================================

# Stencil offsets used by the forward/backward/central schemes.
_XG_OFFSETS = (
    (0, 0, 0),
    (1, 0, 0),
    (-1, 0, 0),
    (0, 1, 0),
    (0, -1, 0),
    (0, 0, 1),
    (0, 0, -1),
)


class CrossGradientOp(NamedTuple):
    """3 row sets (tau_x, tau_y, tau_z), each with stencil coefficients on
    both models.  C1/C2: (3, n_offsets, nz, ny, nx); rhs: (3, N)."""

    C1: jax.Array
    C2: jax.Array
    rhs: jax.Array  # (3, N) = -tau * glob_weight
    cost: jax.Array  # (3,) per component sum tau^2
    magnitude: jax.Array  # (N,) |tau| per cell (for VTK output)

    def matvec(self, x1_cube, x2_cube):
        outs = []
        for c in range(3):
            acc = 0.0
            for oi, off in enumerate(_XG_OFFSETS):
                acc = acc + self.C1[c, oi] * shift(x1_cube, off)
                acc = acc + self.C2[c, oi] * shift(x2_cube, off)
            outs.append(acc.reshape(-1))
        return jnp.concatenate(outs)

    def rmatvec(self, u):
        shp = self.C1.shape[-3:]
        N = shp[0] * shp[1] * shp[2]
        g1 = jnp.zeros(shp, u.dtype)
        g2 = jnp.zeros(shp, u.dtype)
        for c in range(3):
            ucube = u[c * N : (c + 1) * N].reshape(shp)
            for oi, off in enumerate(_XG_OFFSETS):
                neg = tuple(-o for o in off)
                g1 = g1 + shift(self.C1[c, oi] * ucube, neg)
                g2 = g2 + shift(self.C2[c, oi] * ucube, neg)
        return g1, g2

    @property
    def nrows(self):
        return self.rhs.size


def _scheme_gradient(m, delta, scheme: str):
    """Per-axis finite differences of cube m with zero-padded lookups
    (reference: get_grad, gradient.F90:71-175). delta = (dXc, dYc, dZc) cubes."""
    dXc, dYc, dZc = delta
    offs = {"x": (1, 0, 0), "y": (0, 1, 0), "z": (0, 0, 1)}
    out = {}
    for ax, off in offs.items():
        d = {"x": dXc, "y": dYc, "z": dZc}[ax]
        fwd = (shift(m, off) - m) / d
        bwd = (m - shift(m, tuple(-o for o in off))) / d
        cnt = (shift(m, off) - shift(m, tuple(-o for o in off))) / (2.0 * d)
        out[ax] = {"fwd": fwd, "bwd": bwd, "cnt": cnt}[scheme]
    return out["x"], out["y"], out["z"]


def make_cross_gradient(
    model1: jax.Array,  # (N,) actual values (component 1)
    model2: jax.Array,
    column_weight1: jax.Array,
    column_weight2: jax.Array,
    glob_weight: float,
    der_type: int,  # 1 = forward, 2 = central (with boundary switching)
    keep_model_constant: Tuple[int, int],
    vec_field: Optional[jax.Array],  # (N, 3) or None
    vec_field_type: int,
    dX: jax.Array,
    dY: jax.Array,
    dZ: jax.Array,
    nx: int,
    ny: int,
    nz: int,
    add_weights: bool = True,
) -> CrossGradientOp:
    """Assemble the cross-gradient constraint tau = grad m1 x grad m2
    (reference: cross_gradient_calculate, cross_gradient.F90:220-391) with
    per-cell scheme selection: forward in the interior (der_type=1) or
    central (der_type=2), backward on the right boundary, forward on the left
    boundary (der_type=2), and disabled where a cell touches both boundaries
    (cross_gradient.F90:262-287)."""
    shp = (nz, ny, nx)
    m1 = model1.reshape(shp)
    m2 = model2.reshape(shp)
    cw1 = column_weight1.reshape(shp)
    cw2 = column_weight2.reshape(shp)
    dXc = dX.reshape(1, 1, nx)
    dYc = dY.reshape(1, ny, 1)
    dZc = dZ.reshape(nz, 1, 1)
    delta = (dXc, dYc, dZc)

    ii = jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    on_left = (ii == 0) | (jj == 0) | (kk == 0)
    on_right = (ii == nx - 1) | (jj == ny - 1) | (kk == nz - 1)
    mask_zero = on_left & on_right
    if der_type == 1:
        mask_bwd = on_right & ~mask_zero
        mask_fwd = ~on_right & ~mask_zero
        mask_cnt = jnp.zeros(shp, bool)
    elif der_type == 2:
        mask_bwd = on_right & ~mask_zero
        mask_fwd = on_left & ~on_right & ~mask_zero
        mask_cnt = ~on_left & ~on_right
    else:
        raise ValueError(f"Unsupported derivative type {der_type}!")

    def gradients(m, use_field: bool):
        if use_field:
            vf = vec_field.T.reshape(3, nz, ny, nx)
            return {"fwd": (vf[0], vf[1], vf[2]), "bwd": (vf[0], vf[1], vf[2]), "cnt": (vf[0], vf[1], vf[2])}
        return {s: _scheme_gradient(m, delta, s) for s in ("fwd", "bwd", "cnt")}

    g1 = gradients(m1, vec_field_type == 1 and vec_field is not None)
    g2 = gradients(m2, vec_field_type == 2 and vec_field is not None)

    n_off = len(_XG_OFFSETS)
    off_index = {o: i for i, o in enumerate(_XG_OFFSETS)}
    # Follow the model dtype: a default-dtype zeros here would silently
    # upcast f32 solves to f64.
    dt = m1.dtype
    C1 = jnp.zeros((3, n_off) + shp, dt)
    C2 = jnp.zeros((3, n_off) + shp, dt)
    tau = jnp.zeros((3,) + shp, dt)

    def accumulate(C1, C2, tau, scheme, mask):
        """Add one scheme's tau and Jacobian stencils where mask holds."""
        m1x, m1y, m1z = g1[scheme]
        m2x, m2y, m2z = g2[scheme]
        # tau = g1 x g2
        t = (
            m1y * m2z - m1z * m2y,
            m1z * m2x - m1x * m2z,
            m1x * m2y - m1y * m2x,
        )
        tau = tau + jnp.stack([jnp.where(mask, tc, 0.0) for tc in t])

        if scheme == "fwd":
            sx, sy, sz = dXc, dYc, dZc
            # (component, model, offset, value) entries; reference
            # cross_gradient.F90:486-575 with der_type = 1.
            entries = [
                (0, 1, (0, 1, 0), m2z / sy), (0, 2, (0, 1, 0), -m1z / sy),
                (0, 1, (0, 0, 1), -m2y / sz), (0, 2, (0, 0, 1), m1y / sz),
                (0, 1, (0, 0, 0), -(m2z / sy - m2y / sz)), (0, 2, (0, 0, 0), -(m1y / sz - m1z / sy)),
                (1, 1, (1, 0, 0), -m2z / sx), (1, 2, (1, 0, 0), m1z / sx),
                (1, 1, (0, 0, 1), m2x / sz), (1, 2, (0, 0, 1), -m1x / sz),
                (1, 1, (0, 0, 0), -(m2x / sz - m2z / sx)), (1, 2, (0, 0, 0), -(m1z / sx - m1x / sz)),
                (2, 1, (1, 0, 0), m2y / sx), (2, 2, (1, 0, 0), -m1y / sx),
                (2, 1, (0, 1, 0), -m2x / sy), (2, 2, (0, 1, 0), m1x / sy),
                (2, 1, (0, 0, 0), -(m2y / sx - m2x / sy)), (2, 2, (0, 0, 0), -(m1x / sy - m1y / sx)),
            ]
        elif scheme == "bwd":
            sx, sy, sz = dXc, dYc, dZc
            # reference: cross_gradient_calculate_tau_backward,
            # cross_gradient.F90:675-743.
            entries = [
                (0, 1, (0, -1, 0), -m2z / sy), (0, 2, (0, -1, 0), m1z / sy),
                (0, 1, (0, 0, -1), m2y / sz), (0, 2, (0, 0, -1), -m1y / sz),
                (0, 1, (0, 0, 0), m2z / sy - m2y / sz), (0, 2, (0, 0, 0), m1y / sz - m1z / sy),
                (1, 1, (-1, 0, 0), m2z / sx), (1, 2, (-1, 0, 0), -m1z / sx),
                (1, 1, (0, 0, -1), -m2x / sz), (1, 2, (0, 0, -1), m1x / sz),
                (1, 1, (0, 0, 0), m2x / sz - m2z / sx), (1, 2, (0, 0, 0), m1z / sx - m1x / sz),
                (2, 1, (-1, 0, 0), -m2y / sx), (2, 2, (-1, 0, 0), m1y / sx),
                (2, 1, (0, -1, 0), m2x / sy), (2, 2, (0, -1, 0), -m1x / sy),
                (2, 1, (0, 0, 0), m2y / sx - m2x / sy), (2, 2, (0, 0, 0), m1x / sy - m1y / sx),
            ]
        else:  # central: step doubled, no diagonal entry
            sx, sy, sz = 2.0 * dXc, 2.0 * dYc, 2.0 * dZc
            entries = [
                (0, 1, (0, 1, 0), m2z / sy), (0, 2, (0, 1, 0), -m1z / sy),
                (0, 1, (0, 0, 1), -m2y / sz), (0, 2, (0, 0, 1), m1y / sz),
                (0, 1, (0, -1, 0), -m2z / sy), (0, 2, (0, -1, 0), m1z / sy),
                (0, 1, (0, 0, -1), m2y / sz), (0, 2, (0, 0, -1), -m1y / sz),
                (1, 1, (1, 0, 0), -m2z / sx), (1, 2, (1, 0, 0), m1z / sx),
                (1, 1, (0, 0, 1), m2x / sz), (1, 2, (0, 0, 1), -m1x / sz),
                (1, 1, (-1, 0, 0), m2z / sx), (1, 2, (-1, 0, 0), -m1z / sx),
                (1, 1, (0, 0, -1), -m2x / sz), (1, 2, (0, 0, -1), m1x / sz),
                (2, 1, (1, 0, 0), m2y / sx), (2, 2, (1, 0, 0), -m1y / sx),
                (2, 1, (0, 1, 0), -m2x / sy), (2, 2, (0, 1, 0), m1x / sy),
                (2, 1, (-1, 0, 0), -m2y / sx), (2, 2, (-1, 0, 0), m1y / sx),
                (2, 1, (0, -1, 0), m2x / sy), (2, 2, (0, -1, 0), -m1x / sy),
            ]

        for (c, mdl, off, val) in entries:
            oi = off_index[off]
            v = jnp.where(mask, val, 0.0)
            if mdl == 1:
                C1 = C1.at[c, oi].add(v)
            else:
                C2 = C2.at[c, oi].add(v)
        return C1, C2, tau

    C1, C2, tau = accumulate(C1, C2, tau, "fwd", mask_fwd)
    C1, C2, tau = accumulate(C1, C2, tau, "bwd", mask_bwd)
    if der_type == 2:
        C1, C2, tau = accumulate(C1, C2, tau, "cnt", mask_cnt)

    # keep_model_constant zeroes that model's derivatives
    # (cross_gradient.F90:294-295).
    if keep_model_constant[0]:
        C1 = jnp.zeros_like(C1)
    if keep_model_constant[1]:
        C2 = jnp.zeros_like(C2)

    # Matrix entries carry column weights and the global weight
    # (cross_gradient.F90:320-321); the weight sits at the *column* cell.
    if add_weights:
        for oi, off in enumerate(_XG_OFFSETS):
            C1 = C1.at[:, oi].mul(glob_weight * shift(cw1, off)[None])
            C2 = C2.at[:, oi].mul(glob_weight * shift(cw2, off)[None])

    rhs = (-glob_weight * tau).reshape(3, -1)
    cost = jnp.sum(tau.reshape(3, -1) ** 2, axis=1)
    magnitude = jnp.sqrt(jnp.sum(tau**2, axis=0)).reshape(-1)
    return CrossGradientOp(C1=C1, C2=C2, rhs=rhs, cost=cost, magnitude=magnitude)


# =============================================================================
# Clustering (petrophysical Gaussian-mixture prior) —
# reference: clustering.F90:393-649
# =============================================================================


class ClusteringOp(NamedTuple):
    """One row set per problem; diagonal on that problem's first component."""

    dcoef: jax.Array  # (N,) on this problem's model
    rhs: jax.Array  # (N,)
    cost: jax.Array
    probabilities: jax.Array  # (N,) P(m) per cell for output
    problem: int

    @property
    def nrows(self):
        return self.rhs.size


def gaussian_mixture(
    val1, val2, mu, sigma, cell_weight, weight_loc
):
    """Gaussian mixture value and derivatives per cell.

    val1/val2: (N,); mu: (2, C); sigma: (3, C) rows (s11, s22, s12);
    cell_weight: (N, C); weight_loc: (w1, w2) flags choosing 1-D vs 2-D
    Gaussians (reference: clustering.F90:514-649). Returns (gauss (N,),
    deriv (2, N))."""
    x = val1[:, None]
    y = val2[:, None]
    mu1, mu2 = mu[0][None, :], mu[1][None, :]
    s11, s22, s12 = sigma[0][None, :], sigma[1][None, :], sigma[2][None, :]

    both = (weight_loc[0] != 0.0) and (weight_loc[1] != 0.0)
    if both:
        det = s12**4 - s11**2 * s22**2
        arg = (
            -((-mu2 + y) * (mu2 * s11**2 - mu1 * s12**2 + s12**2 * x - s11**2 * y)) / det
            - ((-mu1 + x) * (mu2 * s12**2 - mu1 * s22**2 + s22**2 * x - s12**2 * y)) / (-det)
        ) / 2.0
        norm = 2.0 * jnp.pi * jnp.sqrt(-det)
    elif weight_loc[1] == 0.0:
        arg = -((x - mu1) ** 2) / s11**2 / 2.0
        norm = jnp.sqrt(2.0 * jnp.pi * s11**2)
    else:
        arg = -((y - mu2) ** 2) / s22**2 / 2.0
        norm = jnp.sqrt(2.0 * jnp.pi * s22**2)

    # exp floor at exp(-100) (clustering.F90:584-588).
    g = jnp.where(arg < -100.0, jnp.exp(-100.0), jnp.exp(jnp.maximum(arg, -100.0)) / norm)

    gauss_loc = cell_weight * g  # (N, C)
    gauss = jnp.sum(gauss_loc, axis=1)

    det = s12**4 - s11**2 * s22**2
    coef1 = (s22**2 * (-mu1 + x) + s12**2 * (mu2 - y)) / det
    coef2 = (s12**2 * (mu1 - x) + s11**2 * (-mu2 + y)) / det
    d1 = jnp.sum(coef1 * gauss_loc, axis=1)
    d2 = jnp.sum(coef2 * gauss_loc, axis=1)
    return gauss, jnp.stack([d1, d2])


def make_clustering(
    model1: jax.Array,
    model2: jax.Array,
    column_weight1: jax.Array,
    column_weight2: jax.Array,
    weight_glob: Tuple[float, float],
    mu: jax.Array,
    sigma: jax.Array,
    cell_weight: jax.Array,  # (N, C)
    mixture_max: jax.Array,  # (N,)
    opt_type: int,
    problem: int,  # 0 or 1: which row set
) -> ClusteringOp:
    """Assemble one problem's clustering rows (reference: clustering_add,
    clustering.F90:393-508)."""
    weight_loc = tuple(1.0 if w != 0.0 else 0.0 for w in weight_glob)
    gauss, deriv = gaussian_mixture(model1, model2, mu, sigma, cell_weight, weight_loc)

    if opt_type == 2:
        deriv = jnp.where(gauss != 0.0, -deriv / jnp.where(gauss != 0.0, gauss, 1.0), 0.0)
        func_val = jnp.where(
            gauss > 0.0, -jnp.log(jnp.where(gauss > 0.0, gauss, 1.0)) + jnp.log(mixture_max), 0.0
        )
    elif opt_type == 1:
        func_val = gauss - mixture_max
    else:
        raise ValueError(f"Wrong optimization type {opt_type} in clustering!")

    Cp = [1.0 if weight_loc[i] != 0.0 else 0.0 for i in range(2)]
    cw = column_weight1 if problem == 0 else column_weight2
    dcoef = weight_glob[problem] * cw * deriv[problem] * Cp[problem]
    rhs = -weight_glob[problem] * func_val * Cp[problem]
    cost = jnp.sum(rhs**2)
    return ClusteringOp(
        dcoef=dcoef, rhs=rhs, cost=cost, probabilities=gauss, problem=problem
    )
