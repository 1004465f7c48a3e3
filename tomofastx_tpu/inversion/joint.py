"""Joint inversion system: operator stack + per-major-iteration solve.

TPU-native counterpart of t_joint_inversion (joint_inverse_problem.F90).
Instead of assembling CSR constraint rows each major iteration, the whole
per-iteration solve — ADMM dual updates, constraint linearization, LSQR with
dense MXU matvecs, wavelet conversions, and the final un-weighting of the
model update — is ONE jitted function, traced once per configuration and
reused across major iterations and prior models.

Row-block order of the stacked system (norms are order-independent; this
fixes the layout): [data blocks per active problem] then per active problem
[damping (ncomp*N rows), damping-gradient (3*ncomp*N rows)], then ADMM
blocks (N rows each), then cross-gradient (3N), then clustering (N per
problem).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tomofastx_tpu.inversion import operators as ops
from tomofastx_tpu.ops import wavelet as W
from tomofastx_tpu.ops.lsqr import lsqr_solve


@dataclass(frozen=True)
class SystemSpec:
    """Static description of the joint system (hashable; closed over by jit)."""

    active: Tuple[int, ...]  # active problem indices (subset of (0, 1))
    ncomp: int
    nx: int
    ny: int
    nz: int
    ndata_rows: Tuple[int, ...]  # ndata * ndata_components per active problem
    compression_type: int
    wavelet_domain: bool
    problem_weight: Tuple[float, float]
    alpha: Tuple[float, float]
    norm_power: float
    add_damping: Tuple[bool, bool]
    beta: Tuple[float, float]
    add_damping_gradient: Tuple[bool, bool]
    admm_enabled: Tuple[bool, bool]
    nlithos: int
    cross_grad: bool
    cross_grad_weight: float
    der_type: int
    keep_model_constant: Tuple[int, int]
    vec_field_type: int
    clustering: bool
    clustering_weight_glob: Tuple[float, float]
    clustering_opt_type: int
    apply_local_damping_weight: bool
    niter: int
    rmin: float
    gamma: float
    target_misfit: float
    # Dynamic ADMM weight adjustment (problem_joint_gravmag.F90:618-638);
    # only used by the fused on-device major loop.
    admm_cost_threshold: float = 1.0e-4
    admm_weight_multiplier: float = 1.0
    admm_max_weight: float = 1.0e10
    # Iterative refinement (tpu.refineForward): forward predictions /
    # residuals go through the exact-physics matrix-free operator in
    # arrays["S_fwd"] (model domain, weights baked) while LSQR keeps the
    # stored kernel — the major loop then corrects the stored kernel's
    # compression/bf16 error instead of converging to it.
    refine_forward: bool = False

    @property
    def N(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def seg_size(self) -> int:
        return self.ncomp * self.N

    @property
    def admm_comp(self) -> int:
        # Bounds act on Mz for magnetization-vector models
        # (joint_inverse_problem.F90:499-506).
        return 2 if self.ncomp == 3 else 0


def decide_wavelet_domain(ipar) -> bool:
    """Solve for the update in wavelet coordinates only when no constraint
    needs model-space rows (reference: joint_inverse_problem.F90:189-200).
    Takes an InversionParams."""
    if ipar.cross_grad_weight != 0.0:
        return False
    if ipar.clustering_weight_glob[0] != 0.0 or ipar.clustering_weight_glob[1] != 0.0:
        return False
    if any(b != 0.0 and pw != 0.0 for b, pw in zip(ipar.beta, ipar.problem_weight)):
        return False
    if ipar.norm_power != 2.0:
        return False
    if ipar.admm_bound_type != 1:
        return False
    if ipar.apply_local_damping_weight > 0:
        return False
    return True


def admm_iterate(z, u, x, min_bound, max_bound):
    """ADMM scaled-dual iteration (reference: admm_method.F90:70-134):
    z = Pc(x + u) projecting onto the nearest of the disjoint intervals,
    u += x - z; returns (z, u, x0 = z - u).

    min_bound/max_bound: (L, N); candidate scan order (min_j, max_j, j=1..L)
    with first-minimum tie-breaking matches the reference's strict-< scan."""
    arg = x + u
    inside = jnp.any((min_bound <= arg[None, :]) & (arg[None, :] <= max_bound), axis=0)
    # Interleave candidates in reference scan order: min1, max1, min2, max2...
    cand = jnp.stack([min_bound, max_bound], axis=1).reshape(-1, arg.shape[0])
    dist = jnp.abs(cand - arg[None, :])
    closest = cand[jnp.argmin(dist, axis=0), jnp.arange(arg.shape[0])]
    z_new = jnp.where(inside, arg, closest)
    u_new = u + x - z_new
    return z_new, u_new, z_new - u_new


def _to_solver(spec: SystemSpec, seg):
    """Scaled-model flat segment (ncomp*N,) -> matrix column (wavelet) domain."""
    if spec.compression_type == 0:
        return seg
    return W.forward_wavelet_flat(
        seg.reshape(spec.ncomp, spec.N), spec.nx, spec.ny, spec.nz, spec.compression_type
    ).reshape(-1)


def _from_solver(spec: SystemSpec, seg):
    if spec.compression_type == 0:
        return seg
    return W.inverse_wavelet_flat(
        seg.reshape(spec.ncomp, spec.N), spec.nx, spec.ny, spec.nz, spec.compression_type
    ).reshape(-1)


def _build_solve_fn(spec: SystemSpec):
    """Build the (untraced) per-major-iteration solve function."""

    nseg = len(spec.active)
    seg = spec.seg_size
    offsets = [a * seg for a in range(nseg)]
    ncols = nseg * seg
    cube_shape = (spec.nz, spec.ny, spec.nx)
    wconv = spec.compression_type > 0 and not spec.wavelet_domain

    def solve_once(arr: Dict):
        S = arr["S"]  # tuple per active problem (rows_i, seg)
        cw = arr["cw"]  # tuple (N,)
        dXdYdZ = (arr["dX"], arr["dY"], arr["dZ"])

        costs = {}
        extras = {}

        # ---------------- ADMM dual update + x0 ----------------
        new_z, new_u = [], []
        admm_x0 = []
        for a, i in enumerate(spec.active):
            if spec.admm_enabled[i]:
                x_comp = arr["model"][a][spec.admm_comp]
                z, u, x0 = admm_iterate(
                    arr["admm_z"][a], arr["admm_u"][a], x_comp,
                    arr["min_bound"][a], arr["max_bound"][a],
                )
                new_z.append(z)
                new_u.append(u)
                admm_x0.append(x0)
                # ADMM cost |x - z| / |z| (joint_inverse_problem.F90:522-525,
                # costs.f90: cost(arr1=z, arr2=x)).
                denom = jnp.sum(z**2)
                costs[f"admm_cost_{i}"] = jnp.where(
                    denom != 0.0, jnp.sqrt(jnp.sum((z - x_comp) ** 2) / jnp.where(denom != 0.0, denom, 1.0)), 0.0
                )
            else:
                new_z.append(arr["admm_z"][a])
                new_u.append(arr["admm_u"][a])
                admm_x0.append(None)
                costs[f"admm_cost_{i}"] = jnp.asarray(0.0)

        # ---------------- constraint blocks ----------------
        damping_ops = {}
        dampgrad_ops = {}
        admm_ops = {}
        xgrad_op = None
        clustering_ops = {}

        for a, i in enumerate(spec.active):
            if spec.add_damping[i]:
                lw = arr["damping_weight"][a] if spec.apply_local_damping_weight else None
                damping_ops[a] = ops.make_damping(
                    spec.alpha[i], spec.problem_weight[i], spec.norm_power,
                    arr["model"][a], arr["prior"][a], cw[a], lw,
                    spec.wavelet_domain, spec.compression_type,
                    spec.nx, spec.ny, spec.nz,
                )
                costs[f"damping_cost_{i}"] = damping_ops[a].cost

            if spec.add_damping_gradient[i]:
                per_dir = []
                for k in range(spec.ncomp):
                    for direction in (1, 2, 3):
                        op = ops.make_damping_gradient(
                            spec.beta[i], spec.problem_weight[i],
                            arr["model"][a][k], cw[a],
                            arr["damping_grad_weight"][a][direction - 1],
                            *dXdYdZ, spec.nx, spec.ny, spec.nz, direction,
                        )
                        per_dir.append((k, direction, op))
                dampgrad_ops[a] = per_dir
                # Sum cost over components per direction
                # (joint_inverse_problem.F90:483-486).
                for direction in (1, 2, 3):
                    costs[f"damping_gradient_cost_{'xyz'[direction-1]}_{i}"] = sum(
                        op.cost for (k, d, op) in per_dir if d == direction
                    )

            if spec.admm_enabled[i]:
                # ADMM quadratic term via the damping machinery with
                # alpha = rho_ADMM, norm 2, local weight = bound_weight
                # (joint_inverse_problem.F90:509-520). rho is traced (it is
                # adjusted dynamically between major iterations).
                rho = arr["rho_admm"][i]
                cwk = cw[a]
                diff = jnp.where(cwk != 0.0, (arr["model"][a][spec.admm_comp] - admm_x0[a]) / jnp.where(cwk != 0.0, cwk, 1.0), 0.0)
                if spec.compression_type > 0 and spec.wavelet_domain:
                    diff = W.forward_wavelet_flat(diff, spec.nx, spec.ny, spec.nz, spec.compression_type)
                base = rho * spec.problem_weight[i]
                bw = arr["bound_weight"][a]
                admm_ops[a] = ops.DampingOp(
                    dcoef=(base * bw)[None, :],
                    rhs=(-base * diff * bw)[None, :],
                    cost=jnp.asarray(0.0),
                )

        if spec.cross_grad:
            a1, a2 = 0, 1  # requires both problems active
            xgrad_op = ops.make_cross_gradient(
                arr["model"][a1][0], arr["model"][a2][0], cw[a1], cw[a2],
                spec.cross_grad_weight, spec.der_type, spec.keep_model_constant,
                arr.get("vec_field"), spec.vec_field_type,
                *dXdYdZ, spec.nx, spec.ny, spec.nz,
            )
            costs["cross_grad_cost"] = xgrad_op.cost
            extras["cross_grad_magnitude"] = xgrad_op.magnitude

        if spec.clustering:
            for t in range(2):
                op = ops.make_clustering(
                    arr["model"][0][0], arr["model"][1][0],
                    cw[0], cw[1],
                    spec.clustering_weight_glob,
                    arr["mixture_mu"], arr["mixture_sigma"],
                    arr["cell_weight"], arr["mixture_max"],
                    spec.clustering_opt_type, t,
                )
                clustering_ops[t] = op
                costs[f"clustering_cost_{t}"] = op.cost
            extras["clustering_probabilities"] = clustering_ops[0].probabilities

        # ---------------- right-hand side ----------------
        b_parts = []
        for a, i in enumerate(spec.active):
            b_parts.append(spec.problem_weight[i] * arr["residuals"][a].reshape(-1))
        for a, i in enumerate(spec.active):
            if a in damping_ops:
                b_parts.append(damping_ops[a].rhs.reshape(-1))
            if a in dampgrad_ops:
                for (_, _, op) in dampgrad_ops[a]:
                    b_parts.append(op.rhs)
        for a, i in enumerate(spec.active):
            if a in admm_ops:
                b_parts.append(admm_ops[a].rhs.reshape(-1))
        if xgrad_op is not None:
            b_parts.append(xgrad_op.rhs.reshape(-1))
        for t, op in clustering_ops.items():
            b_parts.append(op.rhs)
        b = jnp.concatenate(b_parts)

        ndata_total = sum(spec.ndata_rows)

        # ---------------- operator closures ----------------
        def split_x(x):
            return [x[off : off + seg].reshape(spec.ncomp, spec.N) for off in offsets]

        def matvec(x):
            segs = split_x(x)
            parts = []
            for a, i in enumerate(spec.active):
                with jax.named_scope(f"sensit_matvec_{i}"):
                    xw = _to_solver(spec, segs[a].reshape(-1)) if wconv else segs[a].reshape(-1)
                    parts.append(S[a].matvec(xw))
            for a, i in enumerate(spec.active):
                if a in damping_ops:
                    with jax.named_scope(f"damping_matvec_{i}"):
                        parts.append(damping_ops[a].matvec(segs[a]))
                if a in dampgrad_ops:
                    with jax.named_scope(f"damping_gradient_matvec_{i}"):
                        for (k, d, op) in dampgrad_ops[a]:
                            parts.append(op.matvec(segs[a][k].reshape(cube_shape)))
            for a, i in enumerate(spec.active):
                if a in admm_ops:
                    with jax.named_scope(f"admm_matvec_{i}"):
                        parts.append(admm_ops[a].matvec(segs[a][spec.admm_comp : spec.admm_comp + 1]))
            if xgrad_op is not None:
                with jax.named_scope("cross_gradient_matvec"):
                    parts.append(
                        xgrad_op.matvec(
                            segs[0][0].reshape(cube_shape), segs[1][0].reshape(cube_shape)
                        )
                    )
            for t, op in clustering_ops.items():
                with jax.named_scope(f"clustering_matvec_{t}"):
                    parts.append(op.dcoef * segs[t][0])
            return jnp.concatenate(parts)

        def rmatvec(u):
            out = [jnp.zeros((spec.ncomp, spec.N), u.dtype) for _ in spec.active]
            pos = 0
            for a, i in enumerate(spec.active):
                rows = spec.ndata_rows[a]
                with jax.named_scope(f"sensit_rmatvec_{i}"):
                    g = S[a].rmatvec(u[pos : pos + rows])
                if wconv:
                    g = _from_solver(spec, g)
                out[a] = out[a] + g.reshape(spec.ncomp, spec.N)
                pos += rows
            for a, i in enumerate(spec.active):
                if a in damping_ops:
                    rows = spec.ncomp * spec.N
                    with jax.named_scope(f"damping_rmatvec_{i}"):
                        out[a] = out[a] + damping_ops[a].rmatvec(u[pos : pos + rows])
                    pos += rows
                if a in dampgrad_ops:
                    with jax.named_scope(f"damping_gradient_rmatvec_{i}"):
                        for (k, d, op) in dampgrad_ops[a]:
                            rows = spec.N
                            out[a] = out[a].at[k].add(op.rmatvec(u[pos : pos + rows]).reshape(-1))
                            pos += rows
            for a, i in enumerate(spec.active):
                if a in admm_ops:
                    rows = spec.N
                    with jax.named_scope(f"admm_rmatvec_{i}"):
                        contrib = admm_ops[a].rmatvec(u[pos : pos + rows])
                        out[a] = out[a].at[spec.admm_comp].add(contrib.reshape(-1))
                    pos += rows
            if xgrad_op is not None:
                rows = 3 * spec.N
                with jax.named_scope("cross_gradient_rmatvec"):
                    g1, g2 = xgrad_op.rmatvec(u[pos : pos + rows])
                    out[0] = out[0].at[0].add(g1.reshape(-1))
                    out[1] = out[1].at[0].add(g2.reshape(-1))
                pos += rows
            for t, op in clustering_ops.items():
                rows = spec.N
                with jax.named_scope(f"clustering_rmatvec_{t}"):
                    out[t] = out[t].at[0].add(op.dcoef * u[pos : pos + rows])
                pos += rows
            return jnp.concatenate([o.reshape(-1) for o in out])

        # Data misfit early-exit check (lsqr_solver2.F90:168-189).
        b0_data = b[:ndata_total]

        def misfit_fn(x):
            segs = split_x(x)
            parts = []
            for a, i in enumerate(spec.active):
                xw = _to_solver(spec, segs[a].reshape(-1)) if wconv else segs[a].reshape(-1)
                parts.append(S[a].matvec(xw))
            Sx = jnp.concatenate(parts)
            return jnp.sqrt(jnp.sum((Sx - b0_data) ** 2) / ndata_total)

        # ---------------- LSQR ----------------
        # "niter_cap" is an optional TRACED iteration bound: the fused
        # major loop passes 0 for masked (inactive) scan steps so one
        # compiled program serves every chunk length — a capped step costs
        # ~2 operator applications instead of ~2*niter.
        res = lsqr_solve(
            matvec, rmatvec, b, ncols,
            niter=arr.get("niter_cap", spec.niter),
            rmin=spec.rmin, gamma=spec.gamma,
            target_misfit=spec.target_misfit,
            misfit_fn=misfit_fn if spec.target_misfit > 0.0 else None,
        )

        # ---------------- convert update to model space ----------------
        deltas = []
        for a, i in enumerate(spec.active):
            d = res.x[offsets[a] : offsets[a] + seg]
            if spec.compression_type > 0 and spec.wavelet_domain:
                d = _from_solver(spec, d)
            d = d.reshape(spec.ncomp, spec.N) * cw[a][None, :]  # rescale_model
            deltas.append(d)

        return {
            "delta": tuple(deltas),
            "costs": costs,
            "admm_z": tuple(new_z),
            "admm_u": tuple(new_u),
            "lsqr_iters": res.iters,
            "lsqr_r": res.r,
            "extras": extras,
        }

    return solve_once


def make_solver(spec: SystemSpec):
    """Jitted per-major-iteration solve: solve(arrays) -> dict with delta
    models, costs, new ADMM state, LSQR stats and output fields."""
    return jax.jit(_build_solve_fn(spec))



def make_fused_solver(spec: SystemSpec, n_steps: int):
    """Build a jitted driver that runs n_steps FULL major iterations
    on-device in one XLA program (lax.scan): residual computation, the
    LSQR solve, model update, forward data prediction, per-iteration costs,
    and the dynamic ADMM weight adjustment
    (problem_joint_gravmag.F90:473-547 entirely inside the device).

    The host only sees the stacked per-iteration cost rows and the final
    state — no tunnel round-trips between major iterations. Stop-file
    checks and intermediate model writes happen at chunk boundaries.

    arrays must additionally contain per active problem:
    - "val_meas": (nd, ndc) observed data
    - "data_weight": (nd, ndc) 1/sigma weights
    - optionally "active_steps": traced int32 scalar k <= n_steps; steps
      with index >= k are masked no-ops (carry passes through, LSQR capped
      to 0 iterations) so ONE compiled program serves every chunk length —
      remainder chunks stopped recompiling the whole fused loop (the
      round-2 cold-start multiplier: a 60-major run with
      writeModelEveryNiter-truncated chunks compiled several distinct
      programs).
    """
    solve_once = _build_solve_fn(spec)

    def forward(arr, model):
        """d_calc per problem (model.F90:220-307 semantics). With
        spec.refine_forward the matvec goes through the exact-physics
        matrix-free operator (model domain — no wavelet conversion)."""
        ds = []
        for a, i in enumerate(spec.active):
            cw = arr["cw"][a][None, :]
            x = jnp.where(cw != 0.0, model[a] / jnp.where(cw != 0.0, cw, 1.0), 0.0)
            xw = x.reshape(-1)
            if spec.refine_forward:
                d = arr["S_fwd"][a].matvec(xw)
            else:
                if spec.compression_type > 0:
                    xw = _to_solver(spec, xw)
                d = arr["S"][a].matvec(xw)
            d = d.reshape(arr["val_meas"][a].shape)
            d = d / spec.problem_weight[i] / arr["data_weight"][a]
            ds.append(d)
        return tuple(ds)

    def data_cost(arr, d_calc):
        """Relative data cost per problem (data_gravmag.f90:123-129)."""
        out = []
        for a, i in enumerate(spec.active):
            meas = arr["val_meas"][a]
            denom = jnp.sqrt(jnp.sum(meas**2))
            c = jnp.where(
                denom != 0.0,
                jnp.sqrt(jnp.sum((d_calc[a] - meas) ** 2)) / jnp.where(denom != 0.0, denom, 1.0),
                0.0,
            )
            out.append(c)
        return tuple(out)

    def model_cost(arr, model):
        """Lp model-prior cost per problem (costs.f90:74-113)."""
        out = []
        for a, i in enumerate(spec.active):
            cw = arr["cw"][a]
            diff = jnp.where(cw != 0.0, (model[a][0] - arr["prior"][a][0]) / jnp.where(cw != 0.0, cw, 1.0), 0.0)
            out.append(jnp.sum(jnp.abs(diff) ** spec.norm_power))
        return tuple(out)

    def fused(arr):
        dt = arr["cw"][0].dtype
        extras_init = {}
        if spec.cross_grad:
            extras_init["cross_grad_magnitude"] = jnp.zeros((spec.N,), dt)
        if spec.clustering:
            extras_init["clustering_probabilities"] = jnp.zeros((spec.N,), dt)

        init = (
            arr["model"],
            arr["admm_z"],
            arr["admm_u"],
            arr["rho_admm"],
            extras_init,
            # d_calc of the incoming model rides the carry: step k's
            # post-update forward IS step k+1's pre-update forward, so the
            # operator is applied once per major iteration, not twice
            # (matters most under refine_forward, where each forward is a
            # full exact-physics matrix-free matvec).
            forward(arr, arr["model"]),
        )

        n_active = arr.get("active_steps", jnp.asarray(n_steps, jnp.int32))

        def step(carry, s):
            model, z, u, rho, _extras, d_calc = carry
            active = s < n_active
            rho_used = rho  # the weight the reference logs for this row
            # Pre-update costs: these become the "previous iteration" entries
            # of the costs.txt row (problem_joint_gravmag.F90:519-528).
            pre_cost_data = data_cost(arr, d_calc)
            pre_cost_model = model_cost(arr, model)

            # Cast to the solve dtype at the LSQR boundary: with
            # refineForwardPrecision=double the exact-physics d_calc is
            # f64 and the residual carries f64 accuracy, but the inner
            # correction solve runs in the (f32) solve dtype — classic
            # mixed-precision iterative refinement (the cast loses only
            # digits beyond the correction solve's own precision).
            residuals = tuple(
                (arr["data_weight"][a] * (arr["val_meas"][a] - d_calc[a]))
                .reshape(-1).astype(model[a].dtype)
                for a, i in enumerate(spec.active)
            )
            arr2 = dict(arr)
            arr2.update(
                model=model, admm_z=z, admm_u=u, rho_admm=rho,
                residuals=residuals,
                # Masked steps run a 0-iteration LSQR (cheap pass-through).
                niter_cap=jnp.where(active, spec.niter, 0),
            )
            arr2.pop("active_steps", None)
            out = solve_once(arr2)

            model_new = tuple(m + d for m, d in zip(model, out["delta"]))

            # Post-update data cost drives the dynamic ADMM weight
            # adjustment (problem_joint_gravmag.F90:618-638).
            d_calc_new = forward(arr, model_new)
            post_cost_data = data_cost(arr, d_calc_new)
            if spec.admm_weight_multiplier != 1.0:
                rho_list = [rho[i] for i in range(2)]
                for a, i in enumerate(spec.active):
                    if spec.admm_enabled[i]:
                        grow = (post_cost_data[a] < spec.admm_cost_threshold) & (
                            rho[i] < spec.admm_max_weight
                        )
                        rho_list[i] = jnp.where(
                            grow, spec.admm_weight_multiplier * rho[i], rho[i]
                        )
                rho = jnp.stack([rho_list[0], rho_list[1]])

            ys = {
                "pre_cost_data": jnp.stack(pre_cost_data),
                "pre_cost_model": jnp.stack(pre_cost_model),
                "post_cost_data": jnp.stack(post_cost_data),
                "costs": out["costs"],
                "rho": rho_used,
                "lsqr_iters": out["lsqr_iters"],
            }
            new_carry = (
                model_new, out["admm_z"], out["admm_u"], rho,
                out["extras"] or _extras, d_calc_new,
            )
            # Masked steps must not advance ANY state (the 0-iteration LSQR
            # already leaves the model unchanged, but the ADMM dual update
            # and rho adjustment run unconditionally above).
            new_carry = jax.tree.map(
                lambda nw, old: jnp.where(active, nw, old), new_carry, carry
            )
            return new_carry, ys

        (model, z, u, rho, extras, final_d), ys = jax.lax.scan(
            step, init, jnp.arange(n_steps, dtype=jnp.int32)
        )
        return {
            "model": model,
            "admm_z": z,
            "admm_u": u,
            "rho_admm": rho,
            "extras": extras,
            "per_iteration": ys,
            "final_d_calc": final_d,
            "final_cost_data": jnp.stack(data_cost(arr, final_d)),
            "final_cost_model": jnp.stack(model_cost(arr, model)),
        }

    return jax.jit(fused)
