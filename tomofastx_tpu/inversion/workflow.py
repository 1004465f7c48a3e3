"""End-to-end joint gravity/magnetics inversion workflow.

TPU-native counterpart of solve_problem_joint_gravmag
(problem_joint_gravmag.F90:65-613): grid + data loading, depth weights,
sensitivity build, synthetic data, prior-model loop, the major inversion
loop with costs.txt logging, dynamic ADMM weight adjustment, stop-file early
exit, and all model/data outputs.

Host-side orchestration is plain Python (it does I/O); all numerics per
major iteration run in one jitted solve (inversion/joint.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from tomofastx_tpu.config.parfile import Config, GRAV, MAGN
from tomofastx_tpu.inversion.joint import SystemSpec, decide_wavelet_domain, make_solver
from tomofastx_tpu.io import data_io, model_io, vtk
from tomofastx_tpu.io.sensit_cache import try_read_kernel_cache, write_kernel_cache
from tomofastx_tpu.models.data import SurveyData
from tomofastx_tpu.models.model import ModelState
from tomofastx_tpu.ops import sensitivity as sens

PROBLEM_PREFIX = ("grav", "mag")  # output file name prefixes (reference usage)


@dataclass
class ProblemContext:
    """Everything belonging to one of the two joint problems."""

    index: int  # 0 = grav, 1 = magn
    par: object  # GravParams | MagParams
    model: ModelState = None
    data: SurveyData = None
    column_weight: np.ndarray = None
    kernel: object = None  # weighted SensitKernel (None in matrix-free mode)
    operator: object = None  # matrix-free operator when kernel is None
    forward_op: object = None  # exact-physics operator (tpu.refineForward)
    residuals: np.ndarray = None


@dataclass
class WorkflowResult:
    models: Dict[int, ModelState]
    data: Dict[int, SurveyData]
    cost_data: List[float]
    cost_model: List[float]
    costs_history: List[dict] = field(default_factory=list)


def _mkoutdir(cfg: Config, base_dir: str) -> str:
    # Outputs resolve against the CURRENT directory, like the reference
    # binary; base_dir only anchors the *input* paths. (Otherwise a
    # read-only data tree would receive the output folder.)
    out = cfg.path_output
    os.makedirs(out, exist_ok=True)
    return out


def _model_write(ctx: ProblemContext, cfg, out_dir, prefix, write_ascii=False):
    """Model snapshot outputs (reference: model_write, model_IO.F90:481-612):
    structured-grid VTK, x/y/z half-slice lego VTKs, optional ASCII."""
    g = ctx.model.grid
    pv = os.path.join(out_dir, "Paraview")
    common = dict(
        X1=g.X1, Y1=g.Y1, Z1=g.Z1, X2=g.X2, Y2=g.Y2, Z2=g.Z2,
        nx=g.nx, ny=g.ny, nz=g.nz,
        invert_z=True, units_mult=ctx.model.units_mult, label=ctx.model.vtk_label,
    )
    val = ctx.model.val.T  # (N, ncomp)
    vtk.write_struct_grid(os.path.join(pv, f"{prefix}model3D_full.vtk"), val, **common)
    vtk.write_lego_grid(
        os.path.join(pv, f"{prefix}model3D_half_x.vtk"), val,
        i1=g.nx // 2 + 1, i2=g.nx // 2 + 1, **common,
    )
    vtk.write_lego_grid(
        os.path.join(pv, f"{prefix}model3D_half_y.vtk"), val,
        j1=g.ny // 2 + 1, j2=g.ny // 2 + 1, **common,
    )
    vtk.write_lego_grid(
        os.path.join(pv, f"{prefix}model3D_half_z.vtk"), val,
        k1=g.nz // 2 + 1, k2=g.nz // 2 + 1, **common,
    )
    if write_ascii:
        model_io.write_model_ascii(
            ctx.model, os.path.join(out_dir, "model", f"{prefix}model_full.txt")
        )


def _data_write(ctx: ProblemContext, out_dir, name, which):
    """Data outputs in ASCII + VTK (reference: data_write,
    data_gravmag.f90:293-354)."""
    data_io.write_data_points(ctx.data, os.path.join(out_dir, "data", f"{name}.txt"), which)
    val = ctx.data.val_meas if which == 1 else ctx.data.val_calc
    vtk.write_points(
        os.path.join(out_dir, "Paraview", f"data_{name}.vtk"),
        val, ctx.data.X, ctx.data.Y, ctx.data.Z,
        invert_z=True, units_mult=ctx.data.units_mult,
    )


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("ct", "nx", "ny", "nz", "nmc"))
def _op_forward_jit(op, x, ct, nx, ny, nz, nmc):
    """Jitted operator forward (optionally via the wavelet domain): one
    program instead of per-op eager dispatches — the unjitted 3-D lifting
    alone cost ~100 tiny compiles on a cold start and as many tunnel
    round-trips per call on the remote TPU."""
    if ct:
        from tomofastx_tpu.ops import wavelet as W

        x = W.forward_wavelet_flat(x.reshape(nmc, -1), nx, ny, nz, ct).reshape(-1)
    return op.matvec(x)


def _calculate_data(ctx: ProblemContext, cfg: Config, solve_dtype):
    """d_calc = S m through the stored weighted kernel (model.F90:220-307),
    or through the matrix-free operator."""
    pw = cfg.inversion.problem_weight[ctx.index]

    def through_operator(op, wavelet_domain: bool):
        """d_calc through an operator with baked row weights: scale the
        model by 1/cw, optionally convert to the wavelet domain, matvec,
        un-weight (model.F90:220-307 semantics)."""
        cw = ctx.column_weight[None, :]
        m = np.asarray(ctx.model.val).reshape(ctx.model.ncomponents, -1)
        x = np.where(cw != 0.0, m / np.where(cw != 0.0, cw, 1.0), 0.0).reshape(-1)
        xj = jnp.asarray(x, solve_dtype)
        g = ctx.model.grid
        d = np.asarray(
            _op_forward_jit(
                op, xj,
                ctx.par.compression_type if wavelet_domain else 0,
                g.nx, g.ny, g.nz, ctx.model.ncomponents,
            )
        )
        d = d.reshape(ctx.data.ndata, ctx.data.ncomponents)
        ctx.data.val_calc = d / pw / np.asarray(ctx.data.weight)

    if ctx.forward_op is not None:
        # Iterative refinement (tpu.refineForward): the forward prediction
        # comes from the exact closed-form physics, so residuals carry the
        # stored kernel's compression/bf16 error and the major loop
        # corrects it (the stored kernel only preconditions the update).
        return through_operator(ctx.forward_op, wavelet_domain=False)
    if ctx.kernel is None:
        return through_operator(
            ctx.operator, wavelet_domain=ctx.par.compression_type > 0
        )
    ctx.data.val_calc = sens.calculate_data(
        ctx.kernel,
        ctx.model.val,
        ctx.column_weight,
        pw,
        ctx.data.weight,
        solve_dtype,
    )


def _calculate_model_cost(ctx: ProblemContext, norm_power: float) -> float:
    """Lp model-prior cost (reference: calculate_cost_model, costs.f90:74-113)."""
    cw = ctx.column_weight
    diff = np.where(cw != 0.0, (ctx.model.val[0] - ctx.model.val_prior[0]) / np.where(cw != 0.0, cw, 1.0), 0.0)
    return float(np.sum(np.abs(diff) ** norm_power))


COSTS_HEADER = (
    "# 1:iteration, 2:data_cost_grav, 3:data_cost_mag, 4:model_cost_grav, 5:model_cost_mag,"
    " 6:ADMM_cost_grav, 7:ADMM_cost_mag, 8:ADMM_weight_grav, 9:ADMM_weight_mag,"
    " 10:damp_gradient_cost_x_grav, 11:damp_gradient_cost_y_grav, 12:damp_gradient_cost_z_grav,"
    " 13:damp_gradient_cost_x_mag, 14:damp_gradient_cost_y_mag, 15:damp_gradient_cost_z_mag,"
    " 16:cross_grad_cost_x, 17:cross_grad_cost_y, 18:cross_grad_cost_z,"
    " 19:clustering_cost_grav, 20:clustering_cost_mag"
)


def solve_problem_joint_gravmag(
    cfg: Config,
    base_dir: str = ".",
    solve_dtype=None,
    compute_dtype=None,
    verbose: bool = True,
    mesh=None,
    near_field_f64: int = 0,
    fused_chunk: int = 0,
    resume: bool = False,
) -> WorkflowResult:
    """Run the full inversion described by a Parfile configuration.

    mesh: optional jax.sharding.Mesh with a 'cells' axis; when given, the
    solver arrays are placed with the cells-sharded layout
    (parallel/mesh.py) and the jitted solve runs SPMD across the mesh.

    near_field_f64 > 0 selects the fast mixed-precision kernel build:
    f32 rows with an f64 recompute of the K nearest cells per observation
    (see ops/sensitivity.py) — useful on TPUs where full-f64 builds are
    emulated and slow.

    fused_chunk > 0 runs the major loop in on-device chunks of that many
    iterations (one lax.scan program per chunk; no host round-trips between
    major iterations — see make_fused_solver). Stop-file checks and
    intermediate model writes happen at chunk boundaries.

    resume=True restarts from <output>/checkpoint.npz if present (written
    every writeModelEveryNiter iterations together with the model
    snapshots): restores models, ADMM dual state z/u, rho, and the
    iteration counter — state the reference cannot recover on restart."""
    import jax

    if solve_dtype is None:
        solve_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if compute_dtype is None:
        # Kernel build wants f64 whenever available (reference computes in
        # double and stores single, global_typedefs.F90:37-45); an f32 build
        # suffers cancellation in the prism integrals.
        compute_dtype = jnp.float64 if jax.config.jax_enable_x64 else solve_dtype

    def log(*a):
        if verbose:
            print(*a, flush=True)

    t_start = time.time()
    ipar = cfg.inversion
    out_dir = _mkoutdir(cfg, base_dir)

    # Memory checkpoint 1/4: startup (reference prints Pss at MPI init,
    # program_tomofastx.F90:60-61).
    from tomofastx_tpu.utils.memory import report as memory_report

    log(memory_report("(init) "))

    if ipar.method != 1:
        raise ValueError(f"Unknown solver type {ipar.method}! (only 1 = LSQR)")

    active = [i for i in (GRAV, MAGN) if cfg.solve_problem(i)]
    if not active:
        raise ValueError("No active problems (both problem weights are zero).")
    ctxs: Dict[int, ProblemContext] = {
        i: ProblemContext(index=i, par=cfg.problem_params(i)) for i in active
    }
    log(f"Solving problem grav/mag. active = {[PROBLEM_PREFIX[i] for i in active]}")

    # ---- (I) model grid ----
    for i, ctx in ctxs.items():
        par = ctx.par
        grid = model_io.read_model_grid(
            os.path.join(base_dir, par.model_grid_file), par.nx, par.ny, par.nz, par.z_axis_dir
        )
        ctx.model = ModelState(
            grid=grid,
            ncomponents=par.nmodel_components,
            units_mult=par.model_units_mult,
            vtk_label=par.vtk_model_label,
        )

    # ---- (II) data ----
    for i, ctx in ctxs.items():
        par = ctx.par
        ctx.data = data_io.read_data_points(
            os.path.join(base_dir, par.data_grid_file), par.ndata, par.ndata_components,
            par.data_units_mult, par.z_axis_dir, grid_only=True,
        )
        if par.use_data_error == 1:
            data_io.read_data_error(ctx.data, os.path.join(base_dir, par.data_error_file))

    # ---- (III) depth weights + sensitivity ----
    for i, ctx in ctxs.items():
        par = ctx.par
        sensit_dir = os.path.join(out_dir, "SENSIT")
        if par.sensit_read == 0:
            log(f"Calculating the depth weight for {PROBLEM_PREFIX[i]}, type = {par.depth_weighting_type}")
            cw = sens.calculate_depth_weight(par, ctx.model.grid, ctx.data, compute_dtype)
            cw = ipar.column_weight_multiplier[i] * cw
            cw = sens.apply_local_depth_weighting(par, cw)
            ctx.column_weight = cw
        else:
            # read = 1 AND read = 2 both take the depth weight from the
            # cache: the reference computes it only for read = 0
            # (problem_joint_gravmag.F90:171-193) and read_sensitivity_kernel
            # unconditionally re-reads it from file at the end
            # (sensitivity_gravmag.F90:873-879). The stored weight already
            # contains the column-weight multiplier and local weighting, so
            # neither is re-applied here. The kernel itself is re-read for
            # read = 1 and recomputed for read = 2 (F90:195-202) below.
            cache_dir = os.path.join(base_dir, par.sensit_path)
            ctx.column_weight = _read_depth_weight_file(cache_dir, i)

        fmt0 = getattr(par, "kernel_format", "dense")
        if fmt0 == "auto" and par.compression_type == 0:
            # Capacity-aware auto (uncompressed): a dense kernel that
            # cannot share the chip with the solver working set falls
            # back to the matrix-free operator chain (BTTB on gridded
            # surveys, corner-lattice/generic otherwise) instead of
            # RESOURCE_EXHAUSTing. The reference has no equivalent — its
            # only answer to kernel memory is more MPI ranks.
            dense_bytes = (
                par.ndata * par.ndata_components * par.nmodel_components
                * ctx.model.grid.nelements_total * 4
            )
            try:
                import jax as _jax

                hbm = _jax.devices()[0].memory_stats().get(
                    "bytes_limit", 16 << 30
                )
            except Exception:
                hbm = 16 << 30
            if dense_bytes > 0.55 * hbm:
                log(f"  {PROBLEM_PREFIX[i]} kernel format auto: dense would "
                    f"be {dense_bytes / 1e9:.1f} GB (> 55% of "
                    f"{hbm / 1e9:.0f} GB HBM) -> matrix-free")
                fmt0 = "matrixfree"

        if fmt0 == "matrixfree":
            # No stored kernel: the operator regenerates rows per matvec
            # (see ops/matrixfree.py).
            from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

            ctx.kernel = None
            ctx.operator = make_matrixfree_kernel(
                par, ctx.model.grid, ctx.data, ctx.column_weight,
                ipar.problem_weight[i], ctx.data.weight, solve_dtype,
                pad_cells_to=(mesh.devices.size if mesh is not None else 1),
                in_fused_program=bool(fused_chunk),
            )
            log(f"  {PROBLEM_PREFIX[i]} kernel: matrix-free "
                f"({type(ctx.operator).__name__}, no row storage)")
            continue

        fmt = fmt0
        if fmt == "auto":
            fmt = "packed" if par.compression_type > 0 else "dense"
        if fmt in ("packed", "tiled") and par.compression_type > 0:
            # Capacity modes: the dense (nd, N) array is NEVER materialized.
            # Build streams row chunks straight to the reference-format
            # cache (sensitivity_gravmag.F90:306-309) and the cache streams
            # back into the packed top-k layout or the tile-union block
            # layout (ibid. 723-862 semantics).
            from tomofastx_tpu.io.sensit_cache import (
                SensitStreamWriter,
                read_kernel_cache_packed,
            )
            from tomofastx_tpu.ops.sparse_kernel import apply_row_weights_packed
            from tomofastx_tpu.ops.tile_kernel import (
                apply_row_weights_tiled,
                tile_kernel_from_cache,
            )

            def _read_capacity(cache_dir):
                if fmt == "tiled":
                    return tile_kernel_from_cache(cache_dir, par, ctx.model.grid)
                return read_kernel_cache_packed(cache_dir, par, ctx.model.grid)

            pk = meta = None
            if par.sensit_read == 1:
                pk, meta = _read_capacity(os.path.join(base_dir, par.sensit_path))
                if pk is None:
                    log(f"WARNING: no readable sensitivity cache for {PROBLEM_PREFIX[i]}; recomputing.")
            if pk is None:
                log(f"Calculating {PROBLEM_PREFIX[i].upper()} sensitivity kernel (streamed/{fmt})...")
                # Predicted allocation print before the big build
                # (reference: sparse_matrix.f90:508-515). The packed layout
                # stores ~nnz x (val + idx) twice (row pack + adjoint pack).
                nrows_tot = par.ndata * par.ndata_components
                ncols_tot = ctx.model.grid.nelements_total * par.nmodel_components
                kept = int(np.ceil(par.compression_rate * ncols_tot))
                pred_gb = 2 * nrows_tot * kept * 8 / 1024**3
                log(f"  predicted {fmt} kernel size = {pred_gb:.3f} GB "
                    f"(nnz ~ {nrows_tot * kept:,})")
                t0 = time.time()
                build_dtype = jnp.float32 if near_field_f64 > 0 else compute_dtype
                writer = SensitStreamWriter(
                    sensit_dir, par, ctx.model.grid, ctx.column_weight,
                    par.compression_type,
                )
                kmeta = sens.compute_sensitivity(
                    par, ctx.model.grid, ctx.data, ctx.column_weight,
                    compute_dtype=build_dtype, store_dtype=jnp.float32,
                    near_field_f64=near_field_f64, mesh=mesh,
                    row_sink=writer.write_chunk,
                )
                writer.finalize(kmeta.comp_error)
                log(f"  kernel built+cached in {time.time() - t0:.2f}s; "
                    f"COMPRESSION ERROR, r = {kmeta.comp_error:.6e}")
                pk, meta = _read_capacity(sensit_dir)

            wrow = (ipar.problem_weight[i] * np.asarray(ctx.data.weight)).reshape(-1)
            ctx.kernel = None
            if fmt == "tiled":
                ctx.operator = apply_row_weights_tiled(pk, wrow)
            else:
                ctx.operator = apply_row_weights_packed(pk, wrow)
            log(
                f"  {PROBLEM_PREFIX[i]} kernel: {fmt} "
                f"{ctx.operator.nbytes / 1e6:.1f} MB "
                f"(dense would be {pk.nrows * pk.ncols * 4 / 1e6:.1f} MB)"
            )
            continue

        kernel = None
        if par.sensit_read == 1:
            kernel = try_read_kernel_cache(os.path.join(base_dir, par.sensit_path), par, ctx.model.grid)
            if kernel is None:
                log(f"WARNING: no readable sensitivity cache for {PROBLEM_PREFIX[i]}; recomputing.")
        if kernel is None:
            log(f"Calculating {PROBLEM_PREFIX[i].upper()} sensitivity kernel...")
            t0 = time.time()
            build_dtype = jnp.float32 if near_field_f64 > 0 else compute_dtype
            # Predicted allocation print (reference: sparse_matrix.f90:508-515).
            pred_gb = par.ndata * par.ndata_components * par.nmodel_components \
                * ctx.model.grid.nelements_total * 4 / 1024**3
            log(f"  predicted kernel size = {pred_gb:.3f} GB (float32)")

            # 10% progress ticker (reference: sensitivity_gravmag.F90:313-316).
            last_decile = [0]

            def ticker(done, total):
                decile = 10 * done // total
                if decile > last_decile[0] and verbose:
                    last_decile[0] = decile
                    rate = done / max(time.time() - t0, 1e-9)
                    print(f"  sensitivity rows: {10 * decile}% "
                          f"({done}/{total}, {rate:.1f} rows/s)", flush=True)

            # bf16 storage builds DIRECTLY into bfloat16: an f32
            # intermediate would double the build's HBM and cap the 2x
            # capacity the mode exists for (a 2M-cell kernel is 8.3 GB in
            # bf16 but 16.6 GB in f32 — over the 16 GB chip).
            build_store = (
                jnp.bfloat16
                if getattr(par, "kernel_store", "float32") == "bfloat16"
                else jnp.float32
            )
            kernel = sens.compute_sensitivity(
                par, ctx.model.grid, ctx.data, ctx.column_weight,
                compute_dtype=build_dtype, store_dtype=build_store,
                near_field_f64=near_field_f64, mesh=mesh, progress=ticker,
            )
            log(f"  kernel built in {time.time() - t0:.2f}s; "
                f"COMPRESSION RATE = {kernel.nnz / max(kernel.S.size, 1):.6f}; "
                f"COMPRESSION ERROR, r = {kernel.comp_error:.6e}")
            # The kernel is device-resident; persisting the cache pulls it
            # to the host once (~8 s/GB over the tunnel). Reference always
            # persists (sensitivity_gravmag.F90:141-153); opt out with
            # tpu.sensitWriteCache = 0 for one-shot runs.
            if getattr(par, "sensit_write", 1):
                if kernel.S.dtype == jnp.bfloat16:
                    # The disk cache is an f32 format (reference interop);
                    # persisting bf16-rounded values would silently poison
                    # a later float32 run that reloads them.
                    log("  NOT writing the sensit cache: the kernel is "
                        "stored bfloat16 and the cache format is float32 "
                        "(set tpu.kernelStoreDtype = float32 to persist).")
                else:
                    write_kernel_cache(sensit_dir, par, kernel, ctx.column_weight)

        # Bake in problem weight x data weights (sensitivity_gravmag.F90:836-843).
        # apply_row_weights donates the unweighted S buffer — on a 16 GB
        # chip a 1M-cell kernel (8.5 GB) cannot exist twice.
        ctx.kernel = sens.apply_row_weights(
            kernel, ipar.problem_weight[i], ctx.data.weight
        )
        kernel = None
        # Cast once to the storage dtype for the LSQR matvecs. Guarded:
        # jnp.astype copies even for the SAME dtype (numpy copy=True
        # semantics) — an 8.5 GB f32->f32 "cast" OOMed the 16 GB chip.
        # tpu.kernelStoreDtype = bfloat16 halves the kernel's HBM (2x
        # capacity) and speeds the matvec ~1.5x through XLA's
        # convert-fused GEMV (bf16 S promoted against the f32 solve
        # vectors in registers, never materialized — BASELINE.md round-2
        # bf16 table); matvec relerr ~1.7e-3.
        store_dtype = (
            jnp.bfloat16 if getattr(par, "kernel_store", "float32") == "bfloat16"
            else solve_dtype
        )
        if ctx.kernel.S.dtype != store_dtype:
            ctx.kernel.S = ctx.kernel.S.astype(store_dtype)

    def _kernel_operator(ctx):
        """Solver-side operator: the packed/matrix-free operators are built
        in phase III (ctx.operator); everything else is the dense MXU
        matmul."""
        from tomofastx_tpu.ops.sparse_kernel import DenseKernel

        if ctx.operator is not None:
            return ctx.operator
        # Contiguous transpose for fast adjoint GEMVs on CPU backends.
        import jax as _jax

        ST = (
            jnp.asarray(np.ascontiguousarray(np.asarray(ctx.kernel.S).T))
            if _jax.default_backend() == "cpu"
            else None
        )
        return DenseKernel(ctx.kernel.S, ST)

    # Memory checkpoint 2/4: after the forward phase (reference prints Pss
    # here, sensitivity_gravmag.F90:394-398).
    log(memory_report("(forward) "))
    log(f"  forward phase done at t+{time.time() - t_start:.2f}s")

    # ---- ADMM bounds ----
    if ipar.admm_type > 0:
        for i, ctx in ctxs.items():
            model_io.set_model_bounds(_with_paths(ipar, base_dir), ctx.model, i)

    # ---- damping-gradient and damping local weights ----
    for i, ctx in ctxs.items():
        if ipar.beta[i] != 0.0:
            ctx.model.allocate_damping_gradient_arrays()
            if ipar.damp_grad_weight_type > 1:
                model_io.read_damping_gradient_weights(
                    ctx.model, os.path.join(base_dir, ipar.damping_gradient_file[i])
                )
        if ipar.apply_local_damping_weight > 0:
            model_io.read_damping_weights(
                ctx.model, os.path.join(base_dir, ipar.damping_weight_file[i])
            )

    # ---- cross-gradient vector field / clustering mixtures ----
    vec_field = None
    if ipar.cross_grad_weight != 0.0 and ipar.vec_field_type > 0:
        vec_field = model_io.read_vector_field(
            os.path.join(base_dir, ipar.vec_field_file), ipar.nelements_total
        )

    mixture = None
    if ipar.clustering_weight_glob[0] != 0.0 or ipar.clustering_weight_glob[1] != 0.0:
        mixture = _read_mixtures(cfg, base_dir)

    # ---- tpu.refineForward: exact-physics forward operators ----
    # (matrix-free, weights baked) used for d_calc/residuals while LSQR
    # keeps the stored kernel — iterative refinement over major iterations.
    refine_requested = [
        i for i in active if getattr(ctxs[i].par, "refine_forward", 0)
    ]
    refine_fwd = bool(active) and len(refine_requested) == len(active)
    if refine_requested and not refine_fwd:
        log("WARNING: tpu.refineForward ignored — it must be enabled for "
            "ALL active problems (set for "
            f"{[PROBLEM_PREFIX[i] for i in refine_requested]} only).")
    if refine_fwd:
        import dataclasses as _dc

        from tomofastx_tpu.ops.bttb import BTTBKernel
        from tomofastx_tpu.ops.matrixfree import (
            LatticeMatrixFreeKernel,
            MatrixFreeKernel,
            make_matrixfree_kernel,
        )

        mf_already = [
            i for i in active
            if ctxs[i].kernel is None
            and isinstance(
                ctxs[i].operator,
                (MatrixFreeKernel, LatticeMatrixFreeKernel, BTTBKernel),
            )
        ]
        if len(mf_already) == len(active):
            # Every solve operator IS exact physics already.
            log("NOTE: tpu.refineForward is a no-op with kernelFormat = "
                "matrixfree (the solve already uses exact physics).")
            refine_fwd = False
        else:
            for i in active:
                ctx = ctxs[i]
                if i in mf_already:
                    # This problem's solve operator is already exact
                    # physics — reuse it as the refinement forward so a
                    # mixed-format joint run still refines the OTHER
                    # (stored-kernel) problem.
                    ctx.forward_op = ctx.operator
                    continue
                # tpu.refineForwardPrecision = double: emulated-f64
                # refinement residuals under f32 inner solves — true
                # mixed-precision iterative refinement (the forward costs
                # one matvec per major iteration, so the f64 emulation
                # overhead is amortized over the whole LSQR solve).
                fwd_dtype = (
                    jnp.float64
                    if getattr(ctx.par, "refine_forward_precision", "") == "double"
                    else solve_dtype
                )
                if fwd_dtype == jnp.float64 and not jax.config.jax_enable_x64:
                    # Without x64, jnp silently canonicalizes every f64
                    # array to f32 (refinement would be a no-op that
                    # still pays the force_no_fft penalty below) — warn
                    # and keep the solve dtype instead.
                    log("WARNING: tpu.refineForwardPrecision = double "
                        "requires jax_enable_x64 (the CLI sets it; "
                        "library callers must too) — falling back to "
                        "solve-precision refinement residuals.")
                    fwd_dtype = solve_dtype
                ctx.forward_op = make_matrixfree_kernel(
                    _dc.replace(ctx.par, compression_type=0),
                    ctx.model.grid, ctx.data, ctx.column_weight,
                    ipar.problem_weight[i], ctx.data.weight, fwd_dtype,
                    pad_cells_to=(mesh.devices.size if mesh is not None else 1),
                    in_fused_program=bool(fused_chunk),
                    # An f64 BTTB operator needs complex128 FFTs, which
                    # the TPU rejects ("Element type C128 is not
                    # supported", observed live on the Mansfield floor
                    # run 2026-08-21) — fall back to the lattice/per-cell
                    # exact operator for f64 refinement off-CPU.
                    force_no_fft=(
                        fwd_dtype == jnp.float64
                        and jax.default_backend() != "cpu"
                    ),
                )


    # ---- synthetic data (problem_joint_gravmag.F90:277-362) ----
    for i, ctx in ctxs.items():
        par = ctx.par
        if par.use_synthetic_model:
            model_io.set_model(
                ctx.model, 2, 0.0, os.path.join(base_dir, par.synthetic_model_file)
            )
            _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_synth_")
            _calculate_data(ctx, cfg, solve_dtype)
            _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_synthetic", 2)
            # The reference re-reads the just-written synthetic file as the
            # observed data; writing divides by units_mult and reading
            # multiplies, so this is val_meas = val_calc.
            ctx.data.val_meas = ctx.data.val_calc.copy()
        else:
            data_io.read_data_values(ctx.data, os.path.join(base_dir, par.data_grid_file))
        _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_observed", 1)

    log(f"  data/synthetic phase done at t+{time.time() - t_start:.2f}s")

    # ---- build the jitted solver ----
    g0 = ctxs[active[0]].model.grid
    for i in active:
        # The parfile parser keeps these in lockstep (one key sets both,
        # parfile.py); programmatic configs can drift them apart, which
        # silently mismatches the kernel's column domain against the
        # solver's wavelet conversions — fail fast instead (the
        # reference's metadata consistency-check philosophy,
        # sensitivity_gravmag.F90:1016-1030).
        if ctxs[i].par.compression_type != ipar.compression_type:
            raise ValueError(
                f"compression_type mismatch: problem {PROBLEM_PREFIX[i]} has "
                f"{ctxs[i].par.compression_type} but inversion params have "
                f"{ipar.compression_type}; set both (the Parfile key "
                "forward.matrixCompression.type sets them together)."
            )
    wavelet_domain = decide_wavelet_domain(ipar) if ipar.compression_type > 0 else False
    spec = SystemSpec(
        active=tuple(active),
        ncomp=ipar.nmodel_components,
        nx=g0.nx, ny=g0.ny, nz=g0.nz,
        ndata_rows=tuple(ipar.ndata[i] * ipar.ndata_components[i] for i in active),
        compression_type=ipar.compression_type,
        wavelet_domain=wavelet_domain,
        problem_weight=ipar.problem_weight,
        alpha=ipar.alpha,
        norm_power=ipar.norm_power,
        add_damping=tuple(
            ipar.alpha[i] != 0.0 and ipar.problem_weight[i] != 0.0 for i in (0, 1)
        ),
        beta=ipar.beta,
        add_damping_gradient=tuple(
            ipar.beta[i] != 0.0 and ipar.problem_weight[i] != 0.0 for i in (0, 1)
        ),
        admm_enabled=tuple(
            ipar.admm_type > 0 and ipar.problem_weight[i] != 0.0 for i in (0, 1)
        ),
        nlithos=ipar.nlithos,
        cross_grad=ipar.cross_grad_weight != 0.0,
        cross_grad_weight=ipar.cross_grad_weight,
        der_type=ipar.derivative_type,
        keep_model_constant=ipar.keep_model_constant,
        vec_field_type=ipar.vec_field_type,
        clustering=(ipar.clustering_weight_glob[0] != 0.0 or ipar.clustering_weight_glob[1] != 0.0),
        clustering_weight_glob=ipar.clustering_weight_glob,
        clustering_opt_type=ipar.clustering_opt_type,
        apply_local_damping_weight=ipar.apply_local_damping_weight > 0,
        niter=ipar.niter,
        rmin=ipar.rmin,
        gamma=ipar.gamma,
        target_misfit=ipar.target_misfit,
        admm_cost_threshold=ipar.data_cost_threshold_ADMM,
        admm_weight_multiplier=ipar.weight_multiplier_ADMM,
        admm_max_weight=ipar.max_weight_ADMM,
        refine_forward=refine_fwd,
    )
    if (spec.cross_grad or spec.clustering) and len(active) < 2:
        raise ValueError(
            "Cross-gradient and clustering constraints require BOTH problems "
            "active (nonzero inversion.joint.*.problemWeight); the reference "
            "would dereference an unallocated second model here."
        )
    log(f"WAVELET_DOMAIN = {spec.wavelet_domain}")
    solver = make_solver(spec)
    if mesh is not None:
        from tomofastx_tpu.parallel.mesh import shard_system_arrays

        base_solver = solver

        def solver(arrays):
            with mesh:
                return base_solver(shard_system_arrays(arrays, mesh))

    # Static per-run arrays.
    static_arrays = {
        "S": tuple(_kernel_operator(ctxs[i]) for i in active),
        "cw": tuple(jnp.asarray(ctxs[i].column_weight, solve_dtype) for i in active),
        "dX": jnp.asarray(g0.dX(), solve_dtype),
        "dY": jnp.asarray(g0.dY(), solve_dtype),
        "dZ": jnp.asarray(g0.dZ(), solve_dtype),
        # Arrays for DISABLED features shrink to unit placeholders: the
        # solve only reads them under the corresponding static spec flag
        # (joint.py), and at 10^7-10^8 cells each full-size ones/zeros
        # placeholder wastes 0.5-1.6 GB of HBM (found by the 134M-cell
        # BTTB run sizing).
        "damping_weight": tuple(
            jnp.asarray(ctxs[i].model.damping_weight, solve_dtype)
            if spec.apply_local_damping_weight
            else jnp.ones((1,), solve_dtype)
            for i in active
        ),
        "damping_grad_weight": tuple(
            jnp.asarray(
                ctxs[i].model.damping_grad_weight
                if ctxs[i].model.damping_grad_weight is not None
                else np.ones((3, spec.N)),
                solve_dtype,
            )
            if spec.add_damping_gradient[i]
            else jnp.ones((3, 1), solve_dtype)
            for i in active
        ),
        "min_bound": tuple(
            jnp.asarray(ctxs[i].model.min_bound, solve_dtype)
            if spec.admm_enabled[i] and ctxs[i].model.min_bound is not None
            else jnp.zeros((1, spec.N if spec.admm_enabled[i] else 1), solve_dtype)
            for i in active
        ),
        "max_bound": tuple(
            jnp.asarray(ctxs[i].model.max_bound, solve_dtype)
            if spec.admm_enabled[i] and ctxs[i].model.max_bound is not None
            else jnp.zeros((1, spec.N if spec.admm_enabled[i] else 1), solve_dtype)
            for i in active
        ),
        "bound_weight": tuple(
            jnp.asarray(
                ctxs[i].model.bound_weight
                if ctxs[i].model.bound_weight is not None
                else np.ones(spec.N),
                solve_dtype,
            )
            if spec.admm_enabled[i]
            else jnp.ones((1,), solve_dtype)
            for i in active
        ),
        # Observed data + weights (used by the fused on-device major loop).
        "val_meas": tuple(
            jnp.asarray(ctxs[i].data.val_meas, solve_dtype) for i in active
        ),
        "data_weight": tuple(
            jnp.asarray(ctxs[i].data.weight, solve_dtype) for i in active
        ),
    }
    if refine_fwd:
        static_arrays["S_fwd"] = tuple(ctxs[i].forward_op for i in active)
    if vec_field is not None:
        static_arrays["vec_field"] = jnp.asarray(vec_field, solve_dtype)
    if mixture is not None:
        static_arrays.update(
            {k: jnp.asarray(v, solve_dtype) for k, v in mixture.items()}
        )
    else:
        # Placeholders keep the arrays dict shape static.
        static_arrays.update(
            mixture_mu=jnp.zeros((2, 1), solve_dtype),
            mixture_sigma=jnp.ones((3, 1), solve_dtype),
            cell_weight=jnp.zeros((1, 1), solve_dtype),
            mixture_max=jnp.ones((1,), solve_dtype),
        )

    # ---- prior-models loop (problem_joint_gravmag.F90:374-598) ----
    result = WorkflowResult(models={}, data={}, cost_data=[0.0, 0.0], cost_model=[0.0, 0.0])
    number_prior_models = cfg.grav.number_prior_models
    base_out = out_dir
    rho_admm = list(ipar.rho_ADMM)

    # ADMM dual state persists across the prior-models loop (the reference
    # allocates z/u once in initialize2 and never resets them,
    # joint_inverse_problem.F90:320, 352-355).
    admm_z = [
        jnp.zeros((spec.N if spec.admm_enabled[i] else 1,), solve_dtype)
        for i in active
    ]
    admm_u = [
        jnp.zeros((spec.N if spec.admm_enabled[i] else 1,), solve_dtype)
        for i in active
    ]

    for m in range(1, number_prior_models + 1):
        if m > 1:
            out_dir = base_out.rstrip("/") + f"_{m}/"
            os.makedirs(out_dir, exist_ok=True)

        log(f"=== Solve problem for prior model #{m}, output folder = {out_dir}")

        # Prior model.
        for i, ctx in ctxs.items():
            par = ctx.par
            prior_file = par.prior_model_file
            if m > 1:
                prior_file = f"{prior_file}_{m}"
            model_io.set_model(
                ctx.model, par.prior_model_type, par.prior_model_val,
                os.path.join(base_dir, prior_file),
            )
            ctx.model.val_prior = ctx.model.val.copy()
            if par.prior_model_type > 1:
                _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_prior_")
            _calculate_data(ctx, cfg, solve_dtype)
            _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_prior", 2)

        # Starting model.
        for i, ctx in ctxs.items():
            par = ctx.par
            model_io.set_model(
                ctx.model, par.start_model_type, par.start_model_val,
                os.path.join(base_dir, par.start_model_file),
            )
            if par.start_model_type > 1:
                _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_starting_")
            _calculate_data(ctx, cfg, solve_dtype)
            _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_starting", 2)

        # Initial costs.
        cost_model = [0.0, 0.0]
        cost_data = [0.0, 0.0]
        for i, ctx in ctxs.items():
            cost_model[i] = _calculate_model_cost(ctx, ipar.norm_power)
            cost_data[i] = ctx.data.get_cost()
            log(f"data cost (initial) [{PROBLEM_PREFIX[i]}] = {cost_data[i]}")
        log(f"  entering the major loop at t+{time.time() - t_start:.2f}s")

        it_start = 1
        ckpt_path = os.path.join(out_dir, "checkpoint.npz")
        if resume and os.path.exists(ckpt_path):
            ck = load_checkpoint(ckpt_path)
            if int(ck["m"]) == m:
                it_start = int(ck["it"]) + 1
                rho_admm = [float(v) for v in ck["rho_admm"]]
                for a, i in enumerate(active):
                    ctxs[i].model.val = ck[f"model_{i}"]
                    ctxs[i].model.val_prior = ck[f"prior_{i}"]
                    admm_z[a] = jnp.asarray(ck[f"admm_z_{i}"], solve_dtype)
                    admm_u[a] = jnp.asarray(ck[f"admm_u_{i}"], solve_dtype)
                    _calculate_data(ctxs[i], cfg, solve_dtype)
                    cost_data[i] = ctxs[i].data.get_cost()
                    cost_model[i] = _calculate_model_cost(ctxs[i], ipar.norm_power)
                log(f"Resumed from checkpoint at iteration {it_start - 1}.")

        costs_path = os.path.join(out_dir, "costs.txt")
        costs_f = open(costs_path, "a" if it_start > 1 else "w")
        if it_start == 1:
            costs_f.write(COSTS_HEADER + "\n")

        last_costs = {}
        extras_np = {}

        # ---- major inversion loop (fused on-device variant) ----
        if fused_chunk > 0:
            from tomofastx_tpu.inversion.joint import make_fused_solver

            # Refresh val_meas (set after static_arrays when synthetic).
            static_arrays["val_meas"] = tuple(
                jnp.asarray(ctxs[i].data.val_meas, solve_dtype) for i in active
            )
            # ONE compiled fused program per run config: the scan length is
            # fixed at prog_steps and shorter chunks (writeModelEveryNiter
            # truncation, the ninversions tail, resume) pass active_steps,
            # masking trailing scan steps into cheap no-ops instead of
            # recompiling a new program shape (the round-2 cold-start
            # multiplier).
            prog_steps = min(fused_chunk, ipar.ninversions)
            base_fused = make_fused_solver(spec, prog_steps)
            if mesh is not None:
                from tomofastx_tpu.parallel.mesh import shard_system_arrays

                def fused_solver(arrays, _f=base_fused):
                    with mesh:
                        return _f(shard_system_arrays(arrays, mesh))

            else:
                fused_solver = base_fused
            it = it_start
            while it <= ipar.ninversions:
                if os.path.exists("stop") or os.path.exists(os.path.join(out_dir, "stop")):
                    log("Stop file found! Exiting the loop.")
                    break
                steps = min(prog_steps, ipar.ninversions - it + 1)
                if ipar.write_model_niter > 0:
                    wmn = ipar.write_model_niter
                    next_write = ((it + wmn - 1) // wmn) * wmn
                    steps = min(steps, next_write - it + 1)
                t_it = time.time()
                arrays = dict(static_arrays)
                arrays.update(
                    model=tuple(jnp.asarray(ctxs[i].model.val, solve_dtype) for i in active),
                    prior=tuple(jnp.asarray(ctxs[i].model.val_prior, solve_dtype) for i in active),
                    admm_z=tuple(admm_z),
                    admm_u=tuple(admm_u),
                    rho_admm=jnp.asarray(rho_admm, solve_dtype),
                    active_steps=jnp.asarray(steps, jnp.int32),
                )
                out = fused_solver(arrays)
                if m == 1 and it == it_start:
                    # Memory checkpoint 3/4: after the first LSQR solve
                    # (lsqr_solver2.F90:293-299).
                    log(memory_report("(first solve) "))

                per_costs = {k: np.asarray(v) for k, v in out["per_iteration"]["costs"].items()}
                pre_cd = np.asarray(out["per_iteration"]["pre_cost_data"])
                pre_cm = np.asarray(out["per_iteration"]["pre_cost_model"])
                rho_per = np.asarray(out["per_iteration"]["rho"])
                for s in range(steps):
                    cd = [0.0, 0.0]
                    cm = [0.0, 0.0]
                    for a, i in enumerate(active):
                        cd[i] = float(pre_cd[s, a])
                        cm[i] = float(pre_cm[s, a])
                    costs_s = {
                        k: (v[s] if np.ndim(v[s]) else float(v[s])) for k, v in per_costs.items()
                    }
                    costs_f.write(_costs_row(it - 1 + s, cd, cm, costs_s, rho_per[s]) + "\n")
                costs_f.flush()

                for a, i in enumerate(active):
                    ctxs[i].model.val = np.asarray(out["model"][a])
                    ctxs[i].data.val_calc = np.asarray(out["final_d_calc"][a]).reshape(
                        ctxs[i].data.val_meas.shape
                    )
                admm_z = list(out["admm_z"])
                admm_u = list(out["admm_u"])
                rho_admm = [float(out["rho_admm"][0]), float(out["rho_admm"][1])]
                fc = np.asarray(out["final_cost_data"])
                fm = np.asarray(out["final_cost_model"])
                for a, i in enumerate(active):
                    cost_data[i] = float(fc[a])
                    cost_model[i] = float(fm[a])
                # History entries carry POST-update costs labeled by their
                # iteration, matching the host-driven loop: the post cost of
                # iteration it+s is the pre cost of it+s+1 (or the final
                # cost for the last step).
                post_cd = np.asarray(out["per_iteration"]["post_cost_data"])
                for s in range(steps):
                    cd = [0.0, 0.0]
                    for a, i in enumerate(active):
                        cd[i] = float(post_cd[s, a])
                    result.costs_history.append(
                        {"iteration": it + s, "cost_data": cd, "cost_model": list(cost_model)}
                    )
                extras_np = {k: np.asarray(v) for k, v in out["extras"].items()}
                log(
                    f"  fused {steps} iterations in {time.time() - t_it:.2f}s, "
                    + ", ".join(f"{PROBLEM_PREFIX[i]} cost = {cost_data[i]:.6e}" for i in active)
                )
                it += steps
                if ipar.write_model_niter > 0 and (it - 1) >= 1 and (it - 1) % ipar.write_model_niter == 0:
                    for i, ctx in ctxs.items():
                        _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_inter_{it - 1}_")
                    save_checkpoint(ckpt_path, active, ctxs, admm_z, admm_u, rho_admm, m, it - 1)

        # ---- major inversion loop (host-driven) ----
        for it in ([] if fused_chunk > 0 else range(it_start, ipar.ninversions + 1)):
            # The reference polls ./stop in the cwd
            # (problem_joint_gravmag.F90:688); the output dir is also
            # accepted because base_dir/input trees may be read-only.
            if os.path.exists("stop") or os.path.exists(os.path.join(out_dir, "stop")):
                log("Stop file found! Exiting the loop.")
                break

            log(f"=== Iteration {it} / prior model {m} ===")
            t_it = time.time()

            # Residuals (problem_joint_gravmag.F90:666-675).
            for i, ctx in ctxs.items():
                ctx.residuals = ctx.data.weight * (ctx.data.val_meas - ctx.data.val_calc)

            arrays = dict(static_arrays)
            arrays.update(
                model=tuple(jnp.asarray(ctxs[i].model.val, solve_dtype) for i in active),
                prior=tuple(jnp.asarray(ctxs[i].model.val_prior, solve_dtype) for i in active),
                residuals=tuple(jnp.asarray(ctxs[i].residuals, solve_dtype) for i in active),
                admm_z=tuple(admm_z),
                admm_u=tuple(admm_u),
                rho_admm=jnp.asarray(rho_admm, solve_dtype),
            )

            out = solver(arrays)
            if m == 1 and it == it_start:
                # Memory checkpoint 3/4: after the first LSQR solve
                # (lsqr_solver2.F90:293-299).
                log(memory_report("(first solve) "))

            admm_z = list(out["admm_z"])
            admm_u = list(out["admm_u"])
            last_costs = {k: float(v) if np.ndim(v) == 0 else np.asarray(v) for k, v in out["costs"].items()}
            extras_np = {k: np.asarray(v) for k, v in out["extras"].items()}

            # Update models + new data.
            for a, i in enumerate(active):
                ctxs[i].model.update(np.asarray(out["delta"][a]))
                _calculate_data(ctxs[i], cfg, solve_dtype)

            if ipar.write_model_niter > 0 and it % ipar.write_model_niter == 0:
                for i, ctx in ctxs.items():
                    _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_inter_{it}_")

            # costs.txt row for the previous iteration
            # (problem_joint_gravmag.F90:519-528).
            row = _costs_row(it - 1, cost_data, cost_model, last_costs, rho_admm)
            costs_f.write(row + "\n")
            costs_f.flush()

            # New costs.
            for i, ctx in ctxs.items():
                cost_model[i] = _calculate_model_cost(ctx, ipar.norm_power)
                cost_data[i] = ctx.data.get_cost()

            log(
                f"  iter done in {time.time() - t_it:.2f}s, lsqr iters = {int(out['lsqr_iters'])}, "
                + ", ".join(
                    f"{PROBLEM_PREFIX[i]} cost = {cost_data[i]:.6e}" for i in active
                )
            )
            result.costs_history.append(
                {"iteration": it, "cost_data": list(cost_data), "cost_model": list(cost_model)}
            )

            # Dynamic ADMM weight adjustment (problem_joint_gravmag.F90:618-638).
            if ipar.admm_type > 0 and ipar.weight_multiplier_ADMM != 1.0:
                for i in active:
                    if (
                        cost_data[i] < ipar.data_cost_threshold_ADMM
                        and rho_admm[i] < ipar.max_weight_ADMM
                    ):
                        rho_admm[i] = ipar.weight_multiplier_ADMM * rho_admm[i]
                        log(f"Increased the ADMM weight to: {rho_admm[i]}")

            # Checkpoint AFTER the rho adjustment: the adjustment belongs to
            # the completed iteration, so a resumed run must start it+1 with
            # the adjusted weight (saving before it resumed with a stale rho
            # whenever weightMultiplier != 1 — caught by
            # test_cli_resume_matches_uninterrupted).
            if ipar.write_model_niter > 0 and it % ipar.write_model_niter == 0:
                save_checkpoint(ckpt_path, active, ctxs, admm_z, admm_u, rho_admm, m, it)

        # Final costs row (problem_joint_gravmag.F90:550).
        costs_f.write(
            f" {ipar.ninversions} {cost_data[0]:.9E} {cost_data[1]:.9E}"
            f" {cost_model[0]:.9E} {cost_model[1]:.9E}\n"
        )
        costs_f.close()

        # ---- final outputs ----
        for i, ctx in ctxs.items():
            _model_write(ctx, cfg, out_dir, f"{PROBLEM_PREFIX[i]}_final_", write_ascii=True)
            log(
                f"Model {i + 1} min/max values = {ctx.model.val.min()}, {ctx.model.val.max()}"
            )
            _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_final", 2)
            # Final data residual written over val_calc (F90:569-578).
            saved = ctx.data.val_calc.copy()
            ctx.data.val_calc = ctx.data.val_meas - ctx.data.val_calc
            _data_write(ctx, out_dir, f"{PROBLEM_PREFIX[i]}_misfit", 2)
            ctx.data.val_calc = saved

        if "cross_grad_magnitude" in extras_np and active:
            ctx0 = ctxs[active[0]]
            g = ctx0.model.grid
            vtk.write_struct_grid(
                os.path.join(out_dir, "Paraview", "cross_grad_final_model3D_full.vtk"),
                extras_np["cross_grad_magnitude"][:, None],
                g.X1, g.Y1, g.Z1, g.X2, g.Y2, g.Z2, g.nx, g.ny, g.nz,
                invert_z=True, units_mult=ctx0.model.units_mult, label=ctx0.model.vtk_label,
            )
        if "clustering_probabilities" in extras_np and active:
            ctx0 = ctxs[active[0]]
            g = ctx0.model.grid
            vtk.write_struct_grid(
                os.path.join(out_dir, "Paraview", "clustering_final_model3D_full.vtk"),
                extras_np["clustering_probabilities"][:, None],
                g.X1, g.Y1, g.Z1, g.X2, g.Y2, g.Z2, g.nx, g.ny, g.nz,
                invert_z=True, units_mult=ctx0.model.units_mult, label=ctx0.model.vtk_label,
            )

    result.models = {i: ctxs[i].model for i in active}
    result.data = {i: ctxs[i].data for i in active}
    result.cost_data = cost_data
    result.cost_model = cost_model
    log(memory_report("(end) "))
    log(f"THE END. total time = {time.time() - t_start:.2f}s")
    return result


def _costs_row(it, cost_data, cost_model, costs, rho_admm) -> str:
    """One costs.txt row in the reference's 20-column layout
    (problem_joint_gravmag.F90:519-528)."""

    def get(key):
        return float(costs.get(key, 0.0))

    xg = costs.get("cross_grad_cost", np.zeros(3))
    xg = np.asarray(xg) if np.ndim(xg) else np.array([xg, 0, 0])
    vals = [
        cost_data[0], cost_data[1], cost_model[0], cost_model[1],
        get("admm_cost_0"), get("admm_cost_1"),
        rho_admm[0], rho_admm[1],
        get("damping_gradient_cost_x_0"), get("damping_gradient_cost_y_0"), get("damping_gradient_cost_z_0"),
        get("damping_gradient_cost_x_1"), get("damping_gradient_cost_y_1"), get("damping_gradient_cost_z_1"),
        float(xg[0]), float(xg[1]), float(xg[2]),
        get("clustering_cost_0"), get("clustering_cost_1"),
    ]
    return f" {it} " + " ".join(f"{v:.9E}" for v in vals)


def save_checkpoint(path, active, ctxs, admm_z, admm_u, rho_admm, m, it):
    """Mid-run state checkpoint (beyond the reference, which only snapshots
    models and loses the ADMM dual state on restart — SURVEY.md §5.4)."""
    payload = {"m": m, "it": it, "rho_admm": np.asarray(rho_admm), "active": np.asarray(active)}
    for a, i in enumerate(active):
        payload[f"model_{i}"] = np.asarray(ctxs[i].model.val)
        payload[f"prior_{i}"] = np.asarray(ctxs[i].model.val_prior)
        payload[f"admm_z_{i}"] = np.asarray(admm_z[a])
        payload[f"admm_u_{i}"] = np.asarray(admm_u[a])
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _with_paths(ipar, base_dir):
    """Shallow copy of InversionParams with bounds-file paths resolved."""
    import copy

    out = copy.copy(ipar)
    out.bounds_ADMM_file = tuple(
        os.path.join(base_dir, p) if p != "None" else p for p in ipar.bounds_ADMM_file
    )
    return out


def _read_depth_weight_file(cache_dir: str, problem_index: int) -> np.ndarray:
    """Binary depth-weight file (reference format: int32 N then float64 N,
    sensitivity_gravmag.F90:446-460)."""
    suffix = ("grav", "magn")[problem_index]
    path = os.path.join(cache_dir, f"sensit_{suffix}_weight")
    with open(path, "rb") as f:
        n = int(np.fromfile(f, np.int32, 1)[0])
        w = np.fromfile(f, np.float64, n)
    return w


def _read_mixtures(cfg: Config, base_dir: str) -> dict:
    """Clustering mixture + cell weights (reference:
    clustering_read_mixtures, clustering.F90:163-278)."""
    ipar = cfg.inversion
    C = ipar.nclusters
    N = ipar.nelements_total
    with open(os.path.join(base_dir, ipar.mixture_file)) as f:
        nclusters_read = int(f.readline().split()[0])
        if nclusters_read != C:
            raise ValueError("The number of clusters is inconsistent!")
    from tomofastx_tpu.io.tableio import load_table

    table = load_table(os.path.join(base_dir, ipar.mixture_file), skiprows=1)
    cluster_weight = table[:, 0]
    mu = np.stack([table[:, 1], table[:, 3]])  # (2, C)
    sigma = np.stack([table[:, 2], table[:, 4], table[:, 5]])  # (3, C): s11, s22, s12

    if ipar.clustering_constraints_type != 1:
        with open(os.path.join(base_dir, ipar.cell_weights_file)) as f:
            n_read, c_read = (int(t) for t in f.readline().split()[:2])
            if n_read != N or c_read != C:
                raise ValueError("The clustering cell weights are inconsistent!")
        cell_weight = load_table(
            os.path.join(base_dir, ipar.cell_weights_file), skiprows=1
        )[:, :C]
    else:
        cw = cluster_weight / cluster_weight.sum()
        cell_weight = np.repeat(cw[None, :], N, axis=0)

    # Maximum of the mixture, assumed at one of the cluster centers
    # (clustering.F90:654-678).
    from tomofastx_tpu.inversion.operators import gaussian_mixture

    weight_loc = tuple(1.0 if w != 0.0 else 0.0 for w in ipar.clustering_weight_glob)
    maxima = []
    for c in range(C):
        v1 = np.full(N, mu[0, c])
        v2 = np.full(N, mu[1, c])
        g, _ = gaussian_mixture(
            jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(mu), jnp.asarray(sigma),
            jnp.asarray(cell_weight), weight_loc,
        )
        maxima.append(np.asarray(g))
    mixture_max = np.max(np.stack(maxima), axis=0)

    return dict(
        mixture_mu=mu, mixture_sigma=sigma, cell_weight=cell_weight, mixture_max=mixture_max
    )
