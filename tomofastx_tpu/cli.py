"""Command-line driver: ``python -m tomofastx_tpu -p <Parfile>``.

Counterpart of program_tomofastx (program_tomofastx.F90:25-103), minus MPI
boilerplate: under JAX SPMD there is no rank/size plumbing, and the unit
tests live in ``tests/`` under pytest rather than inside the binary.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tomofastx",
        description="TPU-native Tomofast-x: 3-D gravity + magnetics joint inversion",
    )
    parser.add_argument("-p", "--parfile", help="path to the Parfile")
    parser.add_argument(
        "-j", dest="parfile_j", metavar="PARFILE", default=None,
        help="legacy alias for -p (reference: parameters_init.f90:104-119)",
    )
    parser.add_argument(
        "--base-dir", default=".", help="directory that relative Parfile paths resolve against"
    )
    parser.add_argument(
        "--precision",
        choices=("double", "single"),
        default=None,
        help="solver precision (default: double on CPU, single on TPU)",
    )
    parser.add_argument("--platform", default=None, help="force a JAX platform (cpu/tpu)")
    parser.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR (view with "
        "tensorboard or xprof)",
    )
    parser.add_argument(
        "--mesh", default="0", metavar="N|RxC",
        help="shard the solve over N devices along the cells axis, or over "
        "a 2-D obs x cells mesh given as RxC (e.g. 2x4: data rows over 2, "
        "model columns over 4; 0 = no mesh)",
    )
    parser.add_argument(
        "--debug-nans", action="store_true",
        help="enable jax_debug_nans (the reference's debug builds trap FP "
        "exceptions, Makefile:54)",
    )
    parser.add_argument(
        "--fast-build", type=int, default=0, metavar="K",
        help="mixed-precision kernel build: f32 rows + f64 recompute of the "
        "K nearest cells per observation (fast on TPU, near-f64 quality)",
    )
    parser.add_argument(
        "--build-precision", choices=["double", "single"], default="double",
        help="kernel build physics precision (default double, the reference "
        "policy). 'single' is the compensated-f32 build: pure f32 physics "
        "with far cells by Gauss quadrature (tpu.farFieldQuad) — "
        "reproduces the f64-build inversion quality at f32 speed with no "
        "emulated f64 anywhere (Mansfield truth-corr 0.814161 for both; "
        "BASELINE.md round 4)",
    )
    parser.add_argument(
        "--f32-compress", action="store_true",
        help="run the wavelet+threshold compression pipeline in f32 for "
        "full-f64 kernel builds (tpu.f64BuildF32Compress=1): f64-quality "
        "compressed kernels at f32 pipeline speed — on lattice grids this "
        "supersedes --fast-build (full f64 physics via the corner-lattice "
        "build, no near-field approximation)",
    )
    parser.add_argument(
        "--fused", type=int, default=0, metavar="M",
        help="run the major loop in on-device chunks of M iterations "
        "(one lax.scan program per chunk; no host round-trips in between)",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from <output>/checkpoint.npz (written every "
        "writeModelEveryNiter iterations): restores models, ADMM duals, "
        "rho and the iteration counter",
    )
    parser.add_argument("-q", "--quiet", action="store_true")
    args = parser.parse_args(argv)
    if args.parfile is None:
        args.parfile = args.parfile_j
    if args.parfile is None:
        parser.error("a Parfile is required (-p/-j)")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    backend_is_tpu = None
    try:
        backend_is_tpu = jax.default_backend() not in ("cpu",)
    except Exception:
        backend_is_tpu = False

    if backend_is_tpu:
        # Persistent compilation cache (compiles are expensive on remote
        # TPUs). CPU executables are deliberately NOT cached: remote-compiled
        # CPU AOT results can target different host CPU features (SIGILL
        # risk).
        from tomofastx_tpu.utils.compile_cache import enable as enable_compile_cache

        enable_compile_cache()

    precision = args.precision or ("single" if backend_is_tpu else "double")
    # x64 is always enabled: even in single (f32-solve) mode the sensitivity
    # kernel is computed in f64 and rounded to f32 storage, matching the
    # reference's precision policy (global_typedefs.F90:37-45). An f32-built
    # kernel measurably degrades inversion quality (cancellation in the
    # prism closed forms).
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    try:
        cfg = read_parfile(args.parfile)
    except (FileNotFoundError, ValueError) as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 1

    if not args.quiet:
        # Echo all parameters like the reference's rank-0 startup dump
        # (parameters_init.f90:58-88).
        from tomofastx_tpu.config.parfile import config_summary

        print(config_summary(cfg))

    # Copy the Parfile into the output folder for provenance
    # (parameters_init.f90:144-148). Output paths are relative to the
    # current directory, like the reference binary.
    out_dir = cfg.path_output
    os.makedirs(out_dir, exist_ok=True)
    try:
        shutil.copy(args.parfile, os.path.join(out_dir, "Parfile_run.txt"))
    except shutil.SameFileError:
        pass

    solve_dtype = jnp.float64 if precision == "double" else jnp.float32

    import contextlib

    profile_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    mesh = None
    if args.mesh and args.mesh != "0":
        from tomofastx_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh if "x" in args.mesh else int(args.mesh))

    if args.f32_compress:
        cfg.grav.f64_build_f32_compress = 1
        cfg.magn.f64_build_f32_compress = 1

    compute_dtype = (
        jnp.float64 if args.build_precision == "double" else jnp.float32
    )
    try:
        with profile_cm:
            solve_problem_joint_gravmag(
                cfg, base_dir=args.base_dir, solve_dtype=solve_dtype,
                compute_dtype=compute_dtype,
                verbose=not args.quiet, mesh=mesh, near_field_f64=args.fast_build,
                fused_chunk=args.fused, resume=args.resume,
            )
    except (FileNotFoundError, ValueError, FloatingPointError) as e:
        # Clean fail-fast diagnostics, like the reference's exit_MPI banner
        # (mpi_tools.F90:30-54). Re-raise with --debug-nans for tracebacks.
        if args.debug_nans:
            raise
        print(f"ERROR: {e}", file=sys.stderr)
        return 1
    print("THE END.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
