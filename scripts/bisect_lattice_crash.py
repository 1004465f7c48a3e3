"""Bisect the >2M-cell blended-lattice composed-solver TPU worker crash.

Round-4 narrowing: standalone blended matvec/rmatvec AND a bare jitted
20-iteration lsqr_solve while_loop at 4M cells run fine, but the composed
solver program (make_solver / fused scan) crashes the worker. Round 5's
quad+patch restructure (one full-grid evaluation per call) still crashes
inside run_4m_matrixfree.py, so the trigger is the COMPOSITION, not the
evaluate-both formulation. This script adds the composition elements one
at a time, each stage in a fresh process (the worker crash poisons the
process):

  A  bare lsqr_solve(op.matvec, op.rmatvec) while_loop        [round-4 ok]
  B  A + in-program residual (one extra matvec instance before the loop)
  C  B + damping augmentation rows inside the loop's matvec/rmatvec
  D  C + post-loop cost (a third matvec instance after the loop)
  E  the real make_solver program (workflow composition)

Usage:  python scripts/bisect_lattice_crash.py <stage>   # A..E
        sh -c 'for s in A B C D E; do timeout 1800 python \
           scripts/bisect_lattice_crash.py $s; echo "$s -> $?"; done'
"""

import os
import sys
import time

# Stage G (generic blended op) must reach the crashing configuration
# despite the factory's >2M generic-blend gate (added after this
# script first reproduced the crash).
import os as _os
_os.environ.setdefault("TOMOFASTX_GENERIC_BLEND_MAX_CELLS", "999999999")
import jax

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np


def build_op(nx=200, ny=200, nz=100, nside=45, force_generic=False):
    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops import sensitivity as sens
    from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

    hx = hy = 100.0
    hz = 50.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * hx, X2=(i + 1) * hx,
                Y1=j * hy, Y2=(j + 1) * hy, Z1=k * hz, Z2=(k + 1) * hz)
    nd = nside * nside
    xs = (np.arange(nside) + 0.5) * (nx * hx / nside)
    ys = (np.arange(nside) + 0.5) * (ny * hy / nside)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(nd, -0.1)
    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float32)
    op = make_matrixfree_kernel(par, grid, data, cw, 1.0, data.weight,
                                jnp.float32, validate=False,
                                force_no_fft=True,
                                force_generic=force_generic)
    from tomofastx_tpu.ops.matrixfree import (
        LatticeMatrixFreeKernel, MatrixFreeKernel)
    if force_generic:
        assert isinstance(op, MatrixFreeKernel) and op.phys.far_quad
        assert op.near_idx is not None
    else:
        assert isinstance(op, LatticeMatrixFreeKernel) and op.far_quad
    return op, par, grid, data, cw


def main():
    stage = sys.argv[1].upper()
    import jax.numpy as jnp

    from tomofastx_tpu.ops.lsqr import lsqr_solve

    t0 = time.time()
    # Tiny-op handshake first so walls are interpretable.
    _ = float(jnp.float32(1.0) + jnp.float32(2.0))
    print(f"[bisect] handshake {time.time() - t0:.1f}s", flush=True)

    # Stage G: the composed (damped + residual + cost) program over the
    # GENERIC blended per-cell operator at 4M cells (ADVICE round-4 item:
    # the generic blended composed solve above 2M was unproven).
    # Optional trailing args override the grid: <stage> [nx ny nz]
    # (e.g. "A 256 250 128" probes the 8M shape).
    dims = {}
    if len(sys.argv) >= 5:
        dims = dict(zip(("nx", "ny", "nz"),
                        (int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))))
    op, par, grid, data, cw = build_op(force_generic=(stage == "G"), **dims)
    if stage == "G":
        stage = "D"
    N = op.ncols
    nd = op.nrows
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(size=(nd,)).astype(np.float32))
    m0 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.01)
    beta = 1e-11
    niter = 20

    if stage == "A":
        @jax.jit
        def prog(op, b):
            return lsqr_solve(op.matvec, op.rmatvec, b, N, niter=niter,
                              rmin=0.0).x

        out = prog(op, b)
    elif stage == "B":
        @jax.jit
        def prog(op, b, m0):
            r = b - op.matvec(m0)  # extra matvec instance pre-loop
            return lsqr_solve(op.matvec, op.rmatvec, r, N, niter=niter,
                              rmin=0.0).x

        out = prog(op, b, m0)
    elif stage == "C":
        @jax.jit
        def prog(op, b, m0):
            r = b - op.matvec(m0)
            rr = jnp.concatenate([r, jnp.zeros((N,), jnp.float32)])

            def mv(x):
                return jnp.concatenate([op.matvec(x), np.sqrt(beta) * x])

            def rmv(u):
                return op.rmatvec(u[:nd]) + np.sqrt(beta) * u[nd:]

            return lsqr_solve(mv, rmv, rr, N, niter=niter, rmin=0.0).x

        out = prog(op, b, m0)
    elif stage == "D":
        @jax.jit
        def prog(op, b, m0):
            r = b - op.matvec(m0)
            rr = jnp.concatenate([r, jnp.zeros((N,), jnp.float32)])

            def mv(x):
                return jnp.concatenate([op.matvec(x), np.sqrt(beta) * x])

            def rmv(u):
                return op.rmatvec(u[:nd]) + np.sqrt(beta) * u[nd:]

            dx = lsqr_solve(mv, rmv, rr, N, niter=niter, rmin=0.0).x
            m1 = m0 + dx
            cost = jnp.sum((b - op.matvec(m1)) ** 2)  # 3rd matvec instance
            return m1, cost

        out = prog(op, b, m0)
    elif stage == "E":
        # The real composition: run_4m_matrixfree's workflow path.
        print("[bisect] stage E == scripts/run_4m_matrixfree.py; run that",
              flush=True)
        return 0
    else:
        raise SystemExit(f"unknown stage {stage}")

    t1 = time.time()
    leaf = out[0] if isinstance(out, tuple) else out
    v = float(np.asarray(leaf).ravel()[0])
    print(f"[bisect] stage {stage} OK in {time.time() - t0:.1f}s "
          f"(compile+run {time.time() - t1 + 0:.1f}s tail, probe {v:.3e})",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
