"""LSQR (Paige & Saunders) over an abstract linear operator.

TPU-native counterpart of the reference's column-parallel solver
(lsqr_solver2.F90:47-473). Differences by design, not translation:

- The operator is a pair of closures (matvec, rmatvec) instead of CSR
  matrices; the sensitivity part is a dense MXU matmul and the constraint
  part is a set of fused stencil/diagonal ops.
- The minor loop is a jittable ``lax.while_loop``; the early-exit criteria
  (relative residual <= rmin, |rhobar| < 1e-30, rho == 0, optional
  target-misfit RMSE check) are loop-carry flags mirroring
  lsqr_solver2.F90:163, 185-188, 251-254, 286-289.
- Under a device mesh the inner contractions are sharded over the cells axis
  and XLA inserts the psum that replaces the reference's two MPI_Allreduce
  calls per iteration (lsqr_solver2.F90:208-214, 241).

All vectors here live in the *scaled/solver* domain; wavelet-domain
conversions are the operator's business (see inversion/system.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class LSQRResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    r: jax.Array  # relative residual phibar / b1
    misfit: jax.Array  # last computed data RMSE (inf if never computed)


def _soft_threshold(x, gamma):
    """ISTA soft thresholding (reference: apply_soft_thresholding,
    lsqr_solver2.F90:478-494)."""
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - gamma, 0.0)


def lsqr_solve(
    matvec: Callable,
    rmatvec: Callable,
    b: jax.Array,
    ncols: int,
    niter: int,
    rmin: float,
    gamma: float = 0.0,
    target_misfit: float = 0.0,
    misfit_fn: Optional[Callable] = None,
) -> LSQRResult:
    """Solve min ||A x - b|| with LSQR.

    matvec(x: (ncols,)) -> (nlines,);  rmatvec(u: (nlines,)) -> (ncols,).
    If target_misfit > 0 and misfit_fn is given, misfit_fn(x) is evaluated at
    the top of every iteration and the loop exits once it reaches
    target_misfit (reference: lsqr_solver2.F90:168-189).
    """
    dtype = b.dtype
    calc_misfit = (target_misfit > 0.0) and (misfit_fn is not None)

    def normalize(vec):
        s = jnp.linalg.norm(vec)
        scaled = jnp.where(s != 0.0, vec / jnp.where(s != 0.0, s, 1.0), vec)
        return scaled, s

    b1_vec, beta0 = normalize(b)
    u0 = b1_vec
    b1 = beta0

    v_raw = rmatvec(u0)
    v0, alpha0 = normalize(v_raw)

    x0 = jnp.zeros((ncols,), dtype)

    class Carry(NamedTuple):
        x: jax.Array
        w: jax.Array
        u: jax.Array
        v: jax.Array
        alpha: jax.Array
        beta: jax.Array
        rhobar: jax.Array
        phibar: jax.Array
        r: jax.Array
        it: jax.Array
        stop: jax.Array
        misfit: jax.Array

    init = Carry(
        x=x0,
        w=v0,
        u=u0,
        v=v0,
        alpha=alpha0,
        beta=beta0,
        rhobar=alpha0,
        phibar=beta0,
        r=jnp.asarray(1.0, dtype),
        it=jnp.asarray(1, jnp.int32),
        stop=jnp.asarray(False),
        misfit=jnp.asarray(jnp.inf, dtype),
    )

    def cond(c: Carry):
        return (c.it <= niter) & (c.r > rmin) & (~c.stop)

    def body(c: Carry):
        # Optional data-misfit early exit.
        if calc_misfit:
            misfit = misfit_fn(c.x)
            reached = misfit <= target_misfit
        else:
            misfit = c.misfit
            reached = jnp.asarray(False)

        def iterate(c: Carry):
            # u = -alpha*u + A v ;  beta = ||u|| ; u /= beta
            u = -c.alpha * c.u + matvec(c.v)
            u, beta = normalize(u)
            # v = -beta*v + A^T u ; alpha = ||v|| ; v /= alpha
            v = -beta * c.v + rmatvec(u)
            v, alpha = normalize(v)

            rho = jnp.sqrt(c.rhobar * c.rhobar + beta * beta)
            rho_ok = rho != 0.0
            rho_safe = jnp.where(rho_ok, rho, 1.0)
            rho_inv = 1.0 / rho_safe
            cc = c.rhobar * rho_inv
            ss = beta * rho_inv
            theta = ss * alpha
            rhobar = -cc * alpha
            phi = cc * c.phibar
            phibar = ss * c.phibar
            t1 = phi * rho_inv
            t2 = -theta * rho_inv

            x = t1 * c.w + c.x
            w = t2 * c.w + v
            if gamma != 0.0:
                x = _soft_threshold(x, gamma)
            r = phibar / b1

            stop = (~rho_ok) | (jnp.abs(rhobar) < 1.0e-30)
            # When rho == 0 the reference exits before updating x.
            x = jnp.where(rho_ok, x, c.x)
            w = jnp.where(rho_ok, w, c.w)
            it = jnp.where(rho_ok, c.it + 1, c.it)
            r = jnp.where(rho_ok, r, c.r)
            return Carry(x, w, u, v, alpha, beta, rhobar, phibar, r, it, stop, misfit)

        def hold(c: Carry):
            return c._replace(stop=jnp.asarray(True), misfit=misfit)

        return lax.cond(reached, hold, iterate, c)

    # Guard for ||b|| == 0: the model is exact, return zeros
    # (reference: lsqr_solver2.F90:123-126).
    final = lax.while_loop(cond, body, init)
    x = jnp.where(b1 != 0.0, final.x, jnp.zeros_like(final.x))
    return LSQRResult(x=x, iters=final.it - 1, r=final.r, misfit=final.misfit)
