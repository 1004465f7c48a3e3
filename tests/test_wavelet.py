"""Wavelet transform tests.

Mirrors tests_wavelet_compression.f90 (reference, 328 LoC): perfect
inversion for Haar and D4, norm preservation, and the crucial matvec
invariant <W(row), W(model)> = <row, model> that makes wavelet-domain solves
equal to model-domain solves. Additionally checks bit-level parity against a
scalar-loop oracle implementing the reference's lifting algorithm
(wavelet_transform.F90:75-498) directly.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from tomofastx_tpu.ops import wavelet as W


# ---------------------------------------------------------------------------
# Scalar-loop oracle (independent re-implementation of the Fortran lifting
# algorithm, 1-based indices mapped to 0-based).
# ---------------------------------------------------------------------------


def _nscale(L):
    return int(math.log(float(L)) / math.log(2.0)) if L > 1 else 0


def _oracle_haar_1d(s, inverse=False):
    L = s.shape[0]
    sq = math.sqrt(2.0)
    scales = range(_nscale(L), 0, -1) if inverse else range(1, _nscale(L) + 1)
    for istep in scales:
        step = 2**istep
        g0 = step // 2
        ng = (L - 1 - g0) // step + 1
        e = [i * step for i in range(ng)]
        g = [g0 + i * step for i in range(ng)]
        if not inverse:
            for i in range(ng):
                s[g[i]] -= s[e[i]]
            for i in range(ng):
                s[e[i]] += s[g[i]] / 2.0
            for i in range(ng):
                s[e[i]] *= sq
                s[g[i]] /= sq
        else:
            for i in range(ng):
                s[e[i]] /= sq
                s[g[i]] *= sq
            for i in range(ng):
                s[e[i]] -= s[g[i]] / 2.0
            for i in range(ng):
                s[g[i]] += s[e[i]]
    return s


def _oracle_d4_1d(s, inverse=False):
    L = s.shape[0]
    c0 = math.sqrt(3.0)
    c1 = math.sqrt(3.0) / 4.0
    c2 = (math.sqrt(3.0) - 2.0) / 4.0
    c3 = (math.sqrt(3.0) - 1.0) / math.sqrt(2.0)
    c4 = (math.sqrt(3.0) + 1.0) / math.sqrt(2.0)
    scales = range(_nscale(L), 0, -1) if inverse else range(1, _nscale(L) + 1)
    for istep in scales:
        step = 2**istep
        g0 = step // 2
        ng = (L - 1 - g0) // step + 1
        e = [i * step for i in range(ng)]
        g = [g0 + i * step for i in range(ng)]
        if not inverse:
            for i in range(ng):  # update 1
                s[e[i]] += s[g[i]] * c0
            # predict with wrap boundary
            s[g[0]] -= s[e[0]] * c1 + s[e[ng - 1]] * c2
            for i in range(1, ng):
                s[g[i]] -= s[e[i]] * c1 + s[e[i - 1]] * c2
            # update 2 with wrap boundary
            for i in range(ng - 1):
                s[e[i]] -= s[g[i + 1]]
            s[e[ng - 1]] -= s[g[0]]
            for i in range(ng):  # normalize
                s[e[i]] *= c3
                s[g[i]] *= c4
        else:
            for i in range(ng):
                s[e[i]] *= c4
                s[g[i]] *= c3
            for i in range(ng - 2, -1, -1):
                s[e[i]] += s[g[i + 1]]
            s[e[ng - 1]] += s[g[0]]
            for i in range(ng - 1, 0, -1):
                s[g[i]] += s[e[i]] * c1 + s[e[i - 1]] * c2
            s[g[0]] += s[e[0]] * c1 + s[e[ng - 1]] * c2
            for i in range(ng):
                s[e[i]] -= s[g[i]] * c0
    return s


def _oracle_3d(cube, wavelet_type, inverse=False):
    """Apply 1-D oracle along x (axis -1), y, z, like the Fortran ic loop."""
    fn = _oracle_haar_1d if wavelet_type == 1 else _oracle_d4_1d
    out = cube.copy()
    for axis in (2, 1, 0):
        moved = np.moveaxis(out, axis, -1)
        flat = moved.reshape(-1, moved.shape[-1])
        for r in range(flat.shape[0]):
            flat[r] = fn(flat[r].copy(), inverse)
        out = np.moveaxis(flat.reshape(moved.shape), -1, axis)
    return out


SHAPES = [(2, 128, 32), (5, 7, 11), (8, 8, 8), (1, 16, 4)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("wt", [W.HAAR, W.DAUB4])
def test_forward_matches_oracle(shape, wt):
    rng = np.random.default_rng(1)
    x = rng.normal(size=shape)
    ours = np.asarray(W.forward_wavelet_3d(jnp.asarray(x), wt))
    oracle = _oracle_3d(x, wt, inverse=False)
    np.testing.assert_allclose(ours, oracle, rtol=0, atol=1e-12)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("wt", [W.HAAR, W.DAUB4])
def test_inverse_matches_oracle(shape, wt):
    rng = np.random.default_rng(2)
    x = rng.normal(size=shape)
    ours = np.asarray(W.inverse_wavelet_3d(jnp.asarray(x), wt))
    oracle = _oracle_3d(x, wt, inverse=True)
    np.testing.assert_allclose(ours, oracle, rtol=0, atol=1e-12)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("wt", [W.HAAR, W.DAUB4])
def test_perfect_inversion(shape, wt):
    rng = np.random.default_rng(3)
    x = rng.normal(size=shape)
    y = W.inverse_wavelet_3d(W.forward_wavelet_3d(jnp.asarray(x), wt), wt)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-12)


@pytest.mark.parametrize("wt", [W.HAAR, W.DAUB4])
def test_norm_preservation(wt):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 8, 16))
    y = W.forward_wavelet_3d(jnp.asarray(x), wt)
    assert abs(float(jnp.linalg.norm(y)) - np.linalg.norm(x)) < 1e-10 * np.linalg.norm(x)


@pytest.mark.parametrize("wt", [W.HAAR, W.DAUB4])
def test_matvec_invariant(wt):
    """<W(row), W(model)> == <row, model> (tests_wavelet_compression.f90:70-135)."""
    rng = np.random.default_rng(5)
    row = rng.normal(size=(2, 128, 32))
    model = rng.normal(size=(2, 128, 32))
    lhs = float(
        jnp.vdot(W.forward_wavelet_3d(jnp.asarray(row), wt), W.forward_wavelet_3d(jnp.asarray(model), wt))
    )
    rhs = float(np.vdot(row, model))
    assert abs(lhs - rhs) < 1e-9 * abs(rhs)


def test_batched_matches_single():
    rng = np.random.default_rng(6)
    batch = rng.normal(size=(7, 4, 8, 16))
    out_b = np.asarray(W.forward_wavelet_3d(jnp.asarray(batch), W.DAUB4))
    for i in range(7):
        single = np.asarray(W.forward_wavelet_3d(jnp.asarray(batch[i]), W.DAUB4))
        np.testing.assert_allclose(out_b[i], single, atol=1e-12)
