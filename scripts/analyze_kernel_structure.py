"""Measure the wavelet-compressed kernel's sparsity structure on the real
TPU build (64^3 cells, 4096 obs, rate 0.15) to choose the capacity-mode
representation with data, not guesses.

Questions answered (printed as JSON):
1. Column population distribution: what dense-panel width covers what
   fraction of nnz when columns are sorted by population?
2. Block structure in the flat (in-place lifting, scale-interleaved)
   ordering: per-row 128-block count, tile-union width at TM=8.
3. Same two, after reordering columns by wavelet LEVEL (Mallat-style
   grouping: coarse first, then per-level detail in spatial order).
Saves the boolean nnz mask to /tmp/kernel_mask.npz for offline
experiments.
"""

import json
import os
import sys
import time

# Persistent compile cache: the env var is IGNORED on this JAX build —
# must go through jax.config (tomofastx_tpu/utils/compile_cache.py).
import jax  # noqa: E402

from tomofastx_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import numpy as np


def level_1d(n, L):
    """Per-position wavelet level in the in-place lifting layout after L
    scales: approx coefficients sit at stride 2^L (level L); detail of
    level l at positions = odd multiples of 2^(l-1). Non-power-of-2 sizes
    follow ceil-halving (wavelet_transform.F90:96-100): at each scale s
    the first ceil(n_s / 2) strided positions stay 'approx'."""
    lev = np.zeros(n, np.int32)
    idx = np.arange(n)
    cur = idx.copy()
    for s in range(1, L + 1):
        ns = cur.size
        if ns <= 1:
            break
        approx = cur[np.arange(ns) % 2 == 0]
        detail = cur[np.arange(ns) % 2 == 1]
        lev[detail] = s
        cur = approx
    lev[cur] = L + 1  # final approximation, coarsest
    return lev


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_capacity import NX, NY, NZ, get_kernel

    S = get_kernel()  # disk-cached across scripts (see bench_capacity.py)
    mask = S != 0.0
    np.savez_compressed("/tmp/kernel_mask.npz", mask=np.packbits(mask, axis=1),
                        shape=np.array(mask.shape))
    nnz = int(mask.sum())
    N = S.shape[1]
    out = {"shape": list(S.shape), "nnz": nnz, "rate": nnz / S.size}

    # 1. dense-panel coverage when columns sorted by population
    pop = mask.sum(axis=0)
    order = np.argsort(-pop)
    csum = np.cumsum(pop[order])
    for frac in (0.5, 0.7, 0.8, 0.9, 0.95, 0.99):
        w = int(np.searchsorted(csum, frac * nnz)) + 1
        out[f"panel_cols_for_{int(frac*100)}pct_nnz"] = w
        out[f"panel_bytes_frac_{int(frac*100)}"] = round(S.shape[0] * w * 4 / (nnz * 4), 2)
    out["cols_pop_ge_half"] = int((pop >= S.shape[0] // 2).sum())
    out["nnz_in_cols_pop_ge_half"] = round(float(pop[pop >= S.shape[0] // 2].sum()) / nnz, 3)

    # 2. block structure, flat ordering
    def block_stats(m, tag):
        NB = m.shape[1] // 128
        mb = m[:, : NB * 128].reshape(m.shape[0], NB, 128).any(axis=2)
        per_row = mb.sum(axis=1)
        tiles = mb.reshape(-1, 8, NB).any(axis=1)
        out[f"{tag}_blocks_per_row_mean"] = round(float(per_row.mean()), 1)
        out[f"{tag}_tile_union_max"] = int(tiles.sum(axis=1).max())
        out[f"{tag}_tile_union_mean"] = round(float(tiles.sum(axis=1).mean()), 1)
        out[f"{tag}_NB"] = NB

    block_stats(mask, "flat")

    # 3. level-grouped (Mallat-style) ordering
    L = 10  # reference float-truncated scale count ~ log2 but capped by dims
    lx = level_1d(NX, L)
    ly = level_1d(NY, L)
    lz = level_1d(NZ, L)
    # Flat cell order is i-fastest: cube (nz, ny, nx) C-order.
    lev3 = np.minimum.reduce(np.meshgrid(lz, ly, lx, indexing="ij")).ravel()
    # column order: coarsest (high level) first, then spatial order inside
    morder = np.lexsort((np.arange(N), -lev3))
    block_stats(mask[:, morder], "mallat")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    sys.exit(main())
