"""Benchmark: LSQR hot loop on a production-scale dense sensitivity kernel.

Primary perf metric (BASELINE.json): sensitivity matvec GFLOP/s/chip,
measured through the real solver path — a jitted LSQR solve (damped system)
whose per-iteration cost is one S@v and one S^T@u GEMV over the stored f32
kernel, exactly the inner loop of every inversion this framework runs.

Baseline (vs_baseline): the Fortran reference cannot be built in this image
(no gfortran/MPI), so the comparison point is the estimated 48-core CPU CSR
matvec throughput of the reference's LSQR loop, ~8 GFLOP/s effective
(2-socket server-class memory bandwidth ~200 GB/s over 8 bytes/flop CSR with
f32 values + int32 indices, plus MPI_Allreduce latency per iteration) —
documented in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import logging
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# Cold-wall budget for the full Mansfield fused run on a fresh process with
# a warm persistent compile cache (round-2 verdict target: <= ~40 s).
# The budget assumes a HEALTHY tunnel; see TunnelHealth for the scaling
# applied when the measured per-dispatch latency is inflated.
COLD_WALL_BUDGET_S = 40.0

# Healthy-tunnel reference: a warm tiny-op dispatch+host-fetch round trip
# costs ~30 ms (measured repeatedly in rounds 1-2; CLAUDE.md). When the
# tunnel is degraded this inflates several-fold and every wall number that
# contains N dispatches inflates with it.
HEALTHY_DISPATCH_S = 0.03

# Per-section budgets (round-4/5 verdict item: every bench section gets a
# budget + verdict, not just the Mansfield cold wall, so a regression in
# any of them flips a flag instead of shipping as a silently different
# number). Budgets are healthy-tunnel numbers from measured rounds
# (BENCH_r04.json; lattice re-baselined after the round-5 quad+patch
# restructure; lattice re-measured at 267-274 ms with the shipped
# chunk=128 + div-free integrands — budget 270 keeps ~16% headroom
# before a false 'regressed'): "throughput" sections must stay >= budget*(1-tol),
# "time" sections <= budget*(1+tol); the tunnel latency factor widens the
# effective bound (a sick tunnel inflates walls with zero product
# regression — same logic as the cold-wall adjudication below).
SECTION_BUDGETS = {
    "gemv_gflops":        {"budget": 360.0, "tol": 0.08, "kind": "throughput"},
    "bf16_gflops":        {"budget": 500.0, "tol": 0.10, "kind": "throughput"},
    "lattice_ms_per_iter": {"budget": 270.0, "tol": 0.15, "kind": "time"},
    "bttb_ms_per_iter":   {"budget": 0.30,  "tol": 0.30, "kind": "time"},
}


def section_verdict(name, value, latency_factor):
    """'ok' | 'tunnel_latency' | 'regressed' for a measured section value
    against its stored budget, tunnel-health-normalized."""
    s = SECTION_BUDGETS[name]
    if s["kind"] == "throughput":
        ok_at = s["budget"] * (1.0 - s["tol"])
        if value >= ok_at:
            return "ok"
        if value >= ok_at / latency_factor:
            return "tunnel_latency"
        return "regressed"
    ok_at = s["budget"] * (1.0 + s["tol"])
    if value <= ok_at:
        return "ok"
    if value <= ok_at * latency_factor:
        return "tunnel_latency"
    return "regressed"


class CompileCounter(logging.Handler):
    """Counts persistent-compile-cache hits and misses per bench phase.

    jax._src.compiler logs 'Persistent compilation cache hit' on a hit and
    'PERSISTENT COMPILATION CACHE MISS' on a miss (= a real XLA compile,
    written to the cache) at DEBUG level. Counting them decomposes a cold
    wall into load-from-cache programs vs genuine recompiles — without
    this the round-3 bench could not distinguish 'cache coverage broke'
    (real regression) from 'tunnel is sick' (noise)."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.hits = 0
        self.misses = 0
        self._logger = logging.getLogger("jax._src.compiler")

    def install(self):
        self._logger.addHandler(self)
        self._prev_level = self._logger.level
        if self._logger.level > logging.DEBUG or self._logger.level == 0:
            self._logger.setLevel(logging.DEBUG)
        # Do not propagate our DEBUG records to the root handler's stderr.
        self._prev_propagate = self._logger.propagate
        self._logger.propagate = False
        return self

    def uninstall(self):
        self._logger.removeHandler(self)
        self._logger.setLevel(self._prev_level)
        self._logger.propagate = self._prev_propagate

    def emit(self, record):
        msg = record.getMessage()
        if "Persistent compilation cache hit" in msg:
            self.hits += 1
        elif "PERSISTENT COMPILATION CACHE MISS" in msg:
            self.misses += 1

    def phase(self):
        """Snapshot counters; returns a closure giving the delta dict."""
        h0, m0 = self.hits, self.misses
        return lambda: {"pc_hits": self.hits - h0,
                        "pc_misses": self.misses - m0}


COUNTER = CompileCounter()


# If the first dispatch does not complete within this budget, the tunnel
# is declared unresponsive and the bench emits an error record instead of
# hanging forever (observed 2026-08-21: a first dispatch still pending
# after 90 minutes — the round artifact must exist regardless).
TUNNEL_DEAD_AFTER_S = 900.0


def measure_tunnel_health():
    """Per-process handshake + warm per-dispatch latency of the tunnel.

    Returns (first_dispatch_s, per_dispatch_s, latency_factor). The
    latency factor (measured warm dispatch / healthy 30 ms, floored at 1)
    scales the cold-wall budget: a wall made of N round trips inflates by
    exactly this factor on a sick tunnel with zero product regression.

    Raises TimeoutError if the first dispatch exceeds TUNNEL_DEAD_AFTER_S
    (the dispatch runs in a daemon thread — a blocked RPC cannot be
    cancelled, but the process must not hang)."""
    import threading

    import jax.numpy as jnp

    t_probe = time.time()
    done = threading.Event()

    def _first():
        _ = float(jnp.float32(1.0) + jnp.float32(2.0))
        done.set()

    th = threading.Thread(target=_first, daemon=True)
    th.start()
    if not done.wait(TUNNEL_DEAD_AFTER_S):
        raise TimeoutError(
            f"tunnel unresponsive: first dispatch still pending after "
            f"{TUNNEL_DEAD_AFTER_S:.0f}s"
        )
    first_dispatch_s = round(time.time() - t_probe, 1)
    # Warm per-dispatch latency: median of tiny add+fetch round trips.
    samples = []
    for i in range(10):
        t0 = time.time()
        _ = float(jnp.float32(float(i)) + jnp.float32(1.0))
        samples.append(time.time() - t0)
    per_dispatch_s = float(np.median(samples))
    latency_factor = max(1.0, per_dispatch_s / HEALTHY_DISPATCH_S)
    return first_dispatch_s, round(per_dispatch_s, 4), round(latency_factor, 2)


def main():
    import jax

    # Persistent compilation cache: the LSQR while-loop compile costs
    # minutes over a tunneled TPU; cache it across runs.
    from tomofastx_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    COUNTER.install()

    import jax.numpy as jnp

    from tomofastx_tpu.ops.lsqr import lsqr_solve

    # Tunnel-health probe FIRST (CLAUDE.md): the axon tunnel's per-process
    # first-dispatch latency varies from 4 s to 385+ s by the hour, AND the
    # warm per-dispatch latency itself inflates ~1.5x+ when degraded,
    # confounding every wall number below. Measure both before anything
    # else touches the device and report them alongside the walls.
    try:
        first_dispatch_s, per_dispatch_s, latency_factor = measure_tunnel_health()
    except TimeoutError as e:
        # Emit a well-formed record rather than hanging the round.
        print(json.dumps({
            "metric": "sensit_matvec_gflops_per_chip",
            "value": 0.0,
            "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "tunnel_unresponsive": True,
            "error": str(e),
            "backend": jax.default_backend(),
        }))
        return
    _log(f"[bench] tunnel: first dispatch {first_dispatch_s}s, warm "
         f"per-dispatch {per_dispatch_s * 1e3:.0f}ms "
         f"(healthy {HEALTHY_DISPATCH_S * 1e3:.0f}ms -> "
         f"latency factor {latency_factor:.2f}x)")

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    if small:
        ndata, N = 512, 32768
    else:
        ndata, N = 4096, 262144  # 4.3 GB f32 kernel (64^3 cells, 4096 rows)
    niter = 100
    alpha = 1e-3

    t_gen = time.time()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    S = jax.random.normal(k1, (ndata, N), jnp.float32) * (1.0 / np.sqrt(N))
    b = jax.random.normal(k2, (ndata,), jnp.float32)
    bb = jnp.concatenate([b, jnp.zeros((N,), jnp.float32)])
    jax.block_until_ready((S, bb))
    _log(f"[bench] data generated in {time.time() - t_gen:.1f}s "
         f"({ndata}x{N} f32, {ndata * N * 4 / 1e9:.2f} GB)")

    @jax.jit
    def solve(S, bb):
        # S must be an argument (NOT a closure capture) so it is not baked
        # into the program as a multi-GB constant.
        def matvec(x):
            return jnp.concatenate([S @ x, alpha * x])

        def rmatvec(u):
            return S.T @ u[:ndata] + alpha * u[ndata:]

        return lsqr_solve(matvec, rmatvec, bb, N, niter=niter, rmin=0.0)

    # Warm-up / compile. NOTE: on the tunneled axon backend
    # block_until_ready can return before remote execution completes, so all
    # timing fences use an explicit host fetch of a result scalar.
    ph = COUNTER.phase()
    t_comp = time.time()
    res = solve(S, bb)
    _ = float(res.r)
    _log(f"[bench] compile + first solve in {time.time() - t_comp:.1f}s "
         f"({ph()})")

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        res = solve(S, bb)
        _ = float(res.r)  # host fetch = completion fence
    dt = (time.time() - t0) / reps

    iters = int(res.iters)
    # 2 GEMVs per iteration, 2*ndata*N flops each.
    flops = iters * 2 * (2.0 * ndata * N)
    gflops = flops / dt / 1e9
    iters_per_s = iters / dt

    detail = {
        "ndata": ndata,
        "ncells": N,
        "lsqr_iters": iters,
        "lsqr_iters_per_s": round(iters_per_s, 2),
        "solve_wall_s": round(dt, 4),
        "backend": jax.default_backend(),
        "tunnel_first_dispatch_s": first_dispatch_s,
        "tunnel_warm_per_dispatch_s": per_dispatch_s,
        "tunnel_latency_factor": latency_factor,
        "gemv_phase_compiles": ph(),
    }

    # bf16 kernel storage (tpu.kernelStoreDtype = bfloat16): halves the
    # HBM bytes the GEMV pair streams, so the same HBM-bound loop runs
    # ~1.5-2x more iterations/s. The MXU takes bf16 operands with f32
    # accumulate natively; production pairs this with exact-physics
    # iterative refinement (tpu.refineForward) so inversion quality is
    # anchored by f64 physics, not the stored dtype (CLAUDE.md policy).
    try:
        S16 = S.astype(jnp.bfloat16)
        jax.block_until_ready(S16)
        res16 = solve(S16, bb)
        _ = float(res16.r)  # compile + first run
        t0 = time.time()
        for _ in range(reps):
            res16 = solve(S16, bb)
            _ = float(res16.r)
        dt16 = (time.time() - t0) / reps
        iters16 = int(res16.iters)
        gflops16 = iters16 * 2 * (2.0 * ndata * N) / dt16 / 1e9
        detail["bf16_storage"] = {
            "lsqr_iters": iters16,
            "lsqr_iters_per_s": round(iters16 / dt16, 2),
            "gflops_per_chip": round(gflops16, 2),
            "speedup_vs_f32_storage": round(gflops16 / gflops, 2),
            "residual_rel_dev_vs_f32": round(
                abs(float(res16.r) - float(res.r)) / max(float(res.r), 1e-30), 6
            ),
        }
        _log(f"[bench] bf16 storage: {gflops16:.0f} GFLOP/s "
             f"({gflops16 / gflops:.2f}x f32 storage)")
    except Exception as e:  # never lose the primary metric
        _log(f"[bench] bf16 storage bench failed: {e}")

    # ---- production-path metrics (VERDICT round-1 item 6): not a bare
    # GEMV but the full product — wavelet conversions, damping + ADMM,
    # fused on-device major loop on the shipped Mansfield parfile, plus
    # the matrix-free (unlimited-scale) operator's per-iteration cost.
    if not small:
        try:
            detail["mansfield_fused"] = _bench_mansfield_fused()
        except Exception as e:  # never lose the primary metric
            _log(f"[bench] mansfield fused bench failed: {e}")
        try:
            detail["corner_lattice"] = _bench_matrixfree(force_no_fft=True)
        except Exception as e:
            _log(f"[bench] corner-lattice bench failed: {e}")
        try:
            # Same problem through the FFT/BTTB operator (the survey lies
            # on the cell lattice, so production auto-selects this path).
            detail["bttb"] = _bench_matrixfree(force_no_fft=False)
        except Exception as e:
            _log(f"[bench] bttb bench failed: {e}")

    baseline_gflops = 8.0  # ESTIMATED 48-core MPI reference (see BASELINE.md)
    record = {
        "metric": "sensit_matvec_gflops_per_chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / baseline_gflops, 2),
        "vs_baseline_estimated": True,
        "detail": detail,
    }
    # Per-section budget adjudication (see SECTION_BUDGETS). The small
    # variant runs a different shape, so budgets only apply to the full
    # bench.
    if not small:
        verdicts = {}
        verdicts["gemv_gflops"] = section_verdict(
            "gemv_gflops", gflops, latency_factor)
        if detail.get("bf16_storage"):
            verdicts["bf16_gflops"] = section_verdict(
                "bf16_gflops", detail["bf16_storage"]["gflops_per_chip"],
                latency_factor)
        if detail.get("corner_lattice"):
            verdicts["lattice_ms_per_iter"] = section_verdict(
                "lattice_ms_per_iter",
                detail["corner_lattice"]["ms_per_lsqr_iter"], latency_factor)
        if detail.get("bttb"):
            verdicts["bttb_ms_per_iter"] = section_verdict(
                "bttb_ms_per_iter", detail["bttb"]["ms_per_lsqr_iter"],
                latency_factor)
        record["section_budgets"] = {
            k: SECTION_BUDGETS[k]["budget"] for k in verdicts}
        record["section_verdicts"] = verdicts
        record["any_section_regressed"] = any(
            v == "regressed" for v in verdicts.values())
        for k, v in verdicts.items():
            if v != "ok":
                _log(f"[bench] section {k}: verdict={v} "
                     f"(budget {SECTION_BUDGETS[k]['budget']}, "
                     f"latency factor {latency_factor:.2f}x)")
    # Cold/warm product walls are FIRST-CLASS fields (round-2 verdict: the
    # flat GEMV headline hid the product numbers in detail). Cold = full
    # Mansfield run in a fresh-process-equivalent state with a warm
    # persistent compile cache; the budget fails loudly on regression
    # (the reference has zero compile cost — its startup is file I/O,
    # program_tomofastx.F90:56-95).
    b16 = detail.get("bf16_storage")
    if b16:
        record["bf16_gflops_per_chip"] = b16["gflops_per_chip"]
    mf = detail.get("mansfield_fused")
    if mf:
        record["mansfield_cold_wall_s"] = mf["cold_wall_s"]
        record["mansfield_warm_wall_s"] = mf["warm_wall_s"]
        record["tunnel_first_dispatch_s"] = first_dispatch_s
        record["tunnel_latency_factor"] = latency_factor
        record["cold_wall_budget_s"] = COLD_WALL_BUDGET_S
        # Tunnel-health-scaled budget: a wall composed of device round
        # trips inflates by the measured per-dispatch latency factor even
        # when the product is unchanged (round-3 verdict item 1 — the
        # absolute budget made regressions unfalsifiable on a sick tunnel).
        eff_budget = round(COLD_WALL_BUDGET_S * latency_factor, 1)
        record["cold_wall_budget_effective_s"] = eff_budget
        cold = mf["cold_wall_s"]
        misses = mf["cold_compiles"]["pc_misses"]
        record["mansfield_cold_compiles"] = misses
        if cold <= COLD_WALL_BUDGET_S:
            verdict = "ok"
        elif misses > 0:
            # Real XLA compiles happened: cache coverage broke (or shapes
            # changed) — the wall is not comparable to the budget, but the
            # miss count itself is the actionable signal.
            verdict = "cache_misses"
        elif cold <= eff_budget:
            verdict = "tunnel_latency"  # excess explained by sick tunnel
        else:
            verdict = "regressed"
        record["cold_wall_verdict"] = verdict
        record["cold_wall_regressed"] = verdict == "regressed"
        if verdict != "ok":
            _log(f"[bench] cold wall {cold:.1f}s > budget "
                 f"{COLD_WALL_BUDGET_S}s: verdict={verdict} "
                 f"(effective budget {eff_budget}s, pc_misses={misses})")
    print(json.dumps(record))


def _bench_mansfield_fused():
    """Full Mansfield inversion (60 majors x 100 LSQR iters, ADMM +
    wavelet compression) through the fused on-device major loop — the
    product's time-to-misfit, not a kernel ceiling. Runs the PRODUCTION
    TPU configuration (round 4): f32 solve + compensated-f32 kernel build
    (tpu.farFieldQuad — reproduces the f64-build quality anchor exactly,
    truth-corr 0.814161, with zero emulated-f64 work; BASELINE.md).
    Returns wall seconds for the cold (first, fresh-process) and warm
    (second, same-process) runs and the fused-loop majors/s."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import read_parfile
    from tomofastx_tpu.inversion.workflow import solve_problem_joint_gravmag

    jax.config.update("jax_enable_x64", True)
    REF = "/root/reference"
    out = {}
    for attempt in ("cold", "warm"):
        cfg = read_parfile(f"{REF}/parfiles/Parfile_mansf_slice.txt")
        tmp = tempfile.mkdtemp()
        cfg.path_output = tmp + "/"
        ph = COUNTER.phase()
        t0 = time.time()
        res = solve_problem_joint_gravmag(
            cfg, base_dir=REF, verbose=False, fused_chunk=60,
            solve_dtype=jnp.float32, compute_dtype=jnp.float32,
        )
        wall = time.time() - t0
        out[f"{attempt}_wall_s"] = round(wall, 2)
        out[f"{attempt}_compiles"] = ph()
        out["final_cost"] = float(res.cost_data[0])
        shutil.rmtree(tmp, ignore_errors=True)
        _log(f"[bench] mansfield fused ({attempt}): {wall:.1f}s, "
             f"cost {res.cost_data[0]:.2e}, {out[f'{attempt}_compiles']}")
    out["majors"] = 60
    out["majors_per_s"] = round(60.0 / out["warm_wall_s"], 2)
    return out


def _bench_matrixfree(force_no_fft=True):
    """Matrix-free LSQR s/iter at the bench shape (262k cells, 4096 data).

    force_no_fft=True: the corner-lattice operator (regenerates every
    prism row per matvec — VPU transcendental-bound). False: the FFT/BTTB
    operator (per-layer 2-D FFT convolutions of a precomputed exact-f64
    offset table — the production fast path on gridded surveys)."""
    import jax
    import jax.numpy as jnp

    from tomofastx_tpu.config.parfile import GravParams
    from tomofastx_tpu.models.data import SurveyData
    from tomofastx_tpu.models.grid import Grid
    from tomofastx_tpu.ops import sensitivity as sens
    from tomofastx_tpu.ops.lsqr import lsqr_solve
    from tomofastx_tpu.ops.matrixfree import make_matrixfree_kernel

    nx = ny = nz = 64
    nd = 4096
    h = 100.0
    i = np.tile(np.arange(nx), ny * nz)
    j = np.tile(np.repeat(np.arange(ny), nx), nz)
    k = np.repeat(np.arange(nz), nx * ny)
    grid = Grid(nx=nx, ny=ny, nz=nz, X1=i * h, X2=(i + 1) * h,
                Y1=j * h, Y2=(j + 1) * h, Z1=k * h, Z2=(k + 1) * h)
    n_side = 64
    xs = (np.arange(n_side) + 0.5) * (nx * h / n_side)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    data = SurveyData(ndata=nd, ncomponents=1)
    data.X, data.Y, data.Z = X.ravel(), Y.ravel(), np.full(nd, -0.1)

    par = GravParams(nx=nx, ny=ny, nz=nz, ndata=nd, depth_weighting_type=1,
                     Z0=0.1, depth_weighting_power=2.0)
    cw = sens.calculate_depth_weight(par, grid, data, jnp.float32)
    op = make_matrixfree_kernel(
        par, grid, data, cw, 1.0, data.weight, jnp.float32, validate=False,
        force_no_fft=force_no_fft,
    )

    b = jnp.asarray(
        np.random.default_rng(1).normal(size=(nd,)).astype(np.float32)
    )
    # Enough iterations that the ~30 ms tunnel dispatch+fetch overhead
    # amortizes below the per-iteration cost being measured.
    niter = 5 if force_no_fft else 400

    @jax.jit
    def solve(op, b):
        return lsqr_solve(op.matvec, op.rmatvec, b, op.ncols,
                          niter=niter, rmin=0.0)

    label = "corner-lattice" if force_no_fft else "bttb"
    ph = COUNTER.phase()
    t0 = time.time()
    res = solve(op, b)
    _ = float(res.r)
    compile_s = time.time() - t0
    t0 = time.time()
    res = solve(op, b)
    _ = float(res.r)
    dt = time.time() - t0
    s_per_iter = dt / int(res.iters)
    _log(f"[bench] {label}: {s_per_iter * 1e3:.2f} ms/LSQR-iter "
         f"(compile+first {compile_s:.1f}s, {ph()})")
    return {
        "ncells": nx * ny * nz, "ndata": nd,
        "ms_per_lsqr_iter": round(s_per_iter * 1e3, 3),
        "lsqr_iters_per_s": round(1.0 / s_per_iter, 3),
        "compiles": ph(),
    }


if __name__ == "__main__":
    main()
