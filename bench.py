"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): DQMC sweeps/sec on 8x8 attractive Hubbard, beta=10,
256 chains. One sweep = a full [down;up] pass over all 100 imaginary-time
slices (2*M*N = 12,800 Metropolis site updates + UDT-stabilized propagation),
matching the reference's sweep definition (run! loop, DQMC.jl:420-436).
A secondary Ising spin-flips/sec metric (8x8, 256 chains) is included as an
extra field.

DEADLINE DISCIPLINE (VERDICT r3 task 1): round 3's bench was killed by the
driver (rc=124) and recorded nothing. This driver now (a) enables the
persistent XLA compile cache (round 3's 16-minute headline phase was almost
entirely jit compilation; a warm cache replays it in seconds — measured
12.1 s -> 0.8 s cross-process on the axon backend), (b) runs phases in
priority order under a global BENCH_DEADLINE_S budget, skipping what no
longer fits, (c) emits the final JSON line with whatever completed plus a
"skipped_phases" list the moment the budget is exhausted, and (d) installs a
SIGTERM handler that emits the partial record immediately if the driver's
timeout fires anyway. Per-phase wall times land in "phase_s" so any future
slowdown is diagnosable from the artifact alone.

CACHE-LOAD REALITY (measured r5, 2026-08-20): a persistent-cache HIT is
NOT free on the tunneled axon backend — executable load scales with
program size. N=64 programs (~3-11 MB entries) load in ~2-5 s, but the
N=256 (L=16) sweep/init programs are 32/119 MB and load in ~200-380 s,
and the L=16 gate's session programs cost ~500-870 s warm. That is why
the L=16 phases carry est_warm in the hundreds and gate_l16 runs dead
last behind a disk-cached-result fallback: a "warm" run is fast only for
the N=64 operating points.

Sanity: `sanity_ok` is a CALIBRATED per-mode criterion (VERDICT r1 task 2),
not an acceptance band. For f32 modes it is an on-device matched-seed
cross-safe_mult validation (montecarlo_tpu.validation.cross_sm_check), pooled
over two independent seeds: the candidate mode must reproduce occupation AND
the correlators (CDC, PC, SDCz) AND the tau-integrated susceptibilities
(CDS, PS — the longest-unstabilized-window stress test) of the drift-proof
safe_mult=1 anchor within Bonferroni-scaled standard-error bounds. The sm=1
anchor pool is computed ONCE and shared by the headline and g_refresh gates
(they compare against the same anchor mode). The L=16 and complex (Peierls)
operating points carry their OWN cross-sm gates (VERDICT r3 task 2) in
`l16_mode.cross_sm_validation` / `complex_mode.cross_sm_validation`.
For f64 the criterion is the reference's drift alarm (max window-end drift
< 1e-6; reference threshold 1e-7 per stabilization, stack.jl:530-550).
Set BENCH_VALIDATE=0 to skip all cross-sm gates (sanity_ok is then null).

vs_baseline: the reference (ffreyer/MonteCarlo.jl) publishes no numbers and
Julia is not available in this image; the baseline is an estimate of the
reference's single-core CPU throughput for this config: ~0.6 GFLOP/sweep of
small-matrix f64 work at ~12 GFLOP/s effective (LoopVectorization @avx on
64x64 kernels) ≈ 20 sweeps/sec. Recorded as BASELINE_EST_SWEEPS_PER_S.
"""

import json
import os
import signal
import sys
import time
from functools import partial

T0 = time.time()
# 1680 s: the driver's kill is NOT a fixed 3550 s — round 4's arrived at
# elapsed 1798.2 s (BENCH_r04.json, mid-l16-phase, rc=124). 1680 leaves
# ~2 min of emit headroom under the tightest observed kill. The budget is
# spent against MEASURED r5 phase walls (see phase est/est_warm below;
# full-suite probe run 2026-08-20: 2686 s with a cold headline, all gates
# PASS): everything except gate_l16 fits warm in ~1300 s; gate_l16 (868 s
# measured) runs LAST and only if the budget still covers it, else the
# most recent on-device result is attached from a disk cache with explicit
# "cached" provenance (see _gate_l16_cache_path).
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1680"))
RESERVE_S = 20.0  # emit + teardown slack held back from every phase decision


def _progress(msg):
    """Phase progress on stderr (stdout stays the single JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')} +{time.time() - T0:5.0f}s] "
          f"{msg}", file=sys.stderr, flush=True)


import jax

jax.config.update("jax_enable_x64", True)

# Persistent compile cache: round 3's rc=124 was ~all compile time. Entries
# are keyed on the HLO + compile options, so code changes invalidate exactly
# the affected programs. Disable with BENCH_CACHE_DIR="".
_cache_dir = os.environ.get(
    "BENCH_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_bench_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

BASELINE_EST_SWEEPS_PER_S = 20.0
# strict-f64 throughput bound on v5e (256 chains, sm=10): 76.7 measured r4
# with the double-float Pallas QR kernel (was 24.0 on the XLA-emulated QR,
# r2). The regression assertion below warns if a round drops >30% under it —
# e.g. if df_qr_ok's compile probe starts failing and f64 silently falls
# back to the ~24/s XLA path.
F64_BOUND_SWEEPS_PER_S = 76.0

N_CHAINS = int(os.environ.get("BENCH_CHAINS", "256"))
L = int(os.environ.get("BENCH_L", "8"))
BETA = float(os.environ.get("BENCH_BETA", "10.0"))
SWEEPS = int(os.environ.get("BENCH_SWEEPS", "6"))
# Default configuration: full-float32 propagation with safe_mult=10 and
# full-precision f32 matmuls (set inside the library; TPU would otherwise
# lower f32 matmuls to single bfloat16 MXU passes, whose wrap drift biases
# the chain). Physics-validated on device (VALIDATION.md + the cross-sm
# gate below). BENCH_DTYPE=float64 is the conservative reference-equivalent
# mode.
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
SAFE_MULT = int(os.environ.get("BENCH_SAFE_MULT", "10"))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
VALIDATE = os.environ.get("BENCH_VALIDATE", "1") == "1"
REFRESH_SM = int(os.environ.get("BENCH_REFRESH_SM", "5"))
# complex (Peierls) shipped safe_mult — its own cross-sm gate below validates
# exactly this value; if the gate fails the shipped value must drop.
# Default 5, NOT the real-session 10: the r4 on-device gate REJECTED complex
# sm=10 (average-sign deviation ~0.1 from the sm=1 anchor, z=37 — real phase
# accumulation bias, consistent with r2's complex drift mean ~38) and PASSED
# sm=5 (sign z=0.97, all observables in tolerance).
CPLX_SM = int(os.environ.get("BENCH_CPLX_SM", "5"))

PHASE_S = {}
SKIPPED = []
RESULT = {}  # mutated in place; emitted by _emit (possibly from SIGTERM)
_EMITTED = False


def time_left():
    return DEADLINE_S - (time.time() - T0)


def _gate_ok(mode):
    """ok flag of a mode dict's cross_sm_validation, or None."""
    if not isinstance(mode, dict):
        return None
    g = mode.get("cross_sm_validation")
    return bool(g["ok"]) if isinstance(g, dict) and "ok" in g else None


def _summary():
    """Compact decisive scalars, rebuilt from RESULT at emit time (so a
    SIGTERM snapshot carries whatever phases had completed)."""
    s = {}

    def num(key, src, *path):
        v = src
        for p in path:
            v = v.get(p) if isinstance(v, dict) else None
        if isinstance(v, (int, float)):
            s[key] = v

    num("sm1", RESULT, "sm1_sweeps_per_s")
    num("c512", RESULT, "chains512_sweeps_per_s")
    num("repulsive", RESULT, "repulsive_mode", "chain_sweeps_per_s")
    num("refresh", RESULT, "conservative_mode", "sweeps_per_s")
    num("susc_s", RESULT, "susceptibility_s_per_measured_sweep")
    num("l16", RESULT, "l16_mode", "chain_sweeps_per_s")
    num("complex", RESULT, "complex_mode", "chain_sweeps_per_s")
    num("f64", RESULT, "f64_mode", "sweeps_per_s")
    num("ising_flips", RESULT, "ising_spin_flips_per_s")
    for key, mode in (("headline_gate", {"cross_sm_validation":
                                         RESULT.get("cross_sm_validation")}),
                      ("refresh_gate", RESULT.get("conservative_mode")),
                      ("l16_gate", RESULT.get("l16_mode")),
                      ("complex_gate", RESULT.get("complex_mode"))):
        ok = _gate_ok(mode)
        if ok is not None:
            s[key] = ok
    f64 = RESULT.get("f64_mode")
    if isinstance(f64, dict) and "regression_ok" in f64:
        s["f64_ok"] = f64["regression_ok"]
    return s


def _emit(partial_reason=None):
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    out = dict(RESULT)
    # TRAILER DISCIPLINE (VERDICT r4 task 1b): the driver's tail capture is
    # ~2 KB, and r4's SIGTERM record lost exactly the decisive fields
    # because they were emitted FIRST. Re-order so the bulky diagnostics
    # (gate z-dicts, drift histograms) come first and the compact decisive
    # scalars — summary, metric, value, vs_baseline, sanity_ok — are the
    # LAST ~600 bytes of the line.
    trailer_keys = ("metric", "value", "unit", "vs_baseline", "sanity_ok")
    trailer = {k: out.pop(k, None) for k in trailer_keys}
    out["deadline_s"] = DEADLINE_S
    out["elapsed_s"] = round(time.time() - T0, 1)
    out["phase_s"] = PHASE_S
    out["skipped_phases"] = SKIPPED
    if partial_reason:
        out["partial"] = partial_reason
    out["summary"] = _summary()
    out["metric"] = (trailer["metric"] or
                     f"DQMC sweeps/sec ({L}x{L} Hubbard, beta={BETA}, "
                     f"{N_CHAINS} chains)")
    out["value"] = trailer["value"]
    out["unit"] = trailer["unit"] or "sweeps/s"
    out["vs_baseline"] = trailer["vs_baseline"]
    out["sanity_ok"] = trailer["sanity_ok"]
    print(json.dumps(out), flush=True)


def _sigterm(signum, frame):  # pragma: no cover - driver timeout path
    # Watchdog FIRST: any exception or hang later in this handler (e.g. a
    # broken stdout pipe raising inside _emit — observed when a SIGTERM to
    # the whole process group killed the consumer before us) must not leave
    # the process running phases with _EMITTED half-set.
    import threading
    threading.Thread(target=lambda: (time.sleep(10), os._exit(0)),
                     daemon=True).start()
    _progress("SIGTERM received — emitting partial record")
    try:
        _emit(partial_reason="SIGTERM (driver timeout) — partial record")
    except Exception as err:
        _progress(f"emit failed in handler: {err!r}")
    # Try to release the TPU client before dying: a bare os._exit leaves the
    # single-client pool claim held, and the NEXT bench process then blocks
    # ~10+ min on its first device op (observed r4: run killed at t+1490s
    # wedged the following run's headline). Bound the attempt with a
    # hard-exit watchdog — the device may be mid-computation and cleanup can
    # itself hang. KNOWN LIMITATION (ADVICE r4): if the main thread is
    # blocked inside a C++ device call when SIGTERM arrives, CPython defers
    # this whole handler (watchdog included) until that call returns — the
    # wedged-device case is bounded only by the driver's SIGKILL.
    # Release caveat — MEASURED on device 2026-08-20 (ADVICE r4 asked for
    # verification): SIGTERM mid-headline + this handler (clear_caches +
    # clear_backends + gc), and the NEXT process's first device op still
    # blocked 303 s. The wedge is a server-side pool-lease timeout that
    # in-process cleanup cannot shorten (live jax.Arrays in the interrupted
    # frames keep the PJRT client refcounted until os._exit anyway). The
    # release attempt is kept as a best effort, but the real protection is
    # DEADLINE_S: finish and exit cleanly BEFORE the driver's kill.
    try:
        import gc

        from jax.extend import backend as jex_backend  # NOT auto-imported
        jax.clear_caches()
        jex_backend.clear_backends()
        gc.collect()
    except Exception as err:
        _progress(f"client release failed: {err!r}")
    os._exit(0)


signal.signal(signal.SIGTERM, _sigterm)


def _warm():
    """True when the persistent caches (XLA compile cache + anchor pools)
    are evidently hot: the headline phase compiles (or cache-LOADS, see
    CACHE-LOAD REALITY) the biggest program in the suite, so its wall time
    separates cold (measured 614 s in the r5 probe; 250-470 s in r3/r4)
    from warm (measured 221 s warm-LOAD in r5 run-2; 11-93 s when the
    in-process jit cache is hot). Threshold 300 sits mid-gap — the old
    150 cutoff misclassified r5's genuinely-warm 221 s load as cold
    (VERDICT r4 weak #3 was the same failure one tier down). Warm runs use
    the warm per-phase estimates for skip decisions; a cold run falls back
    to worst-case."""
    return PHASE_S.get("headline", 1e9) < 300


def phase(name, est_s, fn, enabled=True, required=False, est_warm=None):
    """Run one bench phase under the global deadline. Returns fn() or None
    (skipped), or {"error": repr} on exception. est_s is the worst-case
    (cold-cache) estimate, est_warm the warm-cache one; the skip decision
    uses est_warm when _warm() says the caches are hot."""
    if not enabled:
        return None
    if est_warm is not None and _warm():
        est_s = est_warm
    if not required and time_left() < est_s + RESERVE_S:
        SKIPPED.append(name)
        _progress(f"SKIP {name} ({time_left():.0f}s left < est {est_s:.0f}s)")
        return None
    _progress(f"{name} (est {est_s:.0f}s, {time_left():.0f}s left)")
    t0 = time.time()
    try:
        out = fn()
    except Exception as err:  # pragma: no cover
        out = {"error": repr(err)}
        _progress(f"{name} FAILED: {err!r}")
    PHASE_S[name] = round(time.time() - t0, 1)
    return out


def bench_dqmc(safe_mult=SAFE_MULT, g_refresh=False, dtype=None,
               sweeps=SWEEPS, lattice_L=None, chains=None, repulsive=False):
    import montecarlo_tpu as mct
    from montecarlo_tpu.dqmc import core
    from montecarlo_tpu.dqmc.parameters import DQMCParameters

    L_cur = lattice_L or L
    n_chains = chains or N_CHAINS
    model_cls = (mct.HubbardModelRepulsive if repulsive
                 else mct.HubbardModelAttractive)
    model = model_cls(dims=2, L=L_cur, U=4.0, mu=0.0)
    params = DQMCParameters(beta=BETA, safe_mult=safe_mult)
    ctx, consts = core.make_context(model, params,
                                    dtype=jnp.dtype(dtype or DTYPE),
                                    use_pallas=USE_PALLAS,
                                    g_refresh=g_refresh)
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, n_chains, params.slices)
    keys = jax.random.split(key, n_chains)
    state = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
    if len(jax.devices()) > 1 and n_chains % len(jax.devices()) == 0:
        # multi-chip: shard the chain axis over the ICI mesh — the jitted
        # sweep partitions into pure per-device compute (no collectives)
        from montecarlo_tpu.parallel import chain_mesh, shard_chain_state
        state = shard_chain_state(state, chain_mesh())
    jax.block_until_ready(state["S_U"])
    sweep = jax.jit(jax.vmap(partial(core.sweep_pair, ctx, consts)))
    state, _, _ = sweep(state)  # compile + warmup
    # force a HOST fetch, not just block_until_ready: on the tunneled
    # runtime block_until_ready can return while the computation is still
    # in flight, which once produced a nonsense 3e6 sweeps/s reading
    float(jnp.sum(jnp.real(state["G"])))
    t0 = time.time()
    for _ in range(sweeps):
        state, _, _ = sweep(state)
    float(jnp.sum(jnp.real(state["G"])))
    dt = time.time() - t0
    # plausibility floor: even a perfect chip cannot finish one batched
    # sweep (2*M*N site updates x N_CHAINS chains) in under ~10 us; a
    # sub-floor reading means async dispatch was not actually flushed
    assert dt > 10e-6 * sweeps, (
        f"bench timing implausible ({dt:.6f}s for {sweeps} sweeps) — "
        "async dispatch was not flushed")
    drift = {
        "max": float(jnp.max(state["prop_err_max"])),
        "mean": float(jnp.sum(state["prop_err_sum"]) /
                      jnp.maximum(1, jnp.sum(state["prop_err_n"]))),
        "exceed_hist": [int(x) for x in
                        jnp.sum(state["prop_err_hist"], axis=0)],
        "exceed_edges": list(core.PROP_ERR_EDGES),
        "n_windows": int(jnp.sum(state["prop_err_n"])),
    }
    acc = float(jnp.sum(state["acc"])) / float(jnp.sum(state["prop"]))
    return n_chains * sweeps / dt, dt / sweeps, drift, acc


def bench_ising():
    from montecarlo_tpu import MC, IsingModel

    # Ising sweeps are tiny; use a large chain batch to amortize step latency
    chains = int(os.environ.get("BENCH_ISING_CHAINS", "262144"))
    model = IsingModel(dims=2, L=L)
    mc = MC(model, beta=0.44, n_chains=chains, seed=0, sweeps=50,
            thermalization=0, measure_rate=10 ** 9, measurements={})
    mc.run(sweeps=100, verbose=False, chunk=100)  # compile + warmup
    t0 = time.time()
    mc.run(sweeps=300, verbose=False, chunk=100)
    dt = time.time() - t0
    flips = 200 * chains * L * L  # attempted spin flips
    return flips / dt


def bench_susceptibility():
    """Measured-sweep cost with the FULL susceptibility set (CDS+PS+SDSz+CCS,
    combined-greens iterator over all M slices) every sweep, via the public
    DQMC API (VERDICT r1 weak #5: on-device number that includes measurement
    pushes)."""
    from montecarlo_tpu import DQMC, HubbardModelAttractive
    from montecarlo_tpu.measurements import dqmc_measurements as dm

    model = HubbardModelAttractive(dims=2, L=L, U=4.0, mu=0.0)
    mc = DQMC(model, beta=BETA, delta_tau=0.1, n_chains=N_CHAINS, seed=0,
              dtype=jnp.dtype(DTYPE), use_pallas=USE_PALLAS,
              measurements={}, measure_rate=1, safe_mult=SAFE_MULT)
    mc.measurements.add("CDS", dm.charge_density_susceptibility(mc, model),
                        mc.n_chains)
    mc.measurements.add("PS", dm.pairing_susceptibility(mc, model),
                        mc.n_chains)
    mc.measurements.add("SDSz",
                        dm.spin_density_susceptibility(mc, model, "z"),
                        mc.n_chains)
    mc.measurements.add("CCS", dm.current_current_susceptibility(mc, model),
                        mc.n_chains)
    mc.run(sweeps=16, thermalization=0, verbose=False)  # compile n=16 block
    mc.last_sweep = 0
    t0 = time.time()
    mc.run(sweeps=16, thermalization=0, verbose=False)
    return (time.time() - t0) / 16


def _gate_fields(g):
    return {k: g[k] for k in ("ok", "seeds", "anchor_cached", "z", "z_tol",
                              "candidate", "anchor") if k in g}


def _gate_cache_path(name):
    """Disk slot for the last COMPLETED on-device result of a statistical
    gate phase. Next to the XLA cache so wiping one wipes both; the stored
    dict carries its own provenance ("derived_at" wall-clock date +
    "derived_elapsed_s") and is attached to the record with "cached": true
    when the live gate does not fit the driver budget — never silently
    passed off as a live run."""
    if not _cache_dir:
        return None
    return os.path.join(_cache_dir, "gates", f"{name}.json")


def _gate_cache_write(name, fields):
    path = _gate_cache_path(name)
    if not path:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        rec = dict(fields)
        rec["derived_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        rec["derived_elapsed_s"] = round(PHASE_S.get(name, -1.0), 1)
        with open(path, "w") as f:
            json.dump(rec, f)
    except Exception as err:  # pragma: no cover - disk full/readonly
        _progress(f"{name} cache write failed: {err!r}")


def _gate_cache_read(name):
    path = _gate_cache_path(name)
    if not path or not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            rec = json.load(f)
        rec["cached"] = True
        return rec
    except Exception as err:  # pragma: no cover
        _progress(f"{name} cache read failed: {err!r}")
        return None


def _anchor_cached(**kwargs) -> bool:
    """Is a gate's pooled sm=1 anchor already on disk? Missing anchor =
    the gate pays its derivation — on a FRESH machine (empty
    .jax_bench_cache, observed when a round starts on a new box) that turned
    gate_complex's 170 s warm estimate into an 1100 s+ phase that overran
    the whole budget. Gate phases price themselves with this check instead
    of the global _warm() proxy, and fall back to their cached result when
    the honest estimate does not fit."""
    try:
        from montecarlo_tpu.validation import anchor_cache_exists
        return bool(anchor_cache_exists(**kwargs))
    except Exception:  # pragma: no cover - keep the bench running
        return False


def _backend_watchdog():
    """The tunneled TPU backend blocks INDEFINITELY in init while the device
    pool is unavailable (observed: >2 h during round 3). Rather than hang the
    driver and record nothing, probe device init on a daemon thread and emit
    a diagnostic JSON line if it does not complete within
    BENCH_INIT_TIMEOUT_S (default: half the deadline, capped at 600 s)."""
    import threading
    ok = threading.Event()
    err_box = []

    def _init():
        try:
            jax.devices()
            ok.set()
        except Exception as e:
            err_box.append(repr(e))

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    timeout = float(os.environ.get("BENCH_INIT_TIMEOUT_S",
                                   str(min(600.0, DEADLINE_S / 2))))
    _progress(f"waiting for backend init (up to {timeout:.0f}s)")
    t.join(timeout)
    if not ok.is_set():
        if err_box:  # init FAILED fast — report the real exception,
            msg = f"backend init raised: {err_box[0]}"  # not a fake timeout
        else:
            msg = (f"backend init did not complete within {timeout:.0f}s "
                   "— TPU pool unavailable")
        RESULT["error"] = msg
        _emit()
        os._exit(0)


def main():
    _backend_watchdog()

    # PHASE ORDER (VERDICT r4 tasks 1+3, re-planned on r5 measured walls):
    # headline + its gate first (they ARE the metric), then the cheap
    # throughput rows (sm1 / repulsive / chains512 / ising, ~2 min warm
    # total) so no cold compile can starve them, then g_refresh + gate,
    # then the L=16 throughput point in a GUARANTEED mid-budget slot
    # (its big-program loads cost ~380 s even warm — see CACHE-LOAD
    # REALITY), then the three cheaper pins (susceptibility, complex,
    # f64), and LAST the 868 s gate_l16, which runs live only if the
    # budget still covers it and otherwise attaches its most recent
    # on-device result from disk with explicit "cached" provenance.

    # ---- 1. headline (required: this IS the metric) --------------------
    head = phase("headline", 700, bench_dqmc, required=True)
    if not isinstance(head, tuple):
        RESULT["error"] = (head or {}).get("error", "headline failed")
        _emit()
        return
    sweeps_per_s, s_per_sweep, drift, acc = head
    RESULT.update({
        "value": round(sweeps_per_s, 3),
        "vs_baseline": round(sweeps_per_s / BASELINE_EST_SWEEPS_PER_S, 3),
        "dtype": DTYPE,
        "safe_mult": SAFE_MULT,
        "use_pallas": USE_PALLAS,
        "chains": N_CHAINS,
        "s_per_batched_sweep": round(s_per_sweep, 3),
        "propagation_drift": drift,
        "acceptance": round(acc, 4),
        "baseline_estimate_note":
            "reference CPU single-core estimate, 20 sweeps/s (no published "
            "numbers); measured in-image anchor: 3.96 sweeps/s for a "
            "single-chain numpy/BLAS f64 implementation of the same hot "
            "loop (benchmarks/cpu_reference.py; simplified stabilization, "
            "i.e. optimistic) — the 20/s estimate stays as a conservative "
            "bound for the reference's @avx Julia",
    })

    # ---- 2. cross-sm gate, headline mode (stores the shared anchor) ----
    anchor_pool = None
    sanity = None
    if DTYPE == "float64":
        sanity = drift["max"] < 1e-6 and 0.3 < acc < 0.95
    elif VALIDATE:
        def _headline_gate():
            from montecarlo_tpu.validation import cross_sm_check
            return cross_sm_check(L=L, beta=BETA, dtype=DTYPE,
                                  safe_mult=SAFE_MULT, use_pallas=USE_PALLAS)
        # price on the anchor's own cache state (fresh box = cold anchor:
        # measured 299 s; anchor-cached warm runs measured 95-110 s)
        _anch_ok = _anchor_cached(L=L, beta=BETA, dtype=DTYPE,
                                  use_pallas=USE_PALLAS)
        g = phase("gate_headline", 300 if _anch_ok else 400, _headline_gate,
                  est_warm=110 if _anch_ok else None)
        if isinstance(g, dict) and "ok" in g:
            anchor_pool = g.pop("_anchor_pool", None)
            RESULT["cross_sm_validation"] = _gate_fields(g)
            sanity = bool(g["ok"]) and 0.3 < acc < 0.95
        elif g is not None:
            RESULT["cross_sm_validation"] = g  # {"error": ...}
            sanity = False
    RESULT["sanity_ok"] = sanity

    # ---- 3. drift-proof sm=1 anchor throughput --------------------------
    sm1 = phase("sm1_anchor", 60,
                lambda: round(bench_dqmc(safe_mult=1, sweeps=2)[0], 3),
                enabled=(SAFE_MULT != 1
                         and os.environ.get("BENCH_SM1", "1") == "1"),
                est_warm=30)
    RESULT["sm1_sweeps_per_s"] = sm1 if not isinstance(sm1, dict) else sm1

    # ---- 4. repulsive (F=2) model row (VERDICT r4 task 5) ---------------
    # The second shipped model family re-verified every round instead of
    # frozen at r2's 1897 cs/s; same headline config, 2 timed sweeps.
    def _repulsive():
        sps, sp_sweep, d, a = bench_dqmc(sweeps=2, repulsive=True)
        return {"chains": N_CHAINS, "chain_sweeps_per_s": round(sps, 3),
                "s_per_batched_sweep": round(sp_sweep, 3),
                "drift_max": d["max"], "acceptance": round(a, 4)}
    rep = phase("repulsive", 250, _repulsive,
                enabled=os.environ.get("BENCH_REPULSIVE", "1") == "1",
                est_warm=35)
    RESULT["repulsive_mode"] = rep

    # ---- 5. chain-scaling point (512-chain saturation, VERDICT r3 #7) ---
    c512 = phase("chains512", 90,
                 lambda: round(bench_dqmc(chains=512, sweeps=2)[0], 3),
                 enabled=os.environ.get("BENCH_C512", "1") == "1",
                 est_warm=25)
    RESULT["chains512_sweeps_per_s"] = c512

    # ---- 6. Ising secondary metric --------------------------------------
    ising = phase("ising", 120, bench_ising, est_warm=15)
    RESULT["ising_spin_flips_per_s"] = (round(ising) if isinstance(
        ising, (int, float)) else ising)

    # ---- 7. g_refresh conservative mode + gate (reuses the anchor) -----
    refresh_mode = phase(
        "g_refresh", 90, est_warm=25, fn=
        lambda: (lambda r: {"kind": "g_refresh", "safe_mult": REFRESH_SM,
                            "sweeps_per_s": round(r[0], 3),
                            "vs_baseline": round(
                                r[0] / BASELINE_EST_SWEEPS_PER_S, 3),
                            "propagation_drift": r[2]})(
            bench_dqmc(safe_mult=REFRESH_SM, g_refresh=True)),
        enabled=os.environ.get("BENCH_REFRESH", "1") == "1")
    RESULT["conservative_mode"] = refresh_mode  # write-through: a SIGTERM
    # during the gate below must not lose the measured mode (r4 lesson:
    # l16's 753 s of data vanished from the partial record this way)
    if (isinstance(refresh_mode, dict) and "error" not in refresh_mode
            and VALIDATE and DTYPE != "float64"):
        def _refresh_gate():
            from montecarlo_tpu.validation import cross_sm_check
            return cross_sm_check(L=L, beta=BETA, dtype=DTYPE,
                                  safe_mult=REFRESH_SM, g_refresh=True,
                                  use_pallas=USE_PALLAS,
                                  anchor_pool=anchor_pool)
        g = phase("gate_g_refresh", 250, _refresh_gate, est_warm=125)
        if isinstance(g, dict) and "ok" in g:
            g.pop("_anchor_pool", None)
            refresh_mode["cross_sm_validation"] = _gate_fields(g)
            RESULT["sanity_ok"] = (RESULT["sanity_ok"] and bool(g["ok"])
                                   if RESULT["sanity_ok"] is not None
                                   else bool(g["ok"]))
        elif g is not None:
            refresh_mode["cross_sm_validation"] = g
    RESULT["conservative_mode"] = refresh_mode

    # ---- 8. L=16 (N=256) operating point -------------------------------
    # Guaranteed mid-budget slot (VERDICT r4 task 3). Its cross-sm gate is
    # phase 12 (dead last — 868 s measured r5, see CACHE-LOAD REALITY).
    l16_mode = None
    if L < 16 and os.environ.get("BENCH_L16", "1") == "1":
        def _l16():
            sps, _, d, a = bench_dqmc(sweeps=2, lattice_L=16, chains=64)
            return {"chains": 64, "chain_sweeps_per_s": round(sps, 3),
                    "drift_max": d["max"], "acceptance": round(a, 4)}
        l16_mode = phase("l16", 700, _l16, est_warm=430)
    RESULT["l16_mode"] = l16_mode  # write-through (see conservative_mode)

    # ---- 9. susceptibility set cost -------------------------------------
    susc = phase("susceptibility", 150,
                 lambda: round(bench_susceptibility(), 4),
                 enabled=os.environ.get("BENCH_SUSC", "1") == "1",
                 est_warm=85)
    RESULT["susceptibility_s_per_measured_sweep"] = susc

    # ---- 10. complex (Peierls) mode + its own cross-sm gate --------------
    cplx_mode = None
    if DTYPE == "float32" and os.environ.get("BENCH_CPLX", "1") == "1":
        def _cplx():
            # ONE shared protocol with the standalone script (same session
            # setup, warmup/host-fetch sync, transfer-safe phase readout)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from benchmarks.complex_bench import run_complex_bench
            return run_complex_bench(chains=N_CHAINS, L=L, beta=BETA,
                                     sweeps=2, safe_mult=CPLX_SM,
                                     use_pallas=USE_PALLAS)
        cplx_mode = phase("complex", 200, _cplx, est_warm=75)
        RESULT["complex_mode"] = cplx_mode  # write-through
        if (isinstance(cplx_mode, dict) and "error" not in cplx_mode
                and VALIDATE
                and os.environ.get("BENCH_CPLX_GATE", "1") == "1"):
            def _cplx_gate():
                import numpy as np
                from montecarlo_tpu.validation import cross_sm_check
                # the SAME pure-gauge pattern the complex throughput phase
                # runs (complex_bench.py): random site phases, complex64.
                # REDUCED candidate protocol (VERDICT r4 task 1c): the full
                # 2-seed/400-sweep candidate pool alone cost 370 s in r4;
                # one seed at half the sweeps fits the driver budget. The
                # anchor keeps the FULL protocol (disk-cached) — asymmetric
                # pools only widen the error bars (see cross_sm_check doc).
                rng = np.random.default_rng(0)
                phis = rng.uniform(0.0, 2 * np.pi, L * L)
                theta = phis[:, None] - phis[None, :]
                return cross_sm_check(L=L, beta=BETA, dtype=DTYPE,
                                      safe_mult=CPLX_SM,
                                      use_pallas=USE_PALLAS, peierls=theta,
                                      cand_seeds=(123,), cand_sweeps=150,
                                      cand_thermalization=50)
            # price the phase on its OWN anchor's cache state, not the
            # global _warm() proxy: with the anchor on disk the phase is
            # candidate-only (~170 s warm); without it, anchor derivation
            # dominates (r4 measured 707 s; 1100 s+ on a fresh box)
            import numpy as _np
            _rng = _np.random.default_rng(0)
            _phis = _rng.uniform(0.0, 2 * _np.pi, L * L)
            _anch_ok = _anchor_cached(L=L, beta=BETA, dtype=DTYPE,
                                      use_pallas=USE_PALLAS,
                                      peierls=_phis[:, None] - _phis[None, :])
            g = phase("gate_complex", 400 if _anch_ok else 1100, _cplx_gate,
                      est_warm=170 if _anch_ok else None)
            if isinstance(g, dict) and "ok" in g:
                g.pop("_anchor_pool", None)
                fields = _gate_fields(g)
                cplx_mode["cross_sm_validation"] = fields
                _gate_cache_write("gate_complex", fields)
            elif g is not None:
                cplx_mode["cross_sm_validation"] = g
            else:  # skipped for budget — fall back to the cached result
                cached = _gate_cache_read("gate_complex")
                if cached is not None:
                    cplx_mode["cross_sm_validation"] = cached
    RESULT["complex_mode"] = cplx_mode

    # ---- 11. strict-f64 validation mode (pinned every round) -------------
    # 128 chains (VERDICT r4 task 1c): the f64 mode is a numerics pin, not a
    # throughput headline — halving the batch halves its 245 s r4 wall.
    # MEASURED r5: chain-sweeps/s is batch-INDEPENDENT at these sizes
    # (76.67 cs/s at 128 chains vs r4's 76.6 at 256 — the serialized
    # emulated-f64 op chain, not VPU throughput, is the wall), so the raw
    # cs/s compares directly against the 256-chain bound with no
    # normalization.
    f64_mode = None
    if DTYPE != "float64" and os.environ.get("BENCH_F64", "1") == "1":
        def _f64():
            sps, _, d, _ = bench_dqmc(dtype="float64", sweeps=1, chains=128)
            return {"sweeps_per_s": round(sps, 3), "chains": 128,
                    "drift_max": d["max"],
                    "bound_sweeps_per_s": F64_BOUND_SWEEPS_PER_S,
                    "regression_ok": bool(
                        sps >= 0.7 * F64_BOUND_SWEEPS_PER_S)}
        f64_mode = phase("f64", 250, _f64, est_warm=220)
    RESULT["f64_mode"] = f64_mode

    # ---- 12. L=16 cross-sm gate: LAST, with cached-result fallback -------
    # Gate protocol: same kernels as shipped (site-major delayed + MXU QR)
    # at the shipped safe_mult vs the sm=1 anchor with the same kernels, at
    # beta=2 (same 10-slice stabilization windows as the headline; full
    # beta=10 at sm=1/N=256 costs ~hours and lives in VALIDATION.md). The
    # anchor pool is disk-cached (derived on-device r5); the candidate's
    # N=256 session programs still cost ~500-870 s to compile OR load (see
    # CACHE-LOAD REALITY), which does not fit the driver budget alongside
    # the full suite. So: run live when the remaining budget covers the
    # measured wall; otherwise attach the most recent completed on-device
    # result from disk, marked {"cached": true, "derived_at": ...} — the
    # throughput row above is always live, only the statistical gate falls
    # back, and its provenance is explicit in the record.
    if (isinstance(l16_mode, dict) and "error" not in l16_mode
            and VALIDATE and DTYPE != "float64"
            and os.environ.get("BENCH_L16_GATE", "1") == "1"):
        gate_beta = float(os.environ.get("BENCH_L16_GATE_BETA", "2.0"))

        def _l16_gate():
            from montecarlo_tpu.validation import (EQUAL_TIME_OBSERVABLES,
                                                   cross_sm_check)
            return cross_sm_check(
                L=16, beta=gate_beta,
                dtype=DTYPE, safe_mult=SAFE_MULT, use_pallas=USE_PALLAS,
                n_chains=32, sweeps=200, thermalization=60,
                observables=EQUAL_TIME_OBSERVABLES)
        from montecarlo_tpu.validation import EQUAL_TIME_OBSERVABLES
        _anch_ok = _anchor_cached(L=16, beta=gate_beta, dtype=DTYPE,
                                  use_pallas=USE_PALLAS, n_chains=32,
                                  sweeps=200, thermalization=60,
                                  observables=EQUAL_TIME_OBSERVABLES)
        g = phase("gate_l16", 950 if _anch_ok else 1900, _l16_gate,
                  est_warm=620 if _anch_ok else None)
        if isinstance(g, dict) and "ok" in g:
            g.pop("_anchor_pool", None)
            fields = _gate_fields(g)
            fields["beta"] = gate_beta
            l16_mode["cross_sm_validation"] = fields
            _gate_cache_write("gate_l16", fields)
        elif g is not None:
            l16_mode["cross_sm_validation"] = g
        else:  # skipped for budget — fall back to the cached result
            cached = _gate_cache_read("gate_l16")
            if cached is not None:
                l16_mode["cross_sm_validation"] = cached
    RESULT["l16_mode"] = l16_mode

    _emit()


if __name__ == "__main__":
    main()
