"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): DQMC sweeps/sec on 8x8 attractive Hubbard, beta=10,
256 chains. One sweep = a full [down;up] pass over all 100 imaginary-time
slices (2*M*N = 12,800 Metropolis site updates + UDT-stabilized propagation),
matching the reference's sweep definition (run! loop, DQMC.jl:420-436).
A secondary Ising spin-flips/sec metric (8x8, 256 chains) is included as an
extra field.

Sanity: `sanity_ok` is a CALIBRATED per-mode criterion (VERDICT r1 task 2),
not an acceptance band. For f32 modes it is an on-device matched-seed
cross-safe_mult validation (montecarlo_tpu.validation.cross_sm_check), pooled
over two independent seeds: the candidate mode must reproduce occupation AND
the correlators (CDC, PC, SDCz) AND the tau-integrated susceptibilities
(CDS, PS — the longest-unstabilized-window stress test) of the drift-proof
safe_mult=1 anchor within Bonferroni-scaled standard-error bounds.
For f64 the criterion is the reference's drift alarm (max window-end drift
< 1e-6; reference threshold 1e-7 per stabilization, stack.jl:530-550).
Window-end drift quantile diagnostics (mean + exceedance histogram over
core.PROP_ERR_EDGES) are reported alongside. Set BENCH_VALIDATE=0 to skip
the ~3 min cross-sm run (sanity_ok is then null, not true).

vs_baseline: the reference (ffreyer/MonteCarlo.jl) publishes no numbers and
Julia is not available in this image; the baseline is an estimate of the
reference's single-core CPU throughput for this config: ~0.6 GFLOP/sweep of
small-matrix f64 work at ~12 GFLOP/s effective (LoopVectorization @avx on
64x64 kernels) ≈ 20 sweeps/sec. Recorded as BASELINE_EST_SWEEPS_PER_S.
"""

import json
import os
import sys
import time
from functools import partial


def _progress(msg):
    """Phase progress on stderr (stdout stays the single JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

BASELINE_EST_SWEEPS_PER_S = 20.0

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
# default ON: the fused chain-batched Pallas site sweep measured 2154
# sweeps/s vs 1373 for the XLA path at the headline config (v5e, f32,
# sm=10), physics-validated on device (occ unbiased at 8x8 + the cross-sm
# gate below). BENCH_PALLAS=0 selects the plain XLA hot path.
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"
VALIDATE = os.environ.get("BENCH_VALIDATE", "1") == "1"


def bench_dqmc(safe_mult=SAFE_MULT, g_refresh=False, dtype=None,
               sweeps=SWEEPS, lattice_L=None, chains=None):
    from montecarlo_tpu import HubbardModelAttractive
    from montecarlo_tpu.dqmc import core
    from montecarlo_tpu.dqmc.parameters import DQMCParameters

    L_cur = lattice_L or L
    n_chains = chains or N_CHAINS
    model = HubbardModelAttractive(dims=2, L=L_cur, U=4.0, mu=0.0)
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


def _backend_watchdog():
    """The tunneled TPU backend blocks INDEFINITELY in init while the device
    pool is unavailable (observed: >2 h during round 3). Rather than hang the
    driver and record nothing, probe device init on a daemon thread and emit
    a diagnostic JSON line if it does not complete within
    BENCH_INIT_TIMEOUT_S (default 900 s)."""
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
    timeout = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))
    _progress(f"waiting for backend init (up to {timeout:.0f}s)")
    t.join(timeout)
    if not ok.is_set():
        if err_box:  # init FAILED fast — report the real exception,
            msg = f"backend init raised: {err_box[0]}"  # not a fake timeout
        else:
            msg = (f"backend init did not complete within {timeout:.0f}s "
                   "— TPU pool unavailable")
        # flush=True: os._exit bypasses the stdio flush, and a block-buffered
        # pipe would otherwise swallow the only record of this run
        print(json.dumps({
            "metric": f"DQMC sweeps/sec ({L}x{L} Hubbard, beta={BETA}, "
                      f"{N_CHAINS} chains)",
            "value": None,
            "unit": "sweeps/s",
            "vs_baseline": None,
            "error": msg,
        }), flush=True)
        os._exit(0)


def main():
    _backend_watchdog()
    _progress("headline dqmc")
    sweeps_per_s, s_per_sweep, drift, acc = bench_dqmc()
    # drift-proof conservative mode (f32 + safe_mult=1): the anchor whose
    # window-end drift matches reference-grade stabilization; reported every
    # round alongside the headline (VERDICT r2 task 2)
    sm1_sweeps_per_s = None
    if SAFE_MULT != 1 and os.environ.get("BENCH_SM1", "1") == "1":
        try:
            _progress("sm=1 anchor mode")
            sm1_sweeps_per_s, _, _, _ = bench_dqmc(safe_mult=1)
        except Exception:  # pragma: no cover
            sm1_sweeps_per_s = None
    # g_refresh conservative mode (VERDICT r2 task 2): per-slice exact G
    # recomputation from deferred factor windows — wrap-free propagation at
    # ~1.4x the sm=1 anchor's speed. Validated by its own cross-sm gate below.
    refresh_mode = None
    REFRESH_SM = int(os.environ.get("BENCH_REFRESH_SM", "5"))
    if os.environ.get("BENCH_REFRESH", "1") == "1":
        try:
            _progress("g_refresh conservative mode")
            r_sps, _, r_drift, _ = bench_dqmc(safe_mult=REFRESH_SM,
                                              g_refresh=True)
            refresh_mode = {"kind": "g_refresh", "safe_mult": REFRESH_SM,
                            "sweeps_per_s": round(r_sps, 3),
                            "vs_baseline": round(
                                r_sps / BASELINE_EST_SWEEPS_PER_S, 3),
                            "propagation_drift": r_drift}
        except Exception as err:  # pragma: no cover
            refresh_mode = {"error": repr(err)}
    # strict-f64 validation mode: measured every round so regressions are
    # visible (VERDICT r2 task 8 — documented position: f64 on TPU is the
    # validation-only mode, bounded by QR under double-float emulation)
    f64_mode = None
    if DTYPE != "float64" and os.environ.get("BENCH_F64", "1") == "1":
        try:
            _progress("strict-f64 mode")
            f_sps, _, f_drift, _ = bench_dqmc(dtype="float64", sweeps=2)
            f64_mode = {"sweeps_per_s": round(f_sps, 3),
                        "drift_max": f_drift["max"]}
        except Exception as err:  # pragma: no cover
            f64_mode = {"error": repr(err)}
    # L=16 (N=256) operating point: exercises the site-major Pallas kernel
    # (chains on sublanes) past the N=128 chain-on-lanes cap — measured every
    # round so the large-lattice scaling story is in the bench record
    # (VERDICT r2 task 4). 64 chains matches the ROADMAP L=16 comparison row.
    l16_mode = None
    if L < 16 and os.environ.get("BENCH_L16", "1") == "1":
        try:
            _progress("L=16 site-major mode")
            l_sps, _, l_drift, l_acc = bench_dqmc(sweeps=2, lattice_L=16,
                                                  chains=64)
            l16_mode = {"chains": 64, "chain_sweeps_per_s": round(l_sps, 3),
                        "drift_max": l_drift["max"],
                        "acceptance": round(l_acc, 4)}
        except Exception as err:  # pragma: no cover
            l16_mode = {"error": repr(err)}
    # complex-hopping (Peierls) mode at the headline config: pure-gauge
    # complex64 session — exercises the two-plane fused site-sweep + QR
    # kernels; mean phase must stay 1 (pure gauge). BENCH_CPLX=0 opts out.
    cplx_mode = None
    if DTYPE == "float32" and os.environ.get("BENCH_CPLX", "1") == "1":
        try:
            _progress("complex (Peierls) mode")
            # ONE shared protocol with the standalone script (same session
            # setup, warmup/host-fetch sync, transfer-safe phase readout)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from benchmarks.complex_bench import run_complex_bench
            cplx_mode = run_complex_bench(chains=N_CHAINS, L=L, beta=BETA,
                                          sweeps=2, safe_mult=SAFE_MULT,
                                          use_pallas=USE_PALLAS)
        except Exception as err:  # pragma: no cover
            cplx_mode = {"error": repr(err)}
    try:
        _progress("ising")
        ising_flips = bench_ising()
    except Exception:
        ising_flips = None
    # full susceptibility set cost — measured EVERY round (VERDICT r2 task 3);
    # BENCH_SUSC=0 opts out
    susc_s = None
    if os.environ.get("BENCH_SUSC", "1") == "1":
        try:
            _progress("susceptibility set")
            susc_s = round(bench_susceptibility(), 4)
        except Exception:  # pragma: no cover
            susc_s = None

    sanity = None
    cross_sm = None
    if DTYPE == "float64":
        sanity = drift["max"] < 1e-6 and 0.3 < acc < 0.95
    elif VALIDATE:
        from montecarlo_tpu.validation import cross_sm_check
        try:
            _progress("cross-sm gate (headline mode)")
            cross_sm = cross_sm_check(L=L, beta=BETA, dtype=DTYPE,
                                      safe_mult=SAFE_MULT,
                                      use_pallas=USE_PALLAS)
            sanity = bool(cross_sm["ok"]) and 0.3 < acc < 0.95
        except Exception as err:  # pragma: no cover
            cross_sm = {"error": repr(err)}
            sanity = False
        if refresh_mode is not None and "error" not in refresh_mode:
            try:
                _progress("cross-sm gate (g_refresh mode)")
                rgate = cross_sm_check(L=L, beta=BETA, dtype=DTYPE,
                                       safe_mult=REFRESH_SM, g_refresh=True,
                                       use_pallas=USE_PALLAS)
                refresh_mode["cross_sm_validation"] = {
                    k: rgate[k] for k in ("ok", "seeds", "z", "z_tol",
                                          "candidate", "anchor")}
                sanity = sanity and bool(rgate["ok"])
            except Exception as err:  # pragma: no cover
                refresh_mode["cross_sm_validation"] = {"error": repr(err)}
    print(json.dumps({
        "metric": f"DQMC sweeps/sec ({L}x{L} Hubbard, beta={BETA}, "
                  f"{N_CHAINS} chains)",
        "value": round(sweeps_per_s, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / BASELINE_EST_SWEEPS_PER_S, 3),
        "dtype": DTYPE,
        "safe_mult": SAFE_MULT,
        "use_pallas": USE_PALLAS,
        "chains": N_CHAINS,
        "s_per_batched_sweep": round(s_per_sweep, 3),
        # drift-proof f32+sm=1 conservative mode (reference-grade window
        # drift); target: >= 1000 sweeps/s = 50x the baseline estimate
        "sm1_sweeps_per_s": (None if sm1_sweeps_per_s is None
                             else round(sm1_sweeps_per_s, 3)),
        # wrap-free per-slice-recompute conservative mode (g_refresh):
        # >= 1000 sweeps/s with near-anchor drift
        "conservative_mode": refresh_mode,
        # strict-f64 (validation-only on TPU): pinned so regressions show
        "f64_mode": f64_mode,
        # L=16 / N=256 large-lattice point (site-major Pallas kernel)
        "l16_mode": l16_mode,
        # complex-hopping (Peierls) point: two-plane fused kernels
        "complex_mode": cplx_mode,
        "propagation_drift": drift,
        "acceptance": round(acc, 4),
        "sanity_ok": sanity,
        "cross_sm_validation": ({k: cross_sm[k] for k in
                                 ("ok", "seeds", "z", "z_tol", "candidate",
                                  "anchor")
                                 if k in cross_sm}
                                if isinstance(cross_sm, dict) else None),
        "ising_spin_flips_per_s": None if ising_flips is None else round(ising_flips),
        # seconds per measured sweep with the full susceptibility set
        # (CDS+PS+SDSz+CCS every sweep, public API); default-on
        "susceptibility_s_per_measured_sweep": susc_s,
        "baseline_estimate_note": "reference CPU single-core estimate, "
                                  "20 sweeps/s (no published numbers); "
                                  "measured in-image anchor: 3.96 sweeps/s "
                                  "for a single-chain numpy/BLAS f64 "
                                  "implementation of the same hot loop "
                                  "(benchmarks/cpu_reference.py; simplified "
                                  "stabilization, i.e. optimistic) — the "
                                  "20/s estimate stays as a conservative "
                                  "bound for the reference's @avx Julia",
    }))


if __name__ == "__main__":
    main()
