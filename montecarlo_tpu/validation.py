"""On-device numerical-mode validation: matched-seed cross-safe_mult checks.

The f32 propagation modes trade per-window drift (reset at every UDT
stabilization) for ~50x throughput. Whether that drift BIASES the Markov
chain cannot be read off the drift monitor alone — the calibrated criterion
is: matched-seed runs at the candidate safe_mult must reproduce the
CORRELATORS of the drift-proof safe_mult=1 runs within statistical errors.
The observable set includes the tau-integrated susceptibilities (CDS, PS):
they drag Green's factors through the LONGEST unstabilized windows of the
unequal-time iterator, so they are the most drift-sensitive quantities the
framework measures (reference accuracy gates for the same iterators:
/root/reference/test/flavortests_DQMC.jl:149-162).

`cross_sm_check` runs the candidate mode and the sm=1 anchor back to back
over >= 2 independent seeds (chains pool across seeds — they are all
independent) and returns per-observable z-scores; `bench.py` gates its
`sanity_ok` on it (VERDICT r1 task 2 + r2 task 1). The check is
parameterized over lattice size, inverse temperature, and Peierls phases
(complex sessions), so the SAME gate covers the headline, g_refresh, L=16,
and complex operating points (VERDICT r3 task 2). When several gates share
one anchor configuration, compute the anchor once with `pooled_run` and
pass it via `anchor_pool=` — the anchor run is the expensive half of each
gate. Reference alarm semantics being calibrated here:
src/flavors/DQMC/stack.jl:530-550 (1e-7 per stabilization in f64).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

DEFAULT_OBSERVABLES = ("occ", "greens", "CDC", "PC", "SDCz", "CDS", "PS")
# equal-time-only subset for operating points where the combined-greens
# iterator is too expensive for an in-bench gate (L=16); still includes the
# full correlator set, just not the tau-integrated susceptibilities
EQUAL_TIME_OBSERVABLES = ("occ", "greens", "CDC", "PC", "SDCz")


def _run_one(model_kwargs, dqmc_kwargs, observables=DEFAULT_OBSERVABLES):
    """One run; returns {obs_key: per-chain-mean array (C, ...)} plus acc and
    drift diagnostics under '_'-prefixed keys."""
    from . import DQMC, HubbardModelAttractive
    from .measurements import dqmc_measurements as dm

    model = HubbardModelAttractive(**model_kwargs)
    mc = DQMC(model, **dqmc_kwargs)
    adders = {
        "CDC": lambda: dm.charge_density_correlation(mc, model),
        "PC": lambda: dm.pairing_correlation(mc, model, K=4),
        "SDCz": lambda: dm.spin_density_correlation(mc, model, "z"),
        # tau-integrated susceptibilities: the longest-window stress test
        "CDS": lambda: dm.charge_density_susceptibility(mc, model),
        "PS": lambda: dm.pairing_susceptibility(mc, model, K=4),
    }
    for key, make in adders.items():
        if key in observables:
            mc.measurements.add(key, make(), mc.n_chains)
    mc.run(verbose=False, chunk=50)
    out = {}
    obs = mc.observables()
    for key in obs:
        for name, res in obs[key].items():
            if hasattr(res, "per_chain_mean"):
                out[f"{key}/{name}"] = np.asarray(res.per_chain_mean)
    out["_acc"] = mc.analysis.acc_rate
    out["_perr_mean"] = mc.analysis.prop_err_mean
    out["_perr_hist"] = list(mc.analysis.prop_err_hist)
    return out


def pooled_run(L: int = 8, beta: float = 10.0, U: float = 4.0,
               mu: float = 0.0, dtype: str = "float32",
               safe_mult: int = 1, n_chains: int = 64, sweeps: int = 300,
               thermalization: int = 100, measure_rate: int = 5,
               seeds: Sequence[int] = (123, 321), use_pallas: bool = False,
               g_refresh: bool = False, peierls=None,
               observables: Sequence[str] = DEFAULT_OBSERVABLES) -> Dict:
    """Run one (dtype, safe_mult, kernel) mode over `seeds` and pool the
    per-chain observable means across seeds (every chain is an independent
    Markov chain, so the cross-chain scatter of len(seeds)*n_chains means is
    an autocorrelation-free standard error).

    The seeds run as ONE batched session (DQMC's sequence-`seed` support
    folds the independent streams into the chain axis with the same RNG
    keys and initial configurations as separate sessions) — one jit program
    + one sweep loop instead of len(seeds), roughly halving gate wall-time
    on an under-saturated chip.
    Returns {obs_key: (len(seeds)*n_chains, ...) array} plus '_'-prefixed
    pooled diagnostics (single-element lists, kept as lists for record-format
    continuity with the per-seed runs of rounds 1-3)."""
    import jax.numpy as jnp

    mk = dict(dims=2, L=L, U=U, mu=mu)
    if peierls is not None:
        mk["peierls"] = peierls
    common = dict(beta=beta, n_chains=n_chains, sweeps=sweeps,
                  thermalization=thermalization, measure_rate=measure_rate,
                  print_rate=10 ** 9, dtype=jnp.dtype(dtype),
                  use_pallas=use_pallas, safe_mult=safe_mult,
                  g_refresh=g_refresh)
    run = _run_one(mk, dict(common, seed=tuple(seeds)),
                   observables=observables)
    return {key: ([val] if key.startswith("_") else val)
            for key, val in run.items()}


def _anchor_cache_path(cfg: Dict) -> str:
    """Deterministic on-disk location for a pooled anchor run. The anchor
    (drift-proof sm=1) is ground truth for a FIXED protocol: same seeds, same
    sweep schedule, same lattice/model/dtype. Re-running it every bench run
    re-derives the identical distribution at ~60% of each gate's cost, so
    pooled anchors persist under MC_TPU_ANCHOR_CACHE (default
    <repo>/.jax_bench_cache/anchors). A stale-but-correct anchor still
    detects candidate bias — and catches regressions in the sm=1 path itself
    (fresh candidate vs known-good anchor fails). Set MC_TPU_ANCHOR_CACHE=""
    to disable. Delete the directory to force re-derivation."""
    import hashlib
    import json as _json
    import os
    base = os.environ.get(
        "MC_TPU_ANCHOR_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_bench_cache", "anchors"))
    if not base:
        return ""
    key = _json.dumps(
        {k: (v.tolist() if isinstance(v, np.ndarray) else
             list(v) if isinstance(v, tuple) else v)
         for k, v in sorted(cfg.items())}, sort_keys=True)
    h = hashlib.sha256(key.encode()).hexdigest()[:16]
    return os.path.join(base, f"anchor_{h}.npz")


def anchor_cache_exists(L: int = 8, beta: float = 10.0, U: float = 4.0,
                        mu: float = 0.0, dtype: str = "float32",
                        anchor_sm: int = 1, n_chains: int = 64,
                        sweeps: int = 300, thermalization: int = 100,
                        measure_rate: int = 5,
                        seeds: Sequence[int] = (123, 321),
                        use_pallas: bool = False, peierls=None,
                        anchor_use_pallas=None,
                        observables: Sequence[str] = DEFAULT_OBSERVABLES,
                        **_candidate_only) -> bool:
    """True when the pooled sm=1 anchor for this `cross_sm_check`
    configuration is already on disk. Lets callers (bench.py) price a gate
    phase honestly: a missing anchor means the gate pays the full anchor
    derivation (the expensive half), which on a fresh machine is the
    difference between a ~3-min and a ~15-min phase. Accepts (and ignores)
    the cand_* overrides so it can be called with a gate's exact kwargs."""
    import os
    cfg = dict(L=L, beta=beta, U=U, mu=mu, dtype=dtype, n_chains=n_chains,
               sweeps=sweeps, thermalization=thermalization,
               measure_rate=measure_rate, seeds=seeds, peierls=peierls,
               observables=observables)
    a_pallas = use_pallas if anchor_use_pallas is None else anchor_use_pallas
    path = _anchor_cache_path(dict(cfg, safe_mult=anchor_sm,
                                   use_pallas=a_pallas, version=1))
    return bool(path) and os.path.exists(path)


def load_or_run_anchor(cfg_for_key: Dict, **pooled_kwargs) -> Dict:
    """pooled_run with a persistent on-disk cache (see _anchor_cache_path)."""
    import os
    path = _anchor_cache_path(cfg_for_key)
    if path and os.path.exists(path):
        with np.load(path, allow_pickle=True) as z:
            out = {k: (z[k].tolist() if k.startswith("_") else z[k])
                   for k in z.files}
        out["_cached"] = True
        return out
    out = pooled_run(**pooled_kwargs)
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez(path, **{k: np.asarray(v, dtype=object)
                          if k.startswith("_") else v
                          for k, v in out.items()})
    return out


def compare_pools(cand: Dict, anch: Dict, alpha: float = 0.01):
    """Per-observable max-|z| between two pooled runs with Bonferroni-scaled
    thresholds; returns (ok, z_by_obs, tol_by_obs). The per-observable cutoff
    accounts for its component count: the max of n standard normals is
    ~sqrt(2 ln n), so a flat cutoff would false-alarm on the 4096-component
    Green's function while being too lax on scalars. The two-sided Bonferroni
    quantile sqrt(2 ln(2 n / alpha)) — ~3.3 for a scalar, ~5.3 at n=4096 —
    still catches the ~5-sigma occupation bias that single-pass bf16 matmuls
    caused in round 1."""
    zs, tols = {}, {}
    ok = True
    for key in cand:
        if key.startswith("_") or key not in anch:
            continue
        pc1, pc2 = cand[key], anch[key]
        m1, e1 = pc1.mean(axis=0), (pc1.std(axis=0, ddof=1)
                                    / np.sqrt(pc1.shape[0]))
        m2, e2 = pc2.mean(axis=0), (pc2.std(axis=0, ddof=1)
                                    / np.sqrt(pc2.shape[0]))
        err = np.sqrt(np.abs(e1) ** 2 + np.abs(e2) ** 2)
        err = np.maximum(err, 1e-12)
        n_comp = int(np.size(m1))
        # DEGENERATE components: when every chain agrees to ≥5 digits the
        # quantity is deterministic for this config up to per-chain rounding
        # (e.g. sign == 1 exactly in a pure-gauge complex session; measured
        # cross-chain SE ~1e-6 from f32 phase accumulation) and a z-test is
        # meaningless — a systematic rounding gap between modes is a huge
        # multiple of the ~0 sampling error (measured: pure-gauge sign
        # z = 37 for an absolute deviation of 4e-5 while every physical
        # observable passed). No physical MC observable converges to 1e-5
        # relative in a few hundred sweeps, so only deterministic
        # quantities qualify. Those components get an ABSOLUTE gate
        # instead: |m1 - m2| < 1e-3 * scale, far below any physically
        # meaningful bias yet far above rounding noise.
        scale = np.maximum(np.maximum(np.abs(m1), np.abs(m2)), 1e-30)
        degen = err < 1e-5 * scale
        zdeg = np.abs(m1 - m2) / (1e-3 * scale)   # <1 == pass, scaled like z
        zstat = np.abs(m1 - m2) / err
        tol = float(np.sqrt(2.0 * np.log(2.0 * n_comp / alpha)))
        # report the max over components of each component's own criterion,
        # normalized so the recorded z is comparable to its recorded tol
        zs[key] = float(np.max(np.where(degen, zdeg * tol, zstat)))
        tols[key] = tol
        ok = ok and zs[key] < tols[key]
    return bool(ok), zs, tols


def cross_sm_check(L: int = 8, beta: float = 10.0, U: float = 4.0,
                   mu: float = 0.0, dtype: str = "float32",
                   safe_mult: int = 10, anchor_sm: int = 1,
                   n_chains: int = 64, sweeps: int = 300,
                   thermalization: int = 100, measure_rate: int = 5,
                   seeds: Sequence[int] = (123, 321),
                   alpha: float = 0.01, use_pallas: bool = False,
                   g_refresh: bool = False, peierls=None,
                   anchor_pool: Optional[Dict] = None,
                   anchor_use_pallas: Optional[bool] = None,
                   observables: Sequence[str] = DEFAULT_OBSERVABLES,
                   cand_sweeps: Optional[int] = None,
                   cand_thermalization: Optional[int] = None,
                   cand_seeds: Optional[Sequence[int]] = None,
                   cand_n_chains: Optional[int] = None) -> Dict:
    """Matched-seed comparison of the candidate (dtype, safe_mult, kernels)
    mode against the drift-proof anchor (same dtype, safe_mult=anchor_sm),
    pooled over multiple independent seeds.

    `anchor_pool`: a precomputed `pooled_run` result for the anchor mode —
    pass it when several gates share one anchor so the expensive sm=1 run
    happens once (VERDICT r3 weak #2). `anchor_use_pallas` lets the anchor
    run a different kernel path than the candidate (e.g. candidate = Pallas
    site-major + MXU QR, anchor = plain XLA), turning the gate into a joint
    kernel-rounding + drift check.

    `cand_*`: optional CANDIDATE-protocol overrides (fewer sweeps / seeds /
    chains) that leave the anchor protocol — and therefore its on-disk cache
    key — untouched. The z-test stays valid with asymmetric pools (each
    pool's standard error is computed from its own chain scatter and the two
    add in quadrature); a smaller candidate pool only WIDENS the error bars,
    i.e. it can cost sensitivity but never produces a false alarm. Used by
    bench.py's gate_complex to fit the driver's observed ~30-min kill budget
    (VERDICT r4 task 1c) while keeping the full-protocol anchor as ground
    truth.

    Returns {"ok": bool, "z": {obs: max z-score}, per-observable
    Bonferroni-scaled thresholds, acc + drift stats, "_anchor_pool": the
    anchor pool for reuse (strip '_'-keys before serializing)}.
    """
    cfg = dict(L=L, beta=beta, U=U, mu=mu, dtype=dtype, n_chains=n_chains,
               sweeps=sweeps, thermalization=thermalization,
               measure_rate=measure_rate, seeds=seeds, peierls=peierls,
               observables=observables)
    cand_cfg = dict(cfg)
    for k, v in (("sweeps", cand_sweeps),
                 ("thermalization", cand_thermalization),
                 ("seeds", cand_seeds), ("n_chains", cand_n_chains)):
        if v is not None:
            cand_cfg[k] = v
    cand = pooled_run(safe_mult=safe_mult, use_pallas=use_pallas,
                      g_refresh=g_refresh, **cand_cfg)
    anch = anchor_pool
    if anch is None:
        a_pallas = use_pallas if anchor_use_pallas is None else anchor_use_pallas
        anch = load_or_run_anchor(
            dict(cfg, safe_mult=anchor_sm, use_pallas=a_pallas, version=1),
            safe_mult=anchor_sm, use_pallas=a_pallas, **cfg)
    ok, zs, tols = compare_pools(cand, anch, alpha=alpha)
    return {
        "ok": ok,
        "seeds": list(seeds),
        "anchor_cached": bool(anch.get("_cached", False)),
        "z": zs,
        "z_tol": tols,
        "candidate": {"safe_mult": safe_mult, "g_refresh": bool(g_refresh),
                      "sweeps": cand_cfg["sweeps"],
                      "seeds": list(cand_cfg["seeds"]),
                      "n_chains": cand_cfg["n_chains"],
                      "acc": cand["_acc"],
                      "perr_mean": cand["_perr_mean"],
                      "perr_hist": cand["_perr_hist"]},
        "anchor": {"safe_mult": anchor_sm, "acc": anch["_acc"],
                   "perr_mean": anch["_perr_mean"]},
        "_anchor_pool": anch,
    }
