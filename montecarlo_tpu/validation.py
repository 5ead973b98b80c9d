"""On-device numerical-mode validation: matched-seed cross-safe_mult checks.

The f32 propagation modes trade per-window drift (reset at every UDT
stabilization) for ~50x throughput. Whether that drift BIASES the Markov
chain cannot be read off the drift monitor alone — the calibrated criterion
is: a matched-seed run at the candidate safe_mult must reproduce the
CORRELATORS (not just the occupation, the least drift-sensitive observable)
of the drift-proof safe_mult=1 run within statistical errors.

`cross_sm_check` runs the candidate mode and the sm=1 anchor back to back
and returns per-observable z-scores; `bench.py` gates its `sanity_ok` on it
(VERDICT r1 task 2). Reference alarm semantics being calibrated here:
src/flavors/DQMC/stack.jl:530-550 (1e-7 per stabilization in f64).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _run_one(model_kwargs, dqmc_kwargs, observables=("occ", "CDC", "PC", "SDCz")):
    import jax.numpy as jnp

    from . import DQMC, HubbardModelAttractive
    from .measurements import dqmc_measurements as dm

    model = HubbardModelAttractive(**model_kwargs)
    mc = DQMC(model, **dqmc_kwargs)
    if "CDC" in observables:
        mc.measurements.add("CDC", dm.charge_density_correlation(mc, model),
                            mc.n_chains)
    if "PC" in observables:
        mc.measurements.add("PC", dm.pairing_correlation(mc, model, K=4),
                            mc.n_chains)
    if "SDCz" in observables:
        mc.measurements.add("SDCz", dm.spin_density_correlation(mc, model, "z"),
                            mc.n_chains)
    mc.run(verbose=False, chunk=50)
    out = {}
    obs = mc.observables()
    for key in obs:
        for name, res in obs[key].items():
            if hasattr(res, "per_chain_mean"):
                # cross-chain statistics: chains are INDEPENDENT, so the
                # empirical scatter of per-chain means gives an
                # autocorrelation-free standard error of the pooled mean
                pc = np.asarray(res.per_chain_mean)
                C = pc.shape[0]
                out[f"{key}/{name}"] = (pc.mean(axis=0),
                                        pc.std(axis=0, ddof=1) / np.sqrt(C))
    out["_acc"] = mc.analysis.acc_rate
    out["_perr_mean"] = mc.analysis.prop_err_mean
    out["_perr_hist"] = list(mc.analysis.prop_err_hist)
    return out


def cross_sm_check(L: int = 8, beta: float = 10.0, U: float = 4.0,
                   mu: float = 0.0, dtype: str = "float32",
                   safe_mult: int = 10, anchor_sm: int = 1,
                   n_chains: int = 64, sweeps: int = 300,
                   thermalization: int = 100, seed: int = 123,
                   alpha: float = 0.01, use_pallas: bool = False) -> Dict:
    """Matched-seed comparison of the candidate (dtype, safe_mult) mode
    against the drift-proof anchor (same dtype, safe_mult=anchor_sm).

    Returns {"ok": bool, "z": {obs: max z-score}, per-observable
    Bonferroni-scaled thresholds, acc + drift stats}. Standard errors are
    the empirical cross-chain scatter (chains are independent, so no
    autocorrelation correction is needed), and each observable's alarm
    threshold accounts for its number of components: the max of n standard
    normals is ~sqrt(2 ln n), so a flat cutoff would false-alarm on the
    4096-component Green's function while being too lax on scalars. The
    per-observable cutoff is the two-sided Bonferroni quantile
    sqrt(2 ln(2 n / alpha)) — ~3.3 for a scalar, ~5.3 at n=4096 —
    which still catches the ~5-sigma occupation bias that single-pass
    bf16 matmuls caused in round 1.
    """
    import jax.numpy as jnp

    mk = dict(dims=2, L=L, U=U, mu=mu)
    common = dict(beta=beta, n_chains=n_chains, seed=seed, sweeps=sweeps,
                  thermalization=thermalization, measure_rate=5,
                  print_rate=10 ** 9, dtype=jnp.dtype(dtype),
                  use_pallas=use_pallas)
    cand = _run_one(mk, dict(common, safe_mult=safe_mult))
    anch = _run_one(mk, dict(common, safe_mult=anchor_sm))
    zs, tols = {}, {}
    ok = True
    for key in cand:
        if key.startswith("_"):
            continue
        m1, e1 = cand[key]
        m2, e2 = anch[key]
        err = np.sqrt(e1 ** 2 + e2 ** 2)
        err = np.maximum(err, 1e-12)
        n_comp = int(np.size(m1))
        zs[key] = float(np.max(np.abs(m1 - m2) / err))
        tols[key] = float(np.sqrt(2.0 * np.log(2.0 * n_comp / alpha)))
        ok = ok and zs[key] < tols[key]
    return {
        "ok": bool(ok),
        "z": zs,
        "z_tol": tols,
        "candidate": {"safe_mult": safe_mult, "acc": cand["_acc"],
                      "perr_mean": cand["_perr_mean"],
                      "perr_hist": cand["_perr_hist"]},
        "anchor": {"safe_mult": anchor_sm, "acc": anch["_acc"],
                   "perr_mean": anch["_perr_mean"]},
    }
