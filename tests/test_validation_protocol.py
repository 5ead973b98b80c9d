"""Protocol tests for the cross-safe_mult gate machinery
(montecarlo_tpu/validation.py) — pure numpy, no simulation.

The gate itself runs on device in bench.py; these tests pin the COMPARISON
semantics: Bonferroni-scaled z-tests for statistical components, absolute
gates for degenerate (deterministic) components such as the sign of a
pure-gauge complex session.
"""

import numpy as np

from montecarlo_tpu.validation import compare_pools


def _pool(mean, se, n=64, ncomp=1, seed=0):
    """Per-chain sample pool with the requested mean / standard error."""
    rng = np.random.default_rng(seed)
    return mean + rng.standard_normal((n, ncomp)) * se * np.sqrt(n)


def test_statistical_pass_and_fail():
    ok, zs, tols = compare_pools(
        {"occ": _pool(0.5, 1e-3, seed=1)}, {"occ": _pool(0.5, 1e-3, seed=2)})
    assert ok and zs["occ"] < tols["occ"]
    # a 20-sigma bias must fail
    ok, zs, _ = compare_pools(
        {"occ": _pool(0.5 + 20 * np.sqrt(2) * 1e-3, 1e-3, seed=1)},
        {"occ": _pool(0.5, 1e-3, seed=2)})
    assert not ok and zs["occ"] > 10


def test_degenerate_component_absolute_gate():
    """A deterministic component (all chains identical) with a rounding-level
    difference between modes must PASS (z-testing it is meaningless: the
    sampling error is ~0), while a large absolute deviation must FAIL."""
    a = {"sign": np.full((64, 1), 1.0)}
    b = {"sign": np.full((64, 1), 1.0 - 4e-5)}   # pure-gauge f32 rounding gap
    ok, zs, tols = compare_pools(a, b)
    assert ok, (zs, tols)
    c = {"sign": np.full((64, 1), 0.99)}          # 1% sign bias: reject
    ok, zs, tols = compare_pools(a, c)
    assert not ok
    # measured r4 device case: per-chain rounding spread SE ~1.2e-6 around a
    # systematic 4.4e-5 mode gap — degenerate handling must apply (z-test
    # would read 37) and pass on the absolute criterion
    rng = np.random.default_rng(7)
    a = {"sign": 1.0 + rng.standard_normal((64, 1)) * 1.2e-6 * 8}
    b = {"sign": (1.0 - 4.4e-5) + rng.standard_normal((64, 1)) * 1.2e-6 * 8}
    ok, zs, tols = compare_pools(a, b)
    assert ok, (zs, tols)


def test_bonferroni_scales_with_components():
    a = {"G": _pool(0.1, 1e-3, ncomp=4096, seed=3)}
    b = {"G": _pool(0.1, 1e-3, ncomp=4096, seed=4)}
    ok, zs, tols = compare_pools(a, b)
    assert ok
    assert tols["G"] > 5.0  # ~sqrt(2 ln(2*4096/0.01)) ≈ 5.2
    _, _, tols1 = compare_pools({"occ": _pool(0.5, 1e-3, seed=5)},
                                {"occ": _pool(0.5, 1e-3, seed=6)})
    assert tols1["occ"] < tols["G"]


def test_anchor_cache_exists_key_roundtrip(tmp_path, monkeypatch):
    """anchor_cache_exists must reconstruct exactly the cfg key that
    load_or_run_anchor writes under — a drifted default would silently
    misprice every bench gate phase (fresh-box budget overrun, round 5)."""
    import numpy as _np

    from montecarlo_tpu import validation as v

    monkeypatch.setenv("MC_TPU_ANCHOR_CACHE", str(tmp_path))
    theta = _np.arange(4.0).reshape(2, 2)
    kwargs = dict(L=2, beta=0.5, dtype="float32", use_pallas=False,
                  n_chains=3, sweeps=4, thermalization=2, peierls=theta,
                  observables=("occ",))
    assert not v.anchor_cache_exists(**kwargs)
    # write a dummy record at the path cross_sm_check would use
    cfg = dict(L=2, beta=0.5, U=4.0, mu=0.0, dtype="float32", n_chains=3,
               sweeps=4, thermalization=2, measure_rate=5, seeds=(123, 321),
               peierls=theta, observables=("occ",))
    path = v._anchor_cache_path(dict(cfg, safe_mult=1, use_pallas=False,
                                     version=1))
    _np.savez(path, dummy=_np.zeros(1))
    assert v.anchor_cache_exists(**kwargs)
    # candidate-only overrides must not change the anchor key
    assert v.anchor_cache_exists(cand_seeds=(1,), cand_sweeps=2, **kwargs)
    # a differing anchor-protocol field must miss
    assert not v.anchor_cache_exists(**{**kwargs, "n_chains": 5})
