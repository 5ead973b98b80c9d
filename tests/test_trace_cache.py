"""Trace cache for the jitted batched entry points (core.jitted_vmapped):
equal-config simulations must share one trace; different constants must not
collide (the cache keys on the consts CONTENT, not object identity)."""

import jax
import numpy as np

import montecarlo_tpu as mc
from montecarlo_tpu.dqmc import core


def _sim(U=4.0, seed=2, **kw):
    model = mc.HubbardModelAttractive(dims=2, L=2, U=U, mu=0.0)
    args = dict(beta=1.0, delta_tau=0.1, n_chains=4, seed=seed, sweeps=3,
                thermalization=1)
    args.update(kw)
    return mc.DQMC(model, **args)


def test_equal_config_instances_share_traces():
    a = _sim()
    n0 = len(core._TRACE_CACHE)
    fa = core.jitted_vmapped("sweep_pair", a.ctx, a.consts)
    n1 = len(core._TRACE_CACHE)
    b = _sim(seed=7)  # different seed only — same ctx, bit-equal consts
    fb = core.jitted_vmapped("sweep_pair", b.ctx, b.consts)
    assert len(core._TRACE_CACHE) == n1, "equal config should hit the cache"
    assert fa is fb


def test_different_consts_do_not_collide():
    # default beta/n_chains so the executed traces share the suite's common
    # (L=2, beta=1, nc=4) compile family instead of adding a (beta=0.5, nc=2)
    # one; only U differs — that's the consts-content collision under test
    a = _sim(U=4.0)
    b = _sim(U=2.0)  # different U -> different consts
    fa = core.jitted_vmapped("sweep_pair", a.ctx, a.consts)
    fb = core.jitted_vmapped("sweep_pair", b.ctx, b.consts)
    assert fa is not fb
    sa, Ga, _ = fa(a.state)
    sb, Gb, _ = fb(b.state)
    assert not np.allclose(np.asarray(Ga), np.asarray(Gb))


def test_cached_run_is_bit_identical():
    a = _sim()
    a.run(verbose=False)
    occ_a = mc.occupation(a, a.model)
    b = _sim()  # second instance rides the warm trace cache
    b.run(verbose=False)
    assert np.array_equal(np.asarray(a.state["conf"]),
                          np.asarray(b.state["conf"]))
    assert np.array_equal(np.asarray(a.state["G"]), np.asarray(b.state["G"]))


def test_lru_hit_refreshes_and_clear_empties():
    filled = dict(core._TRACE_CACHE)
    try:
        core._TRACE_CACHE.clear()
        a = _sim()
        fa = core.jitted_vmapped("sweep_pair", a.ctx, a.consts)
        # fill to capacity with fakes; the real entry sits oldest
        for i in range(core._TRACE_CACHE_MAX - 1):
            core._TRACE_CACHE[("fake", i)] = None
        # a hit must move it to the end so the next insert evicts a fake
        assert core.jitted_vmapped("sweep_pair", a.ctx, a.consts) is fa
        core._TRACE_CACHE[("fake", "new")] = None
        assert list(core._TRACE_CACHE)[-2][0] == "sweep_pair"
        core.clear_trace_cache()
        assert len(core._TRACE_CACHE) == 0
    finally:
        core._TRACE_CACHE.clear()
        core._TRACE_CACHE.update(filled)


def test_cache_eviction_bounds_size():
    filled = dict(core._TRACE_CACHE)
    try:
        core._TRACE_CACHE.clear()
        for i in range(core._TRACE_CACHE_MAX + 5):
            core._TRACE_CACHE[("fake", i)] = None
            if len(core._TRACE_CACHE) > core._TRACE_CACHE_MAX:
                core._TRACE_CACHE.pop(next(iter(core._TRACE_CACHE)))
        a = _sim()
        core.jitted_vmapped("init_state", a.ctx, a.consts)
        assert len(core._TRACE_CACHE) <= core._TRACE_CACHE_MAX
    finally:
        core._TRACE_CACHE.clear()
        core._TRACE_CACHE.update(filled)
