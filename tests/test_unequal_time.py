"""Time-displaced Green's function tests
(modeled on reference test/flavortests_DQMC.jl:74-162).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu import HubbardModelAttractive, HubbardModelRepulsive
from montecarlo_tpu.dqmc import core, unequal_time as ut
from montecarlo_tpu.dqmc.parameters import DQMCParameters


def _setup(model_cls=HubbardModelAttractive, L=2, beta=1.0, U=4.0, mu=0.5,
           seed=3, **kw):
    if model_cls is HubbardModelAttractive:
        model = model_cls(dims=2, L=L, U=U, mu=mu)
    else:
        model = model_cls(dims=2, L=L, U=U)
    params = DQMCParameters(beta=beta, **kw)
    ctx, consts = core.make_context(model, params)
    key = jax.random.PRNGKey(seed)
    conf = model.rand_conf(key, 1, params.slices)[0]
    return model, params, ctx, consts, conf


def _naive_B(ctx, consts, conf, l):
    """Dense 0-based slice matrix B_l per flavor (numpy)."""
    eT2 = np.asarray(consts["eT2"])
    eV = np.asarray(core.eV_diag(ctx, conf[:, l]))
    return np.stack([eT2 * eV[f][None, :] for f in range(ctx.F)])


def _naive_greens_kl(ctx, consts, conf, k, l):
    """Direct dense formula (valid only for small beta)."""
    F, N, M = ctx.F, ctx.N, ctx.M
    Bs = [_naive_B(ctx, consts, conf, j) for j in range(M)]
    out = np.zeros((F, N, N))
    for f in range(F):
        def prod(lo, hi):  # B_{hi-1} ... B_{lo}
            P = np.eye(N)
            for j in range(lo, hi):
                P = Bs[j][f] @ P
            return P
        full_lo = prod(0, l)   # B_{l-1}..B_0
        full_hi = prod(l, M)   # B_{M-1}..B_l
        if k >= l:
            mid = prod(l, k)   # B_{k-1}..B_l
            G = mid @ np.linalg.inv(np.eye(N) + full_lo @ full_hi)
        else:
            # G(k<l) = -B_{k-1}..B_0 · B_{M-1}..B_l · [I + Q_l]^{-1}
            C = prod(0, k) @ prod(l, M)
            G = -C @ np.linalg.inv(np.eye(N) + full_lo @ full_hi)
        out[f] = G
    return out


@pytest.mark.parametrize("k,l", [(0, 0), (3, 0), (7, 2), (10, 10), (5, 5),
                                 (0, 4), (2, 9), (0, 10)])
def test_greens_kl_vs_naive(k, l):
    """G(k,l) against the direct dense formula at small beta
    (G(k≥l) = B_{k-1}..B_l [1 + B(l,0)B(M,l)]^{-1};
     G(k<l) = -[1+B(l.. )]^{-1} (B_{l-1}..B_k)^{-1} B(l,0)B(M,l) — equivalent
     standard identities)."""
    model, params, ctx, consts, conf = _setup(beta=1.0)
    G = np.asarray(ut.greens_kl(ctx, consts, conf, k, l))
    G_naive = _naive_greens_kl(ctx, consts, conf, k, l)
    assert np.max(np.abs(G - G_naive)) < 1e-8


def test_gll_matches_equal_time():
    """G(l,l) from the unequal-time path equals the equal-time stack result
    (reference gate < 1e-14, flavortests_DQMC.jl:107-111)."""
    model, params, ctx, consts, conf = _setup(beta=5.0, U=4.0)
    for l in (0, 7, 25, 50):
        G_ut = np.asarray(ut.greens_kl(ctx, consts, conf, l, l))
        G_et = np.asarray(core.greens_from_scratch(ctx, consts, conf, l))
        assert np.max(np.abs(G_ut - G_et)) < 1e-11, f"l={l}"


def test_anti_periodicity():
    """G(t, 0) + G(t, beta) = 0 — anti-periodicity in the second time argument
    (reference gate < 1e-13, flavortests_DQMC.jl:113-119)."""
    model, params, ctx, consts, conf = _setup(beta=5.0, U=4.0,
                                              model_cls=HubbardModelAttractive)
    M = ctx.M
    for k in (0, 3, 17, 30, 44):
        Gk0 = np.asarray(ut.greens_kl(ctx, consts, conf, k, 0))
        GkM = np.asarray(ut.greens_kl(ctx, consts, conf, k, M))
        assert np.max(np.abs(Gk0 + GkM)) < 1e-11, f"k={k}"


@pytest.mark.parametrize("recalc_mult,tol", [(1, 1e-10), (2, 1e-6)])
def test_combined_iterator_accuracy_strong_coupling(recalc_mult, tol):
    """CombinedGreensIterator self-check vs direct greens_kl at STRONG
    coupling (U=4), where the Gll similarity advance amplifies factor errors
    ~2-3x per slice — the default recalculate=safe_mult tier must stay at
    ~1e-12 (reference accuracy(it) semantics, unequal_time_stack.jl:885-889).
    beta=5 so the config shares test_gll_matches_equal_time's compile family
    (the fast tier's wall time is distinct jit families, not physics)."""
    model, params, ctx, consts, conf = _setup(beta=5.0, U=4.0)
    G00 = core.greens_from_scratch(ctx, consts, conf, 0)
    err = ut.combined_accuracy(ctx, consts, conf, G00,
                               recalculate=recalc_mult * ctx.sm)
    assert float(err) < tol


@pytest.mark.slow
def test_iterator_reference_gate_config():
    """The reference's own iterator gate: 6-site chain, U=1, beta=15,
    safe_mult=5 — CombinedGreensIterator and GreensIterator at
    recalculate=4*safe_mult must be < 1e-10 / 1e-11, at safe_mult < 1e-13
    (reference test/flavortests_DQMC.jl:127-162)."""
    model = HubbardModelAttractive(dims=1, L=6, U=1.0, mu=0.0)
    params = DQMCParameters(beta=15.0, safe_mult=5)
    ctx, consts = core.make_context(model, params)
    conf = model.rand_conf(jax.random.PRNGKey(3), 1, params.slices)[0]
    G00 = core.greens_from_scratch(ctx, consts, conf, 0)
    assert float(ut.combined_accuracy(ctx, consts, conf, G00,
                                      recalculate=ctx.sm)) < 1e-13
    assert float(ut.combined_accuracy(ctx, consts, conf, G00,
                                      recalculate=4 * ctx.sm)) < 1e-10
    assert float(ut.greens_range_accuracy(ctx, consts, conf, 0,
                                          recalculate=ctx.sm)) < 1e-13
    assert float(ut.greens_range_accuracy(ctx, consts, conf, 0,
                                          recalculate=4 * ctx.sm)) < 1e-11


@pytest.mark.parametrize("l", [0, 7, 10])
def test_greens_range_iterator(l):
    """General GreensIterator: all G(k, l) for k = l..M at arbitrary l
    (reference GreensIterator{:, l}, unequal_time_stack.jl:644-726 — the
    reference only supports ls=0; arbitrary l is an extension). beta=5
    shares the test_gll_matches_equal_time compile family."""
    model, params, ctx, consts, conf = _setup(beta=5.0, U=4.0)
    err = ut.greens_range_accuracy(ctx, consts, conf, l,
                                   recalculate=ctx.sm)
    assert float(err) < 1e-10, f"l={l}: {float(err)}"


def test_combined_iterator_yields_all_M():
    """The scan-based iterator must call step_fn exactly M times (one per
    l = 1..M), checked by counting through the accumulator. Default setup
    (beta=1) shares test_greens_kl_vs_naive's compile family."""
    model, params, ctx, consts, conf = _setup()
    G00 = core.greens_from_scratch(ctx, consts, conf, 0)

    def step(acc, G0l, Gl0, Gll):
        return acc + 1

    n = ut.combined_greens_apply(ctx, consts, conf, G00,
                                 jnp.zeros((), jnp.int32), step)
    assert int(n) == ctx.M
    # verify_combined (the boolean accuracy API) re-runs the iterator, so it
    # is exercised HERE on the cheap beta=1 family instead of inside the
    # strong-coupling test, where the re-run doubled a 27 s test
    assert ut.verify_combined(ctx, consts, conf, G00, maxerror=1e-10,
                              recalculate=ctx.sm)


def test_public_greens_kl_api():
    """sim.greens(k, l) — the public time-displaced accessor (reference:
    greens(mc, k, l), unequal_time_stack.jl:271-304) — returns the PHYSICAL
    (unwrapped) G(kΔτ ← lΔτ): G(l, l) matches the equal-time sim.greens(l),
    and anti-periodicity G(k,0) = -G(k,M) holds through the public API."""
    import montecarlo_tpu as mc
    model = HubbardModelAttractive(dims=2, L=2, U=4.0, mu=0.5)
    sim = mc.DQMC(model, beta=2.0, n_chains=2, seed=5, sweeps=2,
                  thermalization=1)
    sim.run(verbose=False)
    M = sim.ctx.M
    for l in (0, 7):
        Gll = np.asarray(sim.greens(l, l))
        Get = np.asarray(sim.greens(l))
        assert np.max(np.abs(Gll - Get)) < 1e-11, f"l={l}"
    # one k suffices: each distinct (k, l) pair is a fresh trace+compile
    # (k/l are static in greens_kl's scan bounds) — k=11 added 2 compiles
    # (~8 s of this test) without new coverage beyond k=3
    k = 3
    Gk0 = np.asarray(sim.greens(k, 0))
    GkM = np.asarray(sim.greens(k, M))
    assert np.max(np.abs(Gk0 + GkM)) < 1e-11, f"k={k}"
