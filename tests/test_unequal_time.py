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


@pytest.mark.parametrize("recalc_mult,tol", [(1, 1e-10), (2, 1e-4)])
def test_combined_iterator_accuracy(recalc_mult, tol):
    """CombinedGreensIterator outputs vs direct greens_kl computation
    (reference tiers: recalc=safe_mult → 1e-14, 4*safe_mult → 1e-10;
    flavortests_DQMC.jl:127-162)."""
    model, params, ctx, consts, conf = _setup(beta=4.0, U=4.0)
    M = ctx.M
    G00 = core.greens_from_scratch(ctx, consts, conf, 0)
    unwrap = partial(core.unwrap_greens, ctx, consts)

    collected = []

    def step(acc, G0l, Gl0, Gll):
        collected.append((G0l, Gl0, Gll))
        return acc

    ut.combined_greens_apply(ctx, consts, conf, G00, 0.0, step,
                             recalculate=recalc_mult * ctx.sm)
    assert len(collected) == M
    for l in (1, 5, 9, 10, 11, 20, 33, M - 1, M):
        G0l, Gl0, Gll = collected[l - 1]
        ref_l0 = unwrap(ut.greens_kl(ctx, consts, conf, l, 0))
        ref_0l = unwrap(ut.greens_kl(ctx, consts, conf, 0, l))
        ref_ll = unwrap(ut.greens_kl(ctx, consts, conf, l, l))
        assert np.max(np.abs(np.asarray(Gl0) - np.asarray(ref_l0))) < tol, f"Gl0 l={l}"
        assert np.max(np.abs(np.asarray(G0l) - np.asarray(ref_0l))) < tol, f"G0l l={l}"
        assert np.max(np.abs(np.asarray(Gll) - np.asarray(ref_ll))) < tol, f"Gll l={l}"
