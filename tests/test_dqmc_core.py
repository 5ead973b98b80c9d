"""DQMC propagation core tests (modeled on reference test/flavortests_DQMC.jl).

The strongest gate is wrap/stack self-consistency: sweep_pair carries G through
rank-1 updates + wraps, and at every safe_mult boundary compares against a
fresh UDT recomputation — prop_err_max < 1e-9 therefore validates the rank-1
update, the wraps, the stack sequencing and calculate_greens simultaneously
(reference analog: wrap drift < 1e-9, flavortests_DQMC.jl:56-60).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu import DQMC, HubbardModelAttractive, HubbardModelRepulsive
from montecarlo_tpu.dqmc import core
from montecarlo_tpu.dqmc.parameters import DQMCParameters


def test_parameters_resolution():
    p = DQMCParameters(beta=5.0)
    assert p.delta_tau == 0.1 and p.slices == 50
    p = DQMCParameters(beta=5.0, slices=25)
    assert p.delta_tau == 0.2
    p = DQMCParameters(delta_tau=0.125, slices=40)
    assert p.beta == 5.0
    with pytest.raises(ValueError):
        DQMCParameters(beta=5.0, delta_tau=0.1, slices=13)
    with pytest.raises(ValueError):
        DQMCParameters(slices=10)
    # safe_mult shrinks to a divisor of slices
    p = DQMCParameters(beta=2.5, delta_tau=0.1)  # 25 slices
    assert p.slices % p.safe_mult == 0


def _setup(model_cls, L=4, beta=2.0, U=4.0, mu=0.0, seed=0, **kw):
    model = (model_cls(dims=2, L=L, U=U, mu=mu) if mu or model_cls is HubbardModelAttractive
             else model_cls(dims=2, L=L, U=U))
    params = DQMCParameters(beta=beta, **kw)
    ctx, consts = core.make_context(model, params)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    conf = model.rand_conf(k1, 1, params.slices)[0]  # single chain
    return model, params, ctx, consts, conf, k2


def test_free_fermion_limit():
    """U=0: no interaction, G must equal the exact Fermi function greens."""
    model, params, ctx, consts, conf, key = _setup(
        HubbardModelAttractive, L=4, beta=2.0, U=0.0, mu=0.3)
    G_eff = core.greens_from_scratch(ctx, consts, conf, 0)
    G = core.unwrap_greens(ctx, consts, G_eff)
    T = np.asarray(consts["hopping"])
    w, V = np.linalg.eigh(T)
    # exact (continuum) result exp(-beta*T); Trotter error vanishes at U=0
    # because B_l = e^{-dtau T} exactly
    G_exact = V @ np.diag(1.0 / (1.0 + np.exp(-params.beta * w))) @ V.T
    assert np.max(np.abs(np.asarray(G[0]) - G_exact)) < 1e-10


def test_greens_from_scratch_matches_naive_product():
    """Stack-based G equals a naive (but stabilized slice-count) product for a
    small beta where the naive chain is still accurate
    (reference: flavortests_DQMC.jl:44-69)."""
    model, params, ctx, consts, conf, key = _setup(
        HubbardModelAttractive, L=2, beta=1.0, U=4.0)
    N, M = ctx.N, ctx.M
    # naive dense product
    eT2 = np.asarray(consts["eT2"])
    lam = ctx.lamb
    B_all = np.eye(N)
    for l in range(M):
        eV = np.exp(lam * np.asarray(conf[:, l], float))
        B_all = (eT2 * eV[None, :]) @ B_all
    G_naive = np.linalg.inv(np.eye(N) + B_all)
    G = np.asarray(core.greens_from_scratch(ctx, consts, conf, 0)[0])
    assert np.max(np.abs(G - G_naive)) < 1e-9


@pytest.mark.parametrize("model_cls,U", [(HubbardModelAttractive, 4.0),
                                         (HubbardModelRepulsive, 4.0)])
def test_sweep_pair_self_consistency(model_cls, U):
    """Rank-1-updated + wrapped G agrees with fresh UDT recomputation at every
    safe_mult boundary (wrap drift gate < 1e-9)."""
    model, params, ctx, consts, conf, key = _setup(model_cls, L=4, beta=2.0, U=U)
    state = core.init_state(ctx, consts, conf, key)
    sweep = jax.jit(partial(core.sweep_pair, ctx, consts))
    for _ in range(3):
        state, G_meas, conf_meas = sweep(state)
    assert float(state["prop_err_max"]) < 5e-9
    assert int(state["neg_prob"]) == 0
    acc = float(state["acc"]) / float(state["prop"])
    assert 0.05 < acc < 1.0
    # conf remains ±1
    assert set(np.unique(np.asarray(state["conf"]))) <= {-1, 1}


def test_measured_greens_matches_scratch():
    """G_meas returned by sweep_pair equals greens_from_scratch(conf) up to
    the subsequent up-sweep updates of slices > 0; with a single slice segment
    per safe_mult this is covered by the propagation check. Here: after the
    sweep, a fresh G at slice 0 must agree with the carried G at the end of
    the pair (both are G_eff(0)-wrapped representations) to stabilization
    accuracy."""
    model, params, ctx, consts, conf, key = _setup(
        HubbardModelAttractive, L=4, beta=1.0, U=4.0)
    state = core.init_state(ctx, consts, conf, key)
    sweep = jax.jit(partial(core.sweep_pair, ctx, consts))
    state, G_meas, conf_meas = sweep(state)
    G_scratch = core.greens_from_scratch(ctx, consts, state["conf"], 0)
    # end-of-pair G is G_eff(M) == G_eff(0)
    assert np.max(np.abs(np.asarray(state["G"]) - np.asarray(G_scratch))) < 1e-8


def test_dqmc_driver_runs():
    model = HubbardModelAttractive(dims=2, L=2, U=2.0)
    mc = DQMC(model, beta=1.0, n_chains=4, seed=1, sweeps=10,
              thermalization=10, measure_rate=2, print_rate=1000)
    assert mc.run(verbose=False)
    obs = mc.observables()
    occ = obs["occ"]["occ"]
    assert occ.mean.shape == (1, 4)
    # half filling at mu=0: <n> = 0.5 by particle-hole symmetry
    assert np.allclose(occ.mean, 0.5, atol=0.1)
    assert mc.analysis.propagation_error.max < 1e-7


def test_honeycomb_hubbard_half_filling():
    """DQMC on the native 2-site-basis honeycomb (reference's honeycomb.jl is
    entirely commented out — this exceeds it): the attractive model at mu=0
    on a bipartite lattice is exactly half filled by particle-hole symmetry."""
    from montecarlo_tpu import DQMC, HubbardModelAttractive
    from montecarlo_tpu.lattices.library import Honeycomb
    lat = Honeycomb(2)                      # 2x2 cells x 2-site basis = 8
    model = HubbardModelAttractive(l=lat, U=4.0, mu=0.0)
    mc = DQMC(model, beta=2.0, n_chains=16, seed=5, sweeps=150,
              thermalization=75, measure_rate=2, print_rate=10 ** 9)
    assert mc.run(verbose=False)
    assert mc.analysis.propagation_error.max < 1e-7
    obs = mc.observables()["occ"]["occ"]
    occ = float(np.mean(obs.mean))
    err = float(np.mean(obs.std_error))
    assert abs(occ - 0.5) < max(4 * err, 0.02), (occ, err)


def test_use_pallas_auto_default():
    """DQMC(use_pallas=None) resolves by backend: off on CPU (interpreter is
    test-only), on for TPU (validated bench default); explicit True/False
    still wins."""
    import montecarlo_tpu as mc
    import jax.numpy as jnp
    model = mc.HubbardModelAttractive(dims=2, L=2, U=4.0, mu=0.0)
    kw = dict(beta=1.0, delta_tau=0.1, n_chains=2, seed=0, sweeps=1,
              thermalization=0, dtype=jnp.float32)
    assert not mc.DQMC(model, **kw).ctx.use_pallas          # auto on CPU
    assert mc.DQMC(model, use_pallas=True, **kw).ctx.use_pallas


def test_seed_sequence_batches_chains():
    """DQMC(seed=(s1, s2)) folds the independent streams into the chain
    axis: chains [n:2n] start from seed s2's exact initial state (BIT-equal
    confs and RNG keys) and track a separate seed=s2 session to f32
    rounding over a short run (matmul blocking depends on batch size, so
    exact bit-equality across batch sizes is not guaranteed). The cross-sm
    validation gates rely on this (validation.py::pooled_run)."""
    import montecarlo_tpu as mc
    model = mc.HubbardModelAttractive(dims=2, L=2, U=4.0, mu=0.0)
    kw = dict(beta=1.0, delta_tau=0.1, n_chains=3, sweeps=8,
              thermalization=2, measure_rate=2, dtype=jnp.float32,
              print_rate=10 ** 9)
    both = mc.DQMC(model, seed=(5, 9), **kw)
    solo = mc.DQMC(model, seed=9, **kw)
    assert both.n_chains == 6
    np.testing.assert_array_equal(np.asarray(both.state["conf"])[3:],
                                  np.asarray(solo.state["conf"]))
    np.testing.assert_array_equal(np.asarray(both.state["key"])[3:],
                                  np.asarray(solo.state["key"]))
    both.run(verbose=False)
    solo.run(verbose=False)
    pa = np.asarray(both.observables()["occ"]["occ"].per_chain_mean)
    pb = np.asarray(solo.observables()["occ"]["occ"].per_chain_mean)
    np.testing.assert_allclose(pa[3:], pb, rtol=2e-3, atol=2e-3)
