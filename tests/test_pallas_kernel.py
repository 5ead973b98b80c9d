"""Pallas fused site-sweep kernel vs the XLA reference path
(interpreter mode on CPU; compiled Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu import DQMC, HubbardModelAttractive, HubbardModelRepulsive
from montecarlo_tpu.dqmc import core
from montecarlo_tpu.dqmc.parameters import DQMCParameters
from montecarlo_tpu.ops import pallas_site_sweep as pss


@pytest.mark.parametrize("model_cls", [HubbardModelAttractive,
                                       HubbardModelRepulsive])
def test_pallas_matches_xla_sweep(model_cls):
    if model_cls is HubbardModelAttractive:
        model = model_cls(dims=2, L=4, U=4.0, mu=0.0)
    else:
        model = model_cls(dims=2, L=4, U=4.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(0)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int32)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)

    G2, s2, acc, nneg = jax.vmap(lambda g, s, uu: pss.site_sweep_pallas(
        g, s, uu, lamb=ctx.lamb, signs=ctx.signs,
        det_power=ctx.det_power, use_boson=ctx.use_boson))(G, sigma, u)
    Gr, sr, lsr = jax.vmap(
        lambda g, s, uu: core.sweep_slice(ctx, g, s.astype(jnp.int8), uu,
                                          core.init_local_stats(ctx))
    )(G, sigma, u)
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 1e-5
    assert np.array_equal(np.asarray(s2), np.asarray(sr, dtype=np.int32))
    assert np.array_equal(np.asarray(acc), np.asarray(lsr["acc"]))


@pytest.mark.parametrize("model_cls", [HubbardModelAttractive,
                                       HubbardModelRepulsive])
def test_sitemajor_matches_xla_sweep(model_cls):
    """The site-major kernel layout (chains on sublanes, used for N > 128)
    must match the XLA site loop. Exercised here at small N via force_cb so
    the CPU interpreter stays fast; chain padding (C=3 -> CB=8) is covered."""
    if model_cls is HubbardModelAttractive:
        model = model_cls(dims=2, L=4, U=4.0, mu=0.0)
    else:
        model = model_cls(dims=2, L=4, U=4.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(1)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int32)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)

    G2, s2, acc, nneg = pss._site_sweep_sitemajor(
        G, sigma, u, lamb=ctx.lamb, signs=ctx.signs,
        det_power=ctx.det_power, use_boson=ctx.use_boson, force_cb=8)
    Gr, sr, lsr = jax.vmap(
        lambda g, s, uu: core.sweep_slice(ctx, g, s.astype(jnp.int8), uu,
                                          core.init_local_stats(ctx))
    )(G, sigma, u)
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 1e-4
    assert np.array_equal(np.asarray(s2), np.asarray(sr, dtype=np.int32))
    assert np.array_equal(np.asarray(acc), np.asarray(lsr["acc"]))


def test_complex_kernel_matches_xla_sweep():
    """The two-plane complex64 kernel (Peierls sessions) must reproduce the
    XLA complex site loop: same Markov decisions, same G, and the SAME
    local-stats bundle (phase product, imag/neg magnitude stats) — the
    complex kernel emits per-site detratios and the stats are rebuilt
    order-independently outside (core._track_detratio_batch)."""
    import dataclasses
    N = 8
    rng = np.random.default_rng(5)
    theta = rng.normal(size=(N, N))
    theta = theta - theta.T            # generic (non-pure-gauge) flux
    model = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15,
                                   peierls=theta)
    params = DQMCParameters(beta=1.0, delta_tau=0.1)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=True)
    assert ctx.use_pallas and ctx.is_complex
    ctx_xla = dataclasses.replace(ctx, use_pallas=False)
    C, F = 3, ctx.F
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2
                    + 1j * rng.normal(size=(C, F, N, N)) * 0.1
                    + 0.5 * np.eye(N), jnp.complex64)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int8)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)

    run = lambda c: jax.vmap(lambda g, s, uu: core.sweep_slice(
        c, g, s, uu, core.init_local_stats(c)))(G, sigma, u)
    G2, s2, ls2 = run(ctx)
    Gr, sr, lsr = run(ctx_xla)
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 1e-4
    assert np.array_equal(np.asarray(s2), np.asarray(sr))
    assert np.array_equal(np.asarray(ls2["acc"]), np.asarray(lsr["acc"]))
    assert np.array_equal(np.asarray(ls2["nneg"]), np.asarray(lsr["nneg"]))
    np.testing.assert_allclose(np.asarray(ls2["phase"]),
                               np.asarray(lsr["phase"]), atol=1e-5)
    assert np.array_equal(np.asarray(ls2["imag_count"]),
                          np.asarray(lsr["imag_count"]))
    for k in ("neg_min", "neg_max", "neg_sum",
              "imag_min", "imag_max", "imag_sum"):
        np.testing.assert_allclose(np.asarray(ls2[k]), np.asarray(lsr[k]),
                                   rtol=1e-5, atol=1e-6)


def test_complex_kernel_repulsive_f2_matches_xla():
    """F=2 (repulsive, opposite-sign flavor blocks) through the complex
    kernel: per-flavor complex rank-1 updates and the flavor-product
    detratio must match the XLA loop."""
    import dataclasses
    N = 8
    rng = np.random.default_rng(6)
    theta = rng.normal(size=(N, N))
    theta = theta - theta.T
    model = HubbardModelRepulsive(dims=1, L=N, U=4.0, peierls=theta)
    params = DQMCParameters(beta=1.0, delta_tau=0.1)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=True)
    assert ctx.use_pallas and ctx.is_complex and ctx.F == 2
    ctx_xla = dataclasses.replace(ctx, use_pallas=False)
    C = 2
    G = jnp.asarray(rng.normal(size=(C, 2, N, N)) * 0.2
                    + 1j * rng.normal(size=(C, 2, N, N)) * 0.1
                    + 0.5 * np.eye(N), jnp.complex64)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int8)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)
    run = lambda c: jax.vmap(lambda g, s, uu: core.sweep_slice(
        c, g, s, uu, core.init_local_stats(c)))(G, sigma, u)
    G2, s2, ls2 = run(ctx)
    Gr, sr, lsr = run(ctx_xla)
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 1e-4
    assert np.array_equal(np.asarray(s2), np.asarray(sr))
    assert np.array_equal(np.asarray(ls2["acc"]), np.asarray(lsr["acc"]))
    np.testing.assert_allclose(np.asarray(ls2["phase"]),
                               np.asarray(lsr["phase"]), atol=1e-5)


def test_complex_kernel_in_full_sweep_pair():
    """End-to-end: a complex64 session with use_pallas=True must run
    sweep_pair and keep the gauge-invariant physics of the pure-gauge case
    (detratio real, occupation from the real model's chain)."""
    N = 8
    phis = np.linspace(0.0, 1.4, N)
    theta = phis[:, None] - phis[None, :]
    model = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.0,
                                   peierls=theta)
    mc_cx = DQMC(model, beta=1.0, delta_tau=0.1, n_chains=8, seed=3,
                 sweeps=20, thermalization=10, dtype=jnp.float32,
                 use_pallas=True)
    assert mc_cx.ctx.use_pallas
    mc_cx.run(verbose=False)
    occ = np.mean(np.asarray(mc_cx.observables()["occ"]["occ"].mean))
    # half filling by particle-hole symmetry (mu=0, pure gauge)
    assert abs(occ - 0.5) < 0.07


def test_sitemajor_block_pick():
    # 3-block (scratch-Gt) budget: the default when the in-kernel transpose
    # compiles; 4-block is the materialized-Gt fallback
    assert pss._pick_sublane_block(64, 256, 1) == 16
    assert pss._pick_sublane_block(64, 256, 2) == 8
    assert pss._pick_sublane_block(64, 144, 1) == 32
    assert pss._pick_sublane_block(64, 256, 1, n_blocks=4) == 8
    assert pss._pick_sublane_block(64, 256, 2, n_blocks=4) is None
    assert pss.sitemajor_supported(256, 1)
    # N=256 F=2 fits ONLY via the scratch variant (CPU probe: always ok)
    assert pss.sitemajor_supported(256, 2)
    assert not pss.sitemajor_supported(512, 1)
    # CB capped at the next multiple of 8 >= C: a single-chain call must not
    # pad out to the VMEM-optimal block
    assert pss._pick_sublane_block(1, 144, 1) == 8
    assert pss._pick_sublane_block(20, 144, 1) == 16  # cap 24 -> next is 16
    assert pss._pick_sublane_block(64, 144, 1) == 32


def test_sitemajor_unsupported_shape_raises():
    # N=512 fits no chain block; the kernel must fail with a clear contract
    # error, not an opaque TypeError from CB=None arithmetic
    G = jnp.zeros((2, 1, 512, 512), jnp.float32)
    sigma = jnp.ones((2, 512), jnp.int32)
    u = jnp.zeros((2, 512), jnp.float32)
    with pytest.raises(ValueError, match="unsupported"):
        pss._site_sweep_sitemajor(G, sigma, u, lamb=0.4, signs=(1.0,),
                                  det_power=2, use_boson=True)


def test_gt_materialized_fallback_matches_scratch():
    """The materialized-Gt fallback path (used when the Mosaic probe fails)
    must be bit-identical to the scratch-Gt default."""
    key = jax.random.PRNGKey(11)
    C, F, N = 4, 1, 16
    kG, ks, ku = jax.random.split(key, 3)
    G = jax.random.normal(kG, (C, F, N, N), jnp.float32) * 0.3
    sigma = jnp.where(jax.random.bernoulli(ks, 0.5, (C, N)), 1, -1)
    u = jax.random.uniform(ku, (C, N), jnp.float32)
    kw = dict(lamb=0.4, signs=(1.0,), det_power=2, use_boson=True)
    a = pss._site_sweep_batched(G, sigma, u, _force_scratch=True, **kw)
    b = pss._site_sweep_batched(G, sigma, u, _force_scratch=False, **kw)
    for x, y in zip(a, b):
        assert jnp.array_equal(x, y)


@pytest.mark.parametrize("F,signs,det_power,use_boson",
                         [(1, (1.0,), 2, True), (2, (1.0, -1.0), 1, False)])
def test_colread_matches_gt_modes(F, signs, det_power, use_boson):
    """The no-Gt (col_read) kernel — column i read as a dynamic sublane
    slice of G itself — must be bit-identical to both Gt modes: the Gt
    update multiplied exactly the same value pairs, so Gt was always
    bit-equal to G^T."""
    key = jax.random.PRNGKey(12)
    C, N = 4, 16
    kG, ks, ku = jax.random.split(key, 3)
    G = (jax.random.normal(kG, (C, F, N, N), jnp.float32) * 0.3
         + 0.25 * jnp.eye(N, dtype=jnp.float32))
    sigma = jnp.where(jax.random.bernoulli(ks, 0.5, (C, N)), 1, -1)
    u = jax.random.uniform(ku, (C, N), jnp.float32)
    kw = dict(lamb=0.4, signs=signs, det_power=det_power, use_boson=use_boson)
    a = pss._site_sweep_batched(G, sigma, u, _force_scratch=True, **kw)
    b = pss._site_sweep_batched(G, sigma, u, _force_colread=True, **kw)
    for x, y in zip(a, b):
        assert jnp.array_equal(x, y)


@pytest.mark.parametrize("F,signs,det_power,use_boson",
                         [(1, (1.0,), 2, True), (2, (1.0, -1.0), 1, False)])
def test_site_pair_matches_sequential(F, signs, det_power, use_boson):
    """The delay-2 (paired-site) col_read kernel — site i+1's decision
    quantities corrected exactly from site i's rank-1 terms, both updates
    applied in one pass — must be bit-identical to the sequential col_read
    kernel: the corrected row'/col'/gii' are the same expressions the
    sequential kernel evaluates after its site-i update."""
    key = jax.random.PRNGKey(13)
    C, N = 4, 16
    kG, ks, ku = jax.random.split(key, 3)
    G = (jax.random.normal(kG, (C, F, N, N), jnp.float32) * 0.3
         + 0.25 * jnp.eye(N, dtype=jnp.float32))
    sigma = jnp.where(jax.random.bernoulli(ks, 0.5, (C, N)), 1, -1)
    u = jax.random.uniform(ku, (C, N), jnp.float32)
    kw = dict(lamb=0.4, signs=signs, det_power=det_power, use_boson=use_boson)
    a = pss._site_sweep_batched(G, sigma, u, _force_colread=True,
                                _force_pair=False, **kw)
    b = pss._site_sweep_batched(G, sigma, u, _force_colread=True,
                                _force_pair=True, **kw)
    for x, y in zip(a, b):
        assert jnp.array_equal(x, y)


@pytest.mark.slow
def test_pallas_dqmc_end_to_end():
    """Full DQMC run with use_pallas must match the plain f32 run exactly in
    distribution (same RNG stream -> same trajectories up to f32 op order).
    slow: ~2 min under the CPU pallas interpreter; the per-slice equivalence
    (test_pallas_matches_xla_sweep) stays in the fast tier."""
    def run(use_pallas):
        model = HubbardModelAttractive(dims=2, L=2, U=2.0, mu=0.0)
        mc = DQMC(model, beta=1.0, n_chains=4, seed=5, dtype=jnp.float32,
                  use_pallas=use_pallas, thermalization=10, sweeps=40,
                  measure_rate=2, print_rate=10 ** 9)
        assert mc.run(verbose=False, chunk=25)
        return mc.observables()["occ"]["occ"].mean.mean()

    occ_p = run(True)
    occ_x = run(False)
    assert abs(occ_p - 0.5) < 0.1
    assert abs(occ_p - occ_x) < 0.05


def test_sites_per_step_unroll_matches(monkeypatch):
    """MC_TPU_SITES_PER_STEP=4 must reproduce the default kernel's Markov
    chain exactly (bit-equal sigma/acc; the decision quantities are computed
    identically) — G may differ at fusion-level rounding (~1e-7) because XLA
    fuses the unrolled site updates."""
    model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(2)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int32)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)
    kw = dict(lamb=ctx.lamb, signs=ctx.signs, det_power=ctx.det_power,
              use_boson=ctx.use_boson)
    G1, s1, a1, n1 = pss._site_sweep_batched(G, sigma, u, **kw)
    monkeypatch.setenv("MC_TPU_SITES_PER_STEP", "4")
    G4, s4, a4, n4 = pss._site_sweep_batched(G, sigma, u, **kw)
    assert np.array_equal(np.asarray(s1), np.asarray(s4))
    assert np.array_equal(np.asarray(a1), np.asarray(a4))
    assert np.max(np.abs(np.asarray(G1 - G4))) < 1e-5


def test_sitemajor_sites_per_step_unroll_matches(monkeypatch):
    """The site-major kernel's MC_TPU_SITES_PER_STEP unroll must reproduce
    the per-site kernel's Markov chain exactly (same contract as the
    chain-on-lanes unroll test above)."""
    model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(5)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int32)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)
    kw = dict(lamb=ctx.lamb, signs=ctx.signs, det_power=ctx.det_power,
              use_boson=ctx.use_boson, force_cb=8, _force_scratch=True)
    G1, s1, a1, n1 = pss._site_sweep_sitemajor(G, sigma, u, **kw)
    monkeypatch.setenv("MC_TPU_SITES_PER_STEP", "4")
    G4, s4, a4, n4 = pss._site_sweep_sitemajor(G, sigma, u, **kw)
    assert np.array_equal(np.asarray(s1), np.asarray(s4))
    assert np.array_equal(np.asarray(a1), np.asarray(a4))
    assert np.max(np.abs(np.asarray(G1 - G4))) < 1e-5


@pytest.mark.parametrize("mxu", [True, False])
def test_sitemajor_delayed_matches_per_site(mxu):
    """The delayed rank-k site-major kernel must reproduce the per-site
    kernel's Markov chain (bit-equal sigma/acc — decision quantities come
    from exactly-maintained row/col slabs) with G equal up to the rounding
    of the deferred block apply."""
    model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(7)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int32)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)
    kw = dict(lamb=ctx.lamb, signs=ctx.signs, det_power=ctx.det_power,
              use_boson=ctx.use_boson)
    G1, s1, a1, n1 = pss._site_sweep_sitemajor(
        G, sigma, u, force_cb=8, _force_scratch=True, **kw)
    Gd, sd, ad, nd = pss._site_sweep_sitemajor_delayed(
        G, sigma, u, force_cb=8, force_dk=4, force_mxu=mxu, **kw)
    assert np.array_equal(np.asarray(s1), np.asarray(sd))
    assert np.array_equal(np.asarray(a1), np.asarray(ad))
    assert np.max(np.abs(np.asarray(G1 - Gd))) < 1e-4


def test_sitemajor_complex_matches_xla():
    """The site-major complex variant (N > 128 Peierls sessions) must match
    the XLA complex loop: exercised at small N via force_cb (interpreter),
    covering chain padding (C=3 -> CB=8) and the two-plane layout."""
    N = 16
    rng = np.random.default_rng(7)
    theta = rng.normal(size=(N, N))
    theta = theta - theta.T
    model = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15,
                                   peierls=theta)
    params = DQMCParameters(beta=1.0, delta_tau=0.1)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32)
    C, F = 3, ctx.F
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2
                    + 1j * rng.normal(size=(C, F, N, N)) * 0.1
                    + 0.5 * np.eye(N), jnp.complex64)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int8)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)
    kw = dict(lamb=ctx.lamb, signs=ctx.signs, det_power=ctx.det_power,
              use_boson=ctx.use_boson)
    G2, s2, accept, det = pss._site_sweep_sitemajor_cx(
        G, sigma.astype(jnp.int32), u, force_cb=8, **kw)
    Gr, sr, lsr = jax.vmap(lambda g, s, uu: core.sweep_slice(
        ctx, g, s, uu, core.init_local_stats(ctx)))(G, sigma, u)
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 1e-4
    assert np.array_equal(np.asarray(s2),
                          np.asarray(sr, dtype=np.int32))
    assert np.array_equal(np.sum(np.asarray(accept), axis=1),
                          np.asarray(lsr["acc"]))
    # per-site detratios feed the host-side stats: spot-check the phase
    ls0 = core.init_local_stats(ctx)
    ls0 = jax.vmap(lambda d, a: core._track_detratio_batch(
        ctx, core.init_local_stats(ctx), d, a))(det, jnp.asarray(accept))
    np.testing.assert_allclose(np.asarray(ls0["phase"]),
                               np.asarray(lsr["phase"]), atol=1e-5)


def test_complex_supported_boundaries():
    # chain-on-lanes region
    assert pss.complex_supported(64, 1)
    assert pss.complex_supported(128, 2)
    # site-major region: N=144/256 F=1 fit (6 planes at CB=8);
    # N=256 F=2 does not (25 MB > budget); N=512 never
    assert pss.complex_supported(144, 1)
    assert pss.complex_supported(256, 1)
    assert not pss.complex_supported(256, 2)
    assert not pss.complex_supported(512, 1)
    # misaligned or tiny N
    assert not pss.complex_supported(100, 1)
    assert not pss.complex_supported(4, 1)


@pytest.mark.parametrize("direction", [+1, -1])
def test_fused_wrap_matches_separate_wrap(direction):
    """The in-kernel MXU wrap (MC_TPU_FUSE_WRAP path) must reproduce
    sweep_slice + wrap_up/wrap_down: identical Markov decisions (the wrap
    happens outside the accept/reject algebra) and G within matmul-order
    rounding (the fused form associates eT2 @ (ev*G*evinv) @ eT2inv)."""
    model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
    params = DQMCParameters(beta=2.0)
    ctx, consts = core.make_context(model, params, update_dtype=jnp.float32,
                                    use_pallas=True)
    C, N, F = 3, ctx.N, ctx.F
    rng = np.random.default_rng(3)
    G = jnp.asarray(rng.normal(size=(C, F, N, N)) * 0.2 + 0.5 * np.eye(N),
                    jnp.float32)
    sigma = jnp.asarray(rng.choice([-1, 1], size=(C, N)), jnp.int8)
    u = jnp.asarray(rng.uniform(size=(C, N)), jnp.float32)

    def reference(g, s, uu, ls):
        with ctx.matmul_precision():
            if direction < 0:
                g = core.wrap_down(ctx, consts, s, g)
            g, s, ls = core.sweep_slice(ctx, g, s, uu, ls)
            if direction > 0:
                g = core.wrap_up(ctx, consts, s, g)
        return g, s, ls

    Gr, sr, lsr = jax.vmap(lambda g, s, uu: reference(
        g, s, uu, core.init_local_stats(ctx)))(G, sigma, u)

    def fused(g, s, uu, ls):
        with ctx.matmul_precision():
            return core._sweep_slice_fused_wrap(ctx, consts, g, s, uu, ls,
                                                direction)
    G2, s2, ls2 = jax.vmap(lambda g, s, uu: fused(
        g, s, uu, core.init_local_stats(ctx)))(G, sigma, u)

    assert np.array_equal(np.asarray(s2), np.asarray(sr))
    assert np.array_equal(np.asarray(ls2["acc"]), np.asarray(lsr["acc"]))
    assert np.max(np.abs(np.asarray(G2 - Gr))) < 2e-5


@pytest.mark.slow
def test_fuse_wrap_end_to_end_half_filling(monkeypatch):
    """MC_TPU_FUSE_WRAP=1 through the public API: sweep_pair runs the fused
    kernel for every scanned slice and the physics stays at half filling.
    Slow tier: the lever is flag-gated OFF by default (retired r3 with A/B
    numbers, ROADMAP) — its 60s interpret-mode run doesn't belong in the
    per-change loop."""
    monkeypatch.setenv("MC_TPU_FUSE_WRAP", "1")
    model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
    d = DQMC(model, beta=1.0, delta_tau=0.1, n_chains=8, seed=1,
             sweeps=50, thermalization=25, dtype=jnp.float32,
             use_pallas=True)
    assert core._fuse_wrap_enabled(d.ctx)
    d.run(verbose=False)
    occ = float(np.mean(np.asarray(d.observables()["occ"]["occ"].mean)))
    assert abs(occ - 0.5) < 0.05


def test_cached_probe_disk_roundtrip(tmp_path, monkeypatch):
    """cached_probe persists probe results across 'processes' (fresh memo
    dicts): the compute callable runs exactly once per (tag, key) while the
    disk file exists, values survive JSON round-trips with types intact
    (bool, config tuple, None), and a namespace change (different source
    hash) invalidates without error."""
    from montecarlo_tpu.ops import pallas_util as pu
    monkeypatch.setenv("MC_TPU_PROBE_CACHE_DIR", str(tmp_path))
    calls = {"n": 0}

    def compute_tuple():
        calls["n"] += 1
        return (16, True)

    m1 = {}
    assert pu.cached_probe(m1, (256, 1), "cfg", compute_tuple) == (16, True)
    # fresh memo = new process: served from disk, compute NOT re-run
    m2 = {}
    assert pu.cached_probe(m2, (256, 1), "cfg", compute_tuple) == (16, True)
    assert calls["n"] == 1
    assert isinstance(m2[(256, 1)], tuple)
    # bool and None values round-trip with their types
    assert pu.cached_probe({}, (64,), "ok", lambda: True) is True
    assert pu.cached_probe({}, (64,), "ok", lambda: None) is True  # cached
    assert pu.cached_probe({}, (8,), "none", lambda: None) is None
    assert pu.cached_probe({}, (8,), "none", lambda: (1,)) is None  # cached
    # namespace bump (source change) = miss, recompute, no crash
    monkeypatch.setattr(pu, "_PROBE_NS", "deadbeefdeadbeef")
    m3 = {}
    assert pu.cached_probe(m3, (256, 1), "cfg", compute_tuple) == (16, True)
    assert calls["n"] == 2


def test_cached_probe_no_dir_is_process_local(monkeypatch):
    """With persistence disabled (empty dir), cached_probe degrades to the
    plain per-process memo."""
    from montecarlo_tpu.ops import pallas_util as pu
    monkeypatch.setenv("MC_TPU_PROBE_CACHE_DIR", "")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return False

    m = {}
    assert pu.cached_probe(m, (1,), "t", compute) is False
    assert pu.cached_probe(m, (1,), "t", compute) is False
    assert calls["n"] == 1
    assert pu.cached_probe({}, (1,), "t", compute) is False  # new process
    assert calls["n"] == 2
