"""g_refresh mode: per-slice exact Green's recomputation from deferred factor
carries (core.sweep_pair_refresh) must reproduce the wrap-based propagation
(core.sweep_pair) — same math, different evaluation order — and keep its
deferral-window drift at the stabilized level.

Reference semantics being replaced: wrap_greens!/propagate
(/root/reference/src/flavors/DQMC/stack.jl:491-631)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu.dqmc import core


def _mk(g_refresh, dtype=jnp.float64, seed=3, sm=5, n_chains=4, **kw):
    model = mc.HubbardModelAttractive(L=2, dims=2, U=4.0)
    return mc.DQMC(model, beta=2.0, delta_tau=0.1, safe_mult=sm,
                   n_chains=n_chains, seed=seed, dtype=dtype,
                   g_refresh=g_refresh, sweeps=1, thermalization=0, **kw)


def test_refresh_matches_wrap_f64():
    """In float64 the refresh-mode G equals the wrap-mode G to ~1e-12 per
    slice, so the Metropolis decisions — and hence the whole trajectory —
    coincide over a few sweeps."""
    a = _mk(False)
    b = _mk(True)
    sa = sb = None
    fa = jax.jit(jax.vmap(lambda s: core.sweep_pair(a.ctx, a.consts, s)))
    fb = jax.jit(jax.vmap(lambda s: core.sweep_pair(b.ctx, b.consts, s)))
    sa, sb = a.state, b.state
    for _ in range(3):
        sa, Ga, ca = fa(sa)
        sb, Gb, cb = fb(sb)
    assert np.array_equal(np.asarray(ca), np.asarray(cb)), \
        "trajectories diverged (different accept decisions)"
    assert np.max(np.abs(np.asarray(Ga - Gb))) < 1e-9


def test_refresh_drift_is_stabilized_f64():
    b = _mk(True)
    s = b.state
    f = jax.jit(jax.vmap(lambda st: core.sweep_pair(b.ctx, b.consts, st)))
    for _ in range(3):
        s, _, _ = f(s)
    drift_max = float(np.max(np.asarray(s["prop_err_max"])))
    n = int(np.sum(np.asarray(s["prop_err_n"])))
    assert n > 0
    assert drift_max < 1e-9, f"deferral drift {drift_max} too large for f64"


def test_refresh_matches_wrap_f32_greens():
    a = _mk(False, dtype=jnp.float32)
    b = _mk(True, dtype=jnp.float32)
    fa = jax.jit(jax.vmap(lambda s: core.sweep_pair(a.ctx, a.consts, s)))
    fb = jax.jit(jax.vmap(lambda s: core.sweep_pair(b.ctx, b.consts, s)))
    sa, Ga, _ = fa(a.state)
    sb, Gb, _ = fb(b.state)
    # one sweep from the same seed: decisions identical unless a detratio sits
    # within f32 noise of its uniform; Green's agree to stabilized f32 level
    assert np.max(np.abs(np.asarray(Ga - Gb))) < 1e-3


def test_refresh_end_to_end_half_filling():
    sim = _mk(True, n_chains=8)
    sim.parameters.sweeps = 30
    sim.parameters.thermalization = 15
    sim["occ"] = mc.occupation(sim, sim.model)
    sim.run(verbose=False)
    occ = float(np.mean(sim.observables()["occ"]["occ"].mean))
    assert abs(occ - 0.5) < 0.04


def test_refresh_survives_checkpoint_roundtrip(tmp_path):
    sim = _mk(True)
    sim.parameters.sweeps = 4
    sim.parameters.thermalization = 2
    sim["occ"] = mc.occupation(sim, sim.model)
    sim.run(verbose=False)
    fn = str(tmp_path / "ck.msgpack")
    mc.save(fn, sim)
    loaded = mc.load(fn)
    assert loaded.ctx.g_refresh is True
    assert np.array_equal(np.asarray(loaded.state["conf"]),
                          np.asarray(sim.state["conf"]))


def test_refresh_complex_session():
    """g_refresh (deferred-window exact recomputation) composed with a
    complex-hopping session: calculate_greens_inv is dtype-generic, and a
    pure-gauge flux must keep half filling at mu=0."""
    import numpy as np
    import montecarlo_tpu as mc
    N = 4
    phis = np.linspace(0.0, 1.1, N)
    theta = phis[:, None] - phis[None, :]
    model = mc.HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.0,
                                      peierls=theta)
    sim = mc.DQMC(model, beta=1.0, delta_tau=0.1, n_chains=8, seed=4,
                  sweeps=60, thermalization=30, g_refresh=True)
    assert sim.ctx.g_refresh and sim.ctx.is_complex
    sim.run(verbose=False)
    occ = float(np.mean(np.asarray(sim.observables()["occ"]["occ"].mean)))
    assert abs(occ - 0.5) < 0.05
