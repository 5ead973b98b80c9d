"""Delayed (rank-k) Green's updates must generate the SAME Markov chain as
the rank-1 path (they are algebraically identical; reference rank-1 form:
HubbardModelAttractive.jl:129-155)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from montecarlo_tpu import HubbardModelAttractive, HubbardModelRepulsive
from montecarlo_tpu.dqmc import core
from montecarlo_tpu.dqmc.parameters import DQMCParameters


@pytest.mark.parametrize("cls,U,mu", [(HubbardModelAttractive, 4.0, 0.3),
                                      (HubbardModelRepulsive, 4.0, 0.0)])
def test_delayed_matches_rank1(cls, U, mu):
    model = cls(dims=2, L=4, U=U, mu=mu)
    params = DQMCParameters(beta=1.0, safe_mult=5)
    ctx1, consts = core.make_context(model, params, delay=0)
    ctx2, _ = core.make_context(model, params, delay=8)
    assert ctx2.delay == 8
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, 3, params.slices)
    keys = jax.random.split(key, 3)
    s1 = jax.jit(jax.vmap(partial(core.init_state, ctx1, consts)))(conf, keys)
    s2 = jax.jit(jax.vmap(partial(core.init_state, ctx2, consts)))(conf, keys)
    f1 = jax.jit(jax.vmap(partial(core.sweep_pair, ctx1, consts)))
    f2 = jax.jit(jax.vmap(partial(core.sweep_pair, ctx2, consts)))
    for _ in range(2):
        s1, _, _ = f1(s1)
        s2, _, _ = f2(s2)
    assert np.array_equal(np.asarray(s1["conf"]), np.asarray(s2["conf"]))
    assert float(jnp.max(jnp.abs(s1["G"] - s2["G"]))) < 1e-9
    assert int(s1["acc"].sum()) == int(s2["acc"].sum())


def test_delay_clamped_to_divisor():
    model = HubbardModelAttractive(dims=2, L=3, U=4.0)  # N=9
    params = DQMCParameters(beta=1.0, safe_mult=5)
    ctx, _ = core.make_context(model, params, delay=8)
    assert ctx.delay == 3  # largest divisor of 9 <= 8
    ctx0, _ = core.make_context(model, params, delay=1)
    assert ctx0.delay == 0
