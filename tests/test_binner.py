"""LogBinner statistics tests (replacing the reference's BinningAnalysis dep)."""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu import LogBinner


def test_mean_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=1000)
    b = LogBinner(shape=(), dtype=jnp.float64)
    state = b.empty_state()
    push = jax.jit(b.push)
    for x in xs:
        state = push(state, x)
    assert LogBinner.count(state) == 1000
    assert abs(LogBinner.mean(state) - xs.mean()) < 1e-12
    # iid samples: std_error ~ std/sqrt(n)
    se = LogBinner.std_error(state)
    expected = xs.std(ddof=1) / np.sqrt(len(xs))
    assert 0.5 * expected < se < 2.0 * expected


def test_scan_push_and_vector_shape():
    b = LogBinner(shape=(3,), dtype=jnp.float64)
    state = b.empty_state()
    xs = jnp.arange(30.0).reshape(10, 3)

    def body(s, x):
        return b.push(s, x), None

    state, _ = jax.lax.scan(body, state, xs)
    assert np.allclose(LogBinner.mean(state), np.asarray(xs).mean(0))


def test_autocorrelated_series_inflates_error():
    """Correlated samples must yield a larger std_error than the naive
    (level-0) estimate — the entire point of logarithmic binning."""
    rng = np.random.default_rng(1)
    n = 2 ** 14
    rho = 0.95
    xs = np.empty(n)
    xs[0] = rng.normal()
    for i in range(1, n):
        xs[i] = rho * xs[i - 1] + np.sqrt(1 - rho ** 2) * rng.normal()
    b = LogBinner(shape=())
    state = b.empty_state()

    def body(s, x):
        return b.push(s, x), None

    state, _ = jax.lax.scan(body, state, jnp.asarray(xs))
    naive = np.sqrt(LogBinner.var(state, 0) / n)
    se = LogBinner.std_error(state)
    tau = LogBinner.tau(state)
    # exact tau for AR(1): rho/(1-rho) = 19: error inflation sqrt(1+2tau)~6.2
    assert se > 3 * naive
    assert tau > 5


def test_vmapped_chain_axis():
    b = LogBinner(shape=(), dtype=jnp.float64)
    C = 4
    states = jax.vmap(lambda _: b.empty_state())(jnp.arange(C))
    xs = jnp.stack([jnp.arange(100.0) + 10 * c for c in range(C)], 0)  # (C, n)

    def body(s, x):
        return jax.vmap(b.push)(s, x), None

    states, _ = jax.lax.scan(body, states, xs.T)
    m = LogBinner.mean(states)
    assert m.shape == (C,)
    assert np.allclose(m, np.asarray(xs).mean(1))
    cm = LogBinner.combined_mean(states)
    assert np.allclose(cm, np.asarray(xs).mean())
    assert LogBinner.combined_std_error(states).shape == ()
