"""Where does the L=16 (N=256) slice visit go?

Same protocol as sm1_breakdown.py but at the bench's l16 operating point
(64 chains, N=256, beta=10, sm=10, f32+Pallas): times the full sweep_pair
per slice visit, then the site path (wrap+sweep_slice) and the boundary
pieces (extend_left, calculate_greens) in isolated scan chains. Decides
whether large-N effort should go to the site kernel (submatrix updates) or
the stack algebra (QR).
"""
import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_enable_x64", True)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, _REPO)

from montecarlo_tpu import HubbardModelAttractive  # noqa: E402
from montecarlo_tpu.dqmc import core  # noqa: E402
from montecarlo_tpu.dqmc.parameters import DQMCParameters  # noqa: E402
from montecarlo_tpu.ops import linalg  # noqa: E402

CHAINS, K = 64, 30


def _mk(sm=10):
    model = HubbardModelAttractive(dims=2, L=16, U=4.0, mu=0.0)
    params = DQMCParameters(beta=10.0, safe_mult=sm)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=True)
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, CHAINS, params.slices)
    keys = jax.random.split(key, CHAINS)
    st = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
    return ctx, consts, conf, st


def _time(tag, fn, *args, per=K):
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    dt = time.time() - t0
    print(f"{tag:34s} {dt / per * 1e3:8.3f} ms/iter   ({dt:.2f}s / {per})",
          flush=True)
    return dt / per


def main():
    print("devices:", jax.devices(), flush=True)
    ctx, consts, conf, st = _mk()
    G = st["G"]
    U0, D0, T0 = st["S_U"][:, 1], st["S_D"][:, 1], st["S_T"][:, 1]

    # whole sweep for reference
    sweep = jax.jit(jax.vmap(partial(core.sweep_pair, ctx, consts)))
    st2, _, _ = sweep(st)
    float(jnp.sum(jnp.real(st2["G"])))
    t0 = time.time()
    st2, _, _ = sweep(st2)
    float(jnp.sum(jnp.real(st2["G"])))
    per_visit = (time.time() - t0) / (2 * ctx.M)
    print(f"{'FULL sweep_pair per slice visit':34s} {per_visit * 1e3:8.3f} "
          f"ms  (sweep {time.time() - t0:.2f}s, "
          f"{CHAINS / (time.time() - t0):.1f} cs/s)", flush=True)

    # wrap + site sweep chain
    @jax.jit
    @partial(jax.vmap, in_axes=(0, 0, 0))
    def site_chain(G, conf, key):
        ls = core.ls_from_state(ctx, st)
        ls = {k: v[0] for k, v in ls.items()}

        def body(carry, l):
            G, key, ls = carry
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (ctx.N,), ctx.urdtype)
            sigma = conf[:, l % ctx.M]
            G = core.wrap_down(ctx, consts, sigma, G)
            G, sigma, ls = core.sweep_slice(ctx, G, sigma, u, ls)
            return (G, key, ls), None
        (G, key, ls), _ = lax.scan(body, (G, key, ls), jnp.arange(K))
        return G

    keys = jax.random.split(jax.random.PRNGKey(1), CHAINS)
    _time("wrap_down + site sweep", site_chain, G, conf, keys)

    # extend_left chain (1 per sm slices in production; cost shown per call)
    @jax.jit
    @partial(jax.vmap, in_axes=(0, 0, 0, 0))
    def ext_chain(conf, U, D, T):
        def body(carry, j):
            U, D, T = carry
            U, D, T = core.extend_left(ctx, consts, conf, j % ctx.n_seg,
                                       U, D, T)
            return (U, D, T), None
        (U, D, T), _ = lax.scan(body, (U, D, T), jnp.arange(K))
        return U

    _time("extend_left (per boundary)", ext_chain, conf, U0, D0, T0)

    # calculate_greens chain
    Ur, Dr, Tr = st["S_U"][:, 2], st["S_D"][:, 2], st["S_T"][:, 2]

    @jax.jit
    @partial(jax.vmap, in_axes=(0,) * 6)
    def cg_chain(Ul, Dl, Tl, Ur, Dr, Tr):
        def body(carry, _):
            eps = jnp.sum(carry) * 0.0 + 1.0
            G = linalg.calculate_greens(Ul * eps, Dl, Tl, Ur, Dr, Tr,
                                        ctx.greens_udt_fn)
            return jnp.real(G[..., 0, 0]), None
        c, _ = lax.scan(body, jnp.zeros(Ul.shape[:-2], ctx.rdtype),
                        None, length=K)
        return c

    _time("calculate_greens (per boundary)", cg_chain, U0, D0, T0, Ur, Dr, Tr)


if __name__ == "__main__":
    main()
