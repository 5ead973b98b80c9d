"""A/B the per-boundary propagation-drift reduction (sm=1 hot path).

The r5 breakdown measured jnp.max(|G - G_re|) at 0.144 ms per slice visit
on (256, 1, 64, 64) f32 operands — 10% of the whole sm=1 visit and ~30x
off the bandwidth bound. Hypothesis: the (C, F, N, N) layout leaves the
128-wide lanes half empty (N=64 minor) and the cross-dim reduce
serializes; flattening the reduced dims into one 128-multiple trailing
axis should restore bandwidth. Variants are timed inside a lax.scan with
the result threaded through the carry (ROADMAP measurement discipline).
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

C, F, N, K = 256, 1, 64, 400


def _time(tag, fn, *args, per=K):
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    dt = time.time() - t0
    print(f"{tag:44s} {dt / per * 1e3:8.4f} ms/iter   ({dt:.2f}s / {per})",
          flush=True)
    return dt / per


def scan_variant(reduce_fn):
    @jax.jit
    def run(G, G2):
        def body(carry, _):
            eps = carry[..., None, None, None] * 0.0  # thread dependency
            d = reduce_fn(G + eps, G2)
            return d, None
        c, _ = lax.scan(body, jnp.zeros(G.shape[:1], jnp.float32),
                        None, length=K)
        return c
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    G = jax.random.normal(key, (C, F, N, N), jnp.float32)
    G2 = G + 1e-6 * jax.random.normal(jax.random.PRNGKey(1), G.shape,
                                      jnp.float32)

    def v_current(G, G2):
        # per-chain max over (F, N, N) — what _track_prop_err consumes
        return jnp.max(jnp.abs(G - G2), axis=(1, 2, 3))

    def v_flat(G, G2):
        d = (G - G2).reshape(C, -1)
        return jnp.max(jnp.abs(d), axis=-1)

    def v_twostep(G, G2):
        # reduce sublanes first, then lanes
        d = jnp.abs(G - G2)
        return jnp.max(jnp.max(d, axis=-2), axis=(-1, -2))

    def v_sumsq(G, G2):
        d = (G - G2).reshape(C, -1)
        return jnp.einsum("ci,ci->c", d, d)

    _time("current max|G-G2| (C,F,N,N)", scan_variant(v_current), G, G2)
    _time("flat max|G-G2| (C, F*N*N)", scan_variant(v_flat), G, G2)
    _time("two-step max (sublane, lane)", scan_variant(v_twostep), G, G2)
    _time("einsum sum-of-squares (C, F*N*N)", scan_variant(v_sumsq), G, G2)

    # sanity: identical values
    a = v_current(G, G2)
    b = v_flat(G, G2)
    c = v_twostep(G, G2)
    print("flat == current:", bool(jnp.all(a == b)),
          " twostep == current:", bool(jnp.all(a == c)), flush=True)


if __name__ == "__main__":
    main()
