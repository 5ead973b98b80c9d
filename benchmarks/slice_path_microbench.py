"""Microbenchmark: split the per-slice hot path into its components.

Sizes ROADMAP lever 2 (fuse the wrap matmuls into the Pallas site-sweep
kernel) with measurements instead of assumptions: times the fused site-sweep
kernel alone, the wrap alone, and the combined per-slice path, plus the
boundary stabilization ops (extend + greens recompute), all at the headline
config (8x8 attractive Hubbard, beta=10, f32, 256 chains).

Measurement discipline (ROADMAP round-3 lessons, tunneled axon runtime):
  * sync by HOST FETCH, never block_until_ready alone;
  * amortize per-call overhead (~30 ms through the tunnel) with K-iteration
    lax.scan chains;
  * thread the mutated operand through the scan carry so nothing hoists out
    of the timed loop (the blocked-triangular-inverse "4.4x win" was a
    hoisting artifact).

Usage: python benchmarks/slice_path_microbench.py  (on the TPU runtime)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from montecarlo_tpu import HubbardModelAttractive  # noqa: E402
from montecarlo_tpu.dqmc import core  # noqa: E402
from montecarlo_tpu.dqmc.parameters import DQMCParameters  # noqa: E402

CHAINS = int(os.environ.get("MICRO_CHAINS", "256"))
L = int(os.environ.get("MICRO_L", "8"))
BETA = float(os.environ.get("MICRO_BETA", "10.0"))
K = int(os.environ.get("MICRO_K", "400"))  # scan iterations per timed region
USE_PALLAS = os.environ.get("MICRO_PALLAS", "1") == "1"


def _timed(name, fn, *args, reps=3):
    """fn returns a pytree whose first leaf is fetched to sync."""
    out = fn(*args)  # compile + warmup
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
        best = min(best, time.time() - t0)
    per_call = best / K * 1e3
    print(f"{name:34s} {per_call:8.4f} ms / call  ({best:.3f}s for {K})")
    return per_call


def main():
    model = HubbardModelAttractive(dims=2, L=L, U=4.0, mu=0.0)
    params = DQMCParameters(beta=BETA, safe_mult=10)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=USE_PALLAS)
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, CHAINS, params.slices)
    keys = jax.random.split(key, CHAINS)
    state = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
    G0 = state["G"]
    sigma0 = state["conf"][:, :, 0]
    print(f"config: N={ctx.N} F={ctx.F} chains={CHAINS} dtype={ctx.dtype}")

    def scan_region(body):
        @jax.jit
        def run(G, sigma, key):
            def step(carry, _):
                G, sigma, key = carry
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (CHAINS, ctx.N), ctx.urdtype)
                G, sigma = body(G, sigma, u)
                return (G, sigma, key), None
            (G, sigma, key), _ = jax.lax.scan(
                step, (G, sigma, key), None, length=K)
            return G
        return run

    def site_sweep_only(G, sigma, u):
        ls = jax.vmap(lambda: core.init_local_stats(ctx), axis_size=CHAINS)()
        G, sigma, _ = jax.vmap(partial(core.sweep_slice, ctx))(G, sigma, u, ls)
        return G, sigma

    def null_body(G, sigma, u):
        # scaffolding-only baseline: pays the per-iteration RNG split +
        # uniform draw + a flip-style sigma mutation (matching wrap_only's
        # anti-hoisting mutation) but none of the real work; subtracted from
        # every region so the shared scan overhead is not double-counted
        flip = jnp.where(u > 2.0, -1, 1)  # data-dependent: never folds
        return G, (sigma * flip).astype(sigma.dtype)

    def wrap_only(G, sigma, u):
        G = jax.vmap(partial(core.wrap_up, ctx, consts))(sigma, G)
        # mutate sigma from G so neither scan operand is loop-invariant
        flip = jnp.where(jnp.real(G[:, 0, 0, :]) > 0.5, -1, 1)
        return G, (sigma * flip).astype(sigma.dtype)

    def sweep_plus_wrap(G, sigma, u):
        G, sigma = site_sweep_only(G, sigma, u)
        G = jax.vmap(partial(core.wrap_up, ctx, consts))(sigma, G)
        return G, sigma

    with ctx.matmul_precision():
        t_null = _timed("scan scaffolding (RNG) only", scan_region(null_body),
                        G0, sigma0, key)
        t_sweep = _timed("site sweep (pallas) only", scan_region(site_sweep_only),
                         G0, sigma0, key)
        t_wrap = _timed("wrap_up only", scan_region(wrap_only), G0, sigma0, key)
        t_both = _timed("site sweep + wrap (real path)",
                        scan_region(sweep_plus_wrap), G0, sigma0, key)

        # boundary stabilization ops at the same shapes
        @jax.jit
        def extend_chain(U, D, T, conf):
            def step(carry, j):
                U, D, T = carry
                U, D, T = core.extend_left(ctx, consts, conf, 0, U, D, T)
                return (U, D, T), None
            (U, D, T), _ = jax.lax.scan(step, (U, D, T),
                                        jnp.arange(max(1, K // 10)))
            return U

        iU, iD, iT = core._identity_udt(ctx)
        bU = jnp.broadcast_to(iU, (CHAINS,) + iU.shape)
        bD = jnp.broadcast_to(iD, (CHAINS,) + iD.shape)
        bT = jnp.broadcast_to(iT, (CHAINS,) + iT.shape)
        vconf = state["conf"]

        def ext(U, D, T, c):
            return jax.vmap(partial(extend_chain))(U, D, T, c)

        out = ext(bU, bD, bT, vconf)
        float(jnp.sum(jnp.real(out)))
        t0 = time.time()
        out = ext(bU, bD, bT, vconf)
        float(jnp.sum(jnp.real(out)))
        t_ext = (time.time() - t0) / max(1, K // 10) * 1e3
        print(f"{'extend_left (sm=10 B-mults + QR)':34s} {t_ext:8.4f} ms / boundary")

        # boundary greens recompute at the same shapes (Dmax/Dmin one-UDT)
        from montecarlo_tpu.ops.linalg import calculate_greens

        @jax.jit
        def greens_chain(U, D, T):
            def step(carry, _):
                U, D, T = carry
                G = jax.vmap(lambda u, d, t: calculate_greens(
                    u, d, t, iU, iD, iT, ctx.greens_udt_fn))(U, D, T)
                # feed G back so the cg is not hoisted out of the scan
                # (1e-30*G is value-neutral at f32 scale but not foldable)
                U = (U + jnp.asarray(1e-30, U.dtype) * G).astype(U.dtype)
                return (U, D, T), None
            (U, D, T), _ = jax.lax.scan(step, (U, D, T),
                                        None, length=max(1, K // 10))
            return U

        out = greens_chain(out, bD, bT)
        float(jnp.sum(jnp.real(out)))
        t0 = time.time()
        out2 = greens_chain(out, bD, bT)
        float(jnp.sum(jnp.real(out2)))
        t_cg = (time.time() - t0) / max(1, K // 10) * 1e3
        print(f"{'calculate_greens':34s} {t_cg:8.4f} ms / boundary")

    # net out the shared per-iteration scaffolding so it is not subtracted
    # twice (each region's scan body pays the same RNG split + draw + flip)
    s_net = t_sweep - t_null
    w_net = t_wrap - t_null
    both_net = t_both - t_null
    overhead = both_net - s_net - w_net
    print(f"\nper-slice-visit split (net of {t_null:.4f} ms scaffolding): "
          f"sweep {s_net:.4f} + wrap {w_net:.4f} ms "
          f"(combined {both_net:.4f}; fusion overlap {overhead:+.4f})")
    print(f"wrap share of the slice path: {w_net / both_net:.1%} — the upper "
          f"bound on ROADMAP lever 2 (wrap fusion) for the headline")


if __name__ == "__main__":
    main()
