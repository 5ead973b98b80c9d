"""One-process A/B for the delay-2 (paired-site) col_read site kernel.

The pair kernel handles two consecutive sites per grid step: site i+1's
decision quantities are corrected exactly from site i's rank-1 terms
(O(N) vector ops), and both rank-1 updates land in one read-modify-write
pass over the (N,N,CB) block — halving the kernel's dominant full-block
traffic. Interpret-mode pin: bit-identical to the sequential col_read
kernel (tests/test_pallas_kernel.py). This measures the real win at the
bench operating points (headline sm=10, drift-proof sm=1, g_refresh sm=5,
repulsive F=2).
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

sys.path.insert(0, _REPO)


def bench(tag, pair, sm=10, g_refresh=False, sweeps=6, chains=256,
          repulsive=False):
    os.environ["MC_TPU_SITE_PAIR"] = "1" if pair else "0"
    try:
        from montecarlo_tpu import (HubbardModelAttractive,
                                    HubbardModelRepulsive)
        from montecarlo_tpu.dqmc import core
        from montecarlo_tpu.dqmc.parameters import DQMCParameters
        cls = HubbardModelRepulsive if repulsive else HubbardModelAttractive
        model = cls(dims=2, L=8, U=4.0, mu=0.0)
        params = DQMCParameters(beta=10.0, safe_mult=sm)
        ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                        use_pallas=True, g_refresh=g_refresh)
        key = jax.random.PRNGKey(0)
        conf = model.rand_conf(key, chains, params.slices)
        keys = jax.random.split(key, chains)
        st = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf,
                                                                      keys)
        sweep = jax.jit(jax.vmap(partial(core.sweep_pair, ctx, consts)))
        st, _, _ = sweep(st)
        float(jnp.sum(jnp.real(st["G"])))
        t0 = time.time()
        for _ in range(sweeps):
            st, _, _ = sweep(st)
        float(jnp.sum(jnp.real(st["G"])))
        dt = time.time() - t0
        acc = float(jnp.sum(st["acc"])) / float(jnp.sum(st["prop"]))
        drift = float(jnp.max(st["prop_err_max"]))
        print(f"{tag:30s} {chains * sweeps / dt:9.1f} cs/s  acc={acc:.4f} "
              f"drift_max={drift:.3g}", flush=True)
        return chains * sweeps / dt
    except Exception as e:
        print(f"{tag:30s} ERROR {e!r}", flush=True)
        return None
    finally:
        os.environ.pop("MC_TPU_SITE_PAIR", None)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for pair in (False, True):
        lbl = "pair" if pair else "seq "
        bench(f"headline sm=10 {lbl}", pair)
        bench(f"sm=1           {lbl}", pair, sm=1, sweeps=2)
        bench(f"g_refresh sm=5 {lbl}", pair, sm=5, g_refresh=True, sweeps=4)
        bench(f"repulsive sm=10 {lbl}", pair, repulsive=True, sweeps=4)
