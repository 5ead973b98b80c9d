"""One-process A/B matrix for the flag-gated perf levers (run on TPU).

Measures the headline config (8x8, beta=10, 256 chains, f32, sm=10) under:
baseline / sites-per-step {2,4,8} / fused wrap / combinations, then the
L=16 site-major point and the complex mode with kernels on/off.
"""
import os
import sys
import time
from functools import partial

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def bench(tag, env=None, l=8, chains=256, sweeps=6, sm=10, use_pallas=True,
          dtype="float32"):
    env = env or {}
    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from montecarlo_tpu import HubbardModelAttractive
        from montecarlo_tpu.dqmc import core
        from montecarlo_tpu.dqmc.parameters import DQMCParameters
        model = HubbardModelAttractive(dims=2, L=l, U=4.0, mu=0.0)
        params = DQMCParameters(beta=10.0, safe_mult=sm)
        ctx, consts = core.make_context(model, params, dtype=jnp.dtype(dtype),
                                        use_pallas=use_pallas)
        key = jax.random.PRNGKey(0)
        conf = model.rand_conf(key, chains, params.slices)
        keys = jax.random.split(key, chains)
        st = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
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
        print(f"{tag:34s} {chains*sweeps/dt:9.1f} cs/s  acc={acc:.4f} "
              f"drift_max={drift:.3g}", flush=True)
        return chains * sweeps / dt
    except Exception as e:
        print(f"{tag:34s} ERROR {e!r}", flush=True)
        return None
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def run_matrix():
    bench("baseline sm=10")
    bench("S=2", {"MC_TPU_SITES_PER_STEP": "2"})
    bench("S=4", {"MC_TPU_SITES_PER_STEP": "4"})
    bench("S=8", {"MC_TPU_SITES_PER_STEP": "8"})
    bench("fuse_wrap", {"MC_TPU_FUSE_WRAP": "1"})
    bench("fuse_wrap+S=4",
          {"MC_TPU_FUSE_WRAP": "1", "MC_TPU_SITES_PER_STEP": "4"})
    bench("fuse_wrap+S=8",
          {"MC_TPU_FUSE_WRAP": "1", "MC_TPU_SITES_PER_STEP": "8"})
    bench("sm=1 baseline", sm=1, sweeps=2)
    bench("sm=1 fuse_wrap+S=4", {"MC_TPU_FUSE_WRAP": "1",
                                 "MC_TPU_SITES_PER_STEP": "4"}, sm=1, sweeps=2)
    bench("L=16 site-major 64ch", l=16, chains=64, sweeps=2)
    bench("L=16 xla (no pallas) 64ch", l=16, chains=64, sweeps=2,
          use_pallas=False)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run_matrix()
