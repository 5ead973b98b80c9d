"""A/B for the fused UDT Pallas kernels (ops/pallas_qr.py::_udt_kernel /
_udt_solve_kernel) on the boundary path (reference stack.jl:272-393).

Runs the three shipped operating points with MC_TPU_FUSED_UDT=0 vs 1:
  headline (sm=10), the sm=1 drift-proof anchor (where boundaries dominate:
  extend ~0.45 ms + cg misc ~0.2 ms of the 1.56 ms slice visit), and the
  g_refresh conservative mode (sm=5).
"""
import os
import sys
import time
from functools import partial

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def bench(tag, fused, l=8, chains=256, sweeps=6, sm=10, g_refresh=False):
    os.environ["MC_TPU_FUSED_UDT"] = "1" if fused else "0"
    from montecarlo_tpu import HubbardModelAttractive
    from montecarlo_tpu.dqmc import core
    from montecarlo_tpu.dqmc.parameters import DQMCParameters
    model = HubbardModelAttractive(dims=2, L=l, U=4.0, mu=0.0)
    params = DQMCParameters(beta=10.0, safe_mult=sm)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=True, g_refresh=g_refresh)
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
    dmax = float(jnp.max(st["prop_err_max"]))
    dmean = float(jnp.sum(st["prop_err_sum"]) /
                  jnp.maximum(1, jnp.sum(st["prop_err_n"])))
    print(f"{tag:32s} {chains*sweeps/dt:9.1f} cs/s  acc={acc:.4f} "
          f"drift={dmean:.3g}/{dmax:.3g}", flush=True)


if __name__ == "__main__":
    from montecarlo_tpu.ops import pallas_qr
    print("probe udt:", pallas_qr.fused_udt_ok(64, "udt"),
          " solve:", pallas_qr.fused_udt_ok(64, "solve"), flush=True)
    for fused in (False, True):
        bench(f"headline sm=10 fused={int(fused)}", fused, sweeps=6)
        bench(f"anchor   sm=1  fused={int(fused)}", fused, sm=1, sweeps=2)
        bench(f"g_refresh sm=5 fused={int(fused)}", fused, sm=5,
              g_refresh=True, sweeps=3)
