"""Complex-hopping (Peierls) throughput at the headline config.

Measures chain-sweeps/s for the 8x8 attractive Hubbard with a pure-gauge
Peierls pattern (complex64 session) at beta=10, 256 chains, safe_mult=10 —
the complex counterpart of bench.py's headline — with the fused complex
kernels on (default) or off (MC_CPLX_PALLAS=0). Round-2 XLA-path anchor:
853 chain-sweeps/s on v5e.

Usage: python benchmarks/complex_bench.py   (on the TPU runtime)
"""

import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from montecarlo_tpu import HubbardModelAttractive  # noqa: E402
from montecarlo_tpu.dqmc import core  # noqa: E402
from montecarlo_tpu.dqmc.parameters import DQMCParameters  # noqa: E402

CHAINS = int(os.environ.get("MC_CPLX_CHAINS", "256"))
L = int(os.environ.get("MC_CPLX_L", "8"))
BETA = float(os.environ.get("MC_CPLX_BETA", "10.0"))
SWEEPS = int(os.environ.get("MC_CPLX_SWEEPS", "4"))
SM = int(os.environ.get("MC_CPLX_SM", "10"))
USE_PALLAS = os.environ.get("MC_CPLX_PALLAS", "1") == "1"


def main():
    N = L * L
    rng = np.random.default_rng(0)
    phis = rng.uniform(0.0, 2 * np.pi, N)
    theta = phis[:, None] - phis[None, :]        # pure gauge
    model = HubbardModelAttractive(dims=2, L=L, U=4.0, mu=0.0, peierls=theta)
    params = DQMCParameters(beta=BETA, safe_mult=SM)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=USE_PALLAS)
    print(f"config: N={ctx.N} chains={CHAINS} dtype={ctx.dtype} "
          f"sm={SM} use_pallas={ctx.use_pallas}", flush=True)
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, CHAINS, params.slices)
    keys = jax.random.split(key, CHAINS)
    state = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
    sweep = jax.jit(jax.vmap(partial(core.sweep_pair, ctx, consts)))
    state, _, _ = sweep(state)                   # compile + warmup
    float(jnp.sum(jnp.real(state["G"])))         # host fetch = real sync
    t0 = time.time()
    for _ in range(SWEEPS):
        state, _, _ = sweep(state)
    float(jnp.sum(jnp.real(state["G"])))
    dt = time.time() - t0
    acc = float(jnp.sum(state["acc"])) / float(jnp.sum(state["prop"]))
    drift = float(jnp.max(state["prop_err_max"]))
    # pure gauge => the average phase must stay exactly 1
    ph = complex(np.mean(np.asarray(state["ls_phase"])))
    print(f"{CHAINS * SWEEPS / dt:.1f} chain-sweeps/s  "
          f"({dt / SWEEPS:.3f} s/batched sweep)  acc={acc:.4f}  "
          f"drift_max={drift:.3g}  mean_phase={ph:.4f}", flush=True)


if __name__ == "__main__":
    main()
