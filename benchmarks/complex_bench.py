"""Complex-hopping (Peierls) throughput at the headline config.

Measures chain-sweeps/s for the 8x8 attractive Hubbard with a pure-gauge
Peierls pattern (complex64 session) at beta=10, 256 chains, safe_mult=10 —
the complex counterpart of bench.py's headline — with the fused complex
kernels on (default) or off (MC_CPLX_PALLAS=0). Round-2 XLA-path anchor:
853 chain-sweeps/s on v5e. bench.py's `complex_mode` field imports
run_complex_bench so the driver record and this script share ONE protocol.

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
from montecarlo_tpu.utils.host import to_host  # noqa: E402

CHAINS = int(os.environ.get("MC_CPLX_CHAINS", "256"))
L = int(os.environ.get("MC_CPLX_L", "8"))
BETA = float(os.environ.get("MC_CPLX_BETA", "10.0"))
SWEEPS = int(os.environ.get("MC_CPLX_SWEEPS", "4"))
SM = int(os.environ.get("MC_CPLX_SM", "10"))
USE_PALLAS = os.environ.get("MC_CPLX_PALLAS", "1") == "1"


def run_complex_bench(chains=CHAINS, L=L, beta=BETA, sweeps=SWEEPS,
                      safe_mult=SM, use_pallas=USE_PALLAS):
    """Timed pure-gauge complex64 session; returns a dict of results.

    The host fetch (not block_until_ready) is the sync point, and the phase
    comes back via to_host — complex device->host transfers are
    UNIMPLEMENTED on some tunneled TPU runtimes."""
    N = L * L
    rng = np.random.default_rng(0)
    phis = rng.uniform(0.0, 2 * np.pi, N)
    theta = phis[:, None] - phis[None, :]        # pure gauge
    model = HubbardModelAttractive(dims=2, L=L, U=4.0, mu=0.0, peierls=theta)
    params = DQMCParameters(beta=beta, safe_mult=safe_mult)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=use_pallas)
    key = jax.random.PRNGKey(0)
    conf = model.rand_conf(key, chains, params.slices)
    keys = jax.random.split(key, chains)
    state = jax.jit(jax.vmap(partial(core.init_state, ctx, consts)))(conf, keys)
    sweep = jax.jit(jax.vmap(partial(core.sweep_pair, ctx, consts)))
    state, _, _ = sweep(state)                   # compile + warmup
    float(jnp.sum(jnp.real(state["G"])))         # host fetch = real sync
    t0 = time.time()
    for _ in range(sweeps):
        state, _, _ = sweep(state)
    float(jnp.sum(jnp.real(state["G"])))
    dt = time.time() - t0
    ph = complex(np.mean(to_host(state["ls_phase"])))
    return {
        "use_pallas": bool(ctx.use_pallas),
        "chains": chains,
        "chain_sweeps_per_s": round(chains * sweeps / dt, 3),
        "s_per_batched_sweep": round(dt / sweeps, 4),
        "acceptance": round(float(jnp.sum(state["acc"]))
                            / float(jnp.sum(state["prop"])), 4),
        "drift_max": float(jnp.max(state["prop_err_max"])),
        # pure gauge => the average phase must stay exactly 1
        "mean_phase_re": round(ph.real, 5),
        "mean_phase_im": round(ph.imag, 5),
    }


def main():
    r = run_complex_bench()
    print(f"config: L={L} chains={r['chains']} sm={SM} "
          f"use_pallas={r['use_pallas']}", flush=True)
    print(f"{r['chain_sweeps_per_s']:.1f} chain-sweeps/s  "
          f"({r['s_per_batched_sweep']:.3f} s/batched sweep)  "
          f"acc={r['acceptance']:.4f}  drift_max={r['drift_max']:.3g}  "
          f"mean_phase={r['mean_phase_re']:.4f}{r['mean_phase_im']:+.4f}j",
          flush=True)


if __name__ == "__main__":
    main()
