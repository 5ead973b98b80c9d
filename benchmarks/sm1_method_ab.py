"""A/B: stack-extension stabilization method at the sm=1 drift-proof anchor.

The sm=1 anchor spends most of its wall on the boundary path (extend +
calculate_greens, one boundary per slice visit). `stab_method="cholqr"`
(ops/linalg.py::udt_well_conditioned — CholeskyQR2 on the well-conditioned
window factor, grading folded exactly into T) replaces the Householder UDT
of extend_left/right with pure MXU matmuls + an n×n Cholesky; at sm=1 the
window factor's condition is e^{dtau*W} ~ 2, squarely inside CholQR2's
validity. calculate_greens keeps the Householder path either way (its
bracket M is graded).

Usage: python benchmarks/sm1_method_ab.py   (on the TPU runtime)
"""
import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from montecarlo_tpu import HubbardModelAttractive  # noqa: E402
from montecarlo_tpu.dqmc import core  # noqa: E402
from montecarlo_tpu.dqmc.parameters import DQMCParameters  # noqa: E402


def bench(tag, stab_method, sm=1, chains=256, sweeps=2):
    model = HubbardModelAttractive(dims=2, L=8, U=4.0, mu=0.0)
    params = DQMCParameters(beta=10.0, safe_mult=sm)
    ctx, consts = core.make_context(model, params, dtype=jnp.float32,
                                    use_pallas=True, stab_method=stab_method)
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
    dmean = float(jnp.sum(st["prop_err_sum"])
                  / jnp.maximum(1, jnp.sum(st["prop_err_n"])))
    print(f"{tag:34s} {chains * sweeps / dt:9.2f} cs/s  acc={acc:.4f} "
          f"drift_max={dmax:.3g} drift_mean={dmean:.3g}", flush=True)


if __name__ == "__main__":
    bench("sm=1 qr (Householder, shipped)", "qr")
    bench("sm=1 cholqr (CholeskyQR2)", "cholqr")
    bench("sm=10 qr (headline ref)", "qr", sm=10)
    bench("sm=10 cholqr", "cholqr", sm=10)
