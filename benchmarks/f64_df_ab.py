"""A/B for the double-float Householder QR kernel (MC_TPU_QR_DF) in the
strict-f64 mode (the reference's native numerics: f64 Householder UDT,
/root/reference/src/linalg/UDT.jl:62-123). Also times one raw QR call to
separate kernel speedup from the rest of the emulated-f64 sweep.
"""
import os
import sys
import time
from functools import partial

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def bench_sweep(tag, df, chains=256, sweeps=1, sm=10):
    os.environ["MC_TPU_QR_DF"] = "1" if df else "0"
    from montecarlo_tpu import HubbardModelAttractive
    from montecarlo_tpu.dqmc import core
    from montecarlo_tpu.dqmc.parameters import DQMCParameters
    model = HubbardModelAttractive(dims=2, L=8, U=4.0, mu=0.0)
    params = DQMCParameters(beta=10.0, safe_mult=sm)
    ctx, consts = core.make_context(model, params, dtype=jnp.float64,
                                    use_pallas=True)
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
    hist = [int(x) for x in jnp.sum(st["prop_err_hist"], axis=0)]
    print(f"{tag:28s} {chains*sweeps/dt:9.2f} cs/s  acc={acc:.4f} "
          f"drift_max={dmax:.3g} drift_mean={dmean:.3g} exceed={hist}",
          flush=True)


def bench_qr_call(B=256, N=64, reps=20):
    """Raw per-call time: XLA f64 QR vs the df kernel, inside a scan chain
    (loop-carried so nothing hoists), host-fetch synced."""
    from montecarlo_tpu.ops import pallas_qr
    A = jax.random.normal(jax.random.PRNGKey(1), (B, N, N), jnp.float64)
    A = A * (2.0 ** 40)

    def chain(fn):
        def body(carry, _):
            Q, R = fn(carry)
            return Q + 1e-6 * R, None
        return jax.jit(lambda A: jax.lax.scan(body, A, None, length=reps)[0])

    for name, fn in (("xla f64 qr", jnp.linalg.qr),
                     ("df kernel", pallas_qr.qr_lanes_df())):
        f = chain(fn)
        out = f(A)
        float(jnp.sum(out))
        t0 = time.time()
        out = f(A)
        float(jnp.sum(out))
        dt = (time.time() - t0) / reps
        print(f"raw QR ({B},{N},{N}) f64 {name:12s}: {dt*1e3:8.2f} ms/call",
              flush=True)


if __name__ == "__main__":
    from montecarlo_tpu.ops import pallas_qr
    print("df_qr_ok(64):", pallas_qr.df_qr_ok(64), flush=True)
    bench_qr_call()
    bench_sweep("f64 sm=10 df=0 (XLA QR)", False)
    bench_sweep("f64 sm=10 df=1 (kernel)", True)
    bench_sweep("f64 sm=1  df=0 (XLA QR)", False, sm=1)
    bench_sweep("f64 sm=1  df=1 (kernel)", True, sm=1)
