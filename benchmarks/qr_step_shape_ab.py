"""Grid-step-shape A/B for the fused QR kernels.

q_backward_ab measured the kernels ~30-40% per-grid-step-overhead bound
(backward half-blocked Q saved its compute but not its steps and won
nothing). This sweeps the two step-shape levers on the FULL (QR + forward
Q) arm at the anchor shape (256 chains, N=64, f32):

  cols/step in {1, 2, 4} — unroll k sequential Householder columns per grid
      step (same passes, 1/k the step dispatch overhead)
  CB in {128, 256}       — lane-block width (wider = fewer chunks, fatter ops)
"""
import os
import sys
import time
import functools

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

from jax.experimental import pallas as pl  # noqa: E402

B, N, K = 256, 64, 200


def _one_col(At_ref, Q_ref, j):
    x = At_ref[pl.ds(j, 1)]
    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
    tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))
    alpha = jnp.sum(x * onehot_j, axis=1, keepdims=True)
    sigma = jnp.sum((x * tail) ** 2, axis=1, keepdims=True)
    normx = jnp.sqrt(alpha * alpha + sigma)
    s = jnp.where(alpha >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    vj = alpha + s * normx
    v = x * tail + vj * onehot_j
    vtv = sigma + vj * vj
    tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))
    At = At_ref[...]
    w = jnp.sum(At * v, axis=1, keepdims=True)
    At_ref[...] = At - (tau * w) * v
    rjj = -s * normx
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj * onehot_j
    Q = Q_ref[...]
    qw = jnp.sum(Q * v, axis=1, keepdims=True)
    Q_ref[...] = Q - (tau * qw) * v


def _kernel(CB, KCOL, At_in, At_ref, Q_ref):
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        At_ref[...] = At_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))

    for k in range(KCOL):
        _one_col(At_ref, Q_ref, step * KCOL + k)


def make_run(CB, KCOL):
    def run(A):
        At = jnp.transpose(A, (2, 1, 0))
        i32 = jnp.int32
        spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
        At_out, Q_out = pl.pallas_call(
            functools.partial(_kernel, CB, KCOL),
            grid=(B // CB, N // KCOL),
            in_specs=[spec],
            out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((N, N, B), jnp.float32),
                       jax.ShapeDtypeStruct((N, N, B), jnp.float32)],
        )(At)
        return jnp.transpose(At_out, (2, 1, 0)), Q_out
    return run


def _time(tag, fn, *args, per=K):
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    dt = time.time() - t0
    print(f"{tag:28s} {dt / per * 1e3:8.3f} ms/iter   ({dt:.2f}s / {per})",
          flush=True)
    return dt / per


def chain(fn):
    @jax.jit
    def run(A):
        def body(carry, _):
            eps = carry * 0.0 + 1.0
            out = fn(A * eps)
            lead = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.real(lead[0, 0, 0]), None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=K)
        return c
    return run


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, N, N), jnp.float32)
    g = jnp.exp2(jnp.linspace(18.0, -20.0, N))
    A = (A * g[None, None, :]).astype(jnp.float32)

    # correctness: all variants must agree with the CB=128/1-col baseline
    R_ref, _ = make_run(128, 1)(A)
    for CB in (128, 256):
        for KCOL in (1, 2, 4):
            R, _ = make_run(CB, KCOL)(A)
            err = float(jnp.max(jnp.abs(R - R_ref)))
            tag = f"CB={CB} cols/step={KCOL}"
            assert err < 1e-3 * float(jnp.max(jnp.abs(R_ref))), (tag, err)
            _time(tag, chain(make_run(CB, KCOL)), A)


if __name__ == "__main__":
    main()
