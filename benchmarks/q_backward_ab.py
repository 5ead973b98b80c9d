"""What fraction of the fused UDT kernel is Q accumulation, and how much
does a panel-blocked BACKWARD Q accumulation (DORGQR-style) save?

The fused QR kernels (ops/pallas_qr.py::_udt_kernel/_udt_solve_kernel) are
VPU-bound: per Householder column they make 2 full (N,N,CB) passes for the
R update and 2 more for the forward Q accumulation Q <- Q.H_j. Accumulating
Q backward (P <- H_j.P, j descending) touches only the trailing
(N-j, N-j) block; with the column loop split into two static halves the
j >= N/2 reflectors work on a (N/2, N/2) block = 1/4 of the pass, cutting
the Q work to 0.625x (and further with finer panels).

Arms (anchor shape 256 chains, N=64, f32, v5e):
  full      — shipped _udt_kernel (forward Q) via udt_fused_lanes
  noq       — same kernel with the Q passes deleted (lower bound)
  backward  — reflector phase stores (V, tau), then a backward half-blocked
              Q phase
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
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, N, K = 256, 64, 200
CB = 128


def _reflector(At_ref, j):
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
    return x, v, tau, s, normx, tail, onehot_j


def _kernel_noq(At_in, At_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        At_ref[...] = At_in[...]

    x, v, tau, s, normx, tail, onehot_j = _reflector(At_ref, j)
    At = At_ref[...]
    w = jnp.sum(At * v, axis=1, keepdims=True)
    At_ref[...] = At - (tau * w) * v
    rjj = -s * normx
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj * onehot_j


def _kernel_backward(At_in, At_ref, Q_ref, V_ref, Tau_ref):
    """Grid (ncb, N + N): steps 0..N-1 reflectors (store V, tau), steps
    N..2N-1 backward Q with a half-size block for the trailing reflectors."""
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        At_ref[...] = At_in[...]

    @pl.when(step < N)
    def _phase_r():
        j = step
        x, v, tau, s, normx, tail, onehot_j = _reflector(At_ref, j)
        At = At_ref[...]
        w = jnp.sum(At * v, axis=1, keepdims=True)
        At_ref[...] = At - (tau * w) * v
        rjj = -s * normx
        At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj * onehot_j
        V_ref[pl.ds(j, 1)] = v
        Tau_ref[pl.ds(j, 1)] = jnp.broadcast_to(tau, (1, 8, CB))

    @pl.when(step == N)
    def _qinit():
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))

    H = N // 2

    @pl.when((step >= N) & (step < N + H))
    def _phase_q_hi():
        # j in [N/2, N): P <- H_j P touches only rows/cols >= N/2 of P.
        # Q_ref stores P TRANSPOSED like At: S[c, r, ch]; the update is
        # S <- S - (tau*w)*v with w = sum(S*v, axis=1) over the active block.
        j = 2 * N - 1 - step
        v = V_ref[pl.ds(j, 1), pl.ds(H, H)]                   # (1,H,CB)
        tau = Tau_ref[pl.ds(j, 1), 0:1]                       # (1,1,CB)
        S = Q_ref[pl.ds(H, H), pl.ds(H, H)]                   # (H,H,CB)
        w = jnp.sum(S * v, axis=1, keepdims=True)
        Q_ref[pl.ds(H, H), pl.ds(H, H)] = S - (tau * w) * v

    @pl.when(step >= N + H)
    def _phase_q_lo():
        j = 2 * N - 1 - step
        v = V_ref[pl.ds(j, 1)]
        tau = Tau_ref[pl.ds(j, 1), 0:1]
        S = Q_ref[...]
        w = jnp.sum(S * v, axis=1, keepdims=True)
        Q_ref[...] = S - (tau * w) * v


def run_noq(A):
    At = jnp.transpose(A, (2, 1, 0))
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    At_out = pl.pallas_call(
        _kernel_noq,
        grid=(B // CB, N),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N, N, B), jnp.float32),
    )(At)
    return jnp.transpose(At_out, (2, 1, 0))


def run_backward(A):
    At = jnp.transpose(A, (2, 1, 0))
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    tspec = pl.BlockSpec((N, 8, CB), lambda cb, j: (i32(0), i32(0), cb))
    At_out, Q_out = pl.pallas_call(
        _kernel_backward,
        grid=(B // CB, 2 * N),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N, N, B), jnp.float32),
                   jax.ShapeDtypeStruct((N, N, B), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((N, N, CB), jnp.float32),
                        pltpu.VMEM((N, 8, CB), jnp.float32)],
    )(At)
    R = jnp.transpose(At_out, (2, 1, 0))
    Q = jnp.transpose(Q_out, (2, 1, 0))   # S = Q^T -> (ch, r, c)
    return R, Q


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


def chain(fn, nout=1):
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
    # graded test matrix like a prescaled propagator product
    A = jax.random.normal(key, (B, N, N), jnp.float32)
    g = jnp.exp2(jnp.linspace(18.0, -20.0, N))
    A = (A * g[None, None, :]).astype(jnp.float32)

    from montecarlo_tpu.ops import pallas_qr

    # correctness of the backward arm vs the shipped kernel
    R1, Q1 = run_backward(A)
    Q0, Rs0, d0 = pallas_qr._udt_fused_batched(A, jnp.ones((B,), jnp.float32))
    recon1 = jnp.einsum("brk,bkc->brc", Q1, R1)
    err_rec = float(jnp.max(jnp.abs(recon1 - A) / jnp.max(jnp.abs(A))))
    err_q = float(jnp.max(jnp.abs(Q1 - Q0)))
    orth = float(jnp.max(jnp.abs(
        jnp.einsum("brk,brc->bkc", Q1, Q1) - jnp.eye(N))))
    print(f"backward: |QR-A|/|A| {err_rec:.2e}  |Q-Q_fwd| {err_q:.2e}  "
          f"|QtQ-I| {orth:.2e}", flush=True)

    udt = pallas_qr.udt_fused_lanes()
    mx = jnp.ones((B,), jnp.float32)
    _time("full fused udt (fwd Q)", chain(lambda A: udt(A, mx)), A)
    _time("noq (R only)", chain(run_noq), A)
    _time("backward half-blocked Q", chain(run_backward), A)


if __name__ == "__main__":
    main()
