"""Pallas TPU kernel: batched Householder QR with chains on the VPU lanes.

XLA's QR on TPU lowers to a blocked Householder While-loop whose per-column
overhead dominates at DQMC sizes (64×64 matrices, hundreds of chains): ~3 ms
per (256, 64, 64) float32 call inside a `lax.scan` — and the UDT-stabilized
sweep performs ~21 of them per sweep pair (extend_left/right +
calculate_greens), making stabilization, not the Metropolis site loop, the
bottleneck of the hot path.

This kernel runs the classic column-by-column Householder QR
(reference algorithm: udt_AVX_pivot!'s reflector loop,
/root/reference/src/linalg/UDT.jl:192-281, itself LAPACK-style) with the
batch on the 128-wide lane dimension, exactly like the fused site sweep
(ops/pallas_site_sweep.py): the column loop is the sequential TPU grid, A is
kept TRANSPOSED in VMEM as At = (col, row, CB) so the per-column access is a
dynamic outer-dim slice (dynamic lane/sublane indexing is unsupported by
Mosaic), and each reflector application is a VPU masked-reduction + rank-1
update over the whole (N, N, CB) block.

float32 only (Mosaic has no f64); CPU backend uses the interpreter (tests).

Numerical notes:
  * LAPACK sign convention: v_j = alpha + sign(alpha)·normx, R_jj =
    -sign(alpha)·normx. udt_dirty takes |R_jj| afterwards, so signs are free.
  * A zero column tail (already-triangular input, or flushed-to-zero modes)
    gives vtv = 0 → tau = 0 → H = I, matching LAPACK's H = I convention.
  * Columns k < j have zero entries in rows ≥ j, so w_k = Σ_r At[k,r]·v_r
    vanishes automatically — no column masking is needed for correctness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

try:  # moved out of the jax namespace in jax 0.9
    from jax.custom_batching import custom_vmap
except ImportError:  # pragma: no cover
    custom_vmap = jax.custom_vmap


def _qr_kernel(N, CB, At_in, At_ref, Q_ref):
    """One grid step = one Householder column j (grid = (n_cb, N)).

    At_ref: (N, N, CB) f32 — A transposed, [col, row, chain]; becomes Rᵀ.
    Q_ref:  (N, N, CB) f32 — [row, col, chain]; accumulates Q = H_0···H_{N-1}.
    State persists across grid steps in the output refs; inputs are copied in
    at j == 0 (input_output_aliases corrupts state under scan+cond, see
    pallas_site_sweep.py)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        At_ref[...] = At_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))

    x = At_ref[pl.ds(j, 1)]                                     # (1,N,CB)
    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
    tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))

    alpha = jnp.sum(x * onehot_j, axis=1, keepdims=True)        # (1,1,CB)
    sigma = jnp.sum((x * tail) ** 2, axis=1, keepdims=True)     # (1,1,CB)
    normx = jnp.sqrt(alpha * alpha + sigma)
    s = jnp.where(alpha >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    vj = alpha + s * normx
    v = x * tail + vj * onehot_j                                # (1,N,CB)
    vtv = sigma + vj * vj
    tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))       # (1,1,CB)

    # apply H = I - tau·vvᵀ to A's rows: At[c] -= tau·(At[c]·v)·v
    At = At_ref[...]
    w = jnp.sum(At * v, axis=1, keepdims=True)                  # (N,1,CB)
    At_ref[...] = At - (tau * w) * v
    # exact zero fill of column j's subdiagonal + exact R_jj (the generic
    # update leaves O(eps·normx) residues there)
    rjj = -s * normx
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj * onehot_j

    # accumulate Q ← Q·H: Q[r] -= tau·(Q[r]·v)·v  (v lives on Q's col dim)
    Q = Q_ref[...]
    qw = jnp.sum(Q * v, axis=1, keepdims=True)                  # (N,1,CB)
    Q_ref[...] = Q - (tau * qw) * v


def _pick_chain_block(B: int) -> int:
    for cb in (256, 128, 64, 32, 16, 8):
        if B % cb == 0:
            return cb
    return B


def _qr_batched(A):
    """Householder QR of A (B, N, N) f32 → (Q, R), both (B, N, N)."""
    B, N, _ = A.shape
    CB = _pick_chain_block(B)
    kern = functools.partial(_qr_kernel, N, CB)
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 1, 0))                            # (col,row,B)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    At_out, Q_out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B // CB, N),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
        ],
    )(At)
    R = jnp.transpose(At_out, (2, 1, 0))
    Q = jnp.transpose(Q_out, (2, 0, 1))
    return Q, R


_QR_CACHE = {}


def qr_lanes():
    """A (..., N, N) f32 QR whose vmap rule folds ALL leading axes into the
    kernel's lane batch instead of serializing them through the grid."""
    if "fn" in _QR_CACHE:
        return _QR_CACHE["fn"]

    @custom_vmap
    def qr(A):
        lead = A.shape[:-2]
        N = A.shape[-1]
        Af = A.reshape((-1, N, N))
        Q, R = _qr_batched(Af)
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn"] = qr
    return qr


def qr_supported(A) -> bool:
    """Kernel eligibility: f32 square trailing dims, sublane-aligned N.

    The leading batch size is NOT checked: at trace time inside a vmapped
    sweep the per-chain shape is only (F, N, N) — the real lane batch
    appears through the custom_vmap rule."""
    if not HAVE_PALLAS or A.dtype != jnp.float32:
        return False
    N = A.shape[-1]
    return A.ndim >= 2 and A.shape[-2] == N and N % 8 == 0 and N >= 8


# None = auto (on for the TPU backend); tests may force True (interpret mode
# on CPU) or False.
ENABLED = None


def enabled() -> bool:
    if ENABLED is not None:
        return ENABLED
    return jax.default_backend() not in ("cpu", "gpu")


def maybe_qr(A):
    """Drop-in for jnp.linalg.qr(A) routing lane-tileable f32 batches to the
    fused kernel on TPU."""
    if enabled() and qr_supported(A):
        return qr_lanes()(A)
    return jnp.linalg.qr(A)
