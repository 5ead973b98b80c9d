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


def _blocked_kernel(N, CB, KB, At_in, At_ref, Q_ref):
    """One grid step = one PANEL of KB Householder columns (grid =
    (n_cb, N // KB)). Blocked WY update: the panel's reflectors are computed
    column-by-column on the (KB, N, CB) slab only, then applied to the
    trailing columns and to Q in ONE pass each via the compact form
    H_0···H_{KB-1} = I − V·T·Vᵀ (LARFT forward T). This cuts the full-matrix
    VMEM traffic per column by ~KB/3 versus the per-column kernel and divides
    the sequential grid length (and its fixed per-step cost) by KB.

    Algebra notes:
      * trailing columns need a ← H_last···H_first·a = (I − V·Tᵀ·Vᵀ)·a;
        in At row form: At[c] ← At[c] − ((At[c]·V)·T)·Vᵀ — identical to the
        Q update Q[r] ← Q[r] − ((Q[r]·V)·T)·Vᵀ for Q ← Q·(I − V·T·Vᵀ).
      * already-finalized columns (c < base) are invariant automatically
        (zero tails), but PANEL columns are not — they already received
        their reflectors during the panel phase — so the At update is
        masked to c ≥ base + KB.
    """
    j0 = pl.program_id(1)
    base = j0 * KB

    @pl.when(j0 == 0)
    def _init():
        At_ref[...] = At_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))

    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    p_ids = lax.broadcasted_iota(jnp.int32, (KB, 1, 1), 0)

    # ---- panel phase: reflectors on the (KB, N, CB) slab only
    P = At_ref[pl.ds(base, KB)]
    vs, taus = [], []
    for kb in range(KB):
        j = base + kb
        x = P[kb:kb + 1]                                        # (1,N,CB)
        onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
        tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))
        alpha = jnp.sum(x * onehot_j, axis=1, keepdims=True)    # (1,1,CB)
        sigma = jnp.sum((x * tail) ** 2, axis=1, keepdims=True)
        normx = jnp.sqrt(alpha * alpha + sigma)
        s = jnp.where(alpha >= 0, jnp.float32(1.0), jnp.float32(-1.0))
        vj = alpha + s * normx
        v = x * tail + vj * onehot_j                            # (1,N,CB)
        vtv = sigma + vj * vj
        tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))   # (1,1,CB)
        # apply to the whole slab (finalized rows have zero tails → no-op),
        # then exact-finalize row kb: zeros below pivot, R_jj = -s·normx
        w = jnp.sum(P * v, axis=1, keepdims=True)               # (KB,1,CB)
        P = P - (tau * w) * v
        fin = x * (1.0 - tail - onehot_j) + (-s * normx) * onehot_j
        P = jnp.where(p_ids == kb, fin, P)
        vs.append(v)
        taus.append(tau)
    At_ref[pl.ds(base, KB)] = P

    # ---- forward LARFT: T upper triangular with H_0···H_{KB-1} = I − V·T·Vᵀ
    # g[m][j] = V[:,m]·v_j  (m < j)
    g = {}
    for jj in range(1, KB):
        for m in range(jj):
            g[(m, jj)] = jnp.sum(vs[m] * vs[jj], axis=1, keepdims=True)
    T = {}
    for jj in range(KB):
        T[(jj, jj)] = taus[jj]
        for i in range(jj - 1, -1, -1):
            acc = None
            for m in range(i, jj):
                term = T[(i, m)] * g[(m, jj)]
                acc = term if acc is None else acc + term
            T[(i, jj)] = -taus[jj] * acc

    # ---- one-pass block apply, chunked over the row dim of X to bound VMEM
    # temporaries (a full-matrix X copy + update would blow the 16 MB scoped
    # limit together with At/Q residing in VMEM): X ← X − ((X·V)·T)·Vᵀ
    # The chunk must DIVIDE N or the last pl.ds runs past the ref bounds
    # (N=72 with CH=16 would address rows 64..79 of a 72-row ref).
    CH = 16 if N % 16 == 0 else (8 if N % 8 == 0 else KB)

    def block_apply(X_ref, mask_trailing):
        for c0 in range(0, N, CH):
            X = X_ref[pl.ds(c0, CH)]                 # (CH,N,CB)
            ws = [jnp.sum(X * vs[k], axis=1, keepdims=True) for k in range(KB)]
            upd = None
            for k in range(KB):
                z = None
                for m in range(k + 1):               # T upper triangular
                    term = ws[m] * T[(m, k)]
                    z = term if z is None else z + term
                t = z * vs[k]
                upd = t if upd is None else upd + t
            if mask_trailing:
                c_ids = c0 + lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0)
                upd = jnp.where(c_ids >= base + KB, upd, jnp.float32(0.0))
            X_ref[pl.ds(c0, CH)] = X - upd

    block_apply(At_ref, True)
    block_apply(Q_ref, False)


def _qr_kernel_vtau(N, CB, At_in, At_ref, Vt_ref, Tau_ref):
    """Per-column Householder QR that emits the reflectors (V, tau) INSTEAD
    of accumulating Q in-kernel. The Q update is exactly half of `_qr_kernel`'s
    full-matrix VMEM passes (2 of 4 per column: the qw reduction + the rank-1
    Q write-back); dropping it and assembling Q outside with batched MXU
    matmuls (see `_wy_assemble_q`: Q = I − V·T·Vᵀ with T from ONE triangular
    solve) trades ~half the VPU-bound kernel time for ~2 N³ MXU matmuls +
    one trsm that XLA runs at full MXU rate. Same reflector math, signs and
    zero-tail conventions as `_qr_kernel`.

    Vt_ref: (N, N, CB) — row j holds v_j (zeros at rows < j, head at j).
    Tau_ref: (N, 8, CB) — tau_j broadcast over the 8 sublanes (Mosaic wants
    a >=8 sublane dim; the waste is N·8·CB·4 bytes)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        At_ref[...] = At_in[...]

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

    At = At_ref[...]
    w = jnp.sum(At * v, axis=1, keepdims=True)                  # (N,1,CB)
    At_ref[...] = At - (tau * w) * v
    rjj = -s * normx
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj * onehot_j

    Vt_ref[pl.ds(j, 1)] = v
    Tau_ref[pl.ds(j, 1)] = jnp.broadcast_to(tau, (1, 8, CB))


def _blocked_kernel_vtau(N, CB, KB, At_in, At_ref, Vt_ref, Tau_ref):
    """Blocked-WY counterpart of `_qr_kernel_vtau` (same panel phase + LARFT
    T as `_blocked_kernel`, which the in-kernel trailing update still needs),
    with the Q block-apply dropped and (V, tau) emitted for the outside MXU
    assembly."""
    j0 = pl.program_id(1)
    base = j0 * KB

    @pl.when(j0 == 0)
    def _init():
        At_ref[...] = At_in[...]

    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    p_ids = lax.broadcasted_iota(jnp.int32, (KB, 1, 1), 0)

    P = At_ref[pl.ds(base, KB)]
    vs, taus = [], []
    for kb in range(KB):
        j = base + kb
        x = P[kb:kb + 1]                                        # (1,N,CB)
        onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
        tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))
        alpha = jnp.sum(x * onehot_j, axis=1, keepdims=True)    # (1,1,CB)
        sigma = jnp.sum((x * tail) ** 2, axis=1, keepdims=True)
        normx = jnp.sqrt(alpha * alpha + sigma)
        s = jnp.where(alpha >= 0, jnp.float32(1.0), jnp.float32(-1.0))
        vj = alpha + s * normx
        v = x * tail + vj * onehot_j                            # (1,N,CB)
        vtv = sigma + vj * vj
        tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))   # (1,1,CB)
        w = jnp.sum(P * v, axis=1, keepdims=True)               # (KB,1,CB)
        P = P - (tau * w) * v
        fin = x * (1.0 - tail - onehot_j) + (-s * normx) * onehot_j
        P = jnp.where(p_ids == kb, fin, P)
        vs.append(v)
        taus.append(tau)
    At_ref[pl.ds(base, KB)] = P
    Vt_ref[pl.ds(base, KB)] = jnp.concatenate(vs, axis=0)
    Tau_ref[pl.ds(base, KB)] = jnp.concatenate(
        [jnp.broadcast_to(t, (1, 8, CB)) for t in taus], axis=0)

    # forward LARFT (needed for the in-kernel trailing update only)
    g = {}
    for jj in range(1, KB):
        for m in range(jj):
            g[(m, jj)] = jnp.sum(vs[m] * vs[jj], axis=1, keepdims=True)
    T = {}
    for jj in range(KB):
        T[(jj, jj)] = taus[jj]
        for i in range(jj - 1, -1, -1):
            acc = None
            for m in range(i, jj):
                term = T[(i, m)] * g[(m, jj)]
                acc = term if acc is None else acc + term
            T[(i, jj)] = -taus[jj] * acc

    CH = 16 if N % 16 == 0 else (8 if N % 8 == 0 else KB)
    for c0 in range(0, N, CH):
        X = At_ref[pl.ds(c0, CH)]                 # (CH,N,CB)
        ws = [jnp.sum(X * vs[k], axis=1, keepdims=True) for k in range(KB)]
        upd = None
        for k in range(KB):
            z = None
            for m in range(k + 1):               # T upper triangular
                term = ws[m] * T[(m, k)]
                z = term if z is None else z + term
            t = z * vs[k]
            upd = t if upd is None else upd + t
        c_ids = c0 + lax.broadcasted_iota(jnp.int32, (CH, 1, 1), 0)
        upd = jnp.where(c_ids >= base + KB, upd, jnp.float32(0.0))
        At_ref[pl.ds(c0, CH)] = X - upd


# ---------------------------------------------------------------------------
# fused UDT kernels: QR + udt_dirty postscale (+ optional right-triangular
# solve) in one pallas_call. The boundary path (extend_* + calculate_greens,
# reference stack.jl:272-311 + :337-393) is per-op-latency-bound on TPU: the
# ~10 small XLA passes around each QR (diag extract, floor, row normalize,
# diag fix, d*mx, pivot-apply + triangular solve) each cost a fixed ~10 us on
# (256, 64, 64) operands. These kernels run them on the VMEM-resident data
# inside the QR's sequential column grid. Pivoting stays OUTSIDE (a per-lane
# dynamic column gather is not expressible in Mosaic); the caller passes the
# prescaled, pivoted matrix plus the power-of-two prescale.
# ---------------------------------------------------------------------------

_UDT_FLOOR = 2.0 ** -70  # flushed-mode diagonal floor, = linalg.udt_dirty's


def _udt_kernel(N, CB, At_in, Mx_in, At_ref, Q_ref, D_ref, dsub_ref):
    """Householder QR + fused udt_dirty postscale (grid = (n_cb, N)).

    In:  At_in (N,N,CB) — PRESCALED, PIVOTED A transposed [col,row,chain];
         Mx_in (8,CB)   — the power-of-two prescale per chain (row 0).
    Out: At_ref → Rs = R/d (unit-|diag| dirty T; flushed modes get an exact
         +1 diagonal, matching udt_dirty's fix); Q_ref → Q;
         D_ref (N,8,CB) → d·mx (the unscaled d of udt_dirty).
    dsub_ref (1,N,CB) scratch accumulates the prescaled-domain d for the
    final row normalization (rows of R are sublanes of At, so the row scale
    is one broadcast divide at the last grid step)."""
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

    At = At_ref[...]
    w = jnp.sum(At * v, axis=1, keepdims=True)                  # (N,1,CB)
    At_ref[...] = At - (tau * w) * v
    # floored diagonal: flushed modes (|R_jj| < floor) carry no representable
    # information — force d = floor and R_jj = +floor so the normalized
    # diagonal is exactly +1 and downstream solves stay finite
    rjj = -s * normx
    absr = jnp.abs(rjj)
    dj = jnp.maximum(absr, jnp.float32(_UDT_FLOOR))
    rjj_eff = jnp.where(absr < _UDT_FLOOR, jnp.float32(_UDT_FLOOR), rjj)
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj_eff * onehot_j
    dsub_ref[...] = jnp.where(r_ids == j, dj, dsub_ref[...])
    mx = Mx_in[0:1, :]                                          # (1,CB)
    D_ref[pl.ds(j, 1)] = jnp.broadcast_to(dj * mx[None], (1, 8, CB))

    Q = Q_ref[...]
    qw = jnp.sum(Q * v, axis=1, keepdims=True)                  # (N,1,CB)
    Q_ref[...] = Q - (tau * qw) * v

    @pl.when(j == N - 1)
    def _normalize():
        # Rs = R / d: rows of R are At sublanes → one broadcast divide
        At_ref[...] = At_ref[...] / dsub_ref[...]


def _udt_solve_kernel(N, CB, At_in, Zt_in, Mx_in, At_ref, Q_ref, Xt_ref):
    """Householder QR + fused right-triangular solve, for calculate_greens:
    emits X = (Zp · Rs⁻¹)/d·(1/mx) = Zp · R_M⁻¹ — exactly rdiv_dirty + the
    /d postscale of the Dmax/Dmin greens algebra — WITHOUT materializing Rs
    or d. Back-substitution pipelines into the column grid: column j of X is
    computed at grid step j (R's rows 0..j are final there — later reflectors
    have zero components on rows ≤ j), and its contribution to all later
    columns' accumulators is folded into Xt_ref immediately.

    In:  At_in (N,N,CB) prescaled+pivoted M transposed; Zt_in (N,N,CB)
         pivoted Zp = (Ur/Drp)[:, piv] transposed; Mx_in (8,CB) prescale.
    Out: At_ref → R (prescaled domain, floored diag — internal, caller
         discards); Q_ref → u; Xt_ref → X (transposed [col,row,chain])."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        At_ref[...] = At_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))
        Xt_ref[...] = jnp.zeros((N, N, CB), jnp.float32)

    x = At_ref[pl.ds(j, 1)]                                     # (1,N,CB)
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
    absr = jnp.abs(rjj)
    rjj_eff = jnp.where(absr < _UDT_FLOOR, jnp.float32(_UDT_FLOOR), rjj)
    At_ref[pl.ds(j, 1)] = x * (1.0 - tail - onehot_j) + rjj_eff * onehot_j

    Q = Q_ref[...]
    qw = jnp.sum(Q * v, axis=1, keepdims=True)
    Q_ref[...] = Q - (tau * qw) * v

    # ---- back-substitution step: X·R = Zp/mx, column j
    # X[:,j] = (Zp[:,j]/mx − ACC_j)/R_jj with ACC_j = Σ_{m<j} X[:,m]·R[m,j]
    # accumulated incrementally in Xt itself (columns > j hold partial sums)
    mx = Mx_in[0:1, :]                                          # (1,CB)
    invmx = 1.0 / mx[None]                                      # (1,1,CB)
    Xcur = Xt_ref[...]
    acc = Xt_ref[pl.ds(j, 1)]
    zcol = Zt_in[pl.ds(j, 1)]
    xcol = (zcol * invmx - acc) / rjj_eff                       # (1,N,CB)
    # row j of R across columns c: R[j,c] = At[c,j,:] (masked sublane reduce)
    At2 = At_ref[...]
    rrow = jnp.sum(At2 * onehot_j, axis=1, keepdims=True)       # (N,1,CB)
    c_ids = lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)
    upd = jnp.where(c_ids > j, rrow, jnp.float32(0.0)) * xcol   # (N,N,CB)
    Xt_ref[...] = Xcur + upd
    Xt_ref[pl.ds(j, 1)] = xcol


def _udt_fused_batched(A, mx):
    """(Q, Rs, d) of prescaled+pivoted A (B,N,N) f32 with prescale mx (B,)."""
    B, N, _ = A.shape
    from .pallas_util import pick_vmem_lane_block
    CB = pick_vmem_lane_block(B, 3 * N * N * 4)
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 1, 0))
    Mx = jnp.broadcast_to(mx[None, :], (8, B)).astype(jnp.float32)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    mx_spec = pl.BlockSpec((8, CB), lambda cb, j: (i32(0), cb))
    d_spec = pl.BlockSpec((N, 8, CB), lambda cb, j: (i32(0), i32(0), cb))
    At_out, Q_out, D_out = pl.pallas_call(
        functools.partial(_udt_kernel, N, CB),
        interpret=interpret,
        grid=(B // CB, N),
        in_specs=[spec, mx_spec],
        out_specs=[spec, spec, d_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, 8, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, N, CB), jnp.float32)],
    )(At, Mx)
    Rs = jnp.transpose(At_out, (2, 1, 0))
    Q = jnp.transpose(Q_out, (2, 0, 1))
    d = jnp.transpose(D_out[:, 0, :], (1, 0))
    return Q, Rs, d


def _udt_solve_batched(A, Z, mx):
    """(Q, X) with X = Z·R_M⁻¹ for prescaled+pivoted A (B,N,N) f32,
    pivoted Z (B,N,N), prescale mx (B,)."""
    B, N, _ = A.shape
    from .pallas_util import pick_vmem_lane_block
    CB = pick_vmem_lane_block(B, 5 * N * N * 4)
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 1, 0))
    Zt = jnp.transpose(Z, (2, 1, 0))
    Mx = jnp.broadcast_to(mx[None, :], (8, B)).astype(jnp.float32)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    mx_spec = pl.BlockSpec((8, CB), lambda cb, j: (i32(0), cb))
    _, Q_out, Xt_out = pl.pallas_call(
        functools.partial(_udt_solve_kernel, N, CB),
        interpret=interpret,
        grid=(B // CB, N),
        in_specs=[spec, spec, mx_spec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
        ],
    )(At, Zt, Mx)
    Q = jnp.transpose(Q_out, (2, 0, 1))
    X = jnp.transpose(Xt_out, (2, 1, 0))
    return Q, X


def udt_fused_lanes():
    """(..., N, N) fused UDT (QR+postscale) folding leading axes into lanes."""
    if "fn_udt" in _QR_CACHE:
        return _QR_CACHE["fn_udt"]

    @custom_vmap
    def udt(A, mx):
        lead = A.shape[:-2]
        N = A.shape[-1]
        from .pallas_util import map_lane_chunks, pick_vmem_lane_chunk
        Q, Rs, d = map_lane_chunks(
            _udt_fused_batched, A.reshape((-1, N, N)), mx.reshape((-1,)),
            step=pick_vmem_lane_chunk(3 * N * N * 4))
        return (Q.reshape(lead + (N, N)), Rs.reshape(lead + (N, N)),
                d.reshape(lead + (N,)))

    @udt.def_vmap
    def _rule(axis_size, in_batched, A, mx):
        return udt(A, mx), (True, True, True)

    _QR_CACHE["fn_udt"] = udt
    return udt


def udt_solve_lanes():
    """(..., N, N) fused UDT+solve folding leading axes into lanes."""
    if "fn_udt_solve" in _QR_CACHE:
        return _QR_CACHE["fn_udt_solve"]

    @custom_vmap
    def udt_solve(A, Z, mx):
        lead = A.shape[:-2]
        N = A.shape[-1]
        from .pallas_util import map_lane_chunks, pick_vmem_lane_chunk
        Q, X = map_lane_chunks(
            _udt_solve_batched, A.reshape((-1, N, N)),
            Z.reshape((-1, N, N)), mx.reshape((-1,)),
            step=pick_vmem_lane_chunk(5 * N * N * 4))
        return Q.reshape(lead + (N, N)), X.reshape(lead + (N, N))

    @udt_solve.def_vmap
    def _rule(axis_size, in_batched, A, Z, mx):
        return udt_solve(A, Z, mx), (True, True)

    _QR_CACHE["fn_udt_solve"] = udt_solve
    return udt_solve


_FUSED_UDT_CACHE = {}


def fused_udt_ok(N, kind="udt") -> bool:
    """Eligibility + cached compile probe for the fused UDT kernels.
    Default ON for f32, 8 | N <= 64 on TPU (MC_TPU_FUSED_UDT=0 disables);
    CPU uses the interpreter (tests force ENABLED)."""
    import os
    env = os.environ.get("MC_TPU_FUSED_UDT")
    if env in ("0", "false", "off"):
        return False
    if not (HAVE_PALLAS and enabled() and N % 8 == 0 and 8 <= N <= 64):
        return False
    if jax.default_backend() == "cpu":
        return True
    key = (N, kind)

    def compute():
        try:
            if kind == "udt":
                fn, shapes = _udt_fused_batched, (
                    jax.ShapeDtypeStruct((256, N, N), jnp.float32),
                    jax.ShapeDtypeStruct((256,), jnp.float32))
            else:
                fn, shapes = _udt_solve_batched, (
                    jax.ShapeDtypeStruct((128, N, N), jnp.float32),
                    jax.ShapeDtypeStruct((128, N, N), jnp.float32),
                    jax.ShapeDtypeStruct((128,), jnp.float32))
            jax.jit(fn).lower(*shapes).compile()
            return True
        except Exception:  # pragma: no cover
            return False

    from .pallas_util import cached_probe
    return cached_probe(_FUSED_UDT_CACHE, key, "fused_udt", compute)


def _wy_assemble_q(V, tau):
    """Q = H_0···H_{N-1} = I − V·T·Vᵀ from the reflectors, as batched MXU
    matmuls + ONE batched triangular solve, via the inverse-T identity

        T⁻¹ = striu(VᵀV) + diag(1/τ)

    (read off the forward-LARFT recurrence T ← [[T, −T·(Vᵀv)·τ],[0, τ]]:
    block-inverting it gives T⁻¹ ← [[T⁻¹, Vᵀv],[0, 1/τ]]). Columns with
    τ = 0 have v = 0 (H = I) and drop out exactly: their S row is e_jᵀ and
    their V column is zero. HIGHEST precision throughout — Q must be
    orthonormal to f32 accuracy regardless of the caller's matmul default."""
    hp = lax.Precision.HIGHEST
    N = V.shape[-1]
    Vt = jnp.swapaxes(V, -1, -2)
    G = jnp.matmul(Vt, V, precision=hp)                       # VᵀV
    tau_safe = jnp.where(tau > 0, tau, 1.0)
    I = jnp.eye(N, dtype=V.dtype)
    S = jnp.triu(G, 1) + (1.0 / tau_safe)[..., :, None] * I
    X = lax.linalg.triangular_solve(S, Vt, left_side=True,
                                    lower=False)              # X = T·Vᵀ
    return I - jnp.matmul(V, X, precision=hp)


def _qr_batched_vtau(A, panel=None):
    """Householder QR of A (B, N, N) f32 → (Q, R) via the V+tau kernels +
    outside WY Q assembly (`_wy_assemble_q`)."""
    B, N, _ = A.shape
    kb = panel if panel is not None else (
        PANEL if PANEL is not None else _auto_panel(N))
    CB = _pick_chain_block(B) if N <= 64 else B
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 1, 0))                            # (col,row,B)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    tau_spec = pl.BlockSpec((N, 8, CB), lambda cb, j: (i32(0), i32(0), cb))
    if kb > 1 and N % kb == 0:
        kern = functools.partial(_blocked_kernel_vtau, N, CB, kb)
        grid = (B // CB, N // kb)
    else:
        kern = functools.partial(_qr_kernel_vtau, N, CB)
        grid = (B // CB, N)
    At_out, Vt_out, Tau_out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=grid,
        in_specs=[spec],
        out_specs=[spec, spec, tau_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, N, B), jnp.float32),
            jax.ShapeDtypeStruct((N, 8, B), jnp.float32),
        ],
    )(At)
    R = jnp.transpose(At_out, (2, 1, 0))
    V = jnp.transpose(Vt_out, (2, 1, 0))                        # (B,row,col)
    tau = jnp.transpose(Tau_out[:, 0, :], (1, 0))               # (B,N)
    return _wy_assemble_q(V, tau), R


def qr_lanes_wy():
    """qr_lanes with the V+tau kernel + outside MXU Q assembly."""
    if "fn_wy" in _QR_CACHE:
        return _QR_CACHE["fn_wy"]

    @custom_vmap
    def qr(A):
        lead = A.shape[:-2]
        N = A.shape[-1]
        Af = A.reshape((-1, N, N))
        from .pallas_util import map_lane_chunks
        Q, R = map_lane_chunks(_qr_batched_vtau, Af)
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn_wy"] = qr
    return qr


def _wy_enabled() -> bool:
    """Experimental flag for the V+tau QR on the N <= 128 f32 path
    (MC_TPU_QR_WY=1 enables). MEASURED AND RETIRED on v5e at N=64: the
    outside WY assembly loses end-to-end everywhere — headline sm=10
    4301 -> 3848 cs/s, sm=1 821 -> 664, g_refresh sm=5 1154 -> 963 — and
    the assembled Q is less orthogonal (sm=10 drift_max 2.1e3 -> 3.2e4).
    At N=64 the two extra N^3 MXU matmuls plus the T triangular solve cost
    more than the in-kernel Q update they replace (per-chain 64-wide dots
    underfill the 128-wide MXU), and I - V.T.Vt amplifies reflector
    rounding that the column-by-column Q accumulation averages out. Kept
    for experimentation at larger N <= 128 shapes only."""
    import os
    return os.environ.get("MC_TPU_QR_WY", "0") not in ("0", "false", "off")


def _qr_kernel_cx(N, CB, Ar_in, Ai_in, Ar_ref, Ai_ref, Qr_ref, Qi_ref):
    """Complex64 Householder QR on two f32 planes (re, im), one grid step =
    one column j (grid = (n_cb, N)). Same layout discipline as `_qr_kernel`:
    A transposed in VMEM as At = (col, row, CB), chains on lanes.

    Complex reflector (LAPACK zgeqrf convention up to the diagonal phase —
    downstream udt_dirty takes |R_jj|, so the phase is free):
      alpha = x_j, phase = alpha/|alpha| (1 if alpha = 0),
      v = x·tail + (alpha + phase·||x||)·e_j,   tau = 2/(v†v) (real),
      H = I − tau·v·v†,   H·x = −phase·||x||·e_j.
    Trailing columns: a ← a − tau·(v†a)·v; Q ← Q·H: Q[r] ← Q[r] −
    tau·(Q[r]·v)·v̄ (note the conjugations — v†a contracts conj(v), the Q
    update spreads conj(v))."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        Ar_ref[...] = Ar_in[...]
        Ai_ref[...] = Ai_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        eye = jnp.where(row_ids == col_ids, jnp.float32(1.0),
                        jnp.float32(0.0))
        Qr_ref[...] = jnp.broadcast_to(eye, (N, N, CB))
        Qi_ref[...] = jnp.zeros((N, N, CB), jnp.float32)

    x_r = Ar_ref[pl.ds(j, 1)]                                   # (1,N,CB)
    x_i = Ai_ref[pl.ds(j, 1)]
    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
    tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))

    al_r = jnp.sum(x_r * onehot_j, axis=1, keepdims=True)       # (1,1,CB)
    al_i = jnp.sum(x_i * onehot_j, axis=1, keepdims=True)
    sigma = jnp.sum((x_r * x_r + x_i * x_i) * tail, axis=1,
                    keepdims=True)                              # (1,1,CB)
    amag2 = al_r * al_r + al_i * al_i
    normx = jnp.sqrt(amag2 + sigma)
    amag = jnp.sqrt(amag2)
    # phase of alpha; alpha = 0 → phase 1 (real-positive convention)
    safe = amag > 0
    ph_r = jnp.where(safe, al_r / jnp.where(safe, amag, 1.0),
                     jnp.ones_like(amag))
    ph_i = jnp.where(safe, al_i / jnp.where(safe, amag, 1.0),
                     jnp.zeros_like(amag))
    vj_r = al_r + ph_r * normx
    vj_i = al_i + ph_i * normx
    v_r = x_r * tail + vj_r * onehot_j                          # (1,N,CB)
    v_i = x_i * tail + vj_i * onehot_j
    vtv = sigma + vj_r * vj_r + vj_i * vj_i                     # real
    tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))       # (1,1,CB)

    # trailing-column update: w_k = v†·A[:,k] (conj on v), A[:,k] -= tau·w_k·v
    Ar = Ar_ref[...]
    Ai = Ai_ref[...]
    w_r = jnp.sum(Ar * v_r + Ai * v_i, axis=1, keepdims=True)   # (N,1,CB)
    w_i = jnp.sum(Ai * v_r - Ar * v_i, axis=1, keepdims=True)
    # fold tau into w BEFORE the product with v: w ~ ||v||² can reach ~1e30
    # on prescaled graded columns, so w·v overflows f32 while (tau·w)·v is
    # O(||x||) — same ordering as the real kernel
    tw_r = tau * w_r
    tw_i = tau * w_i
    Ar_ref[...] = Ar - (tw_r * v_r - tw_i * v_i)
    Ai_ref[...] = Ai - (tw_r * v_i + tw_i * v_r)
    # exact finalize of column j: zeros below the pivot, R_jj = -phase·||x||
    keep = 1.0 - tail - onehot_j
    Ar_ref[pl.ds(j, 1)] = x_r * keep + (-(ph_r * normx)) * onehot_j
    Ai_ref[pl.ds(j, 1)] = x_i * keep + (-(ph_i * normx)) * onehot_j

    # Q ← Q·H: qw = Q·v (plain product), Q[r,c] -= tau·qw_r·conj(v)_c
    Qr = Qr_ref[...]
    Qi = Qi_ref[...]
    qw_r = jnp.sum(Qr * v_r - Qi * v_i, axis=1, keepdims=True)  # (N,1,CB)
    qw_i = jnp.sum(Qr * v_i + Qi * v_r, axis=1, keepdims=True)
    tqw_r = tau * qw_r
    tqw_i = tau * qw_i
    Qr_ref[...] = Qr - (tqw_r * v_r + tqw_i * v_i)
    Qi_ref[...] = Qi - (tqw_i * v_r - tqw_r * v_i)


# 6 resident (N,N,CB) f32 blocks for the complex kernel (At re/im in + out,
# Q re/im out)
def _cx_qr_chunk(N):
    from .pallas_util import pick_vmem_lane_chunk
    return pick_vmem_lane_chunk(6 * N * N * 4)


def _qr_batched_cx(A):
    """Householder QR of complex64 A (B, N, N) → (Q, R), via the two-plane
    kernel. The caller chunks B to `_cx_qr_chunk`."""
    B, N, _ = A.shape
    from .pallas_util import pick_vmem_lane_block
    CB = pick_vmem_lane_block(B, 6 * N * N * 4)
    interpret = jax.default_backend() == "cpu"
    Ar = jnp.transpose(jnp.real(A).astype(jnp.float32), (2, 1, 0))
    Ai = jnp.transpose(jnp.imag(A).astype(jnp.float32), (2, 1, 0))
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    shape = jax.ShapeDtypeStruct((N, N, B), jnp.float32)
    Ar_o, Ai_o, Qr_o, Qi_o = pl.pallas_call(
        functools.partial(_qr_kernel_cx, N, CB),
        interpret=interpret,
        grid=(B // CB, N),
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec, spec],
        out_shape=[shape, shape, shape, shape],
    )(Ar, Ai)
    R = jnp.transpose(Ar_o + 1j * Ai_o, (2, 1, 0)).astype(jnp.complex64)
    Q = jnp.transpose(Qr_o + 1j * Qi_o, (2, 0, 1)).astype(jnp.complex64)
    return Q, R


_CX_QR_OK_CACHE = {}


def _cx_qr_ok(N) -> bool:
    """Cached Mosaic compile probe for the two-plane complex kernel: AOT
    lower+compile the tiny batch once per shape class; on failure the
    dispatch falls back to XLA's complex QR instead of crashing the session.
    Override with MC_TPU_CX_QR=0/1."""
    import os
    env = os.environ.get("MC_TPU_CX_QR")
    if env is not None:
        return env not in ("0", "false", "off")
    if jax.default_backend() == "cpu":
        return True  # interpreter mode
    def compute():
        try:
            # probe at the PRODUCTION chunk size so the validated Mosaic
            # shape class is the one that actually executes
            jax.jit(_qr_batched_cx).lower(
                jax.ShapeDtypeStruct((_cx_qr_chunk(N), N, N),
                                     jnp.complex64)).compile()
            return True
        except Exception:  # pragma: no cover
            return False

    from .pallas_util import cached_probe
    return cached_probe(_CX_QR_OK_CACHE, N, "cx_qr", compute)


def qr_lanes_cx():
    """Complex64 counterpart of qr_lanes (folds leading axes into the lane
    batch, chunked to the VMEM budget)."""
    if "fn_cx" in _QR_CACHE:
        return _QR_CACHE["fn_cx"]

    @custom_vmap
    def qr(A):
        lead = A.shape[:-2]
        N = A.shape[-1]
        Af = A.reshape((-1, N, N))
        from .pallas_util import map_lane_chunks
        Q, R = map_lane_chunks(_qr_batched_cx, Af, step=_cx_qr_chunk(N))
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn_cx"] = qr
    return qr


def _cdot(X, Y, dims, CBQ):
    """Per-chain dot over the sublane chain axis (axis 1 of both operands):
    X (a, CBQ, b) · Y (c, CBQ, d) with `dims` the (X, Y) contracting axes of
    the per-chain 2-D matrices. A python loop of plain 2-D dot_generals —
    the one matmul form the v5e Mosaic toolchain reliably compiles (batched
    dot_general is not supported in kernels). HIGHEST precision is required:
    the MXU's default single-bf16-pass f32 (~2^-8 relative) is fatal for
    accumulated WY updates (measured 2e-1 reconstruction error vs 2e-6 at
    HIGHEST on the 256x256 kernel)."""
    outs = []
    for c in range(CBQ):
        o = lax.dot_general(X[:, c, :], Y[:, c, :],
                            ((dims[0:1], dims[1:2]), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        outs.append(o[:, None, :])
    return jnp.concatenate(outs, axis=1)


def _qr_mxu_kernel(N, CBQ, KB, KB0, At_in, Rt_ref, Q_ref):
    """Blocked WY Householder QR with per-chain MXU trailing updates and
    RECURSIVE T aggregation, for N > 128 where the chain-on-lanes kernels no
    longer fit VMEM.

    Layouts (chains on the SUBLANE dim, matrix dims on outer+lane):
      Rt_ref (N, CBQ, N) = [col, chain, row]  (A transposed per chain);
      Q_ref  (N, CBQ, N) = [row, chain, col].
    One grid step = one KB-column SUPER-panel (grid = (N/KB,), one chain
    block per call — the caller chunks the batch). The super-panel is built
    from KB/KB0 base panels: each base panel's reflectors are computed
    column-by-column on its (KB0, CBQ, N) slab (earlier base panels applied
    to it first in compact WY form), its forward-LARFT T is built with the
    O(KB0^3) scalar recurrence and materialized as a (KB0, CBQ, KB0) array,
    and the base T's are then MERGED pairwise-sequentially via

        T([B1 B2]) = [[T1, -T1 (V1 V2ᵀ) T2], [0, T2]]

    (three per-chain MXU dots per merge) — reaching KB=64 without the
    O(KB^3) scalar-graph blowup that capped the previous version at KB=16.
    The full-matrix trailing + Q updates then run ONCE per KB columns in the
    compact form I − VᵀTV via three MXU dots per chain per target chunk
    (W = X·Vᵀ, Z = W·T, X −= Z·V) — 4x fewer full-matrix RMW passes and
    4x fatter dots than KB=16. Numerical conventions identical to
    `_qr_kernel`/`_blocked_kernel` (LAPACK sign, tau = 0 on zero tails,
    exact zero-fill of finalized panel entries)."""
    j0 = pl.program_id(0) * KB
    i32 = jnp.int32

    @pl.when(j0 == 0)
    def _init():
        Rt_ref[...] = At_in[...]
        row_ids = lax.broadcasted_iota(i32, (N, 1, N), 0)
        col_ids = lax.broadcasted_iota(i32, (N, 1, N), 2)
        Q_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0),
                      jnp.float32(0.0)), (N, CBQ, N))

    lane_r = lax.broadcasted_iota(i32, (1, 1, N), 2)
    p_ids = lax.broadcasted_iota(i32, (KB0, 1, 1), 0)

    # ---- base panels: scalar reflector loop + scalar LARFT at width KB0
    V = None                       # (m, CBQ, N) accumulated reflectors
    T = None                       # (m, CBQ, m) accumulated upper-tri T
    for s in range(KB // KB0):
        b0 = j0 + s * KB0
        P = Rt_ref[pl.ds(b0, KB0)]                            # (KB0,CBQ,N)
        if V is not None:
            # apply the accumulated compound H to this base panel's columns
            W = _cdot(P, V, (1, 1), CBQ)                      # (KB0,CBQ,m)
            Z = _cdot(W, T, (1, 0), CBQ)                      # (KB0,CBQ,m)
            P = P - _cdot(Z, V, (1, 0), CBQ)                  # (KB0,CBQ,N)
        vs, taus = [], []
        for k in range(KB0):
            j = b0 + k
            x = P[k:k + 1]                                    # (1,CBQ,N)
            onehot_j = jnp.where(lane_r == j, jnp.float32(1.0),
                                 jnp.float32(0.0))
            tail = jnp.where(lane_r > j, jnp.float32(1.0), jnp.float32(0.0))
            alpha = jnp.sum(x * onehot_j, axis=2, keepdims=True)  # (1,CBQ,1)
            sigma = jnp.sum((x * tail) ** 2, axis=2, keepdims=True)
            normx = jnp.sqrt(alpha * alpha + sigma)
            s_ = jnp.where(alpha >= 0, jnp.float32(1.0), jnp.float32(-1.0))
            vj = alpha + s_ * normx
            v = x * tail + vj * onehot_j                      # (1,CBQ,N)
            vtv = sigma + vj * vj
            tau = jnp.where(vtv > 0, 2.0 / vtv, jnp.float32(0.0))
            w = jnp.sum(P * v, axis=2, keepdims=True)         # (KB0,CBQ,1)
            P = P - (tau * w) * v
            fin = x * (1.0 - tail - onehot_j) + (-s_ * normx) * onehot_j
            P = jnp.where(p_ids == k, fin, P)
            vs.append(v)
            taus.append(tau)
        Rt_ref[pl.ds(b0, KB0)] = P

        # scalar forward LARFT at width KB0 (entries (1, CBQ, 1))
        g = {}
        for jj in range(1, KB0):
            for m in range(jj):
                g[(m, jj)] = jnp.sum(vs[m] * vs[jj], axis=2, keepdims=True)
        Ts = {}
        for jj in range(KB0):
            Ts[(jj, jj)] = taus[jj]
            for i in range(jj - 1, -1, -1):
                acc = None
                for m in range(i, jj):
                    term = Ts[(i, m)] * g[(m, jj)]
                    acc = term if acc is None else acc + term
                Ts[(i, jj)] = -taus[jj] * acc
        # materialize as (KB0, CBQ, KB0): [m, chain, k], zero below diagonal
        zero = jnp.zeros((1, CBQ, 1), jnp.float32)
        Tmat = jnp.concatenate(
            [jnp.concatenate([jnp.broadcast_to(Ts[(m, k)], (1, CBQ, 1))
                              if m <= k else zero
                              for k in range(KB0)], axis=2)
             for m in range(KB0)], axis=0)
        Vs = jnp.concatenate(vs, axis=0)                      # (KB0,CBQ,N)

        if V is None:
            V, T = Vs, Tmat
        else:
            # merge: T <- [[T, -T·G·Tmat], [0, Tmat]] with G = V·Vsᵀ
            # (per-chain m×KB0); T's per-chain layout is [row i, col k], so
            # T·G contracts T axis 1 with G axis 0, then ·Tmat again (1, 0)
            m = V.shape[0]
            G = _cdot(V, Vs, (1, 1), CBQ)                     # (m,CBQ,KB0)
            TR = _cdot(_cdot(T, G, (1, 0), CBQ), Tmat, (1, 0), CBQ)
            top = jnp.concatenate([T, -TR], axis=2)           # (m,CBQ,m+KB0)
            bot = jnp.concatenate(
                [jnp.zeros((KB0, CBQ, m), jnp.float32), Tmat], axis=2)
            T = jnp.concatenate([top, bot], axis=0)
            V = jnp.concatenate([V, Vs], axis=0)

    # chunk the target's outer (column) dim so value temporaries stay small:
    # full-block value reads/updates at N=256 stack ~29 MB of temporaries
    # regardless of CBQ (measured), while N<=128 fits whole. Same remedy as
    # _blocked_kernel's chunked row loop.
    CH = N if N <= 128 else (64 if N % 64 == 0 else (32 if N % 32 == 0
                                                     else KB))

    def block_apply(X_ref, mask_trailing):
        # per chunk: W[c] = X_c · V_cᵀ per chain (MXU), Z = W·T per chain
        # (MXU), X_c -= Z_c · V_c per chain (MXU), one chunked write-back
        for c0 in range(0, N, CH):
            X = X_ref[pl.ds(c0, CH)]                          # (CH,CBQ,N)
            W = _cdot(X, V, (1, 1), CBQ)                      # (CH,CBQ,KB)
            Z = _cdot(W, T, (1, 0), CBQ)                      # (CH,CBQ,KB)
            if mask_trailing:
                cid = c0 + lax.broadcasted_iota(i32, (CH, 1, 1), 0)
                Z = jnp.where(cid >= j0 + KB, Z, jnp.float32(0.0))
            X_ref[pl.ds(c0, CH)] = X - _cdot(Z, V, (1, 0), CBQ)

    block_apply(Rt_ref, True)
    block_apply(Q_ref, False)


# per-call chain count for the MXU QR at a given N: 3 resident (N,CBQ,N)
# state blocks + the live V slab / T / chunk temporaries (~2 more N²-scale
# blocks at KB=64) under the 13 MB budget, capped at 16
def _mxu_qr_cbq(N):
    from .pallas_util import VMEM_BUDGET
    cbq = VMEM_BUDGET // (5 * N * N * 4)
    return max(1, min(16, (cbq // 2) * 2))


# super-panel width (trailing/Q updates run once per KB columns) and the
# base-panel width for the scalar LARFT recurrence (kept at 16, where the
# O(KB0³) scalar graph still compiles; wider panels are reached by merging)
MXU_QR_KB = 64
MXU_QR_KB0 = 16


def _qr_batched_mxu_chunk(A):
    """One-chain-block blocked-WY MXU QR call: A (B<=CBQ, N, N) f32 ->
    (Q, R). The chain block equals the (padded) batch — with several chain
    blocks per call the compiler pins a full-size output in scoped VMEM
    (same v5e finding as the site-major sweep kernels)."""
    B, N, _ = A.shape
    KB = MXU_QR_KB if N % MXU_QR_KB == 0 else (
        16 if N % 16 == 0 else 8)
    KB0 = min(MXU_QR_KB0, KB)
    CBQ = max(1, -(-B // 2) * 2)
    pad = CBQ - B
    if pad:
        # identity padding keeps the reflector math trivially well-defined
        eye = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), (pad, N, N))
        A = jnp.concatenate([A, eye], axis=0)
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 0, 1))                          # (col,B,row)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, CBQ, N), lambda j: (i32(0), i32(0), i32(0)))
    shape = jax.ShapeDtypeStruct((N, CBQ, N), jnp.float32)
    Rt_out, Q_out = pl.pallas_call(
        functools.partial(_qr_mxu_kernel, N, CBQ, KB, KB0),
        interpret=interpret,
        grid=(N // KB,),
        in_specs=[spec],
        out_specs=[spec, spec],
        out_shape=[shape, shape],
    )(At)
    R = jnp.transpose(Rt_out, (1, 2, 0))[:B]
    Q = jnp.transpose(Q_out, (1, 0, 2))[:B]
    return Q, R


def _qr_batched_mxu(A):
    """Blocked-WY MXU QR of A (B, N, N) f32 -> (Q, R); the batch is split
    into one-chain-block calls of _mxu_qr_cbq(N) chains each, run
    sequentially through lax.map so adjacent chunks' pallas operands are not
    double-buffered in scoped VMEM (see map_lane_chunks_seq)."""
    from .pallas_util import map_lane_chunks_seq
    return map_lane_chunks_seq(_qr_batched_mxu_chunk, A,
                               step=_mxu_qr_cbq(A.shape[-1]))


_MXU_QR_CACHE = {}


def _mxu_qr_ok(N) -> bool:
    """Default-ON gate + cached AOT compile probe for the MXU QR
    (MC_TPU_QR256=0 disables). Measured on v5e at (64,256,256) f32:
    3.69 ms vs XLA's 8.78 ms (2.4x) at equal accuracy (recon rel err
    3.6e-7 vs 4.0e-7) — the recursive-T KB=64 super-panels plus
    HIGHEST-precision dots fixed both of the KB=16 version's problems
    (too-skinny trailing dots at 12.5 ms; bf16 MXU default giving 2e-1
    reconstruction error). End-to-end at the L=16 (N=256) operating
    point (64 chains, f32, sm=10): 126.7 vs 90.3 chain-sweeps/s (1.40x),
    same acceptance."""
    import os
    env = os.environ.get("MC_TPU_QR256")
    if env in ("0", "false", "off"):
        return False
    if jax.default_backend() == "cpu":
        return True
    def compute():
        def scanned(A):
            def body(carry, _):
                Q, R = _qr_batched_mxu(carry)
                return Q + jnp.asarray(1e-6, Q.dtype) * R, None
            out, _ = lax.scan(body, A, None, length=2)
            return out
        try:
            jax.jit(scanned).lower(
                jax.ShapeDtypeStruct((_mxu_qr_cbq(N), N, N),
                                     jnp.float32)).compile()
            return True
        except Exception:
            return False

    from .pallas_util import cached_probe
    return cached_probe(_MXU_QR_CACHE, N, "mxu_qr", compute)


from .pallas_util import pick_lane_block as _pick_chain_block


# Panel width for the blocked kernel; 0/1 selects the per-column kernel.
# None = auto by matrix size. Measured on v5e: at N<=64 the per-column kernel
# wins (the kernel is VPU-throughput-bound and panels add slab/T work); at
# N>=128 the per-column kernel's full-matrix VMEM residency no longer
# compiles and the blocked kernel with a reduced chain block takes over.
PANEL = None


def _auto_panel(N: int) -> int:
    return 1 if N <= 64 else 8


def _qr_batched(A, panel=None):
    """Householder QR of A (B, N, N) f32 → (Q, R), both (B, N, N)."""
    B, N, _ = A.shape
    kb = panel if panel is not None else (
        PANEL if PANEL is not None else _auto_panel(N))
    # Mosaic block constraint: the lane (chain) dim must be a multiple of 128
    # or equal to the full array dim. At N<=64, 2·N²·CB·4B fits scoped VMEM at
    # CB=256. At larger N no 128-multiple fits, so use ONE full chain block
    # (block == array lets Mosaic stream it rather than pin it in VMEM).
    CB = _pick_chain_block(B) if N <= 64 else B
    interpret = jax.default_backend() == "cpu"
    At = jnp.transpose(A, (2, 1, 0))                            # (col,row,B)
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    if kb > 1 and N % kb == 0:
        kern = functools.partial(_blocked_kernel, N, CB, kb)
        grid = (B // CB, N // kb)
    else:
        kern = functools.partial(_qr_kernel, N, CB)
        grid = (B // CB, N)
    At_out, Q_out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=grid,
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
        from .pallas_util import map_lane_chunks
        Q, R = map_lane_chunks(_qr_batched, Af)
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn"] = qr
    return qr


def qr_lanes_mxu():
    """(..., N, N) f32 QR via the blocked MXU kernel (N > 128): folds all
    leading axes into the kernel's grid-blocked chain batch. No outer
    chunking is needed — the kernel's VMEM residency is per chain block,
    independent of the batch."""
    if "fn_mxu" in _QR_CACHE:
        return _QR_CACHE["fn_mxu"]

    @custom_vmap
    def qr(A):
        lead = A.shape[:-2]
        N = A.shape[-1]
        Q, R = _qr_batched_mxu(A.reshape((-1, N, N)))
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn_mxu"] = qr
    return qr


def qr_supported(A) -> bool:
    """Kernel eligibility: f32 square trailing dims, sublane-aligned N.

    The leading batch size is NOT checked: at trace time inside a vmapped
    sweep the per-chain shape is only (F, N, N) — the real lane batch
    appears through the custom_vmap rule.

    N <= 128 routes to the chain-on-lanes kernels (measured on v5e: 1.8x
    XLA at N=64, 3.5x at N=128); f32 at N > 128 routes to the blocked MXU
    kernel behind its compile probe (XLA's column-loop QR costs ~8.1 ms per
    (64,256,256) f32 call); complex64 keeps the two-plane kernel under the
    128 cap."""
    if not HAVE_PALLAS or A.dtype not in (jnp.float32, jnp.complex64):
        return False
    N = A.shape[-1]
    if not (A.ndim >= 2 and A.shape[-2] == N and N % 8 == 0 and N >= 8):
        return False
    if N <= 128:
        return True
    return (A.dtype == jnp.float32 and N % 8 == 0
            and _mxu_qr_ok(N))


# None = auto (on for the TPU backend); tests may force True (interpret mode
# on CPU) or False.
ENABLED = None


def enabled() -> bool:
    if ENABLED is not None:
        return ENABLED
    return jax.default_backend() not in ("cpu", "gpu")


def maybe_qr(A):
    """Drop-in for jnp.linalg.qr(A) routing lane-tileable f32/complex64
    batches to the fused kernels on TPU; f64 routes to the double-float
    Householder kernel (same precision class as XLA's TPU f64 emulation,
    ~25x faster per call) — strict-f64 at ~4x the reference CPU estimate."""
    if (A.dtype == jnp.float64 and A.ndim >= 2
            and A.shape[-1] == A.shape[-2]
            and jax.default_backend() not in ("cpu", "gpu")
            and df_qr_ok(A.shape[-1])):
        return qr_lanes_df()(A)
    if enabled() and qr_supported(A):
        N = A.shape[-1]
        if A.dtype == jnp.complex64:
            if _cx_qr_ok(N):
                return qr_lanes_cx()(A)
            return jnp.linalg.qr(A)  # probe failed: XLA complex QR
        if N > 128:
            return qr_lanes_mxu()(A)
        if _wy_enabled():
            return qr_lanes_wy()(A)
        return qr_lanes()(A)
    return jnp.linalg.qr(A)


# ---------------------------------------------------------------------------
# double-float (df32) Householder QR: strict-f64 QR at TPU speed.
#
# TPU has no native f64; XLA emulates every f64 op with double-float (hi+lo
# f32 pair) arithmetic, and its column-loop QR under that emulation costs
# ~400 ms per (256,64,64) call — 80% of the strict-f64 sweep's wall time
# (the numerics mode the reference runs natively: f64 Householder UDT,
# /root/reference/src/linalg/UDT.jl:62-123 driving stack.jl:502-631). This
# kernel runs the SAME double-float arithmetic (error-free transformations:
# Dekker split + two_sum/two_prod — precision ~2^-49, identical class to
# XLA's emulation) but batched chains-on-lanes inside one Pallas grid, like
# the f32 kernel above. Dots reduce over the sublane axis via a df-add
# halving tree (exact rounding per level, no f32 accumulation loss).
#
# Expected ~10-12x the f32 kernel's op count; measured end-to-end numbers
# live in VALIDATION.md ("strict-f64" rows).
# ---------------------------------------------------------------------------

_DF_SPLIT = 4097.0  # Dekker split constant for f32: 2^12 + 1 (python float:
#                     a module-level jnp scalar would be closure-captured)


def _two_sum(a, b):
    """Error-free a + b = s + err (Knuth)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    """Error-free a + b = s + err assuming |a| >= |b| (Dekker)."""
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    """Error-free a * b = p + err via Dekker splitting (no FMA assumed:
    split products of 12-bit mantissa halves are exact in f32)."""
    p = a * b
    ta = a * _DF_SPLIT
    ah = ta - (ta - a)
    al = a - ah
    tb = b * _DF_SPLIT
    bh = tb - (tb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    return _quick_two_sum(s, e + (al + bl))


def _df_neg(ah, al):
    return -ah, -al


def _df_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    return _quick_two_sum(p, e + (ah * bl + al * bh))


def _df_div(ah, al, bh, bl):
    """Double-float division (two Newton correction terms, ~2 ulp)."""
    q1 = ah / bh
    ph, pl_ = _df_mul(bh, bl, q1, jnp.zeros_like(q1))
    rh, rl = _df_add(ah, al, -ph, -pl_)
    q2 = rh / bh
    ph, pl_ = _df_mul(bh, bl, q2, jnp.zeros_like(q2))
    rh, rl = _df_add(rh, rl, -ph, -pl_)
    q3 = rh / bh
    qh, ql = _quick_two_sum(q1, q2)
    return _df_add(qh, ql, q3, jnp.zeros_like(q3))


def _df_sqrt(ah, al):
    """Double-float sqrt for ah >= 0 (one df correction, ~2 ulp).
    s1 = sqrt(ah); s2 = (a - s1^2)_h / (2 s1); result = s1 + s2."""
    safe = jnp.maximum(ah, jnp.float32(1e-45))
    s1 = jnp.sqrt(safe)
    ph, pl_ = _two_prod(s1, s1)
    rh, _ = _df_add(ah, al, -ph, -pl_)
    s2 = rh / (2.0 * s1)
    sh, sl = _quick_two_sum(s1, s2)
    zero = ah <= 0
    return (jnp.where(zero, jnp.float32(0.0), sh),
            jnp.where(zero, jnp.float32(0.0), sl))


def _df_reduce_sum(h, l, axis_len):
    """Sum a df array over the sublane axis (axis=1, static length) by
    pairwise halving — each level is one exact df add, so there is no f32
    accumulation loss. An odd level folds its straggler element into lane 0
    via a masked df add (adding exact zeros elsewhere)."""
    n = axis_len
    while n > 1:
        half = n // 2
        h1, l1 = h[:, 0:half], l[:, 0:half]
        h2, l2 = h[:, half:2 * half], l[:, half:2 * half]
        h1, l1 = _df_add(h1, l1, h2, l2)
        if n % 2 == 1:
            ids = lax.broadcasted_iota(jnp.int32, (1, half, 1), 1)
            m = jnp.where(ids == 0, jnp.float32(1.0), jnp.float32(0.0))
            h1, l1 = _df_add(h1, l1, h[:, n - 1:n] * m, l[:, n - 1:n] * m)
        h, l = h1, l1
        n = half
    return h, l


def _qr_df_kernel(N, CB, Ath_in, Atl_in, Ath_ref, Atl_ref, Qh_ref, Ql_ref):
    """Double-float Householder QR, one grid step = one column j
    (grid = (n_cb, N)). Layout identical to _qr_kernel: At = (col,row,CB),
    hi/lo planes in separate refs. Masking multiplies (onehot/tail) are
    exact, so they apply to hi and lo planes independently."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        Ath_ref[...] = Ath_in[...]
        Atl_ref[...] = Atl_in[...]
        row_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (N, N, 1), 1)
        Qh_ref[...] = jnp.broadcast_to(
            jnp.where(row_ids == col_ids, jnp.float32(1.0), jnp.float32(0.0)),
            (N, N, CB))
        Ql_ref[...] = jnp.zeros((N, N, CB), jnp.float32)

    xh = Ath_ref[pl.ds(j, 1)]                                   # (1,N,CB)
    xl = Atl_ref[pl.ds(j, 1)]
    r_ids = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    onehot_j = jnp.where(r_ids == j, jnp.float32(1.0), jnp.float32(0.0))
    tail = jnp.where(r_ids > j, jnp.float32(1.0), jnp.float32(0.0))

    a_h = jnp.sum(xh * onehot_j, axis=1, keepdims=True)         # exact pick
    a_l = jnp.sum(xl * onehot_j, axis=1, keepdims=True)
    th, tl = xh * tail, xl * tail                               # exact mask
    sq_h, sq_l = _df_mul(th, tl, th, tl)
    sg_h, sg_l = _df_reduce_sum(sq_h, sq_l, N)                  # sigma
    aa_h, aa_l = _df_mul(a_h, a_l, a_h, a_l)
    n2_h, n2_l = _df_add(aa_h, aa_l, sg_h, sg_l)
    nx_h, nx_l = _df_sqrt(n2_h, n2_l)                           # normx
    s = jnp.where(a_h >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    vj_h, vj_l = _df_add(a_h, a_l, s * nx_h, s * nx_l)
    # LAPACK-normalized reflector: v_j = 1, v_tail = x_tail / vj, and
    # tau = vj / (s·normx) — all O(1) regardless of the column scale. The
    # raw form tau = 2/vᵀv ~ 2^-105 at the 2^50 prescale pushes tau's df
    # correction terms below the f32 subnormal floor, which XLA/TPU FLUSH
    # (measured: Q orthonormality degrades 1e-14 → 2e-7 above 2^46).
    live = n2_h > 0
    vj_h_safe = jnp.where(live, vj_h, jnp.float32(1.0))
    vj_l_safe = jnp.where(live, vj_l, jnp.float32(0.0))
    iv_h, iv_l = _df_div(jnp.full_like(vj_h, 1.0), jnp.zeros_like(vj_h),
                         vj_h_safe, vj_l_safe)
    iv_h = jnp.where(live, iv_h, jnp.float32(0.0))
    iv_l = jnp.where(live, iv_l, jnp.float32(0.0))
    vt_h, vt_l = _df_mul(th, tl, iv_h, iv_l)
    # NOTE: branches must be explicit f32 — bare python scalars materialize
    # an f64 select under jax_enable_x64, which Mosaic cannot lay out
    # (layout.h bitwidth<=32 check aborts the remote compile helper)
    v_h = vt_h + onehot_j * jnp.where(live, jnp.float32(1.0),
                                      jnp.float32(0.0))          # exact v_j=1
    v_l = vt_l
    nx_h_safe = jnp.where(live, s * nx_h, jnp.float32(1.0))
    nx_l_safe = jnp.where(live, s * nx_l, jnp.float32(0.0))
    tau_h, tau_l = _df_div(vj_h_safe, vj_l_safe, nx_h_safe, nx_l_safe)
    tau_h = jnp.where(live, tau_h, jnp.float32(0.0))
    tau_l = jnp.where(live, tau_l, jnp.float32(0.0))

    # ---- At update: At[c] -= tau·(At[c]·v)·v over all columns c
    Ath = Ath_ref[...]
    Atl = Atl_ref[...]
    p_h, p_l = _df_mul(Ath, Atl, v_h, v_l)                      # (N,N,CB)
    w_h, w_l = _df_reduce_sum(p_h, p_l, N)                      # (N,1,CB)
    tw_h, tw_l = _df_mul(tau_h, tau_l, w_h, w_l)
    u_h, u_l = _df_mul(tw_h, tw_l, v_h, v_l)                    # (N,N,CB)
    nAh, nAl = _df_add(Ath, Atl, -u_h, -u_l)
    Ath_ref[...] = nAh
    Atl_ref[...] = nAl
    # exact zero fill of column j's subdiagonal + exact R_jj
    keep = 1.0 - tail - onehot_j
    rjj_h, rjj_l = -s * nx_h, -s * nx_l
    Ath_ref[pl.ds(j, 1)] = xh * keep + rjj_h * onehot_j
    Atl_ref[pl.ds(j, 1)] = xl * keep + rjj_l * onehot_j

    # ---- Q update: Q[r] -= tau·(Q[r]·v)·v
    Qh = Qh_ref[...]
    Ql = Ql_ref[...]
    p_h, p_l = _df_mul(Qh, Ql, v_h, v_l)
    w_h, w_l = _df_reduce_sum(p_h, p_l, N)
    tw_h, tw_l = _df_mul(tau_h, tau_l, w_h, w_l)
    u_h, u_l = _df_mul(tw_h, tw_l, v_h, v_l)
    nQh, nQl = _df_add(Qh, Ql, -u_h, -u_l)
    Qh_ref[...] = nQh
    Ql_ref[...] = nQl


def _qr_df_batched(Ah, Al):
    """df32 QR of hi/lo planes (B,N,N) f32 → (Qh, Ql, Rh, Rl)."""
    B, N, _ = Ah.shape
    from .pallas_util import pick_vmem_lane_block
    CB = pick_vmem_lane_block(B, 10 * N * N * 4)
    interpret = jax.default_backend() == "cpu"
    Ath = jnp.transpose(Ah, (2, 1, 0))
    Atl = jnp.transpose(Al, (2, 1, 0))
    i32 = jnp.int32
    spec = pl.BlockSpec((N, N, CB), lambda cb, j: (i32(0), i32(0), cb))
    Ath_out, Atl_out, Qh_out, Ql_out = pl.pallas_call(
        functools.partial(_qr_df_kernel, N, CB),
        interpret=interpret,
        grid=(B // CB, N),
        in_specs=[spec, spec],
        out_specs=[spec, spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((N, N, B), jnp.float32)] * 4,
    )(Ath, Atl)
    Rh = jnp.transpose(Ath_out, (2, 1, 0))
    Rl = jnp.transpose(Atl_out, (2, 1, 0))
    Qh = jnp.transpose(Qh_out, (2, 0, 1))
    Ql = jnp.transpose(Ql_out, (2, 0, 1))
    return Qh, Ql, Rh, Rl


def _df_split_f64(A):
    """f64 → (hi, lo) f32 planes: hi = f32(A), lo = f32(A - hi). Exact when
    |A| is inside f32 range (guaranteed by udt_dirty's 2^50 prescale)."""
    hi = A.astype(jnp.float32)
    lo = (A - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def qr_lanes_df():
    """(..., N, N) float64 QR through the double-float kernel: split to
    hi/lo f32 planes, run _qr_df_kernel, recombine. vmap folds leading axes
    into the kernel's lane batch."""
    if "fn_df" in _QR_CACHE:
        return _QR_CACHE["fn_df"]

    @custom_vmap
    def qr(A):
        lead = A.shape[:-2]
        N = A.shape[-1]
        Af = A.reshape((-1, N, N))
        Ah, Al = _df_split_f64(Af)
        from .pallas_util import map_lane_chunks_seq, pick_vmem_lane_chunk
        Qh, Ql, Rh, Rl = map_lane_chunks_seq(
            _qr_df_batched, Ah, Al,
            step=pick_vmem_lane_chunk(10 * N * N * 4))
        Q = Qh.astype(jnp.float64) + Ql.astype(jnp.float64)
        R = Rh.astype(jnp.float64) + Rl.astype(jnp.float64)
        return Q.reshape(lead + (N, N)), R.reshape(lead + (N, N))

    @qr.def_vmap
    def _rule(axis_size, in_batched, A):
        return qr(A), (True, True)

    _QR_CACHE["fn_df"] = qr
    return qr


_DF_QR_CACHE = {}


def df_qr_ok(N) -> bool:
    """Eligibility + cached compile probe for the double-float QR kernel.
    Default ON for f64 on TPU at 8 | N <= 64 (MC_TPU_QR_DF=0 disables).
    NOT used on cpu/gpu (native f64 exists there); tests call qr_lanes_df
    directly in interpret mode."""
    import os
    env = os.environ.get("MC_TPU_QR_DF")
    if env in ("0", "false", "off"):
        return False
    if not (HAVE_PALLAS and N % 8 == 0 and 8 <= N <= 64):
        return False
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    def compute():
        try:
            # probe the shape the kernel actually runs at: qr_lanes_df
            # chunks the lane batch BEFORE the pallas_call, so a full-batch
            # probe would reject configs that work (and at N=64 a (256,...)
            # block overflows scoped VMEM)
            from .pallas_util import pick_vmem_lane_chunk
            Bp = min(256, pick_vmem_lane_chunk(10 * N * N * 4))
            jax.jit(_qr_df_batched).lower(
                jax.ShapeDtypeStruct((Bp, N, N), jnp.float32),
                jax.ShapeDtypeStruct((Bp, N, N), jnp.float32)).compile()
            return True
        except Exception:  # pragma: no cover
            return False

    from .pallas_util import cached_probe
    return cached_probe(_DF_QR_CACHE, N, "df_qr", compute)
