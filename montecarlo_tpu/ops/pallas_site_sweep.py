"""Pallas TPU kernel: fused Metropolis site sweep over one time slice.

The sequential site loop (reference: sweep_spatial, DQMC.jl:546-582 — each
site's accept/reject depends on the rank-1-updated G of the previous site) is
inherently serial per chain, but in plain XLA it lowers to ~8 small ops per
site -> ~10^5 dispatches per sweep, making the hot path latency-bound. This
kernel runs the WHOLE site loop for one chain inside VMEM: G resident
on-chip, rank-1 updates as VPU outer products, no HBM traffic between sites.

float32 only (the f32 / mixed-precision hot path — f64 is not supported by
Mosaic); the UDT stabilization outside resets drift every safe_mult slices.

Design notes for Mosaic (round-1's fori_loop/SMEM variant died in the
compiler on 'failed to legalize func.return'; every hazard is avoided here):
  * the site loop IS the pallas grid — TPU grids execute sequentially, and
    constant-index-map blocks persist in VMEM across steps, so G/sigma/
    counters carry from site to site with no lax.fori_loop in the kernel;
  * no SMEM, no scalar stores: sigma and the counters are float32 VMEM row
    vectors; the per-site scalar reads (sigma_i, u_i, G_ii) and the row/
    column extraction are one-hot contractions (dynamic lane indexing
    crashes Mosaic; iota-mask contractions are plain VPU work);
  * no bool→numeric astype (infinite recursion in the convert lowering):
    jnp.where throughout; no integer types at all in the kernel;
  * inputs are aliased to outputs (input_output_aliases) so there is no
    i==0 copy step.
Verified bit-exact against the XLA `core.sweep_slice` path in interpreter
mode (tests/test_pallas_kernel.py), and on device when available.
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


def _kernel(lamb, signs, det_power, use_boson, N, F,
            u_ref, _sigma_in, _G_in, _cnt_in, sigma_ref, G_ref, cnt_ref):
    """One grid step = one site i. State carried across steps in the output
    refs (the inputs are aliased onto them, so _sigma_in/_G_in/_cnt_in are
    the same buffers): sigma_ref (1,N) f32 ±1, G_ref (F,N,N) f32,
    cnt_ref (2,N) f32 [row 0: accepts, row 1: negative detratios]."""
    i = pl.program_id(0)

    onehot_lane = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, N), 1) == i,
        jnp.float32(1.0), jnp.float32(0.0))                       # (1,N)

    s = jnp.sum(sigma_ref[...] * onehot_lane)                     # scalar
    u_i = jnp.sum(u_ref[...] * onehot_lane)                       # scalar
    dEb = jnp.float32(-2.0 * lamb) * s

    G = G_ref[...]                                                # (F,N,N)
    # row i (sublane mask) and column i (lane mask) via contractions
    row_mask = jnp.where(
        lax.broadcasted_iota(jnp.int32, (N, N), 0) == i,
        jnp.float32(1.0), jnp.float32(0.0))                       # (N,N)
    col_mask = jnp.where(
        lax.broadcasted_iota(jnp.int32, (N, N), 1) == i,
        jnp.float32(1.0), jnp.float32(0.0))                       # (N,N)
    row_i = jnp.sum(G * row_mask[None, :, :], axis=1)             # (F,N)
    col_i = jnp.sum(G * col_mask[None, :, :], axis=2)             # (F,N)
    gii = jnp.sum(row_i * onehot_lane, axis=1)                    # (F,)

    # signs is a static python tuple — unrolled, no captured constants
    delta = jnp.stack([jnp.exp(jnp.float32(sg) * dEb) - 1.0
                       for sg in signs])                          # (F,)
    r = 1.0 + delta * (1.0 - gii)                                 # (F,)
    rprod = r[0]
    for f in range(1, len(signs)):
        rprod = rprod * r[f]
    detratio = rprod ** det_power
    w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
    p = w * detratio
    accept = u_i < p                                              # scalar bool

    x = jnp.where(accept, delta / r, jnp.zeros_like(r))           # (F,)
    IG = onehot_lane - col_i                                      # (F,N)
    G_ref[...] = G - (x[:, None] * IG)[:, :, None] * row_i[:, None, :]

    flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
    sigma_ref[...] = sigma_ref[...] * (
        (flip - 1.0) * onehot_lane + 1.0)

    inc = jnp.concatenate([
        jnp.where(accept, onehot_lane, jnp.zeros_like(onehot_lane)),
        jnp.where(detratio < 0, onehot_lane, jnp.zeros_like(onehot_lane)),
    ], axis=0)                                                    # (2,N)
    cnt_ref[...] = jnp.where(i == 0, inc, cnt_ref[...] + inc)


@functools.partial(jax.jit, static_argnames=("lamb", "signs", "det_power",
                                             "use_boson"))
def site_sweep_pallas(G, sigma, u, *, lamb, signs, det_power, use_boson):
    """Fused site sweep for ONE chain. G: (F,N,N) f32, sigma: (N,) int32,
    u: (N,) f32. Returns (G, sigma, acc, nneg). Batch with vmap."""
    F, N, _ = G.shape
    kern = functools.partial(_kernel, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F)
    interpret = jax.default_backend() == "cpu"  # CPU: interpreter fallback
    sigma_f = sigma.astype(jnp.float32)[None, :]
    cnt0 = jnp.zeros((2, N), jnp.float32)
    # NOTE: index maps must return i32 — under jax_enable_x64 a python-int 0
    # traces as i64 and Mosaic dies on 'failed to legalize func.return
    # (i64, i64)'. This was round 1's kernel-killing mystery.
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(jnp.int32(0) for _ in shape))
    sigma_out, G_out, cnt = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(N,),
        in_specs=[full((1, N)), full((1, N)), full((F, N, N)), full((2, N))],
        out_specs=[full((1, N)), full((F, N, N)), full((2, N))],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((F, N, N), G.dtype),
            jax.ShapeDtypeStruct((2, N), jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1, 3: 2},
    )(u[None, :], sigma_f, G, cnt0)
    acc = jnp.sum(cnt[0]).astype(jnp.int32)
    nneg = jnp.sum(cnt[1]).astype(jnp.int32)
    return G_out, sigma_out[0].astype(sigma.dtype), acc, nneg


# ---------------------------------------------------------------------------
# Chain-batched kernel: chains ride the VPU lanes
# ---------------------------------------------------------------------------
#
# The per-chain kernel above is correct but serializes chains when vmapped
# (vmap lifts the batch into the sequential TPU grid): measured 7x SLOWER
# than the XLA path. The fused variant below keeps the whole chain batch
# INSIDE the kernel block with layout (F, N, N, CB) — chains on the 128-wide
# lane dimension — so every VPU op processes all chains of a block at once
# while G stays resident in VMEM across the site loop (the XLA path instead
# round-trips G through HBM on every site, making it HBM-bound).
#
# G's transpose is maintained alongside G so both the row (G[i, :]) and the
# column (G[:, i]) are contiguous dynamic-outer-dim loads (dynamic LANE
# indexing is unsupported by Mosaic, and masked full-G contractions would
# triple the VPU work). Scalars-per-chain are (1, 1, CB) lane vectors;
# sigma/u/counters are (N, 1, CB) so the per-site access is an outer-dim
# dynamic slice.


def _mxu_wrap_block(Gv, A, Bt, srow_in, scol_in, srow_out, scol_out, N):
    """s_out ⊙ (A @ (s_in ⊙ Gv) @ B) ⊙ s_out' for one (N, N, CB) flavor
    block, as 2N in-kernel MXU matmuls: the middle contraction of each
    product runs per outer row (a 2D (N,N)@(N,CB) dot), with one in-kernel
    transpose between the two products (the same swapaxes the scratch-Gt
    probe validates). Bt is B TRANSPOSED (so both dots contract the slice's
    leading axis). Scales are (N,1,CB) row / (1,N,CB) col vectors or None."""
    M = Gv
    if srow_in is not None:
        M = M * srow_in
    if scol_in is not None:
        M = M * scol_in
    # Z[a] = (M @ B)[a] = Bt @ M[a]. Explicit HIGHEST: production traces run
    # under ctx.matmul_precision() so precision=None already canonicalizes to
    # highest there, but standalone callers (microbenchmarks, tests) would
    # otherwise get the MXU's single-bf16-pass default.
    Z = jnp.stack([jnp.dot(Bt, M[a], preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
                   for a in range(N)])                     # (a, j, CB)
    Zt = jnp.swapaxes(Z, 0, 1)                             # (j, a, CB)
    Wt = jnp.stack([jnp.dot(A, Zt[j], preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
                    for j in range(N)])                    # (j, i, CB)
    W = jnp.swapaxes(Wt, 0, 1)                             # (i, j, CB)
    if srow_out is not None:
        W = W * srow_out
    if scol_out is not None:
        W = W * scol_out
    return W


def _batched_kernel(lamb, signs, det_power, use_boson, N, F, CB, gt_scratch,
                    *refs, sites_per_step=1, wrap_dir=0, col_read=False):
    """One grid step = `sites_per_step` consecutive sites for one chain block
    (grid = (n_cb, N // sites_per_step); default 1 = one site per step).
    sigma_ref (N,1,CB) f32 ±1; G_ref (F,N,N,CB); Gt = swap(-3,-2) of G.
    acc/nneg (N,1,CB) one-shot per-site writes.

    sites_per_step > 1 unrolls the site body inside one grid step, trading
    program size for the per-grid-step fixed cost (block index recompute +
    step dispatch). The Markov decisions are identical (each unrolled site
    reads the refs its predecessor just wrote and the decision quantities
    are computed op-for-op the same); G itself may differ at fusion-level
    rounding (~1e-7) where XLA fuses consecutive unrolled updates.

    Three Gt modes (picked by cached Mosaic compile probes, `_colread_ok` /
    `_gt_scratch_ok`):
      * col_read=True: NO transpose copy at all. Column i is read straight
        out of G as a dynamic SUBLANE slice G_ref[f, :, ds(i,1), :] —
        (N,1,CB), exactly the outer-dim orientation the rank-1 update
        consumes, so no per-site transpose either. This removes the whole
        Gt maintenance stream (a second full-block RMW per site), i.e.
        HALF of the kernel's VPU work and VMEM traffic, and frees a
        resident VMEM block. Bit-identical to the Gt modes: the Gt update
        multiplied the same value pairs, so Gt stayed exactly G^T.
      * gt_scratch=True: Gt lives in VMEM scratch, built by an in-kernel
        sublane<->outer transpose at site 0 — the caller neither materializes
        nor reads Gt, saving one (F,N,N,CB) HBM round trip per call and one
        resident block of scoped VMEM;
      * gt_scratch=False: Gt is a regular input+output pair (proven fallback
        for backends whose Mosaic rejects the in-kernel transpose).

    NOTE: inputs are NOT aliased onto the outputs — input_output_aliases on
    this call corrupted the chain state when the pallas call sat inside a
    lax.scan body with a lax.cond measurement branch (on-device bias repro:
    occ 0.99 vs 0.50; clean without the cond). The state is copied into the
    output refs at the first site step instead."""
    if wrap_dir:
        # fused wrap mode (implies the scratch-Gt layout): the slice's wrap
        # matmuls run INSIDE the kernel via _mxu_wrap_block. Direction +1
        # wraps up AFTER the last site with the post-update sigma
        # (G <- eT2 (ev⊙G⊙evinv) eT2inv); direction -1 wraps down BEFORE the
        # first site with the pre-update sigma
        # (G <- evinv⊙(eT2inv G eT2)⊙ev). The caller passes the (N, N)
        # operands Ml = the LEFT matrix of the product and MrT = the RIGHT
        # matrix TRANSPOSED (so both in-kernel dots contract a slice's
        # leading axis): (eT2, eT2invᵀ) for +1, (eT2inv, eT2ᵀ) for -1.
        (u_ref, s_in, G_in, Ml_ref, MrT_ref,
         sigma_ref, G_ref, acc_ref, nneg_ref, Gt_ref) = refs
    elif col_read:
        u_ref, s_in, G_in, sigma_ref, G_ref, acc_ref, nneg_ref = refs
        Gt_ref = None
    elif gt_scratch:
        u_ref, s_in, G_in, sigma_ref, G_ref, acc_ref, nneg_ref, Gt_ref = refs
    else:
        (u_ref, s_in, G_in, Gt_in,
         sigma_ref, G_ref, Gt_ref, acc_ref, nneg_ref) = refs
    i0 = pl.program_id(1) * sites_per_step

    def _ev_scales(sg, power):
        # row (N,1,CB) and col (1,N,CB) forms of diag(exp(power·lamb·sg·s))
        # from the CURRENT sigma_ref
        sv = sigma_ref[...]                                    # (N,1,CB)
        ev = jnp.exp(jnp.float32(power * lamb * sg) * sv)
        return ev, jnp.swapaxes(ev, 0, 1)

    @pl.when(i0 == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        if wrap_dir < 0:
            # wrap down first (pre-update sigma; sigma_ref just copied)
            for f, sg in enumerate(signs):
                evinv_r, _ = _ev_scales(sg, -1.0)
                _, ev_c = _ev_scales(sg, +1.0)
                G_ref[f] = _mxu_wrap_block(
                    G_in[f], Ml_ref[...], MrT_ref[...],
                    None, None, evinv_r, ev_c, N)
        else:
            G_ref[...] = G_in[...]
        if Gt_ref is not None:
            Gt_ref[...] = (jnp.swapaxes(G_ref[...], 1, 2)
                           if (gt_scratch or wrap_dir) else Gt_in[...])

    for di in range(sites_per_step):
        i = i0 + di
        s = sigma_ref[pl.ds(i, 1)]                                # (1,1,CB)
        u_i = u_ref[pl.ds(i, 1)]                                  # (1,1,CB)
        dEb = jnp.float32(-2.0 * lamb) * s

        onehot_j = jnp.where(
            lax.broadcasted_iota(jnp.int32, (1, N, 1), 1) == i,
            jnp.float32(1.0), jnp.float32(0.0))                   # (1,N,1)

        rows, cols, deltas, rs = [], [], [], []
        rprod = None
        for f, sg in enumerate(signs):
            row = G_ref[f, pl.ds(i, 1)]                           # (1,N,CB)
            if col_read:
                # dynamic SUBLANE slice of G itself — already in the
                # outer-dim orientation the update consumes (no transpose)
                col = G_ref[f, :, pl.ds(i, 1), :]                 # (N,1,CB)
            else:
                col = Gt_ref[f, pl.ds(i, 1)]                      # (1,N,CB)
            gii = jnp.sum(row * onehot_j, axis=1, keepdims=True)  # (1,1,CB)
            delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0
            r = 1.0 + delta * (1.0 - gii)
            rows.append(row); cols.append(col)
            deltas.append(delta); rs.append(r)
            rprod = r if rprod is None else rprod * r
        detratio = rprod ** det_power                             # (1,1,CB)
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        accept = u_i < w * detratio                               # (1,1,CB)

        if col_read:
            onehot_o = jnp.where(
                lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0) == i,
                jnp.float32(1.0), jnp.float32(0.0))               # (N,1,1)
        for f in range(F):
            x = jnp.where(accept, deltas[f] / rs[f],
                          jnp.zeros_like(rs[f]))                  # (1,1,CB)
            rowb = rows[f]                                        # (1,N,CB)
            if col_read:
                xIG = x * (onehot_o - cols[f])                    # (N,1,CB)
                G_ref[f] = G_ref[f] - xIG * rowb                  # (N,N,CB)
                continue
            IG = onehot_j - cols[f]                               # (1,N,CB)
            xIG = (x * IG).swapaxes(0, 1)                         # (N,1,CB)
            G_ref[f] = G_ref[f] - xIG * rowb                      # (N,N,CB)
            # transpose copy: Gt[b, a] -= row[b] * xIG[a]
            Gt_ref[f] = Gt_ref[f] - rowb.swapaxes(0, 1) * (x * IG)

        flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
        sigma_ref[pl.ds(i, 1)] = s * flip
        one = jnp.ones_like(s)
        zero = jnp.zeros_like(s)
        acc_ref[pl.ds(i, 1)] = jnp.where(accept, one, zero)
        nneg_ref[pl.ds(i, 1)] = jnp.where(detratio < 0, one, zero)

    if wrap_dir > 0:
        @pl.when(i0 == N - sites_per_step)
        def _wrap_up():
            # wrap up after the last site (post-update sigma):
            # G <- eT2 @ (ev ⊙row G ⊙col evinv) @ eT2inv
            for f, sg in enumerate(signs):
                ev_r, _ = _ev_scales(sg, +1.0)
                _, evinv_c = _ev_scales(sg, -1.0)
                G_ref[f] = _mxu_wrap_block(
                    G_ref[f], Ml_ref[...], MrT_ref[...],
                    ev_r, evinv_c, None, None, N)


def _batched_kernel_pair(lamb, signs, det_power, use_boson, N, F, CB,
                         u_ref, s_in, G_in, sigma_ref, G_ref, acc_ref,
                         nneg_ref):
    """Delay-2 variant of the col_read chain-on-lanes kernel: one grid step
    = TWO consecutive sites (grid = (n_cb, N // 2)).

    The sequential dependency between site i and site j = i+1 runs only
    through site j's row/column/diagonal of G, so site j's decision
    quantities are corrected EXACTLY from site i's rank-1 terms with O(N)
    vector ops (the in-kernel form of the delayed/submatrix update,
    reference accept_local! rank-1 algebra:
    /root/reference/src/models/HubbardModel/HubbardModelAttractive.jl:129-155):

        row'_j = row_j − xIG_i[j]·row_i          (1,N,CB)
        col'_j = col_j − xIG_i·row_i[j]          (N,1,CB)

    and both rank-1 updates then land in ONE read-modify-write pass over
    the (N,N,CB) block instead of two:

        G ← G − xIG_i⊗row_i − xIG_j⊗row'_j

    — halving the kernel's dominant full-block traffic. A rejected site i
    has x_i = 0, so the corrections vanish and site j sees the unmodified
    quantities. The Markov decisions are arithmetically those of the
    sequential kernel (same expressions; fusion-level rounding ~1e-7 may
    differ, same caveat as sites_per_step)."""
    t = pl.program_id(1)
    i = 2 * t

    @pl.when(t == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        G_ref[...] = G_in[...]

    r_lane = lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)
    r_sub = lax.broadcasted_iota(jnp.int32, (N, 1, 1), 0)

    def decide(idx, rows, cols, giis):
        """Metropolis decision at site idx from supplied per-flavor
        row/col/gii (the exact post-previous-updates values). Returns
        (accept, detratio, xIGs, s)."""
        s = sigma_ref[pl.ds(idx, 1)]                          # (1,1,CB)
        u_i = u_ref[pl.ds(idx, 1)]
        dEb = jnp.float32(-2.0 * lamb) * s
        deltas, rs = [], []
        rprod = None
        for f, sg in enumerate(signs):
            delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0
            r = 1.0 + delta * (1.0 - giis[f])
            deltas.append(delta)
            rs.append(r)
            rprod = r if rprod is None else rprod * r
        detratio = rprod ** det_power
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        accept = u_i < w * detratio
        onehot_o = jnp.where(r_sub == idx, jnp.float32(1.0),
                             jnp.float32(0.0))                # (N,1,1)
        xIGs = []
        for f in range(F):
            x = jnp.where(accept, deltas[f] / rs[f], jnp.zeros_like(rs[f]))
            xIGs.append(x * (onehot_o - cols[f]))             # (N,1,CB)
        return accept, detratio, xIGs, s

    def record(idx, accept, detratio, s):
        flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
        sigma_ref[pl.ds(idx, 1)] = s * flip
        one = jnp.ones_like(s)
        zero = jnp.zeros_like(s)
        acc_ref[pl.ds(idx, 1)] = jnp.where(accept, one, zero)
        nneg_ref[pl.ds(idx, 1)] = jnp.where(detratio < 0, one, zero)

    # ---- site i: reads of the current G --------------------------------
    onehot_i = jnp.where(r_lane == i, jnp.float32(1.0), jnp.float32(0.0))
    rows_i, cols_i, giis_i = [], [], []
    for f in range(F):
        row = G_ref[f, pl.ds(i, 1)]                           # (1,N,CB)
        col = G_ref[f, :, pl.ds(i, 1), :]                     # (N,1,CB)
        rows_i.append(row)
        cols_i.append(col)
        giis_i.append(jnp.sum(row * onehot_i, axis=1, keepdims=True))
    acc_i, det_i, xIG_i, s_i = decide(i, rows_i, cols_i, giis_i)
    record(i, acc_i, det_i, s_i)

    # ---- site j = i+1: pre-update reads + exact rank-1 corrections ------
    j = i + 1
    onehot_j = jnp.where(r_lane == j, jnp.float32(1.0), jnp.float32(0.0))
    rows_j, cols_j, giis_j = [], [], []
    onehot_jo = jnp.where(r_sub == j, jnp.float32(1.0), jnp.float32(0.0))
    for f in range(F):
        row0 = G_ref[f, pl.ds(j, 1)]                          # (1,N,CB)
        col0 = G_ref[f, :, pl.ds(j, 1), :]                    # (N,1,CB)
        # element j of the correction vectors, via masked reduces (xIG/row
        # are values, not refs — no pl.ds)
        a = jnp.sum(xIG_i[f] * onehot_jo, axis=0, keepdims=True)  # (1,1,CB)
        b = jnp.sum(rows_i[f] * onehot_j, axis=1, keepdims=True)  # (1,1,CB)
        row = row0 - a * rows_i[f]
        col = col0 - xIG_i[f] * b
        rows_j.append(row)
        cols_j.append(col)
        giis_j.append(jnp.sum(row * onehot_j, axis=1, keepdims=True))
    acc_j, det_j, xIG_j, s_j = decide(j, rows_j, cols_j, giis_j)
    record(j, acc_j, det_j, s_j)

    # ---- combined rank-2 update: one RMW pass over each flavor block ----
    for f in range(F):
        G_ref[f] = (G_ref[f] - xIG_i[f] * rows_i[f]
                    - xIG_j[f] * rows_j[f])


from .pallas_util import pick_lane_block as _pick_chain_block


# ---------------------------------------------------------------------------
# Site-major kernel: sites ride the lanes, chains ride the sublanes
# ---------------------------------------------------------------------------
#
# The chain-on-lanes kernel above keeps G AND Gt fully resident with the
# chain block on the 128-wide lane dimension, so its VMEM footprint is
# 4*F*N^2*128*4 bytes — past N=128 that exceeds the ~16 MB scoped budget and
# make_context used to fall back to the XLA site loop, which is per-op-
# latency-bound at N=256 (measured 46-50 chain-sweeps/s at L=16). This
# variant tiles the CHAIN axis instead: layout (F, N, CB, N) = [flavor, row,
# chain-sublane, col] with a small chain block CB (8-32) on the SUBLANE
# dimension and the full site axis on the lanes, so VMEM scales as
# 3*F*N^2*CB*4 and N=256 fits at CB=16 (~12.6 MB). Rows G[i,:] and columns
# (via the transpose copy Gt) remain dynamic-outer-dim slices; per-chain
# scalars live in lane space as (1,1,CB) vectors and cross into the sublane
# space of the update via two tiny swapaxes per flavor. Grid = (C/CB, N);
# the site loop still persists state in VMEM across grid steps.


def _sitemajor_kernel(lamb, signs, det_power, use_boson, N, F, CB, gt_scratch,
                      *refs, sites_per_step=1):
    """One grid step = `sites_per_step` consecutive sites for one chain block
    (grid = (C/CB, N // sites_per_step); default 1 = one site per step).
    sigma/u/acc/nneg: (1, N, CB) [chain block on lanes]; G_ref (F,N,CB,N)
    [chains on sublanes]; Gt = swap(row, col) of G. With gt_scratch=True
    (cached Mosaic compile probe, `_gt_scratch_ok`) Gt lives in VMEM scratch,
    built by an in-kernel outer<->lane transpose at site 0 — 3 resident big
    blocks instead of 4, and the VMEM headroom funds CB=16 at N=256 plus
    F=2 support; otherwise Gt is a regular input+output pair. State is
    copied into the output refs at site 0 (no input aliasing — see
    _batched_kernel). sites_per_step unrolls the site body inside one grid
    step — Markov-identical, same algebra (see _batched_kernel)."""
    if gt_scratch:
        u_ref, s_in, G_in, sigma_ref, G_ref, acc_ref, nneg_ref, Gt_ref = refs
    else:
        (u_ref, s_in, G_in, Gt_in,
         sigma_ref, G_ref, Gt_ref, acc_ref, nneg_ref) = refs
    i0 = pl.program_id(1) * sites_per_step

    @pl.when(i0 == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        G_ref[...] = G_in[...]
        Gt_ref[...] = (jnp.swapaxes(G_in[...], 1, 3) if gt_scratch
                       else Gt_in[...])

    for di in range(sites_per_step):
        i = i0 + di
        s = sigma_ref[0, pl.ds(i, 1)][None]                   # (1,1,CB) lane
        u_i = u_ref[0, pl.ds(i, 1)][None]                     # (1,1,CB) lane
        dEb = jnp.float32(-2.0 * lamb) * s

        onehot = jnp.where(
            lax.broadcasted_iota(jnp.int32, (1, 1, N), 2) == i,
            jnp.float32(1.0), jnp.float32(0.0))               # (1,1,N)

        rows, colTs, deltas, rs = [], [], [], []
        rprod = None
        for f, sg in enumerate(signs):
            row = G_ref[f, pl.ds(i, 1)]                       # (1,CB,N)
            colT = Gt_ref[f, pl.ds(i, 1)]                     # (1,CB,N)
            gii_sub = jnp.sum(row * onehot, axis=2,
                              keepdims=True)                  # (1,CB,1)
            gii = jnp.swapaxes(gii_sub, 1, 2)                 # (1,1,CB) lane
            delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0      # (1,1,CB)
            r = 1.0 + delta * (1.0 - gii)
            rows.append(row); colTs.append(colT)
            deltas.append(delta); rs.append(r)
            rprod = r if rprod is None else rprod * r
        detratio = rprod ** det_power                         # (1,1,CB)
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        accept = u_i < w * detratio                           # (1,1,CB)

        for f in range(F):
            x = jnp.where(accept, deltas[f] / rs[f],
                          jnp.zeros_like(rs[f]))              # (1,1,CB)
            x_sub = jnp.swapaxes(x, 1, 2)                     # (1,CB,1)
            IG = onehot - colTs[f]                            # (1,CB,N)
            xIG = x_sub * IG                                  # (1,CB,N)
            xIGo = jnp.swapaxes(xIG, 0, 2)                    # (N,CB,1)
            rowb = rows[f]                                    # (1,CB,N)
            G_ref[f] = G_ref[f] - xIGo * rowb
            Gt_ref[f] = Gt_ref[f] - jnp.swapaxes(rowb, 0, 2) * xIG

        flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
        sigma_ref[0, pl.ds(i, 1)] = (s * flip)[0]
        one = jnp.ones_like(s[0])
        zero = jnp.zeros_like(s[0])
        acc_ref[0, pl.ds(i, 1)] = jnp.where(accept[0], one, zero)
        nneg_ref[0, pl.ds(i, 1)] = jnp.where(detratio[0] < 0, one, zero)


def _sitemajor_delayed_kernel(lamb, signs, det_power, use_boson, N, F, CB,
                              DK, mxu_apply, *refs):
    """Delayed rank-k site-major sweep: one grid step = DK consecutive sites
    (grid = (C/CB, N // DK)); materialized-Gt layout only.

    The per-site full-G read-modify-write of `_sitemajor_kernel` is what
    bounds it (measured v5e: ~0.9 T op/s achieved, unaffected by site
    unrolling — VMEM traffic, not per-step cost). This kernel instead keeps
    the DK-block's row slab R = G[i0:i0+DK, :] and column slab
    C = Gt[i0:i0+DK, :] exactly updated through the block (reference
    algebra: delayed/blocked updates of accept_local!,
    /root/reference/src/models/HubbardModel/HubbardModelAttractive.jl:129,
    here batched and deferred), accumulates the rank-1 factors a_p, b_p,
    and applies Sigma_p a_p (x) b_p to G and Gt ONCE per block:
      * row/col/decision quantities per site come from the slabs (exact, so
        the Markov chain is identical to the per-site kernel in exact
        arithmetic);
      * slab maintenance per site costs O(DK*CB*N) instead of O(N*CB*N);
      * the block apply runs either as per-chain MXU dots (mxu_apply=True:
        (N,DK)@(DK,N) per chain c, contracting the slot axis) or as DK
        unrolled VPU rank-1 updates (mxu_apply=False — same flops as the
        per-site kernel but 1/DK of its G traffic).
    """
    (u_ref, s_in, G_in, Gt_in,
     sigma_ref, G_ref, Gt_ref, acc_ref, nneg_ref) = refs
    i0 = pl.program_id(1) * DK

    @pl.when(i0 == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        G_ref[...] = G_in[...]
        Gt_ref[...] = Gt_in[...]

    lane_ids = lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    slot_ids = lax.broadcasted_iota(jnp.int32, (DK, 1, 1), 0)
    # block row/column slabs, kept exactly updated through the DK sites
    Rs = [G_ref[f, pl.ds(i0, DK)] for f in range(F)]       # (DK,CB,N)
    Cs = [Gt_ref[f, pl.ds(i0, DK)] for f in range(F)]
    As = [[] for _ in range(F)]
    Bs = [[] for _ in range(F)]

    for t in range(DK):
        i = i0 + t
        s = sigma_ref[0, pl.ds(i, 1)][None]                # (1,1,CB) lane
        u_i = u_ref[0, pl.ds(i, 1)][None]                  # (1,1,CB) lane
        dEb = jnp.float32(-2.0 * lamb) * s
        onehot = jnp.where(lane_ids == i, jnp.float32(1.0),
                           jnp.float32(0.0))               # (1,1,N)
        e_local = jnp.where(slot_ids == t, jnp.float32(1.0),
                            jnp.float32(0.0))              # (DK,1,1)

        rows, deltas, rs_ = [], [], []
        rprod = None
        for f, sg in enumerate(signs):
            row = Rs[f][t:t + 1]                           # (1,CB,N)
            gii_sub = jnp.sum(row * onehot, axis=2,
                              keepdims=True)               # (1,CB,1)
            gii = jnp.swapaxes(gii_sub, 1, 2)              # (1,1,CB)
            delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0
            r = 1.0 + delta * (1.0 - gii)
            rows.append(row); deltas.append(delta); rs_.append(r)
            rprod = r if rprod is None else rprod * r
        detratio = rprod ** det_power                      # (1,1,CB)
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        accept = u_i < w * detratio                        # (1,1,CB)

        for f in range(F):
            x = jnp.where(accept, deltas[f] / rs_[f],
                          jnp.zeros_like(rs_[f]))          # (1,1,CB)
            x_sub = jnp.swapaxes(x, 1, 2)                  # (1,CB,1)
            col = Cs[f][t:t + 1]                           # (1,CB,N) over r
            a_full = x_sub * (onehot - col)                # (1,CB,N) over r
            b_full = rows[f]                               # (1,CB,N) over n
            # slab-restricted components, one lane extraction each:
            # a[i0+s] = x*(delta_{s,t} - R[s,:,i]), b[i0+s] = C[s,:,i]
            Rcol_i = jnp.sum(Rs[f] * onehot, axis=2,
                             keepdims=True)                # (DK,CB,1)
            Ccol_i = jnp.sum(Cs[f] * onehot, axis=2,
                             keepdims=True)                # (DK,CB,1)
            a_slab = x_sub * (e_local - Rcol_i)            # (DK,CB,1)
            Rs[f] = Rs[f] - a_slab * b_full
            Cs[f] = Cs[f] - Ccol_i * a_full
            As[f].append(a_full)
            Bs[f].append(b_full)

        flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
        sigma_ref[0, pl.ds(i, 1)] = (s * flip)[0]
        one = jnp.ones_like(s[0])
        zero = jnp.zeros_like(s[0])
        acc_ref[0, pl.ds(i, 1)] = jnp.where(accept[0], one, zero)
        nneg_ref[0, pl.ds(i, 1)] = jnp.where(detratio[0] < 0, one, zero)

    # block apply: G -= Sigma_p a_p (x) b_p, Gt -= Sigma_p b_p (x) a_p
    for f in range(F):
        if mxu_apply:
            A = jnp.concatenate(As[f], axis=0)             # (DK,CB,N) over r
            B = jnp.concatenate(Bs[f], axis=0)             # (DK,CB,N) over n
            for c in range(CB):
                A_c = A[:, c, :]                           # (DK,N)
                B_c = B[:, c, :]                           # (DK,N)
                # explicit HIGHEST (see _mxu_wrap_block): keeps the deferred
                # block apply exact-f32 even outside ctx.matmul_precision()
                upd = lax.dot_general(
                    A_c, B_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)       # (N_r,N_n)
                updT = lax.dot_general(
                    B_c, A_c, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)       # (N_n,N_r)
                G_ref[f, :, pl.ds(c, 1), :] = (
                    G_ref[f, :, pl.ds(c, 1), :] - upd[:, None, :])
                Gt_ref[f, :, pl.ds(c, 1), :] = (
                    Gt_ref[f, :, pl.ds(c, 1), :] - updT[:, None, :])
        else:
            Gf, Gtf = G_ref[f], Gt_ref[f]
            for t in range(DK):
                a_o = jnp.swapaxes(As[f][t], 0, 2)         # (N,CB,1)
                b_o = jnp.swapaxes(Bs[f][t], 0, 2)         # (N,CB,1)
                Gf = Gf - a_o * Bs[f][t]
                Gtf = Gtf - b_o * As[f][t]
            G_ref[f] = Gf
            Gt_ref[f] = Gtf


# scoped-VMEM budget for the resident G blocks (3 with Gt in scratch: G
# in+out + Gt; 4 with Gt materialized: in+out for both G and Gt);
# conservative vs the 16 MB v5e limit to leave room for the small buffers
_SITEMAJOR_VMEM_BUDGET = 13 * 2 ** 20


def _pick_sublane_block(C, N, F, n_blocks=3):
    """Largest chain block CB (multiple of 8, dividing the padded batch) whose
    n_blocks resident (F,N,CB,N) f32 blocks fit the scoped-VMEM budget; None
    if even CB=8 does not fit. CB is capped at the next multiple of 8 >= C so
    a small chain batch (e.g. the single-chain reproduce-the-reference setup)
    is not padded out to the VMEM-optimal block."""
    per_chain = n_blocks * F * N * N * 4
    cap = max(8, -(-C // 8) * 8)
    for cb in (32, 16, 8):
        if cb <= cap and cb * per_chain <= _SITEMAJOR_VMEM_BUDGET:
            return cb
    return None


# Cached result of the Mosaic compile probe for the in-kernel Gt transpose,
# keyed by (variant, N, F). The scratch-Gt variant needs Mosaic to lower a
# sublane<->outer (batched) or outer<->lane (site-major) transpose of a VMEM
# block — supported on current TPU toolchains but not guaranteed on every
# jaxlib, so it is verified by an AOT lower+compile of the tiny C=CB case
# the first time each shape class is requested (a few seconds, once per
# process). Override with MC_TPU_GT_SCRATCH=0/1 to skip the probe.
_GT_SCRATCH_CACHE = {}


def _gt_scratch_ok(variant, N, F):
    import os
    env = os.environ.get("MC_TPU_GT_SCRATCH")
    if env is not None:
        return env not in ("0", "false", "off")
    if jax.default_backend() == "cpu":
        return True  # interpreter mode: swapaxes always available
    key = (variant, N, F)

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        gdtype = jnp.float32
        if variant == "batched_cx":
            # probe at the PRODUCTION chunk size — a probe at a smaller lane
            # block would validate a different Mosaic shape class than what
            # actually executes
            C = _cx_chunk(N, F)
            gdtype = jnp.complex64
            fn = functools.partial(_site_sweep_batched_cx, **kw)
        else:  # "batched"  (site-major variants probe via _sitemajor_cfg*)
            C = 128
            fn = functools.partial(_site_sweep_batched,
                                   _force_scratch=True, **kw)
        args = (jax.ShapeDtypeStruct((C, F, N, N), gdtype),
                jax.ShapeDtypeStruct((C, N), jnp.int32),
                jax.ShapeDtypeStruct((C, N), jnp.float32))
        try:
            jax.jit(fn).lower(*args).compile()
            return True
        except Exception:  # Mosaic rejected the in-kernel transpose
            return False

    from .pallas_util import cached_probe
    return cached_probe(_GT_SCRATCH_CACHE, key, "gt_scratch", compute)



_COLREAD_CACHE = {}


def _colread_ok(N, F):
    """Cached compile probe for the no-Gt (col_read) chain-on-lanes kernel:
    needs Mosaic to lower a dynamic SUBLANE slice G_ref[f, :, ds(i,1), :] of
    a VMEM block. Probed at the production chain block inside a scan (like
    every other site-kernel probe). Override with MC_TPU_COLREAD=0/1."""
    import os
    env = os.environ.get("MC_TPU_COLREAD")
    if env is not None:
        return env not in ("0", "false", "off")
    if jax.default_backend() == "cpu":
        return True  # interpreter mode
    key = (N, F)

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        C = 128
        fn = functools.partial(_site_sweep_batched, _force_colread=True, **kw)
        args = (jax.ShapeDtypeStruct((C, F, N, N), jnp.float32),
                jax.ShapeDtypeStruct((C, N), jnp.int32),
                jax.ShapeDtypeStruct((C, N), jnp.float32))
        return _probe_compiles(fn, args)

    from .pallas_util import cached_probe
    return cached_probe(_COLREAD_CACHE, key, "colread", compute)


_PAIR_CACHE = {}


def _pair_ok(N, F):
    """Cached compile probe for the delay-2 (paired-site) col_read kernel
    (_batched_kernel_pair). Default ON only for F >= 2: measured on v5e
    (benchmarks/site_pair_ab.py, 8x8 beta=10, 256 chains) the combined
    rank-2 pass wins +4.6% at F=2 (repulsive 2393 -> 2502 cs/s) where the
    doubled per-site block work amortizes the shared decision chain, but
    LOSES at F=1 (headline 5198 -> 4911, sm=1 921 -> 911, g_refresh
    1393 -> 1361): the VMEM-resident rank-1 update is VPU-FLOP-bound, and
    pairing adds correction work without removing FLOPs. Override with
    MC_TPU_SITE_PAIR=0/1."""
    import os
    env = os.environ.get("MC_TPU_SITE_PAIR")
    if env is not None:
        return env not in ("0", "false", "off")
    if N % 2 or F < 2:
        return False
    if jax.default_backend() == "cpu":
        return True  # interpreter mode
    key = (N, F)

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        C = 128
        fn = functools.partial(_site_sweep_batched, _force_colread=True,
                               _force_pair=True, **kw)
        args = (jax.ShapeDtypeStruct((C, F, N, N), jnp.float32),
                jax.ShapeDtypeStruct((C, N), jnp.int32),
                jax.ShapeDtypeStruct((C, N), jnp.float32))
        return _probe_compiles(fn, args)

    from .pallas_util import cached_probe
    return cached_probe(_PAIR_CACHE, key, "site_pair", compute)


def _sites_per_step(N):
    """Experimental per-grid-step site unroll (MC_TPU_SITES_PER_STEP,
    default 1): identical algebra/rounding, trades program size for the
    per-grid-step fixed cost; clamped to a divisor of N."""
    import os
    S = max(1, int(os.environ.get("MC_TPU_SITES_PER_STEP", "1")))
    while S > 1 and N % S:
        S -= 1
    return S


def _probe_compiles(fn, arg_shapes) -> bool:
    """AOT-compile `fn(G, sigma, u, ...)` INSIDE a lax.scan that threads G and
    sigma through the carry. A standalone compile is not representative: the
    scoped-VMEM accounting differs inside a while/scan body (measured on v5e:
    a kernel that fits standalone by <0.1 MB OOMs by 48 KB once the
    surrounding sweep scan wraps it), and production always runs the kernels
    inside the slice scan."""
    def scanned(*args):
        def body(carry, _):
            out = fn(*carry, *args[len(carry):])
            return (out[0].astype(args[0].dtype),
                    out[1].astype(args[1].dtype)) + carry[2:], None
        carry = args[:2] + args[2:3]
        (G, sigma, u), _ = lax.scan(body, carry, None, length=2)
        return G
    try:
        jax.jit(scanned).lower(*arg_shapes).compile()
        return True
    except Exception:  # VMEM OOM or Mosaic rejection
        return False


# Cached (chunk_C, gt_scratch) production config for the site-major kernels,
# keyed by (N, F, cx). Measured on v5e at N=256: the real compiler fits the
# kernel ONLY when the chain block equals the full per-call batch (block ==
# array lets Mosaic stream the big operands instead of pinning a full-size
# output in scoped VMEM), and the scratch-Gt transpose never fits at N > 128
# — neither constraint is visible to the interpreter, so the config comes
# from AOT compile probes at the EXACT production shapes, preferred-first.
_SITEMAJOR_CFG_CACHE = {}


def _sitemajor_cfg(N, F):
    """(chunk_C, gt_scratch) for the f32 site-major kernel, or None if no
    probed configuration compiles. chunk_C is the per-pallas_call chain
    count (callers chunk the batch to it); the call uses one full-array
    chain block (CB == padded C)."""
    if jax.default_backend() == "cpu":
        # interpreter: any config runs; static v5e-budget stand-in so CPU
        # tests exercise the same support boundary as the old picker
        if (_pick_sublane_block(8, N, F, n_blocks=4) is None
                and _pick_sublane_block(8, N, F, n_blocks=3) is None):
            return None
        return (32, True)
    key = (N, F, False, _sites_per_step(N))

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        for C, scratch in ((64, True), (64, False), (32, True), (32, False),
                           (16, True), (16, False), (8, True), (8, False)):
            fn = functools.partial(_site_sweep_sitemajor, force_cb=C,
                                   _force_scratch=scratch, **kw)
            args = (jax.ShapeDtypeStruct((C, F, N, N), jnp.float32),
                    jax.ShapeDtypeStruct((C, N), jnp.int32),
                    jax.ShapeDtypeStruct((C, N), jnp.float32))
            if _probe_compiles(fn, args):
                return (C, scratch)
        return None

    from .pallas_util import cached_probe
    return cached_probe(_SITEMAJOR_CFG_CACHE, key, "sitemajor", compute)


def _sitemajor_cfg_cx(N, F):
    """chunk_C for the complex site-major kernel (always scratch-Gt), or
    None if no probed chain count compiles."""
    if jax.default_backend() == "cpu":
        if _pick_sublane_block(8, N, F, n_blocks=6) is None:
            return None
        return 32
    key = (N, F, True)

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        for C in (64, 32, 16, 8):
            fn = functools.partial(_site_sweep_sitemajor_cx, force_cb=C, **kw)
            args = (jax.ShapeDtypeStruct((C, F, N, N), jnp.complex64),
                    jax.ShapeDtypeStruct((C, N), jnp.int32),
                    jax.ShapeDtypeStruct((C, N), jnp.float32))
            if _probe_compiles(fn, args):
                return C
        return None

    from .pallas_util import cached_probe
    return cached_probe(_SITEMAJOR_CFG_CACHE, key, "sitemajor_cx", compute)


_WRAP_FUSE_CACHE = {}


def wrap_fuse_ok(N, F):
    """Cached AOT compile probe for the wrap-fused chain-on-lanes kernel at
    its PRODUCTION chunk/block size: the in-kernel MXU wrap holds extra
    (N,N,CB) stack temporaries, so VMEM fit is shape-dependent and only the
    real compiler can confirm it (the interpreter can't). On probe failure
    core._fuse_wrap_enabled leaves the unfused path in place."""
    if jax.default_backend() == "cpu":
        return True  # interpreter mode
    key = (N, F)

    def compute():
        from .pallas_util import pick_vmem_lane_chunk
        C = pick_vmem_lane_chunk(5 * F * N * N * 4)
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False, wrap_dir=1)
        fn = functools.partial(_site_sweep_batched, **kw)
        args = (jax.ShapeDtypeStruct((C, F, N, N), jnp.float32),
                jax.ShapeDtypeStruct((C, N), jnp.int32),
                jax.ShapeDtypeStruct((C, N), jnp.float32),
                jax.ShapeDtypeStruct((N, N), jnp.float32),
                jax.ShapeDtypeStruct((N, N), jnp.float32))
        return _probe_compiles(fn, args)

    from .pallas_util import cached_probe
    return cached_probe(_WRAP_FUSE_CACHE, key, "wrap_fuse", compute)


def _sm_delayed_mode():
    """Delayed-kernel dispatch mode for N > 128: "auto" (default — use the
    delayed kernel when its compile probe passes; measured 80.4 vs 46.9
    chain-sweeps/s at L=16 on v5e), "1" force, "0" disable."""
    import os
    return os.environ.get("MC_TPU_SM_DELAYED", "auto")


def _sitemajor_delayed_cfg(N, F):
    """(chunk_C, DK, mxu_apply) for the delayed site-major kernel, or None.
    Probed at production shapes like _sitemajor_cfg (feasibility-ordered;
    within-order preference: more chains per call, MXU apply)."""
    if jax.default_backend() == "cpu":
        return (32, 16, True)
    key = (N, F, "delayed")

    def compute():
        kw = dict(lamb=0.5, signs=(1.0,) * F if F == 1 else (1.0, -1.0),
                  det_power=2 // F, use_boson=False)
        # DK=64 measured fastest at N=256 (89-97 vs 80-91 cs/s at L=16 for
        # DK=16/32). CB=32 configs compile in a bare sweep but OOM scoped
        # VMEM inside the full DQMC run program (measurement lax.cond
        # branches shift the accounting), so only CB<=16 — whose 4-block
        # residency leaves ~6 MB headroom — is eligible; the probe wraps fn
        # in the production chunking (map_lane_chunks_seq over 2 chunks).
        from .pallas_util import map_lane_chunks_seq
        for C, DK, mxu in ((16, 64, True), (16, 32, True), (16, 16, True),
                           (16, 16, False), (8, 32, True), (8, 16, True),
                           (8, 16, False)):
            kfn = functools.partial(_site_sweep_sitemajor_delayed, force_cb=C,
                                    force_dk=DK, force_mxu=mxu, **kw)
            fn = functools.partial(map_lane_chunks_seq, kfn, step=C)
            args = (jax.ShapeDtypeStruct((2 * C, F, N, N), jnp.float32),
                    jax.ShapeDtypeStruct((2 * C, N), jnp.int32),
                    jax.ShapeDtypeStruct((2 * C, N), jnp.float32))
            if _probe_compiles(fn, args):
                return (C, DK, mxu)
        return None

    from .pallas_util import cached_probe
    return cached_probe(_SITEMAJOR_CFG_CACHE, key, "sitemajor_delayed",
                        compute)


def _sitemajor_chunk(N, F):
    """Per-call chain chunk the N>128 dispatch will use (for the custom_vmap
    rule's batch chunking)."""
    if _sm_delayed_mode() != "0":
        cfg = _sitemajor_delayed_cfg(N, F)
        if cfg is not None:
            return cfg[0]
    cfg = _sitemajor_cfg(N, F)
    return cfg[0] if cfg else None


def sitemajor_supported(N, F):
    """Whether the site-major kernel can run at this (N, F): some probed
    (chunk, Gt-mode) configuration compiles at its production shape."""
    return _sitemajor_cfg(N, F) is not None


def _site_sweep_sitemajor_delayed(G, sigma, u, *, lamb, signs, det_power,
                                  use_boson, force_cb=None, force_dk=None,
                                  force_mxu=None):
    """Delayed rank-k site-major sweep for N > 128 (see
    _sitemajor_delayed_kernel). Same contract as _site_sweep_batched."""
    C, F, N, _ = G.shape
    if force_cb is not None:
        CB, DK = force_cb, (force_dk or 16)
        mxu = True if force_mxu is None else bool(force_mxu)
    else:
        cfg = _sitemajor_delayed_cfg(N, F)
        if cfg is None:
            raise ValueError(
                f"delayed site-major sweep unsupported at N={N}, F={F}")
        chunk, DK, mxu = cfg
        if C > chunk:
            raise ValueError(
                f"delayed site-major sweep called with C={C} > probed "
                f"per-call chunk {chunk}; chunk the batch first")
        CB = max(8, -(-C // 8) * 8)
    while DK > 1 and N % DK:
        DK -= 1
    pad = (-C) % CB
    if pad:
        zpad = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        G, sigma, u = zpad(G), zpad(sigma), zpad(u)
    Cp = C + pad
    kern = functools.partial(_sitemajor_delayed_kernel, float(lamb),
                             tuple(signs), int(det_power), bool(use_boson),
                             N, F, CB, DK, mxu)
    interpret = jax.default_backend() == "cpu"
    Gk = jnp.transpose(G, (1, 2, 0, 3))                       # (F,N,C,N)
    to_blocks = lambda a: jnp.transpose(
        a.reshape(Cp // CB, CB, N), (0, 2, 1))                # (NB,N,CB)
    sig = to_blocks(sigma.astype(jnp.float32))
    uk = to_blocks(u)
    i32 = jnp.int32
    bigspec = pl.BlockSpec((F, N, CB, N),
                           lambda cb, i: (i32(0), i32(0), cb, i32(0)))
    rowspec = pl.BlockSpec((1, N, CB), lambda cb, i: (cb, i32(0), i32(0)))
    vec_shape = jax.ShapeDtypeStruct((Cp // CB, N, CB), jnp.float32)
    big_shape = jax.ShapeDtypeStruct((F, N, Cp, N), jnp.float32)
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(Cp // CB, N // DK),
        in_specs=[rowspec, rowspec, bigspec, bigspec],
        out_specs=[rowspec, bigspec, bigspec, rowspec, rowspec],
        out_shape=[vec_shape, big_shape, big_shape, vec_shape, vec_shape],
    )(uk, sig, Gk, jnp.transpose(G, (1, 3, 0, 2)))
    sig_out, G_out, _Gt, accv, nnegv = outs
    from_blocks = lambda a: jnp.transpose(a, (0, 2, 1)).reshape(Cp, N)[:C]
    G_new = jnp.transpose(G_out, (2, 0, 1, 3))[:C]
    sigma_new = from_blocks(sig_out).astype(sigma.dtype)
    acc = jnp.sum(from_blocks(accv), axis=1).astype(jnp.int32)
    nneg = jnp.sum(from_blocks(nnegv), axis=1).astype(jnp.int32)
    return G_new, sigma_new, acc, nneg


def _site_sweep_sitemajor(G, sigma, u, *, lamb, signs, det_power, use_boson,
                          force_cb=None, _force_scratch=None):
    """Site-major fused sweep for N > 128. Same contract as
    _site_sweep_batched; chains are padded to a multiple of the chain block."""
    C, F, N, _ = G.shape
    if force_cb is not None:
        scratch = bool(_force_scratch)
        CB = force_cb
    else:
        cfg = _sitemajor_cfg(N, F)
        if cfg is None:
            raise ValueError(
                f"site-major fused sweep unsupported at N={N}, F={F}: no "
                "probed configuration compiles — use the XLA site loop "
                "(use_pallas=False / make_context's automatic fallback)")
        chunk, scratch = cfg
        if C > chunk:
            raise ValueError(
                f"site-major sweep called with C={C} > probed per-call "
                f"chunk {chunk}; chunk the batch first (custom_vmap rule)")
        # one full-array chain block per call: block == array lets Mosaic
        # stream the big operands; smaller blocks pin a full-size output in
        # scoped VMEM on the real compiler (measured v5e, N=256)
        CB = max(8, -(-C // 8) * 8)
    pad = (-C) % CB
    if pad:
        # zero padding is algebra-safe: G=0 gives r = 1+delta (no NaN), and
        # the padded chains' outputs are sliced off below
        zpad = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        G, sigma, u = zpad(G), zpad(sigma), zpad(u)
    Cp = C + pad
    S = _sites_per_step(N)
    kern = functools.partial(_sitemajor_kernel, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F, CB,
                             scratch, sites_per_step=S)
    interpret = jax.default_backend() == "cpu"
    Gk = jnp.transpose(G, (1, 2, 0, 3))                       # (F,N,C,N)
    # small per-chain vectors: (C/CB, N, CB) so the block's lane dim (CB)
    # equals the full trailing array dim (legal for any CB)
    to_blocks = lambda a: jnp.transpose(
        a.reshape(Cp // CB, CB, N), (0, 2, 1))                # (NB,N,CB)
    sig = to_blocks(sigma.astype(jnp.float32))
    uk = to_blocks(u)
    i32 = jnp.int32
    bigspec = pl.BlockSpec((F, N, CB, N),
                           lambda cb, i: (i32(0), i32(0), cb, i32(0)))
    rowspec = pl.BlockSpec((1, N, CB), lambda cb, i: (cb, i32(0), i32(0)))
    vec_shape = jax.ShapeDtypeStruct((Cp // CB, N, CB), jnp.float32)
    big_shape = jax.ShapeDtypeStruct((F, N, Cp, N), jnp.float32)
    in_specs = [rowspec, rowspec, bigspec]
    operands = [uk, sig, Gk]
    out_specs = [rowspec, bigspec]
    out_shape = [vec_shape, big_shape]
    scratch_shapes = []
    if scratch:
        scratch_shapes = [pltpu.VMEM((F, N, CB, N), jnp.float32)]
    else:
        in_specs.append(bigspec)
        operands.append(jnp.transpose(G, (1, 3, 0, 2)))       # [f,col,c,row]
        out_specs.append(bigspec)
        out_shape.append(big_shape)
    out_specs += [rowspec, rowspec]
    out_shape += [vec_shape, vec_shape]
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(Cp // CB, N // S),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(*operands)
    if scratch:
        sig_out, G_out, accv, nnegv = outs
    else:
        sig_out, G_out, _Gt, accv, nnegv = outs
    from_blocks = lambda a: jnp.transpose(a, (0, 2, 1)).reshape(Cp, N)[:C]
    G_new = jnp.transpose(G_out, (2, 0, 1, 3))[:C]
    sigma_new = from_blocks(sig_out).astype(sigma.dtype)
    acc = jnp.sum(from_blocks(accv), axis=1).astype(jnp.int32)
    nneg = jnp.sum(from_blocks(nnegv), axis=1).astype(jnp.int32)
    return G_new, sigma_new, acc, nneg


def _site_sweep_batched(G, sigma, u, Ml=None, MrT=None, *, lamb, signs,
                        det_power, use_boson, _force_scratch=None,
                        wrap_dir=0, _force_colread=None, _force_pair=None):
    """Batched fused sweep. G: (C,F,N,N) f32, sigma: (C,N), u: (C,N).
    Returns (G, sigma, acc (C,), nneg (C,)). Dispatches to the chain-on-lanes
    kernel for N <= 128 and the site-major kernel beyond.

    wrap_dir=+1/-1 fuses the slice's wrap into the kernel (chain-on-lanes,
    scratch-Gt only): pass Ml/MrT as the (N, N) wrap operands — (eT2,
    eT2invᵀ) for +1, (eT2inv, eT2ᵀ) for -1 (see _batched_kernel)."""
    C, F, N, _ = G.shape
    if N > 128:
        assert wrap_dir == 0, "wrap fusion is chain-on-lanes only"
        kw = dict(lamb=lamb, signs=signs, det_power=det_power,
                  use_boson=use_boson)
        if _sm_delayed_mode() != "0" and \
                _sitemajor_delayed_cfg(N, F) is not None:
            return _site_sweep_sitemajor_delayed(G, sigma, u, **kw)
        return _site_sweep_sitemajor(G, sigma, u,
                                     _force_scratch=_force_scratch, **kw)
    if wrap_dir or _force_scratch is not None:
        col_read = False  # wrap fusion keeps the scratch-Gt layout
    elif _force_colread is not None:
        col_read = bool(_force_colread)
    else:
        col_read = _colread_ok(N, F)
    scratch = True if wrap_dir else (
        False if col_read else (
            _force_scratch if _force_scratch is not None
            else _gt_scratch_ok("batched", N, F)))
    if wrap_dir:
        # wrap fusion holds ~5 (N,N,CB)-sized f32 blocks in scoped VMEM at
        # once: G in + G out + Gt scratch + the MXU wrap's Z/W stack
        # temporaries (measured on v5e: CB=256 at N=64 allocates 20.55M
        # against the 16M scoped limit; CB=128 fits)
        from .pallas_util import pick_vmem_lane_block
        CB = pick_vmem_lane_block(C, 5 * F * N * N * 4)
    else:
        CB = _pick_chain_block(C)
    import os
    S = max(1, int(os.environ.get("MC_TPU_SITES_PER_STEP", "1")))
    while S > 1 and N % S:
        S -= 1
    if _force_pair is not None:
        pair = bool(_force_pair) and col_read and S == 1 and N % 2 == 0
    else:
        pair = (col_read and S == 1 and N % 2 == 0 and not wrap_dir
                and _pair_ok(N, F))
    if pair:
        kern = functools.partial(_batched_kernel_pair, float(lamb),
                                 tuple(signs), int(det_power),
                                 bool(use_boson), N, F, CB)
        grid_sites = N // 2
    else:
        kern = functools.partial(_batched_kernel, float(lamb), tuple(signs),
                                 int(det_power), bool(use_boson), N, F, CB,
                                 scratch, sites_per_step=S,
                                 wrap_dir=int(wrap_dir), col_read=col_read)
        grid_sites = N // S
    interpret = jax.default_backend() == "cpu"
    Gk = jnp.transpose(G, (1, 2, 3, 0))                       # (F,N,N,C)
    sig = jnp.transpose(sigma.astype(jnp.float32), (1, 0))[:, None, :]
    uk = jnp.transpose(u, (1, 0))[:, None, :]                 # (N,1,C)
    i32 = jnp.int32
    bigspec = pl.BlockSpec((F, N, N, CB),
                           lambda cb, i: (i32(0), i32(0), i32(0), cb))
    rowspec = pl.BlockSpec((N, 1, CB), lambda cb, i: (i32(0), i32(0), cb))
    matspec = pl.BlockSpec((N, N), lambda cb, i: (i32(0), i32(0)))
    vec_shape = jax.ShapeDtypeStruct((N, 1, C), jnp.float32)
    big_shape = jax.ShapeDtypeStruct((F, N, N, C), jnp.float32)
    in_specs = [rowspec, rowspec, bigspec]
    operands = [uk, sig, Gk]
    if wrap_dir:
        in_specs += [matspec, matspec]
        operands += [jnp.asarray(Ml, jnp.float32),
                     jnp.asarray(MrT, jnp.float32)]
    out_specs = [rowspec, bigspec]
    out_shape = [vec_shape, big_shape]
    scratch_shapes = []
    if col_read:
        pass  # no Gt at all — neither operand, output, nor scratch
    elif scratch:
        scratch_shapes = [pltpu.VMEM((F, N, N, CB), jnp.float32)]
    else:
        in_specs.append(bigspec)
        operands.append(jnp.transpose(G, (1, 3, 2, 0)))
        out_specs.append(bigspec)
        out_shape.append(big_shape)
    out_specs += [rowspec, rowspec]
    out_shape += [vec_shape, vec_shape]
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(C // CB, grid_sites),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
    )(*operands)
    if col_read or scratch:
        sig_out, G_out, accv, nnegv = outs
    else:
        sig_out, G_out, _Gt, accv, nnegv = outs
    G_new = jnp.transpose(G_out, (3, 0, 1, 2))
    sigma_new = sig_out[:, 0, :].T.astype(sigma.dtype)
    acc = jnp.sum(accv[:, 0, :], axis=0).astype(jnp.int32)
    nneg = jnp.sum(nnegv[:, 0, :], axis=0).astype(jnp.int32)
    return G_new, sigma_new, acc, nneg


# ---------------------------------------------------------------------------
# Complex (Peierls-phase) chain-on-lanes kernel
# ---------------------------------------------------------------------------
#
# Complex-hopping sessions (reference capability: greenseltype hook +
# complex UDT paths, src/flavors/DQMC/DQMC_optional.jl:7-40,
# src/linalg/UDT.jl:316-469) previously had NO fused kernel — Mosaic has no
# complex dtypes — so the site loop ran the per-op-latency-bound XLA path
# (853 chain-sweeps/s at the 8x8 beta=10 headline vs 4060 for the real f32
# kernel). This variant hand-writes complex64 arithmetic on two f32 planes
# (re, im), with the same layout as `_batched_kernel`: chains on the 128-wide
# lanes, G + its transpose resident in VMEM across the whole site loop (the
# transposes live in scratch; there is no materialized fallback — if the
# in-kernel transpose fails the cached compile probe, `complex_supported`
# returns False and the XLA path stays).
#
# Unlike the real kernel (which only counts accepts / negative detratios and
# lets the XLA path own the full statistics), this kernel emits the per-site
# complex detratio and accept flag, so the caller reconstructs the COMPLETE
# local-stats bundle outside (negative-weight magnitude stats, imaginary-
# weight stats, running configuration phase — core._track_detratio_batch),
# order-independently identical to the sequential XLA bookkeeping.


def _cx_kernel(lamb, signs, det_power, use_boson, N, F, CB, *refs):
    """One grid step = one site i for one chain block (grid = (n_cb, N)).
    Planes: Gr/Gi (F,N,N,CB) f32 = Re/Im of G; scratch Gtr/Gti = transposes.
    Per-site outputs acc/dre/dim (N,1,CB) carry the accept flag and the
    complex detratio out for the host-side statistics."""
    (u_ref, s_in, Gr_in, Gi_in,
     sigma_ref, Gr_ref, Gi_ref, acc_ref, dre_ref, dim_ref,
     Gtr_ref, Gti_ref) = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        Gr_ref[...] = Gr_in[...]
        Gi_ref[...] = Gi_in[...]
        Gtr_ref[...] = jnp.swapaxes(Gr_in[...], 1, 2)
        Gti_ref[...] = jnp.swapaxes(Gi_in[...], 1, 2)

    s = sigma_ref[pl.ds(i, 1)]                                # (1,1,CB)
    u_i = u_ref[pl.ds(i, 1)]                                  # (1,1,CB)
    dEb = jnp.float32(-2.0 * lamb) * s

    onehot_j = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, N, 1), 1) == i,
        jnp.float32(1.0), jnp.float32(0.0))                   # (1,N,1)

    rows_r, rows_i, cols_r, cols_i = [], [], [], []
    deltas, den_r, den_i = [], [], []
    pr = pi = None
    for f, sg in enumerate(signs):
        row_r = Gr_ref[f, pl.ds(i, 1)]                        # (1,N,CB)
        row_i = Gi_ref[f, pl.ds(i, 1)]
        col_r = Gtr_ref[f, pl.ds(i, 1)]
        col_i = Gti_ref[f, pl.ds(i, 1)]
        gii_r = jnp.sum(row_r * onehot_j, axis=1, keepdims=True)  # (1,1,CB)
        gii_i = jnp.sum(row_i * onehot_j, axis=1, keepdims=True)
        delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0          # real (1,1,CB)
        r_r = 1.0 + delta * (1.0 - gii_r)
        r_i = -delta * gii_i
        rows_r.append(row_r); rows_i.append(row_i)
        cols_r.append(col_r); cols_i.append(col_i)
        deltas.append(delta); den_r.append(r_r); den_i.append(r_i)
        if pr is None:
            pr, pi = r_r, r_i
        else:
            pr, pi = pr * r_r - pi * r_i, pr * r_i + pi * r_r
    if det_power == 2:
        dre, dim_ = pr * pr - pi * pi, 2.0 * pr * pi
    else:
        dre, dim_ = pr, pi
    w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
    # Metropolis weight = REAL part (reference: p = real(...), DQMC.jl:554);
    # the imaginary part goes out through dim_ for the phase-problem stats
    accept = u_i < w * dre                                    # (1,1,CB)

    for f in range(F):
        denom = den_r[f] * den_r[f] + den_i[f] * den_i[f]
        inv = 1.0 / denom
        x_r = jnp.where(accept, deltas[f] * den_r[f] * inv,
                        jnp.zeros_like(denom))                # (1,1,CB)
        x_i = jnp.where(accept, -(deltas[f] * den_i[f] * inv),
                        jnp.zeros_like(denom))
        IG_r = onehot_j - cols_r[f]                           # (1,N,CB)
        IG_i = -cols_i[f]
        y_r = x_r * IG_r - x_i * IG_i                         # (1,N,CB)
        y_i = x_r * IG_i + x_i * IG_r
        yo_r = jnp.swapaxes(y_r, 0, 1)                        # (N,1,CB)
        yo_i = jnp.swapaxes(y_i, 0, 1)
        rr, ri = rows_r[f], rows_i[f]                         # (1,N,CB)
        # G[a,b] -= y[a]·row[b] (complex outer product, two planes)
        Gr_ref[f] = Gr_ref[f] - (yo_r * rr - yo_i * ri)
        Gi_ref[f] = Gi_ref[f] - (yo_r * ri + yo_i * rr)
        # transpose copy: Gt[b,a] -= row[b]·y[a]
        ro_r = jnp.swapaxes(rr, 0, 1)                         # (N,1,CB)
        ro_i = jnp.swapaxes(ri, 0, 1)
        Gtr_ref[f] = Gtr_ref[f] - (ro_r * y_r - ro_i * y_i)
        Gti_ref[f] = Gti_ref[f] - (ro_r * y_i + ro_i * y_r)

    flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
    sigma_ref[pl.ds(i, 1)] = s * flip
    one = jnp.ones_like(s)
    zero = jnp.zeros_like(s)
    acc_ref[pl.ds(i, 1)] = jnp.where(accept, one, zero)
    dre_ref[pl.ds(i, 1)] = dre
    dim_ref[pl.ds(i, 1)] = dim_


# 6 resident big blocks (Gr/Gi in + out + scratch transposes)
def _cx_chunk(N, F):
    """Largest chain-batch chunk whose 6 (F,N,N,c) f32 blocks fit VMEM."""
    from .pallas_util import pick_vmem_lane_chunk
    return pick_vmem_lane_chunk(6 * F * N * N * 4)


def _site_sweep_batched_cx(G, sigma, u, *, lamb, signs, det_power, use_boson):
    """Batched fused sweep, complex64. G: (C,F,N,N) c64, sigma: (C,N) int,
    u: (C,N) f32. Returns (G, sigma, accept (C,N) bool, det (C,N) c64).
    The caller is responsible for chunking C to `_cx_chunk` (the custom_vmap
    wrapper below does). N > 128 dispatches to the site-major variant."""
    C, F, N, _ = G.shape
    if N > 128:
        return _site_sweep_sitemajor_cx(G, sigma, u, lamb=lamb, signs=signs,
                                        det_power=det_power,
                                        use_boson=use_boson)
    from .pallas_util import pick_vmem_lane_block
    CB = pick_vmem_lane_block(C, 6 * F * N * N * 4)
    kern = functools.partial(_cx_kernel, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F, CB)
    interpret = jax.default_backend() == "cpu"
    Gr = jnp.transpose(jnp.real(G).astype(jnp.float32), (1, 2, 3, 0))
    Gi = jnp.transpose(jnp.imag(G).astype(jnp.float32), (1, 2, 3, 0))
    sig = jnp.transpose(sigma.astype(jnp.float32), (1, 0))[:, None, :]
    uk = jnp.transpose(u.astype(jnp.float32), (1, 0))[:, None, :]
    i32 = jnp.int32
    bigspec = pl.BlockSpec((F, N, N, CB),
                           lambda cb, i: (i32(0), i32(0), i32(0), cb))
    rowspec = pl.BlockSpec((N, 1, CB), lambda cb, i: (i32(0), i32(0), cb))
    vec_shape = jax.ShapeDtypeStruct((N, 1, C), jnp.float32)
    big_shape = jax.ShapeDtypeStruct((F, N, N, C), jnp.float32)
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(C // CB, N),
        in_specs=[rowspec, rowspec, bigspec, bigspec],
        out_specs=[rowspec, bigspec, bigspec, rowspec, rowspec, rowspec],
        out_shape=[vec_shape, big_shape, big_shape,
                   vec_shape, vec_shape, vec_shape],
        scratch_shapes=[pltpu.VMEM((F, N, N, CB), jnp.float32),
                        pltpu.VMEM((F, N, N, CB), jnp.float32)],
    )(uk, sig, Gr, Gi)
    sig_out, Gr_out, Gi_out, accv, drev, dimv = outs
    tr = lambda a: jnp.transpose(a, (3, 0, 1, 2))
    G_new = (tr(Gr_out) + 1j * tr(Gi_out)).astype(G.dtype)
    sigma_new = sig_out[:, 0, :].T.astype(sigma.dtype)
    accept = accv[:, 0, :].T > 0.5                            # (C,N) bool
    det = (drev[:, 0, :].T + 1j * dimv[:, 0, :].T).astype(jnp.complex64)
    return G_new, sigma_new, accept, det


def _sitemajor_kernel_cx(lamb, signs, det_power, use_boson, N, F, CB, *refs):
    """Site-major complex64 variant (N > 128): chains on the SUBLANES, full
    site axis on the lanes, two f32 planes per block, transposes in scratch
    (6 resident (F,N,CB,N) blocks — N=256/F=1 fits at CB=8). Same contract
    as `_cx_kernel`: per-site detratio + accept emitted for the host-side
    statistics."""
    (u_ref, s_in, Gr_in, Gi_in,
     sigma_ref, Gr_ref, Gi_ref, acc_ref, dre_ref, dim_ref,
     Gtr_ref, Gti_ref) = refs
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        sigma_ref[...] = s_in[...]
        Gr_ref[...] = Gr_in[...]
        Gi_ref[...] = Gi_in[...]
        Gtr_ref[...] = jnp.swapaxes(Gr_in[...], 1, 3)
        Gti_ref[...] = jnp.swapaxes(Gi_in[...], 1, 3)

    s = sigma_ref[0, pl.ds(i, 1)][None]                       # (1,1,CB) lane
    u_i = u_ref[0, pl.ds(i, 1)][None]                         # (1,1,CB) lane
    dEb = jnp.float32(-2.0 * lamb) * s

    onehot = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, 1, N), 2) == i,
        jnp.float32(1.0), jnp.float32(0.0))                   # (1,1,N)

    rows_r, rows_i, colTs_r, colTs_i = [], [], [], []
    deltas, den_r, den_i = [], [], []
    pr = pi = None
    for f, sg in enumerate(signs):
        row_r = Gr_ref[f, pl.ds(i, 1)]                        # (1,CB,N)
        row_i = Gi_ref[f, pl.ds(i, 1)]
        colT_r = Gtr_ref[f, pl.ds(i, 1)]
        colT_i = Gti_ref[f, pl.ds(i, 1)]
        gii_r = jnp.swapaxes(jnp.sum(row_r * onehot, axis=2,
                                     keepdims=True), 1, 2)    # (1,1,CB)
        gii_i = jnp.swapaxes(jnp.sum(row_i * onehot, axis=2,
                                     keepdims=True), 1, 2)
        delta = jnp.exp(jnp.float32(sg) * dEb) - 1.0          # (1,1,CB)
        r_r = 1.0 + delta * (1.0 - gii_r)
        r_i = -delta * gii_i
        rows_r.append(row_r); rows_i.append(row_i)
        colTs_r.append(colT_r); colTs_i.append(colT_i)
        deltas.append(delta); den_r.append(r_r); den_i.append(r_i)
        if pr is None:
            pr, pi = r_r, r_i
        else:
            pr, pi = pr * r_r - pi * r_i, pr * r_i + pi * r_r
    if det_power == 2:
        dre, dim_ = pr * pr - pi * pi, 2.0 * pr * pi
    else:
        dre, dim_ = pr, pi
    w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
    accept = u_i < w * dre                                    # (1,1,CB)

    for f in range(F):
        denom = den_r[f] * den_r[f] + den_i[f] * den_i[f]
        inv = 1.0 / denom
        x_r = jnp.where(accept, deltas[f] * den_r[f] * inv,
                        jnp.zeros_like(denom))                # (1,1,CB)
        x_i = jnp.where(accept, -(deltas[f] * den_i[f] * inv),
                        jnp.zeros_like(denom))
        xs_r = jnp.swapaxes(x_r, 1, 2)                        # (1,CB,1)
        xs_i = jnp.swapaxes(x_i, 1, 2)
        IG_r = onehot - colTs_r[f]                            # (1,CB,N)
        IG_i = -colTs_i[f]
        y_r = xs_r * IG_r - xs_i * IG_i                       # (1,CB,N)
        y_i = xs_r * IG_i + xs_i * IG_r
        yo_r = jnp.swapaxes(y_r, 0, 2)                        # (N,CB,1)
        yo_i = jnp.swapaxes(y_i, 0, 2)
        rr, ri = rows_r[f], rows_i[f]                         # (1,CB,N)
        Gr_ref[f] = Gr_ref[f] - (yo_r * rr - yo_i * ri)
        Gi_ref[f] = Gi_ref[f] - (yo_r * ri + yo_i * rr)
        ro_r = jnp.swapaxes(rr, 0, 2)                         # (N,CB,1)
        ro_i = jnp.swapaxes(ri, 0, 2)
        Gtr_ref[f] = Gtr_ref[f] - (ro_r * y_r - ro_i * y_i)
        Gti_ref[f] = Gti_ref[f] - (ro_r * y_i + ro_i * y_r)

    flip = jnp.where(accept, jnp.float32(-1.0), jnp.float32(1.0))
    sigma_ref[0, pl.ds(i, 1)] = (s * flip)[0]
    one = jnp.ones_like(s[0])
    zero = jnp.zeros_like(s[0])
    acc_ref[0, pl.ds(i, 1)] = jnp.where(accept[0], one, zero)
    dre_ref[0, pl.ds(i, 1)] = dre[0]
    dim_ref[0, pl.ds(i, 1)] = dim_[0]


def _site_sweep_sitemajor_cx(G, sigma, u, *, lamb, signs, det_power,
                             use_boson, force_cb=None):
    """Site-major complex sweep for N > 128. Same contract as
    `_site_sweep_batched_cx`; chains pad to a multiple of the chain block."""
    C, F, N, _ = G.shape
    if force_cb is not None:
        CB = force_cb
    else:
        chunk = _sitemajor_cfg_cx(N, F)
        if chunk is None:
            raise ValueError(
                f"site-major complex sweep unsupported at N={N}, F={F}: no "
                "probed chain count compiles — use the XLA site loop "
                "(make_context's automatic fallback)")
        if C > chunk:
            raise ValueError(
                f"site-major complex sweep called with C={C} > probed "
                f"per-call chunk {chunk}; chunk the batch first")
        CB = max(8, -(-C // 8) * 8)
    pad = (-C) % CB
    if pad:
        zpad = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        G, sigma, u = zpad(G), zpad(sigma), zpad(u)
    Cp = C + pad
    kern = functools.partial(_sitemajor_kernel_cx, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F, CB)
    interpret = jax.default_backend() == "cpu"
    Gr = jnp.transpose(jnp.real(G).astype(jnp.float32), (1, 2, 0, 3))
    Gi = jnp.transpose(jnp.imag(G).astype(jnp.float32), (1, 2, 0, 3))
    to_blocks = lambda a: jnp.transpose(
        a.reshape(Cp // CB, CB, N), (0, 2, 1))                # (NB,N,CB)
    sig = to_blocks(sigma.astype(jnp.float32))
    uk = to_blocks(u.astype(jnp.float32))
    i32 = jnp.int32
    bigspec = pl.BlockSpec((F, N, CB, N),
                           lambda cb, i: (i32(0), i32(0), cb, i32(0)))
    rowspec = pl.BlockSpec((1, N, CB), lambda cb, i: (cb, i32(0), i32(0)))
    vec_shape = jax.ShapeDtypeStruct((Cp // CB, N, CB), jnp.float32)
    big_shape = jax.ShapeDtypeStruct((F, N, Cp, N), jnp.float32)
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(Cp // CB, N),
        in_specs=[rowspec, rowspec, bigspec, bigspec],
        out_specs=[rowspec, bigspec, bigspec, rowspec, rowspec, rowspec],
        out_shape=[vec_shape, big_shape, big_shape,
                   vec_shape, vec_shape, vec_shape],
        scratch_shapes=[pltpu.VMEM((F, N, CB, N), jnp.float32),
                        pltpu.VMEM((F, N, CB, N), jnp.float32)],
    )(uk, sig, Gr, Gi)
    sig_out, Gr_out, Gi_out, accv, drev, dimv = outs
    from_blocks = lambda a: jnp.transpose(a, (0, 2, 1)).reshape(Cp, N)[:C]
    tr = lambda a: jnp.transpose(a, (2, 0, 1, 3))[:C]
    G_new = (tr(Gr_out) + 1j * tr(Gi_out)).astype(G.dtype)
    sigma_new = from_blocks(sig_out).astype(sigma.dtype)
    accept = from_blocks(accv) > 0.5                          # (C,N) bool
    det = (from_blocks(drev)
           + 1j * from_blocks(dimv)).astype(jnp.complex64)
    return G_new, sigma_new, accept, det


def complex_supported(N, F) -> bool:
    """Complex kernel eligibility: chain-on-lanes two-plane kernel for
    lane-tileable N <= 128, the site-major two-plane variant beyond (up to
    the N where even a CB=8 block of its 6 resident planes no longer fits —
    F=1: N<=~266, F=2: N<=~188); each gated by its cached Mosaic compile
    probe. No materialized fallback — on probe failure the XLA path stays."""
    if not HAVE_PALLAS or N % 8 != 0 or N < 8:
        return False
    if N <= 128:
        return _gt_scratch_ok("batched_cx", N, F)
    return _sitemajor_cfg_cx(N, F) is not None


_FUSED_CACHE = {}


def get_fused_site_sweep_cx(*, lamb, signs, det_power, use_boson):
    """Complex-session counterpart of get_fused_site_sweep: per-chain call
    `fn(G (F,N,N) c64, sigma (N,), u (N,)) -> (G, sigma, accept (N,),
    det (N,) c64)` whose vmap rule runs the chain batch through VMEM-sized
    Pallas chunks."""
    key = ("cx", float(lamb), tuple(signs), int(det_power), bool(use_boson))
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]
    kw = dict(lamb=lamb, signs=signs, det_power=det_power, use_boson=use_boson)

    @custom_vmap
    def fused(G, sigma, u):
        Gb, sb, accb, detb = _site_sweep_batched_cx(G[None], sigma[None],
                                                    u[None], **kw)
        return Gb[0], sb[0], accb[0], detb[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, G, sigma, u):
        assert all(in_batched), "fused site sweep expects all args batched"
        N, F = G.shape[-1], G.shape[1]
        # chain-on-lanes (N <= 128) chunks the batch to the VMEM budget;
        # site-major (N > 128) chunks to the probed per-call chain count
        # (block == array — see _sitemajor_cfg_cx), sequentially so chunk
        # calls don't double-buffer in scoped VMEM
        from .pallas_util import map_lane_chunks, map_lane_chunks_seq
        if N <= 128:
            out = map_lane_chunks(
                lambda g, s, uu: _site_sweep_batched_cx(g, s, uu, **kw),
                G, sigma, u, step=_cx_chunk(N, F))
        else:
            out = map_lane_chunks_seq(
                lambda g, s, uu: _site_sweep_batched_cx(g, s, uu, **kw),
                G, sigma, u, step=_sitemajor_cfg_cx(N, F) or axis_size)
        return out, (True, True, True, True)

    _FUSED_CACHE[key] = fused
    return fused


def get_fused_site_sweep_wrap(*, lamb, signs, det_power, use_boson,
                              wrap_dir):
    """Wrap-fused variant of get_fused_site_sweep (ROADMAP lever 2): the
    per-chain call is `fn(G, sigma, u, Ml, MrT)` where Ml/MrT are the
    direction's (N, N) wrap operands — (eT2, eT2invᵀ) for wrap_dir=+1
    (wrap-up after the sweep), (eT2inv, eT2ᵀ) for wrap_dir=-1 (wrap-down
    before it). Enabled via MC_TPU_FUSE_WRAP=1 (core._scan_slices)."""
    key = ("wrap", float(lamb), tuple(signs), int(det_power),
           bool(use_boson), int(wrap_dir))
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]
    kw = dict(lamb=lamb, signs=signs, det_power=det_power,
              use_boson=use_boson, wrap_dir=wrap_dir)

    @custom_vmap
    def fused(G, sigma, u, Ml, MrT):
        Gb, sb, acc, nneg = _site_sweep_batched(G[None], sigma[None],
                                                u[None], Ml, MrT, **kw)
        return Gb[0], sb[0], acc[0], nneg[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, G, sigma, u, Ml, MrT):
        assert in_batched[:3] == [True, True, True] and \
            not any(in_batched[3:]), "G/sigma/u batched; Ml/MrT shared"
        from .pallas_util import map_lane_chunks, pick_vmem_lane_chunk
        F, N = G.shape[1], G.shape[-1]
        out = map_lane_chunks(
            lambda g, s, uu: _site_sweep_batched(g, s, uu, Ml, MrT, **kw),
            G, sigma, u, step=pick_vmem_lane_chunk(5 * F * N * N * 4))
        return out, (True, True, True, True)

    _FUSED_CACHE[key] = fused
    return fused


def get_fused_site_sweep(*, lamb, signs, det_power, use_boson):
    """A per-chain site sweep whose vmap rule dispatches to the chain-batched
    Pallas kernel (chains on lanes) instead of serializing chains through the
    grid. Use inside vmapped sweeps: `fn(G, sigma, u)` with per-chain shapes."""
    key = (float(lamb), tuple(signs), int(det_power), bool(use_boson))
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]
    kw = dict(lamb=lamb, signs=signs, det_power=det_power, use_boson=use_boson)

    @custom_vmap
    def fused(G, sigma, u):
        Gb, sb, acc, nneg = _site_sweep_batched(G[None], sigma[None],
                                                u[None], **kw)
        return Gb[0], sb[0], acc[0], nneg[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, G, sigma, u):
        assert all(in_batched), "fused site sweep expects all args batched"
        from .pallas_util import (map_lane_chunks, map_lane_chunks_seq,
                                  LANE_CHUNK)
        N, F = G.shape[-1], G.shape[1]
        if N > 128:
            # sequential chunk scan: unrolled chunk calls double-buffer in
            # scoped VMEM and OOM at large batches (see map_lane_chunks_seq)
            step = _sitemajor_chunk(N, F) or LANE_CHUNK
            out = map_lane_chunks_seq(
                lambda g, s, uu: _site_sweep_batched(g, s, uu, **kw),
                G, sigma, u, step=step)
        else:
            out = map_lane_chunks(
                lambda g, s, uu: _site_sweep_batched(g, s, uu, **kw),
                G, sigma, u, step=LANE_CHUNK)
        return out, (True, True, True, True)

    _FUSED_CACHE[key] = fused
    return fused
