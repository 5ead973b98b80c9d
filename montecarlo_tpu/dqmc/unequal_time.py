"""Time-displaced Green's functions.

TPU-native rewrite of the reference's UnequalTimeStack
(src/flavors/DQMC/unequal_time_stack.jl): G(k, l) is computed from three
stabilized UDT blocks — forward B(l..1), backward B(M..k+1)^†, and the inverse
chain B^{-1}(l+1..k) — combined with the Dmax/Dmin splitting algebra of
calculate_greens_full1!/full2! (:443-605) that keeps both huge and tiny scales
in diagonal factors.

Index conventions (0-based slice matrices B_0..B_{M-1}, τ gridpoints 0..M):
  forward(k)  = UDT(B_{k-1} ⋯ B_0)
  backward(k) = UDT(B_k^† ⋯ B_{M-1}^†)        (so B_{M-1}⋯B_k = T† D U†)
  inv(l→k)    = UDT(B_l^{-1} B_{l+1}^{-1} ⋯ B_{k-1}^{-1})
  G(k, l), k ≥ l:  [inv(l→k) + forward(l)·(B_{M-1}⋯B_k)]^{-1}   — full1
  G(k, l), k < l:  -[B_{l-1}⋯B_k + (forward(k)·backward(l)-prod)^{-1}]^{-1}

Unlike the reference's lazily built mutable stacks, ``build_ut_stacks``
produces the forward / backward / cumulative-inverse UDT stacks as plain
arrays in ONE pass of three `lax.scan`s (O(M/sm) UDTs total), and the
iterators below index them dynamically inside their scans — so a full
susceptibility integration at β=10 (M=100) compiles to a constant-size trace
(reference: build_stack, unequal_time_stack.jl:106-166).

Iterators (reference :644-889):
  combined_greens_apply — (G(0,l), G(l,0), G(l,l)) for l = 1..M, fused with
      measurement accumulation (CombinedGreensIterator, :746-889)
  greens_range_apply    — G(k, l) for k = l..M at fixed l
      (GreensIterator, :644-726)
Both use the reference's three tiers — quick advance / safe_mult
stabilization / full recalculation every `recalculate` slices — with the
recalculation reading the precomputed stacks, and both have an
``accuracy``/``verify`` self-check vs the direct computation
(:717-726, :885-889).
"""

from __future__ import annotations

from functools import partial, wraps
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import udt_dirty, scatter_columns, rdiv_dirty, calculate_greens
from . import core


def _full_precision(fn):
    """Scope ctx.matmul_precision() around an entry point taking ctx first.

    Every matmul in the unequal-time algebra MUST run at full precision: the
    TPU's default single-pass bf16 MXU lowering destroys the graded UDT
    factors at large beta (measured: tau-displaced susceptibility values
    reaching ~4e6 at beta=10/f32 when these functions were traced outside a
    precision scope). DQMC._measure_all also scopes itself; this guard makes
    direct/standalone use (tests, verify utilities, user code) safe too."""
    @wraps(fn)
    def wrapper(ctx, *args, **kwargs):
        with ctx.matmul_precision():
            return fn(ctx, *args, **kwargs)
    return wrapper


def _adj(A):
    return jnp.swapaxes(A, -1, -2).conj()


def _restab(curr, D, T):
    """Re-UDT (curr · diag(D)) and fold into T."""
    u, d, r, piv = udt_dirty(curr * D[..., None, :])
    return u, d, scatter_columns(r, piv) @ T


def forward_block(ctx, consts, conf, k: int):
    """UDT(B_{k-1}...B_0) (reference: compute_forward_udt_block!,
    unequal_time_stack.jl:383-407). Static k."""
    U, D, T = core._identity_udt(ctx)
    curr = U
    count = 0
    for l in range(k):
        curr = core.mult_B_left(ctx, consts, conf[:, l], curr)
        count += 1
        if count % ctx.sm == 0 or l == k - 1:
            U, D, T = _restab(curr, D, T)
            curr = U
    return U, D, T


def backward_block(ctx, consts, conf, k: int):
    """UDT(B_k^†...B_{M-1}^†) (reference: compute_backward_udt_block!,
    unequal_time_stack.jl:410-434). Static k."""
    U, D, T = core._identity_udt(ctx)
    curr = U
    count = 0
    for l in reversed(range(k, ctx.M)):
        curr = core.mult_B_dagger_left(ctx, consts, conf[:, l], curr)
        count += 1
        if count % ctx.sm == 0 or l == k:
            U, D, T = _restab(curr, D, T)
            curr = U
    return U, D, T


def inverse_block(ctx, consts, conf, low: int, high: int):
    """UDT(B_low^{-1} B_{low+1}^{-1} ⋯ B_{high-1}^{-1})
    (reference: compute_inverse_udt_block!, unequal_time_stack.jl:315-380).
    Static low/high; the product is built right-to-left so the accumulated
    factor stays a left unitary."""
    U, D, T = core._identity_udt(ctx)
    curr = U
    count = 0
    for l in range(high - 1, low - 1, -1):
        curr = core.mult_B_inv_left(ctx, consts, conf[:, l], curr)
        count += 1
        if count % ctx.sm == 0 or l == low:
            U, D, T = _restab(curr, D, T)
            curr = U
    return U, D, T


def _dmax_inv(D):
    return 1.0 / jnp.maximum(1.0, D)


def _dmin(D):
    return jnp.minimum(1.0, D)


# ---------------------------------------------------------------------------
# full1 / full2 Dmax/Dmin-split algebra on UDT triples
# (reference: calculate_greens_full1!/full2!, unequal_time_stack.jl:443-605)
# ---------------------------------------------------------------------------

def full1_algebra(inv_udt, fwd_udt, bwd_udt):
    """G(k≥l) = [inv(l→k) + forward(l)·(backward(k)-product)]^{-1} from the
    three UDT triples (reference: calculate_greens_full1!,
    unequal_time_stack.jl:443-525)."""
    U, D, T = inv_udt
    Ul, Dl, Tl = fwd_udt
    Ur, Dr, Tr = bwd_udt
    # inner = Dl (Tl Tr†) Dr ; udt
    M_ = Tl @ _adj(Tr)
    M_ = M_ * Dr[..., None, :]
    M_ = M_ * Dl[..., :, None]
    u1, d1, g1, p1 = udt_dirty(M_)
    Tl2 = Ul @ u1
    Ur2 = rdiv_dirty(Ur, g1, p1)
    # [U D T + Tl2 d1 Ur2^†-ish]^{-1} with the D split:
    Tr3 = (_dmax_inv(D)[..., :, None] * (_adj(U) @ Tl2)) * _dmin(d1)[..., None, :]
    Tl3 = (_dmin(D)[..., :, None] * (T @ Ur2)) * _dmax_inv(d1)[..., None, :]
    u2, d2, g2, p2 = udt_dirty(Tl3 + Tr3)
    # G = Ur2 · diag(1/max(1,d1)) · t2^{-1} · diag(1/d2) · u2† · diag(1/max(1,D)) · U†
    n = g2.shape[-1]
    X = jnp.eye(n, dtype=g2.dtype) * _dmax_inv(d1)[..., :, None]
    X = rdiv_dirty(X, g2, p2)
    X = X / d2[..., None, :]
    X = X @ _adj(u2)
    X = X * _dmax_inv(D)[..., None, :]
    return Ur2 @ (X @ _adj(U))


def full2_algebra(inv_udt, fwd_udt, bwd_udt):
    """G(k<l) = -[B_{l-1}⋯B_k + (forward(k)·backward(l)-prod)^{-1}]^{-1} from
    UDT triples: inv_udt = inv(k→l), fwd_udt = forward(k), bwd_udt =
    backward(l) (reference: calculate_greens_full2!,
    unequal_time_stack.jl:528-605)."""
    U, D, T = inv_udt
    Ul, Dl, Tl = fwd_udt
    Ur, Dr, Tr = bwd_udt
    M_ = Tl @ _adj(Tr)
    M_ = Dl[..., :, None] * M_
    M_ = M_ * Dr[..., None, :]
    u1, d1, g1, p1 = udt_dirty(M_)
    Tl2 = Ul @ u1
    Ul3 = (_dmax_inv(D)[..., :, None] * (_adj(U) @ Tl2)) * _dmin(d1)[..., None, :]
    Y = rdiv_dirty(T @ Ur, g1, p1)
    Tr3 = (_dmin(D)[..., :, None] * Y) * _dmax_inv(d1)[..., None, :]
    u2, d2, g2, p2 = udt_dirty(Tr3 + Ul3)
    n = g2.shape[-1]
    X = jnp.eye(n, dtype=g2.dtype) * _dmin(d1)[..., :, None]
    X = rdiv_dirty(X, g2, p2)
    X = X / d2[..., None, :]
    X = X @ _adj(u2)
    X = X * _dmin(D)[..., None, :]
    return -(Tl2 @ (X @ T))


@_full_precision
def greens_kl(ctx, consts, conf, k: int, l: int):
    """Effective time-displaced G(k ← l) for static gridpoints 0 ≤ k, l ≤ M
    (reference: calculate_greens(mc, k, l), unequal_time_stack.jl:292-304).
    Returns (F, N, N). Builds the three blocks from scratch — accurate but
    O(M) work; the iterators below amortize via the precomputed stacks."""
    if k >= l:
        inv = inverse_block(ctx, consts, conf, l, k)
        fwd = forward_block(ctx, consts, conf, l)
        bwd = backward_block(ctx, consts, conf, k)
        return full1_algebra(inv, fwd, bwd)
    inv = inverse_block(ctx, consts, conf, k, l)
    fwd = forward_block(ctx, consts, conf, k)
    bwd = backward_block(ctx, consts, conf, l)
    return full2_algebra(inv, fwd, bwd)


# ---------------------------------------------------------------------------
# Precomputed UDT stacks (reference: build_stack, unequal_time_stack.jl:106-166)
# ---------------------------------------------------------------------------

def _segment_product(ctx, consts, conf, j, mult_fn, rev: bool):
    """Dense product of one segment's slice operators; j may be traced.
    rev=False: mult_fn applied for s = 0..sm-1 (ascending slice index),
    rev=True:  descending. The result is mult_fn(last) ∘ ... ∘ mult_fn(first)
    applied to the identity."""
    curr = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype),
                            (ctx.F, ctx.N, ctx.N))
    order = range(ctx.sm - 1, -1, -1) if rev else range(ctx.sm)
    for s in order:
        curr = mult_fn(ctx, consts, conf[:, j * ctx.sm + s], curr)
    return curr


@_full_precision
def build_ut_stacks(ctx, consts, conf):
    """All three UDT stacks as (n_el, F, ...) arrays, j = 0..n_seg:

      fwd[j] = UDT(B_{j·sm-1} ⋯ B_0)            (fwd[0] = I)
      bwd[j] = UDT(B_{j·sm}^† ⋯ B_{M-1}^†)      (bwd[n_seg] = I)
      inv[j] = UDT(B_0^{-1} ⋯ B_{j·sm-1}^{-1})  (cumulative; inv[0] = I)

    One `lax.scan` per stack (n_seg segment extensions each). The cumulative
    inverse replaces the reference's per-segment inverse UDTs + on-demand
    combination loop (compute_inverse_udt_block!, :315-355): the iterators
    only ever need inv(0→boundary), so the combination is done once here.
    """
    n_el = ctx.n_el
    I3, D1, _ = core._identity_udt(ctx)

    def alloc():
        return (jnp.zeros((n_el, ctx.F, ctx.N, ctx.N), ctx.dtype),
                jnp.zeros((n_el, ctx.F, ctx.N), ctx.rdtype),
                jnp.zeros((n_el, ctx.F, ctx.N, ctx.N), ctx.dtype))

    # forward: extend with segment j ascending
    fU, fD, fT = alloc()
    fU, fD, fT = fU.at[0].set(I3), fD.at[0].set(D1), fT.at[0].set(I3)

    def fwd_body(carry, j):
        U, D, T = carry
        curr = _segment_product(
            ctx, consts, conf, j, core.mult_B_left, rev=False) @ U
        U, D, T = _restab(curr, D, T)
        return (U, D, T), (U, D, T)

    (_, _, _), (sU, sD, sT) = lax.scan(
        fwd_body, (I3, D1, I3), jnp.arange(ctx.n_seg))
    fU, fD, fT = (fU.at[1:].set(sU), fD.at[1:].set(sD), fT.at[1:].set(sT))

    # backward: extend with segment j descending (daggered), j = n_seg-1..0
    bU, bD, bT = alloc()
    bU = bU.at[ctx.n_seg].set(I3)
    bD = bD.at[ctx.n_seg].set(D1)
    bT = bT.at[ctx.n_seg].set(I3)

    def bwd_body(carry, j):
        U, D, T = carry
        curr = _segment_product(
            ctx, consts, conf, j, core.mult_B_dagger_left, rev=True) @ U
        U, D, T = _restab(curr, D, T)
        return (U, D, T), (U, D, T)

    (_, _, _), (sU, sD, sT) = lax.scan(
        bwd_body, (I3, D1, I3), jnp.arange(ctx.n_seg - 1, -1, -1))
    # scan emitted j = n_seg-1 .. 0 → stack slots n_seg-1 .. 0
    bU = bU.at[ctx.n_seg - 1::-1].set(sU)
    bD = bD.at[ctx.n_seg - 1::-1].set(sD)
    bT = bT.at[ctx.n_seg - 1::-1].set(sT)

    # cumulative inverse: C_{j+1} = C_j · (B_{j·sm}^{-1} ⋯ B_{(j+1)·sm-1}^{-1})
    # as a right extension: C·P = U · [ (D (T P)) = u d t ] → (U u) d t
    iU, iD, iT = alloc()
    iU, iD, iT = iU.at[0].set(I3), iD.at[0].set(D1), iT.at[0].set(I3)

    def inv_body(carry, j):
        U, D, T = carry
        P = _segment_product(
            ctx, consts, conf, j, core.mult_B_inv_left, rev=True)
        X = D[..., :, None] * (T @ P)
        u, d, r, piv = udt_dirty(X)
        U, D, T = U @ u, d, scatter_columns(r, piv)
        return (U, D, T), (U, D, T)

    (_, _, _), (sU, sD, sT) = lax.scan(
        inv_body, (I3, D1, I3), jnp.arange(ctx.n_seg))
    iU, iD, iT = (iU.at[1:].set(sU), iD.at[1:].set(sD), iT.at[1:].set(sT))

    return {"fwd": (fU, fD, fT), "bwd": (bU, bD, bT), "inv": (iU, iD, iT)}


def _stack_at(stack, j):
    U, D, T = stack
    return U[j], D[j], T[j]


# ---------------------------------------------------------------------------
# CombinedGreensIterator (reference: unequal_time_stack.jl:746-889)
# ---------------------------------------------------------------------------

def _udt_full(A):
    u, d, r, piv = udt_dirty(A)
    return u, d, scatter_columns(r, piv)


@_full_precision
def combined_greens_apply(ctx, consts, conf, G00_eff, acc0, step_fn: Callable,
                          recalculate: int = None, stacks=None):
    """Iterate (G(0,l), G(l,0), G(l,l)) for l = 1..M, calling
    ``acc = step_fn(acc, G0l, Gl0, Gll)`` with *physical* (unwrapped) Green's
    functions at each step. Measurement accumulation is fused into the
    iteration so no (M, N, N) history is materialized.

    Tiers per slice (reference :793-882):
      l % recalculate == 0 → full recomputation from the precomputed stacks,
      l % safe_mult == 0   → advance + re-UDT stabilization,
      otherwise            → quick advance.

    Default recalculate = safe_mult. The reference defaults to 4·safe_mult
    (gated at <1e-10 vs direct computation in f64 at weak coupling,
    test/flavortests_DQMC.jl:149-162) because its recalculations rebuild
    blocks from scratch; here a recalculation reads the precomputed stacks
    and costs about the same as a stabilization, so the accurate tier is
    the default. This matters at strong coupling: the Gll similarity
    advance amplifies factor errors by ~2-3x per slice at U=4, so long
    windows lose all accuracy regardless of stabilization (the reference
    degrades identically; its gate config is a 6-site U=1 chain).

    The whole iteration is ONE `lax.scan` over segments with an inner scan
    over the quick slices, so the trace size is independent of M — a β=10
    susceptibility integration (M=100) compiles like a β=1 one.

    Recurrences on the effective Green's functions:
      Gl0(l) = B_l Gl0(l-1),   Gl0(0) = G00
      G0l(l) = G0l(l-1) B_l^{-1},   G0l(0) = G00 - I
      Gll(l) = B_l Gll(l-1) B_l^{-1},  Gll(0) = G00
    """
    sm, M = ctx.sm, ctx.M
    if recalculate is None:
        recalculate = sm
    if recalculate % sm:
        raise ValueError(f"recalculate={recalculate} must be a multiple of "
                         f"safe_mult={sm}")
    c = recalculate // sm
    if stacks is None:
        stacks = build_ut_stacks(ctx, consts, conf)
    unwrap = partial(core.unwrap_greens, ctx, consts)
    eyeF = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype),
                            (ctx.F, ctx.N, ctx.N))
    ident = core._identity_udt(ctx)

    # initial UDTs from G00 (reference iterate(it) at :767-782)
    lF = _udt_full(G00_eff)            # Gl0 factors
    rF = _udt_full(G00_eff - eyeF)     # G0l factors
    gF = _udt_full(G00_eff)            # Gll factors

    def advance(carry, l):
        """Multiply B_l into all three factor sets (quick-advance core)."""
        (lU, lD, lT), (rU, rD, rT), (gU, gD, gT) = carry
        sigma = conf[:, l - 1]          # B_l uses slice matrix index l-1
        lU = core.mult_B_left(ctx, consts, sigma, lU)
        rT = core.mult_B_inv_right(ctx, consts, sigma, rT)
        gU = core.mult_B_left(ctx, consts, sigma, gU)
        gT = core.mult_B_inv_right(ctx, consts, sigma, gT)
        return (lU, lD, lT), (rU, rD, rT), (gU, gD, gT)

    def emit(acc, lF, rF, gF):
        (lU, lD, lT), (rU, rD, rT), (gU, gD, gT) = lF, rF, gF
        Gl0 = (lU * lD[..., None, :]) @ lT
        G0l = (rU * rD[..., None, :]) @ rT
        Gll = (gU * gD[..., None, :]) @ gT
        return step_fn(acc, unwrap(G0l), unwrap(Gl0), unwrap(Gll))

    def stabilize(factors):
        """Re-UDT all three factor sets (reference stabilization branch,
        unequal_time_stack.jl:842-852)."""
        (lU, lD, lT), (rU, rD, rT), (gU, gD, gT) = factors
        lU, lD, lT = _restab(lU, lD, lT)
        # G0l: re-UDT from the right side: (diag(rD) rT) = u d t
        u, d, r_, piv = udt_dirty(rD[..., :, None] * rT)
        rF = (rU @ u, d, scatter_columns(r_, piv))
        # Gll: two-sided re-UDT — gT accumulates B^{-1} scales on the right,
        # so a left-only restab loses them
        u1, d1_, r1, p1 = udt_dirty(gU * gD[..., None, :])
        T1 = scatter_columns(r1, p1) @ gT
        u2, d2_, r2, p2 = udt_dirty(d1_[..., :, None] * T1)
        gF = (u1 @ u2, d2_, scatter_columns(r2, p2))
        return (lU, lD, lT), rF, gF

    def recalc(jb):
        """Fresh (Gl0, G0l, Gll) at boundary slice l = jb·sm from the stacks:
        full1/full2 with forward(0) = I, plus the one-UDT equal-time split
        for G(l,l)."""
        inv = _stack_at(stacks["inv"], jb)
        bwd = _stack_at(stacks["bwd"], jb)
        fwd = _stack_at(stacks["fwd"], jb)
        Gl0 = full1_algebra(inv, ident, bwd)
        G0l = full2_algebra(inv, ident, bwd)
        Gll = calculate_greens(*fwd, *bwd, ctx.greens_udt_fn)
        return Gl0, G0l, Gll

    def segment_body(carry, j):
        factors, acc = carry

        # quick advances over slices l = j·sm + 1 .. j·sm + sm-1
        def quick(carry2, t):
            factors, acc = carry2
            l = j * sm + t
            factors = advance(factors, l)
            acc = emit(acc, *factors)
            return (factors, acc), None

        if sm > 1:
            (factors, acc), _ = lax.scan(
                quick, (factors, acc), jnp.arange(1, sm))

        # boundary slice l = (j+1)·sm: recalculate or stabilize
        jb = j + 1

        def do_recalc(args):
            factors, acc = args
            Gl0, G0l, Gll = recalc(jb)
            acc = step_fn(acc, unwrap(G0l), unwrap(Gl0), unwrap(Gll))
            return (_udt_full(Gl0), _udt_full(G0l), _udt_full(Gll)), acc

        def do_stab(args):
            factors, acc = args
            factors = advance(factors, jb * sm)
            factors = stabilize(factors)
            acc = emit(acc, *factors)
            return factors, acc

        factors, acc = lax.cond(jb % c == 0, do_recalc, do_stab,
                                (factors, acc))
        return (factors, acc), None

    carry = ((lF, rF, gF), acc0)
    (factors, acc), _ = lax.scan(segment_body, carry, jnp.arange(ctx.n_seg))
    return acc


def _accuracy_points(ctx, recalculate, lo, hi):
    """Sample points for the accuracy self-checks: the slice before each
    tier transition (worst accumulated drift), the transition itself, and
    the end of the range — O(M/recalculate) direct computations instead of
    O(M)."""
    pts = set()
    for l in range(lo, hi + 1):
        if l % recalculate in (0, recalculate - 1) or l % ctx.sm == 0:
            pts.add(l)
    pts.update((lo, lo + 1, hi - 1, hi))
    return sorted(p for p in pts if lo <= p <= hi)


def combined_accuracy(ctx, consts, conf, G00_eff, recalculate: int = None):
    """Max |iterator − direct| over sampled l for each of (G0l, Gl0, Gll) —
    the reference's accuracy(::CombinedGreensIterator) self-check
    (unequal_time_stack.jl:885-889). Sampling covers the worst slices of
    every tier window (see _accuracy_points). Host-side utility (jittable)."""
    rec = recalculate if recalculate is not None else ctx.sm
    points = _accuracy_points(ctx, rec, 1, ctx.M)
    unwrap = partial(core.unwrap_greens, ctx, consts)
    direct = {}
    for l in points:
        direct[l] = (unwrap(greens_kl(ctx, consts, conf, 0, l)),
                     unwrap(greens_kl(ctx, consts, conf, l, 0)),
                     unwrap(greens_kl(ctx, consts, conf, l, l)))

    def step(acc, G0l, Gl0, Gll):
        errs, l = acc
        e = errs
        for ll in points:
            match = (l == ll)
            e0 = jnp.max(jnp.abs(G0l - direct[ll][0]))
            e1 = jnp.max(jnp.abs(Gl0 - direct[ll][1]))
            e2 = jnp.max(jnp.abs(Gll - direct[ll][2]))
            e = jnp.where(match, jnp.maximum(e, jnp.maximum(
                e0, jnp.maximum(e1, e2))), e)
        return (e, l + 1)

    err0 = (jnp.zeros((), ctx.rdtype), jnp.ones((), jnp.int32))
    fn = jax.jit(lambda cf, g, e0: combined_greens_apply(
        ctx, consts, cf, g, e0, step, recalculate=rec))
    err, _ = fn(conf, G00_eff, err0)
    return err


def verify_combined(ctx, consts, conf, G00_eff, maxerror=1e-6,
                    recalculate: int = None) -> bool:
    """reference: verify(iterator), unequal_time_stack.jl:636-639."""
    return bool(combined_accuracy(ctx, consts, conf, G00_eff,
                                  recalculate=recalculate) < maxerror)


# ---------------------------------------------------------------------------
# General GreensIterator (reference: unequal_time_stack.jl:644-726)
# ---------------------------------------------------------------------------

@_full_precision
def greens_range_apply(ctx, consts, conf, l: int, acc0, step_fn: Callable,
                       recalculate: int = None, stacks=None):
    """All G(k, l) for k = l..M at fixed static l, calling
    ``acc = step_fn(acc, k, G_kl)`` with the *physical* G at each k
    (reference: GreensIterator{:, l} with recalculate, :644-726).

    Tiers per k (reference :689-714): k % recalculate == 0 → fresh full1
    from the precomputed stacks; k % safe_mult == 0 → advance + re-UDT;
    else quick advance. Advancing k multiplies B_k into the U factor:
    G(k+1, l) = B_{k+1} G(k, l).

    The k-sweep after the first boundary is one `lax.scan` over segments
    (constant trace size in M). The recalculation tier needs inv(l→k);
    it is maintained as a fourth, incrementally right-extended UDT carry
    (re-stabilized at every boundary), which matches the reference's
    on-demand inverse-block combination (:315-355) in accuracy.
    """
    sm, M = ctx.sm, ctx.M
    if recalculate is None:
        recalculate = sm
    if recalculate % sm:
        raise ValueError(f"recalculate={recalculate} must be a multiple of "
                         f"safe_mult={sm}")
    c = recalculate // sm
    if stacks is None:
        stacks = build_ut_stacks(ctx, consts, conf)
    unwrap = partial(core.unwrap_greens, ctx, consts)
    ident = core._identity_udt(ctx)

    # k = l start: G(l,l) via full1(l, l) (reference iterate(it) :677-684)
    fwd_l = forward_block(ctx, consts, conf, l)
    bwd_l = backward_block(ctx, consts, conf, l)
    G = full1_algebra(ident, fwd_l, bwd_l)
    acc = step_fn(acc0, l, unwrap(G))
    gF = _udt_full(G)
    invF = ident                      # inv(l→l) = I

    def advance_k(gF, invF, k):
        """k → k+1: left-multiply B_{k+1} into G's U factor; right-extend the
        inverse carry with B_k^{-1} (0-based slice matrix index k)."""
        (gU, gD, gT) = gF
        sigma = conf[:, k]
        gU = core.mult_B_left(ctx, consts, sigma, gU)
        (iU, iD, iT) = invF
        iT = core.mult_B_inv_right(ctx, consts, sigma, iT)
        return (gU, gD, gT), (iU, iD, iT)

    def emit(acc, k, gF):
        (gU, gD, gT) = gF
        G = (gU * gD[..., None, :]) @ gT
        return step_fn(acc, k, unwrap(G))

    # advance within the first (possibly partial) segment up to the first
    # boundary k = ceil(l/sm)*sm — statically unrolled (< sm steps)
    first_boundary = min(((l // sm) + (1 if l % sm else 0)) * sm, M)
    if l % sm == 0 and l < M:
        first_boundary = l  # already on a boundary; segment scan handles rest
    for k in range(l, first_boundary):
        gF, invF = advance_k(gF, invF, k)
        acc = emit(acc, k + 1, gF)
        if (k + 1) % sm == 0 or k + 1 == M:
            gF = (_restab(*gF))
            u, d, r_, piv = udt_dirty(invF[1][..., :, None] * invF[2])
            invF = (invF[0] @ u, d, scatter_columns(r_, piv))

    j0 = first_boundary // sm

    def segment_body(carry, j):
        gF, invF, acc = carry

        def quick(carry2, t):
            gF, invF, acc = carry2
            k = j * sm + t            # slice matrix index being applied
            gF, invF = advance_k(gF, invF, k)
            acc = emit(acc, k + 1, gF)
            return (gF, invF, acc), None

        if sm > 1:
            (gF, invF, acc), _ = lax.scan(
                quick, (gF, invF, acc), jnp.arange(sm - 1))

        # boundary step to k = (j+1)·sm
        jb = j + 1
        gF, invF = advance_k(gF, invF, jb * sm - 1)

        def do_recalc(args):
            gF, invF, acc = args
            # stabilize the inverse carry first, then fresh full1
            u, d, r_, piv = udt_dirty(invF[1][..., :, None] * invF[2])
            invF = (invF[0] @ u, d, scatter_columns(r_, piv))
            bwd = _stack_at(stacks["bwd"], jb)
            G = full1_algebra(invF, fwd_l, bwd)
            acc = step_fn(acc, jb * sm, unwrap(G))
            return _udt_full(G), invF, acc

        def do_stab(args):
            gF, invF, acc = args
            gF = _restab(*gF)
            u, d, r_, piv = udt_dirty(invF[1][..., :, None] * invF[2])
            invF = (invF[0] @ u, d, scatter_columns(r_, piv))
            acc = emit(acc, jb * sm, gF)
            return gF, invF, acc

        gF, invF, acc = lax.cond((jb % c == 0) & (jb * sm != l),
                                 do_recalc, do_stab, (gF, invF, acc))
        return (gF, invF, acc), None

    if j0 < ctx.n_seg:
        (gF, invF, acc), _ = lax.scan(
            segment_body, (gF, invF, acc), jnp.arange(j0, ctx.n_seg))
    return acc


def greens_range_accuracy(ctx, consts, conf, l: int = 0,
                          recalculate: int = None):
    """Max |iterator − direct| over sampled k = l..M — the reference's
    accuracy(::GreensIterator) (unequal_time_stack.jl:717-726)."""
    rec = recalculate if recalculate is not None else ctx.sm
    points = _accuracy_points(ctx, rec, l, ctx.M)
    unwrap = partial(core.unwrap_greens, ctx, consts)
    direct = {k: unwrap(greens_kl(ctx, consts, conf, k, l))
              for k in points}

    def step(err, k, G):
        e = err
        for kk in points:
            e = jnp.where(k == kk,
                          jnp.maximum(e, jnp.max(jnp.abs(G - direct[kk]))), e)
        return e

    err0 = jnp.zeros((), ctx.rdtype)
    fn = jax.jit(lambda cf, e0: greens_range_apply(
        ctx, consts, cf, l, e0, step, recalculate=rec))
    return fn(conf, err0)


def verify_range(ctx, consts, conf, l: int = 0, maxerror=1e-6,
                 recalculate: int = None) -> bool:
    """reference: verify(iterator), unequal_time_stack.jl:636-639."""
    return bool(greens_range_accuracy(ctx, consts, conf, l,
                                      recalculate=recalculate) < maxerror)
