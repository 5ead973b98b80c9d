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
  G(k, l), k ≥ l:  [inv(l→k) + forward(l)·(B_{M-1}⋯B_l ... )]  — see full1
  G(k, l), k < l:  -[B_{l-1}⋯B_k + (forward(k)·backward(l)†)^{-1}]^{-1}

The CombinedGreensIterator (:746-889) — all (G(0,l), G(l,0), G(l,l)) for
l = 1..M — becomes a fused `lax.scan` with statically unrolled
stabilization/recalculation tiers; measurement accumulation runs inside the
scan so no (M, N, N) tensor is ever materialized.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import udt_dirty, scatter_columns, rdiv_dirty, calculate_greens
from . import core


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


def greens_kl(ctx, consts, conf, k: int, l: int):
    """Effective time-displaced G(k ← l) for static gridpoints 0 ≤ k, l ≤ M
    (reference: calculate_greens(mc, k, l), unequal_time_stack.jl:292-304).
    Returns (F, N, N)."""
    if k >= l:
        return _greens_full1(ctx, consts, conf, k, l)
    return _greens_full2(ctx, consts, conf, k, l)


def _greens_full1(ctx, consts, conf, k: int, l: int):
    """k ≥ l: G = [B_l^{-1}⋯B_{k-1}^{-1} + B_{l-1}⋯B_0 · B_{M-1}⋯B_k]^{-1}
    (reference: calculate_greens_full1!, unequal_time_stack.jl:443-525)."""
    U, D, T = inverse_block(ctx, consts, conf, l, k)
    Ul, Dl, Tl = forward_block(ctx, consts, conf, l)
    Ur, Dr, Tr = backward_block(ctx, consts, conf, k)

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


def _greens_full2(ctx, consts, conf, k: int, l: int):
    """k < l: G(k ← l) = -[B_{l-1}⋯B_k + (B_{k-1}⋯B_0 · B_{M-1}⋯B_l)^{-1}]^{-1}
    (reference: calculate_greens_full2!, unequal_time_stack.jl:528-605)."""
    U, D, T = inverse_block(ctx, consts, conf, k, l)
    Ul, Dl, Tl = forward_block(ctx, consts, conf, k)
    Ur, Dr, Tr = backward_block(ctx, consts, conf, l)

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


# ---------------------------------------------------------------------------
# CombinedGreensIterator (reference: unequal_time_stack.jl:746-889)
# ---------------------------------------------------------------------------

def combined_greens_apply(ctx, consts, conf, G00_eff, acc0, step_fn: Callable,
                          recalculate: int = None):
    """Iterate (G(0,l), G(l,0), G(l,l)) for l = 1..M, calling
    ``acc = step_fn(acc, G0l, Gl0, Gll)`` with *physical* (unwrapped) Green's
    functions at each step. Measurement accumulation is fused into the
    iteration so no (M, N, N) history is materialized.

    Tiers per slice (reference :793-882):
      l % recalculate == 0 → full recomputation from scratch,
      l % safe_mult == 0   → advance + re-UDT stabilization,
      otherwise            → quick advance.

    Default recalculate = safe_mult (stricter than the reference's
    4*safe_mult): the Gll similarity advance amplifies errors exponentially
    (~x2-3 per slice at U=4), so longer windows lose all accuracy; with
    safe_mult windows the iterator stays at ~1e-11.

    Recurrences on the effective Green's functions:
      Gl0(l) = B_l Gl0(l-1),   Gl0(0) = G00
      G0l(l) = G0l(l-1) B_l^{-1},   G0l(0) = G00 - I
      Gll(l) = B_l Gll(l-1) B_l^{-1},  Gll(0) = G00
    """
    sm = ctx.sm
    M = ctx.M
    if recalculate is None:
        recalculate = sm
    unwrap = partial(core.unwrap_greens, ctx, consts)
    eyeF = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype),
                            (ctx.F, ctx.N, ctx.N))

    def udt_full(A):
        u, d, r, piv = udt_dirty(A)
        return u, d, scatter_columns(r, piv)

    # initial UDTs from G00 (reference iterate(it) at :767-782)
    l_U, l_D, l_T = udt_full(G00_eff)            # Gl0 factors
    r_U, r_D, r_T = udt_full(G00_eff - eyeF)     # G0l factors
    g_U, g_D, g_T = udt_full(G00_eff)            # Gll factors

    def quick_or_stab(carry, l, stabilize: bool):
        (lU, lD, lT, rU, rD, rT, gU, gD, gT, acc) = carry
        sigma = conf[:, l - 1]  # B_l uses slice matrix index l-1
        lU = core.mult_B_left(ctx, consts, sigma, lU)
        rT = core.mult_B_inv_right(ctx, consts, sigma, rT)
        gU = core.mult_B_left(ctx, consts, sigma, gU)
        gT = core.mult_B_inv_right(ctx, consts, sigma, gT)
        if stabilize:
            lU, lD, lT = _restab(lU, lD, lT)
            # G0l factors: re-UDT from the right side: (diag(rD) rT) = u d t
            u, d, r_, piv = udt_dirty(rD[..., :, None] * rT)
            rU = rU @ u
            rD = d
            rT = scatter_columns(r_, piv)
            # Gll factors: two-sided re-UDT — gT accumulates B^{-1} scales on
            # the right, so a left-only restab loses them (reference
            # stabilization branch, unequal_time_stack.jl:842-852)
            u1, d1_, r1, p1 = udt_dirty(gU * gD[..., None, :])
            T1 = scatter_columns(r1, p1) @ gT
            u2, d2_, r2, p2 = udt_dirty(d1_[..., :, None] * T1)
            gU = u1 @ u2
            gD = d2_
            gT = scatter_columns(r2, p2)
        Gl0 = (lU * lD[..., None, :]) @ lT
        G0l = (rU * rD[..., None, :]) @ rT
        Gll = (gU * gD[..., None, :]) @ gT
        acc = step_fn(acc, unwrap(G0l), unwrap(Gl0), unwrap(Gll))
        return (lU, lD, lT, rU, rD, rT, gU, gD, gT, acc)

    carry = (l_U, l_D, l_T, r_U, r_D, r_T, g_U, g_D, g_T, acc0)
    for l in range(1, M + 1):
        if l % recalculate == 0:
            (lU, lD, lT, rU, rD, rT, gU, gD, gT, acc) = carry
            Gl0 = greens_kl(ctx, consts, conf, l, 0)
            G0l = greens_kl(ctx, consts, conf, 0, l)
            Gll = greens_kl(ctx, consts, conf, l, l)
            acc = step_fn(acc, unwrap(G0l), unwrap(Gl0), unwrap(Gll))
            lU, lD, lT = udt_full(Gl0)
            rU, rD, rT = udt_full(G0l)
            gU, gD, gT = udt_full(Gll)
            carry = (lU, lD, lT, rU, rD, rT, gU, gD, gT, acc)
        else:
            carry = quick_or_stab(carry, l, stabilize=(l % sm == 0))
    return carry[-1]
