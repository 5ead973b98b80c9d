"""Checkerboard slice-matrix decomposition.

TPU-native form of the reference's sparse checkerboard path
(src/flavors/DQMC/slice_matrices.jl:104-222 + init_checkerboard_matrices,
stack.jl:185-235): each hopping group g (vertex-disjoint bonds from the greedy
edge coloring, lattices.Lattice.checkerboard_groups) exponentiates exactly as
independent 2×2 bond rotations

    exp(-dtau*T_g)|bond(s,t) = [[cosh(a), -sinh(a)], [-sinh(a), cosh(a)]],
    a = dtau * T[s, t],

applied as batched row (left) / column (right) gather-mix-scatter updates; the
chemical-potential diagonal is an elementwise scaling. The assembled slice
matrix is

    B_cb = [prod_{g>=2} e^{-dtau/2 T_g}] e^{-dtau T_1} [prod_{g>=2,rev} e^{-dtau/2 T_g}]
           · e^{-dtau mu} · e^{-dtau V(l)}

matching the reference's symmetric splitting, and agrees with the dense
B = e^{-dtau T} e^{-dtau V} to O(dtau^2) Trotter error (reference test gate:
test/slice_matrices.jl:86-100).

NOTE on TPU performance: at N ≲ 10^3 sites a dense batched 64×64… matmul runs
on the MXU and beats the gather/scatter group products; the dense path stays
the default. The checkerboard path exists for API parity, for its different
Trotter systematics, and for very large lattices.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CheckerboardData:
    """Per-group bond indices and rotation coefficients (static)."""

    srcs: Tuple            # tuple of (nb,) int32 arrays
    trgs: Tuple
    cosh_full: Tuple       # cosh/sinh for e^{-dtau T_g}
    sinh_full: Tuple
    cosh_half: Tuple       # for e^{-dtau/2 T_g}
    sinh_half: Tuple
    mu_diag: object        # (N,) e^{-dtau * diag(T)}
    mu_diag_inv: object


def build_checkerboard(lattice, hopping: np.ndarray, dtau: float) -> CheckerboardData:
    groups = lattice.checkerboard_groups
    srcs, trgs, cf, sf, ch, sh = [], [], [], [], [], []
    for g in groups:
        s = g[:, 0].astype(np.int32)
        t = g[:, 1].astype(np.int32)
        a = dtau * hopping[s, t]
        srcs.append(jnp.asarray(s))
        trgs.append(jnp.asarray(t))
        cf.append(jnp.asarray(np.cosh(a)))
        sf.append(jnp.asarray(-np.sinh(a)))
        ch.append(jnp.asarray(np.cosh(0.5 * a)))
        sh.append(jnp.asarray(-np.sinh(0.5 * a)))
    mu = np.diag(hopping)
    return CheckerboardData(
        srcs=tuple(srcs), trgs=tuple(trgs),
        cosh_full=tuple(cf), sinh_full=tuple(sf),
        cosh_half=tuple(ch), sinh_half=tuple(sh),
        mu_diag=jnp.asarray(np.exp(-dtau * mu)),
        mu_diag_inv=jnp.asarray(np.exp(dtau * mu)),
    )


def _mix_rows(M, src, trg, c, s):
    """M ← e^{-dtau T_g} M : mix row pairs (batched over leading axes)."""
    A = M[..., src, :]
    B = M[..., trg, :]
    M = M.at[..., src, :].set(c[:, None] * A + s[:, None] * B)
    M = M.at[..., trg, :].set(s[:, None] * A + c[:, None] * B)
    return M


def _mix_cols(M, src, trg, c, s):
    """M ← M e^{-dtau T_g} : mix column pairs (T_g symmetric)."""
    A = M[..., :, src]
    B = M[..., :, trg]
    M = M.at[..., :, src].set(c[None, :] * A + s[None, :] * B)
    M = M.at[..., :, trg].set(s[None, :] * A + c[None, :] * B)
    return M


def _hop_left(cb: CheckerboardData, M, inv: bool):
    """Apply the symmetric group product from the left
    (reference order: slice_matrices.jl:110-126)."""
    n = len(cb.srcs)
    sgn = -1.0 if inv else 1.0
    for g in reversed(range(1, n)):
        M = _mix_rows(M, cb.srcs[g], cb.trgs[g], cb.cosh_half[g],
                      sgn * cb.sinh_half[g])
    M = _mix_rows(M, cb.srcs[0], cb.trgs[0], cb.cosh_full[0],
                  sgn * cb.sinh_full[0])
    for g in range(1, n):
        M = _mix_rows(M, cb.srcs[g], cb.trgs[g], cb.cosh_half[g],
                      sgn * cb.sinh_half[g])
    return M


def _hop_right(cb: CheckerboardData, M, inv: bool):
    n = len(cb.srcs)
    sgn = -1.0 if inv else 1.0
    for g in reversed(range(1, n)):
        M = _mix_cols(M, cb.srcs[g], cb.trgs[g], cb.cosh_half[g],
                      sgn * cb.sinh_half[g])
    M = _mix_cols(M, cb.srcs[0], cb.trgs[0], cb.cosh_full[0],
                  sgn * cb.sinh_full[0])
    for g in range(1, n):
        M = _mix_cols(M, cb.srcs[g], cb.trgs[g], cb.cosh_half[g],
                      sgn * cb.sinh_half[g])
    return M


def mult_B_left_cb(ctx, consts, cb: CheckerboardData, sigma_l, M):
    """M ← B_cb(l) M (reference: multiply_slice_matrix_left! CBTrue,
    slice_matrices.jl:110-126: eV, mu, then hopping groups)."""
    from . import core
    eV = core.eV_diag(ctx, sigma_l)
    M = eV[:, :, None] * M
    M = cb.mu_diag[:, None] * M
    return _hop_left(cb, M, inv=False)


def mult_B_inv_left_cb(ctx, consts, cb: CheckerboardData, sigma_l, M):
    from . import core
    M = _hop_left(cb, M, inv=True)
    M = cb.mu_diag_inv[:, None] * M
    eVinv = core.eV_diag(ctx, sigma_l, -1.0)
    return eVinv[:, :, None] * M


def mult_B_right_cb(ctx, consts, cb: CheckerboardData, sigma_l, M):
    """M ← M B_cb(l)."""
    from . import core
    M = _hop_right(cb, M, inv=False)
    M = M * cb.mu_diag[None, :]
    eV = core.eV_diag(ctx, sigma_l)
    return M * eV[:, None, :]


def mult_B_inv_right_cb(ctx, consts, cb: CheckerboardData, sigma_l, M):
    from . import core
    eVinv = core.eV_diag(ctx, sigma_l, -1.0)
    M = M * eVinv[:, None, :]
    M = M * cb.mu_diag_inv[None, :]
    return _hop_right(cb, M, inv=True)


def slice_matrix_cb(ctx, consts, cb: CheckerboardData, sigma_l):
    """Dense assembly of B_cb(l) (for testing; reference: slice_matrix
    CBTrue, slice_matrices.jl:85-104)."""
    I = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype), (ctx.F, ctx.N, ctx.N))
    return mult_B_left_cb(ctx, consts, cb, sigma_l, I)


def assemble_dense_operator(lattice, hopping: np.ndarray, dtau: float,
                            dtype=jnp.float64):
    """The checkerboard hopping operator and its exact inverse as DENSE (N,N)
    matrices: op = [Π_{g≥2} e^{-dtau/2 T_g}] e^{-dtau T_1} [Π_{g≥2,rev}] ·
    diag(e^{-dtau·mu}).

    This is how `DQMC(checkerboard=True)` threads the decomposition through
    the propagation (reference: CBTrue slice multiplies,
    src/flavors/DQMC/slice_matrices.jl:104-222): the checkerboard defines a
    specific OPERATOR (with its own O(dtau^2) Trotter systematics); on TPU the
    fastest way to apply it at N ≲ 10^3 is a dense MXU matmul of its
    assembled matrix, not the reference's sparse group products — so the
    checkerboard mode simply swaps the dense e^{-dtau T} in `consts` for this
    assembled matrix, and the whole hot path is unchanged. The sparse
    gather/scatter appliers above remain for very large lattices and for the
    factor-by-factor tests. The inverse is exact (each 2x2 rotation inverts
    exactly), not a matrix inversion."""
    N = hopping.shape[0]
    cb = build_checkerboard(lattice, hopping, dtau)
    I = jnp.eye(N, dtype=dtype)
    hop = _hop_left(cb, I, inv=False)
    hop_inv = _hop_left(cb, I, inv=True)
    op = hop * jnp.asarray(cb.mu_diag, dtype)[None, :]
    op_inv = jnp.asarray(cb.mu_diag_inv, dtype)[:, None] * hop_inv
    return op, op_inv
