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
    """Complex-Hermitian-correct: for a bond amplitude w = T[s,t] (so
    T[t,s] = w̄), the exact 2×2 exponential is

        exp(-dtau·[[0, w], [w̄, 0]]) = [[cosh|a|, -sinh|a|·p],
                                        [-sinh|a|·p̄, cosh|a|]],
        a = dtau·w,  p = a/|a|  (p = sign(a) in the real case, which
        reproduces the classic [[cosh a, -sinh a], [-sinh a, cosh a]]).

    `sinh_*` stores the UPPER off-diagonal (-sinh|a|·p); the lower one is its
    conjugate (a no-op for real hopping)."""
    if np.iscomplexobj(hopping):
        assert np.allclose(hopping, hopping.conj().T), \
            "checkerboard requires a Hermitian hopping matrix"
    groups = lattice.checkerboard_groups
    srcs, trgs, cf, sf, ch, sh = [], [], [], [], [], []

    def coeffs(a):
        mag = np.abs(a)
        safe = np.where(mag > 0, mag, 1.0)
        p = np.where(mag > 0, a / safe, np.ones_like(a))
        return np.cosh(mag), -np.sinh(mag) * p

    for g in groups:
        s = g[:, 0].astype(np.int32)
        t = g[:, 1].astype(np.int32)
        a = dtau * hopping[s, t]
        srcs.append(jnp.asarray(s))
        trgs.append(jnp.asarray(t))
        c1, s1 = coeffs(a)
        c2, s2 = coeffs(0.5 * a)
        cf.append(jnp.asarray(c1))
        sf.append(jnp.asarray(s1))
        ch.append(jnp.asarray(c2))
        sh.append(jnp.asarray(s2))
    mu = np.diag(hopping).real
    return CheckerboardData(
        srcs=tuple(srcs), trgs=tuple(trgs),
        cosh_full=tuple(cf), sinh_full=tuple(sf),
        cosh_half=tuple(ch), sinh_half=tuple(sh),
        mu_diag=jnp.asarray(np.exp(-dtau * mu)),
        mu_diag_inv=jnp.asarray(np.exp(dtau * mu)),
    )


def _mix_rows(M, src, trg, c, s):
    """M ← e^{-dtau T_g} M : mix row pairs (batched over leading axes).
    s is the UPPER off-diagonal coefficient; the lower one is conj(s)."""
    A = M[..., src, :]
    B = M[..., trg, :]
    M = M.at[..., src, :].set(c[:, None] * A + s[:, None] * B)
    M = M.at[..., trg, :].set(jnp.conj(s)[:, None] * A + c[:, None] * B)
    return M


def _mix_cols(M, src, trg, c, s):
    """M ← M e^{-dtau T_g} : mix column pairs (T_g Hermitian: the src column
    mixes with conj(s), the trg column with s)."""
    A = M[..., :, src]
    B = M[..., :, trg]
    M = M.at[..., :, src].set(c[None, :] * A + jnp.conj(s)[None, :] * B)
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
    if np.iscomplexobj(hopping):
        # complex rotation coefficients into a real matrix would silently
        # drop the imaginary parts (jnp .at[].set only warns)
        dtype = jnp.complex128
    I = jnp.eye(N, dtype=dtype)
    hop = _hop_left(cb, I, inv=False)
    hop_inv = _hop_left(cb, I, inv=True)
    op = hop * jnp.asarray(cb.mu_diag, dtype)[None, :]
    op_inv = jnp.asarray(cb.mu_diag_inv, dtype)[:, None] * hop_inv
    return op, op_inv
