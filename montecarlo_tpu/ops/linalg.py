"""Stabilized dense linear algebra for DQMC.

TPU-native replacement for the reference's hand-vectorized kernels
(src/linalg/general.jl, src/linalg/UDT.jl). Everything here is a pure function
over the trailing two axes; arbitrary leading batch axes (chains, flavor
blocks) broadcast for free — the role of the reference's `BlockDiagonal`
type (src/linalg/blockdiagonal.jl) is played by an extra leading axis.

UDT decomposition (reference: udt_AVX_pivot!, src/linalg/UDT.jl:192-281):
A = U · diag(D) · T with U unitary and D positive. Column pivoting is realized
as a one-shot column-norm sort *before* an unpivoted QR — the greedy max-norm
pivot order of the reference equals the norm-descending order for the strongly
column-scaled propagator products DQMC produces, and one-shot pivoting keeps
the QR batched and MXU-friendly (no data-dependent inner loop). The "dirty T"
form (apply_pivot=Val(false), UDT.jl:283-306) is kept: ``udt_dirty`` returns
the triangular factor R and the pivot so that downstream triangular solves
(`rdiv_dirty` = reference rdivp!, src/linalg/general.jl:138-166) stay cheap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _adj(A):
    return jnp.swapaxes(A, -1, -2).conj()


def _qr(A):
    """QR dispatch: the fused batched Householder kernel on TPU for f32
    (ops/pallas_qr.py; ~10x the XLA QR at DQMC sizes inside scans), XLA
    otherwise."""
    from .pallas_qr import maybe_qr
    return maybe_qr(A)


def argsort_desc(v):
    """Permutation sorting v descending (ties: lower index first) — exactly
    ``jnp.argsort(-v)`` but sort-free: for the short per-chain vectors of DQMC
    (N ≤ a few hundred) two O(N²) compare-reduces are ~3x cheaper on TPU than
    XLA's bitonic sort networks (measured 0.091 → 0.035 ms for the full
    pivot+gather at (256, 64)).

    rank[j] = #{k: v[k] > v[j]} + #{k < j: v[k] == v[j]}  (= position of j)
    piv[r]  = the j with rank[j] == r                      (inverse, scatter)
    """
    n = v.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    gt = (v[..., None, :] > v[..., :, None]).astype(jnp.int32)
    tie = ((v[..., None, :] == v[..., :, None])
           & (idx[None, :] < idx[:, None])).astype(jnp.int32)
    rank = jnp.sum(gt + tie, axis=-1)                    # (..., n)
    onehot = (rank[..., :, None] == idx).astype(jnp.int32)   # [j, r]
    piv = jnp.sum(onehot * idx[..., :, None], axis=-2)       # (..., n)
    return piv.astype(jnp.int32), rank.astype(jnp.int32)


def _fused_udt_eligible(A, kind="udt"):
    """True when the fused UDT Pallas kernels (QR + postscale [+ solve] in
    one call, ops/pallas_qr.py) may take this shape: f32, square, N <= 64,
    kernels enabled, Mosaic compile probe green."""
    if A.dtype != jnp.float32 or A.ndim < 2 or A.shape[-1] != A.shape[-2]:
        return False
    from .pallas_qr import enabled, fused_udt_ok
    return enabled() and fused_udt_ok(A.shape[-1], kind)


def udt_dirty(A):
    """A = U · diag(D) · T  with  T = R[:, inv_piv] (i.e. T·P = R upper-tri).

    Returns (U, D, R, piv):
      U    (..., n, n) unitary
      D    (..., n)    positive real
      R    (..., n, n) upper triangular with unit-magnitude diagonal ("dirty T")
      piv  (..., n)    column permutation: A[..., :, piv] = U D R

    Range safety: DQMC propagator products have entries spanning up to
    ~e^{±2 beta W} (46 decades at beta=10). On TPU, float64 is emulated with
    double-float arithmetic that has only float32 RANGE (max ~3e38, subnormal
    floor ~1e-45), so (a) squared column norms inside QR overflow, and (b) a
    naive normalize-to-1 prescale pushes the small-scale columns below the
    subnormal floor and flushes them to zero (NaN via 1/0). Fix: a SCALAR
    power-of-two prescale that brings the largest entry to 2^50 (~1e15) —
    norms-squared then peak at ~N·1e30 (safe) while the representable window
    below still spans ~60 decades, more than any stabilized window needs.
    Power-of-two scaling is exact, so per-column relative precision and the
    graded structure are untouched; the scale folds back into D."""
    mx = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    mx = jnp.maximum(mx, jnp.finfo(A.dtype).tiny)
    mx = jnp.exp2(jnp.ceil(jnp.log2(mx)) - 50.0)  # exact; max entry → ~2^50
    As = A / mx
    norms = jnp.linalg.norm(As, axis=-2)
    piv, _ = argsort_desc(norms)
    Ap = jnp.take_along_axis(As, piv[..., None, :], axis=-1)
    if _fused_udt_eligible(A):
        # fused postscale: the kernel emits Rs (normalized, flush-fixed) and
        # d·mx directly — skips ~5 small XLA passes per call
        from .pallas_qr import udt_fused_lanes
        Q, Rs, d = udt_fused_lanes()(Ap, mx[..., 0, 0])
        return Q, d, Rs, piv
    Q, R = _qr(Ap)
    # complex-correct: D = |r_ii| (the complex modulus — the phase stays in
    # T's unit-MAGNITUDE diagonal; reference complex udt_AVX_pivot!,
    # src/linalg/UDT.jl:316-469)
    d = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))
    # Floor for flushed-to-zero residuals. On TPU the f64 'tiny' constant
    # (2.2e-308) is itself below double-float range and silently becomes 0,
    # so use a floor inside the f32 exponent window there: 2^-70 relative to
    # the 2^50-normalized scale = 2^-120 of the matrix max — far beyond the
    # ~2^-49 double-float precision, so no representable information is lost.
    if d.dtype == jnp.float32 or jax.default_backend() not in ("cpu", "gpu"):
        floor = 2.0 ** -70   # f32 exponent window (TPU f64 emulation has it too)
    else:
        floor = jnp.finfo(d.dtype).tiny
    d = jnp.maximum(d, floor)
    Rs = R / d[..., :, None]
    # rows whose residual flushed to zero have an all-zero R row; force the
    # unit diagonal (mathematically Rs_ii = ±1) so triangular solves stay
    # finite — those modes carry no representable information
    n = Rs.shape[-1]
    diag_vals = jnp.diagonal(Rs, axis1=-2, axis2=-1)
    fixed = jnp.where(jnp.abs(diag_vals) < 0.5,
                      jnp.ones_like(diag_vals), diag_vals)
    Rs = Rs + (fixed - diag_vals)[..., :, None] * jnp.eye(n, dtype=Rs.dtype)
    d = d * mx[..., 0]
    return Q, d, Rs, piv


def udt_dirty_colscaled(A):
    """Per-COLUMN-scaled variant of udt_dirty for exponent-range-limited
    arithmetic (float32 / TPU double-float): every column is normalized before
    the QR so no column can overflow or flush to zero regardless of beta.
    The scales fold into D (products) and into T (ratios s_j/s_i, bounded on
    the upper triangle by the descending pivot order).

    Tradeoff vs the scalar-prescale udt_dirty: normalization erases the
    scale grading the QR otherwise exploits, costing a few digits on
    extremely degenerate spectra (~1e-2 at beta=40 in f64 experiments) —
    irrelevant at float32 precision, where it is the only scheme whose
    intermediate quantities can never leave the representable window."""
    m = jnp.maximum(jnp.max(jnp.abs(A), axis=-2), jnp.finfo(A.dtype).tiny)
    s = m * jnp.linalg.norm(A / m[..., None, :], axis=-2)
    s = jnp.maximum(s, jnp.finfo(A.dtype).tiny)
    piv, _ = argsort_desc(s)
    sp = jnp.take_along_axis(s, piv, axis=-1)
    Ap = jnp.take_along_axis(A, piv[..., None, :], axis=-1) / sp[..., None, :]
    Q, R = _qr(Ap)
    dhat = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))
    dhat = jnp.maximum(dhat, jnp.finfo(dhat.dtype).eps ** 2)
    d = dhat * sp
    n = R.shape[-1]
    mask = jnp.triu(jnp.ones((n, n), bool))
    ratio = jnp.where(mask, sp[..., None, :], 0.0) / sp[..., :, None]
    Rs = (R / dhat[..., :, None]) * ratio
    return Q, d, Rs, piv


def udt(A):
    """A = U · diag(D) · T with T fully formed (pivot applied)."""
    U, D, R, piv = udt_dirty(A)
    T = scatter_columns(R, piv)
    return U, D, T


def invert_permutation(piv):
    """Sort-free inverse of a batched permutation: ipiv[piv[j]] = j."""
    n = piv.shape[-1]
    idx = jnp.arange(n, dtype=piv.dtype)
    onehot = (piv[..., :, None] == idx).astype(piv.dtype)    # [j, r]
    return jnp.sum(onehot * idx[..., :, None], axis=-2)


def scatter_columns(R, piv):
    """Given M and piv with A[..., :, piv] = M, return A (apply P^T on the
    right): out[..., :, piv[j]] = M[..., :, j]."""
    ipiv = invert_permutation(piv)
    return jnp.take_along_axis(R, ipiv[..., None, :], axis=-1)


def permute_rows(T, piv):
    """T[..., piv, :] — row gather. The identity
    scatter_columns(R, piv) @ T == R @ permute_rows(T, piv)
    (R·Pᵀ·T with (Pᵀ·T)[i] = T[piv[i]]) lets the UDT T-factor update skip
    the O(N²) invert_permutation + column gather."""
    return jnp.take_along_axis(T, piv[..., :, None], axis=-2)


# Explicit-inverse path for the dirty-R triangular solves. Default OFF:
# although the blocked inverse wins in isolation, inside the full sweep
# XLA's substitution-based triangular_solve measured FASTER end-to-end
# (1138 vs 1058 chain-sweeps/s, g_refresh sm=5 on v5e) — the solve overlaps
# with surrounding work while the inverse's many small einsums serialize.
# True forces the matmul-only inverse (kept for experimentation).
TRI_INV = False


def _tri_inv_enabled(dtype):
    if TRI_INV is None or TRI_INV is False:
        return False
    return jnp.dtype(dtype) in (jnp.float32, jnp.complex64)


def _nilpotent_inv(T):
    """(..., b, b) upper-triangular with EXACT unit diagonal → inverse via the
    binary product form (I+U)^{-1} = (I-U)(I+U²)(I+U⁴)…, exact for nilpotent
    U (strictly upper, U^b = 0). Pure batched matmuls."""
    b = T.shape[-1]
    I = jnp.eye(b, dtype=T.dtype)
    P = I - T                       # -U
    out = I + P
    cover = 2                       # exponents 0..cover-1 accumulated
    while cover < b:
        P = P @ P
        out = out + out @ P
        cover *= 2
    return out


def tri_unit_inv(R, block=8):
    """Inverse of a batched upper-triangular R with unit-MAGNITUDE diagonal
    (the "dirty T" of udt_dirty), as pure MXU matmuls: row-normalize to unit
    diagonal, invert the (b×b) diagonal blocks with the nilpotent product
    form, then one block-level nilpotent product over the nb×nb block
    structure. ~4x faster than lax.triangular_solve at DQMC sizes on TPU.

    Forward error is ~cond(R)·eps like substitution; the intermediate block
    powers are bounded because column-pivoted dirty R has |R_ij| ≲ |R_ii| = 1
    (greedy-pivot property, reference udt_AVX_pivot!,
    src/linalg/UDT.jl:192-281). Gated by tests/test_linalg.py against the
    substitution path on graded DQMC-like factors."""
    n = R.shape[-1]
    d = jnp.diagonal(R, axis1=-2, axis2=-1)
    Rn = R / d[..., :, None]                      # exact unit diagonal
    if n <= block or n % block:
        return _nilpotent_inv(Rn) / d[..., None, :]
    nb = n // block
    lead = R.shape[:-2]
    Rb = Rn.reshape(lead + (nb, block, nb, block))
    Db = jnp.moveaxis(jnp.diagonal(Rb, axis1=-4, axis2=-2), -1, -3)
    Dbinv = _nilpotent_inv(Db)                    # (..., nb, b, b)
    # Db^{-1}·Rn = I + M, M strictly block-upper (M^nb = 0)
    DbR = jnp.einsum("...ibk,...ikc->...ibc", Dbinv,
                     Rn.reshape(lead + (nb, block, n))).reshape(lead + (n, n))
    I = jnp.eye(n, dtype=R.dtype)
    P = I - DbR                                   # -M
    out = I + P
    cover = 2
    while cover < nb:
        P = P @ P
        out = out + out @ P
        cover *= 2
    # (I+M)^{-1} · Db^{-1}: scale block-columns
    out = jnp.einsum("...rib,...ibc->...ric",
                     out.reshape(lead + (n, nb, block)),
                     Dbinv).reshape(lead + (n, n))
    return out / d[..., None, :]


def rdiv_dirty(A, R, piv):
    """A · T^{-1} where T = scatter_columns(R, piv)
    (reference: rdivp!, src/linalg/general.jl:138-166).
    = A[..., :, piv] @ R^{-1} via batched triangular solve (explicit blocked
    inverse on TPU 32-bit paths, see TRI_INV)."""
    Ap = jnp.take_along_axis(A, piv[..., None, :], axis=-1)
    if _tri_inv_enabled(R.dtype):
        return Ap @ tri_unit_inv(R)
    return lax.linalg.triangular_solve(R, Ap, left_side=False, lower=False)


def calculate_greens(Ul, Dl, Tl, Ur, Dr, Tr, udt_fn=None):
    """G = [I + Ul·diag(Dl)·Tl · Tr†·diag(Dr)·Ur†]^{-1}.

    Range-safe Dmax/Dmin-split algebra. The reference's 6-step equal-time
    version (calculate_greens_AVX!, src/flavors/DQMC/stack.jl:337-393) forms
    Dl·(Tl Tr†)·Dr whose "dirty" triangular factor acquires rows of size
    ~s_max/d_min ≈ e^{2·beta·W} — beyond the f32 exponent range of TPU f64
    emulation. Instead we use the splitting of the reference's unequal-time
    code (calculate_greens_full1!, unequal_time_stack.jl:443-525), applied to
    the equal-time case:

      I + Ul Dl X Dr Ur†
        = Ul·Dlp·[ Dlp^{-1}·(Ul†Ur)·Drp^{-1} + Dlm·X·Drm ]·Drp·Ur†
      G = Ur·Drp^{-1}·M^{-1}·Dlp^{-1}·Ul†,   M = the bracket,

    with Dlp = max(Dl,1), Dlm = min(Dl,1) (and likewise Dr): every factor of
    M is bounded by ~1, so all intermediates stay within ~e^{beta·W}. Needs
    only ONE interior UDT (the reference needs two). Batches over leading axes.
    """
    Dlp = jnp.maximum(Dl, 1.0)
    Dlm = jnp.minimum(Dl, 1.0)
    Drp = jnp.maximum(Dr, 1.0)
    Drm = jnp.minimum(Dr, 1.0)
    X = Tl @ _adj(Tr)
    M = (_adj(Ul) @ Ur) / Dlp[..., :, None] / Drp[..., None, :]
    M = M + (Dlm[..., :, None] * X) * Drm[..., None, :]
    if (udt_fn is None or udt_fn is udt_dirty) and _fused_udt_eligible(
            M, "solve"):
        # fused path: QR + triangular solve + both postscales in ONE Pallas
        # call (ops/pallas_qr.py::_udt_solve_kernel)
        u, Z = _fused_greens_solve(M, Ur / Drp[..., None, :])
        W = _adj(u) / Dlp[..., None, :]
        return Z @ (W @ _adj(Ul))
    u, d, r, piv = (udt_fn or udt_dirty)(M)
    # G = (Ur/Drp) · t^{-1} · d^{-1} · u† · (Dlp^{-1}·Ul†)
    Z = rdiv_dirty(Ur / Drp[..., None, :], r, piv)
    Z = Z / d[..., None, :]
    W = _adj(u) / Dlp[..., None, :]   # u† · diag(1/Dlp)
    return Z @ (W @ _adj(Ul))


def _fused_greens_solve(M, Zpre):
    """(u, Z) with M·P = u·diag(d)·Rs and Z = (Zpre·P)·Rs⁻¹/d, via the fused
    UDT+solve kernel — equivalent to udt_dirty(M) followed by
    rdiv_dirty(Zpre, Rs, piv)/d, in one pallas_call."""
    mx = jnp.max(jnp.abs(M), axis=(-2, -1), keepdims=True)
    mx = jnp.maximum(mx, jnp.finfo(M.dtype).tiny)
    mx = jnp.exp2(jnp.ceil(jnp.log2(mx)) - 50.0)
    Ms = M / mx
    norms = jnp.linalg.norm(Ms, axis=-2)
    piv, _ = argsort_desc(norms)
    Mp = jnp.take_along_axis(Ms, piv[..., None, :], axis=-1)
    Zp = jnp.take_along_axis(Zpre, piv[..., None, :], axis=-1)
    from .pallas_qr import udt_solve_lanes
    return udt_solve_lanes()(Mp, Zp, mx[..., 0, 0])


def udt_dirty_bounded(A):
    """udt_dirty minus the power-of-two prescale, for inputs where BOTH range
    guards are provably unnecessary: max entry « 1e15 (no norm-squared
    overflow) AND min relevant scale » 1e-38 (no subnormal flush). NOTE the
    calculate_greens bracket M does NOT qualify at large beta in float32: its
    graded columns reach ~e^{-2*beta*W} (~1e-35 at beta=10), which only
    survive the QR because the prescale lifts them by ~2^45. Kept for
    low-beta / f64 fast paths; default paths use the full udt_dirty."""
    norms = jnp.linalg.norm(A, axis=-2)
    piv, _ = argsort_desc(norms)
    Ap = jnp.take_along_axis(A, piv[..., None, :], axis=-1)
    Q, R = _qr(Ap)
    d = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))
    if d.dtype == jnp.float32 or jax.default_backend() not in ("cpu", "gpu"):
        floor = 2.0 ** -70
    else:
        floor = jnp.finfo(d.dtype).tiny
    d = jnp.maximum(d, floor)
    Rs = R / d[..., :, None]
    n = Rs.shape[-1]
    diag_vals = jnp.diagonal(Rs, axis1=-2, axis2=-1)
    fixed = jnp.where(jnp.abs(diag_vals) < 0.5,
                      jnp.ones_like(diag_vals), diag_vals)
    Rs = Rs + (fixed - diag_vals)[..., :, None] * jnp.eye(n, dtype=Rs.dtype)
    return Q, d, Rs, piv


def calculate_greens_inv(Ulinv, Dl, Tl, Urinv, Dr, Tr, udt_fn=None):
    """G = [I + Ul·diag(Dl)·Tl · Tr†·diag(Dr)·Ur†]^{-1} expressed through the
    EXPLICIT inverses Ulinv = Ul^{-1}, Urinv = Ur^{-1}.

    Same Dmax/Dmin-split algebra as calculate_greens, which implicitly uses
    Ul^{-1} = Ul† for unitary factors — here the inverses are inputs, so Ul/Ur
    may be any bounded invertible factors. This is the enabler of the
    g_refresh deferred-window mode (dqmc/core.py): between stack boundaries
    the U factors accumulate raw B multiplications (non-unitary) while their
    inverses are accumulated alongside with B^{-1} multiplications; the
    per-slice Green's recomputation then needs no per-slice QR on the stack
    side. For unitary factors calculate_greens(Ul,...) ==
    calculate_greens_inv(Ul†,...) exactly.

        G = Ur^{-†}·Drp^{-1}·M^{-1}·Dlp^{-1}·Ul^{-1},
        M = Dlp^{-1}·(Ul^{-1}·Ur^{-†})·Drp^{-1} + Dlm·(Tl·Tr†)·Drm.
    """
    Dlp = jnp.maximum(Dl, 1.0)
    Dlm = jnp.minimum(Dl, 1.0)
    Drp = jnp.maximum(Dr, 1.0)
    Drm = jnp.minimum(Dr, 1.0)
    Urdaginv = _adj(Urinv)                       # Ur^{-†}
    X = Tl @ _adj(Tr)
    M = (Ulinv @ Urdaginv) / Dlp[..., :, None] / Drp[..., None, :]
    M = M + (Dlm[..., :, None] * X) * Drm[..., None, :]
    if (udt_fn is None or udt_fn is udt_dirty) and _fused_udt_eligible(
            M, "solve"):
        u, Z = _fused_greens_solve(M, Urdaginv / Drp[..., None, :])
        W = _adj(u) / Dlp[..., None, :]
        return Z @ (W @ Ulinv)
    u, d, r, piv = (udt_fn or udt_dirty)(M)
    Z = rdiv_dirty(Urdaginv / Drp[..., None, :], r, piv)
    Z = Z / d[..., None, :]
    W = _adj(u) / Dlp[..., None, :]
    return Z @ (W @ Ulinv)


def udt_well_conditioned(W, D):
    """UDT(W · diag(D)) for a WELL-CONDITIONED W (cond(W)^2 · eps « 1) with an
    arbitrary explicit column grading D, via CholeskyQR2.

    This is the stack-extension stabilization specialized to its actual input
    structure: ``extend_left/right`` always decompose (B-products @ U_prev) ·
    diag(D_prev) where the left factor W has cond ~ e^{safe_mult·dtau·W} (tiny)
    and ALL the grading is explicit in D. Householder QR of the full graded
    product is therefore unnecessary: orthonormalize W alone with two rounds
    of Gram-matrix Cholesky (pure MXU matmuls + an n×n Cholesky + triangular
    solves — far cheaper than Householder on TPU), then fold D into the
    triangular factor exactly:

        W = Q·Rc  →  W·diag(D) = Q · diag(|Rc_ii|·D) · T_dirty,
        T_dirty_ij = Rc_ij · D_j / (|Rc_ii|·D_i)  (unit-diagonal triangular).

    No pivoting is performed: the D ordering drifts only by the bounded
    per-window factors |Rc_ii| ∈ [e^{-w}, e^{+w}], so T stays bounded.
    Returns (U, d, T_dirty, piv=arange) in the udt_dirty convention.
    """
    n = W.shape[-1]
    # CholeskyQR2: two rounds of Q = W·chol(W†W)^{-T}
    eps = jnp.finfo(W.dtype).eps

    def _cqr(Wm, shift):
        Gm = _adj(Wm) @ Wm
        if shift:
            # shifted CholeskyQR: keeps the Gram matrix positive definite for
            # moderately ill-conditioned windows; the orthogonality loss is
            # repaired by the second round
            s = 16.0 * eps * jnp.max(jnp.diagonal(Gm, axis1=-2, axis2=-1),
                                     axis=-1, keepdims=True)
            Gm = Gm + s[..., None] * jnp.eye(n, dtype=Gm.dtype)
        L = jnp.linalg.cholesky(Gm)           # Gm = L L†
        Q = lax.linalg.triangular_solve(
            _adj(L), Wm, left_side=False, lower=False)   # W · (L†)^{-1}
        return Q, _adj(L)                      # R = L† (upper)
    Q1, R1 = _cqr(W, shift=True)
    Q, R2 = _cqr(Q1, shift=False)
    Rc = R2 @ R1                               # W = Q · Rc, upper triangular
    dc = jnp.abs(jnp.diagonal(Rc, axis1=-2, axis2=-1))
    dc = jnp.maximum(dc, jnp.finfo(dc.dtype).tiny)
    d = dc * D
    # T_dirty_ij = Rc_ij · (D_j / D_i) / dc_i — mask the (zero) lower triangle
    # before forming the ratios so no spurious inf/NaN appears
    mask = jnp.triu(jnp.ones((n, n), bool))
    ratio = jnp.where(mask, D[..., None, :], 0.0) / D[..., :, None]
    T = (Rc * ratio) / dc[..., :, None]
    piv = jnp.broadcast_to(jnp.arange(n), d.shape).astype(jnp.int32)
    return Q, d, T, piv


def udt_mul_udt(Ua, Da, Ta, Ub, Db, Tb):
    """UDT of the product (Ua Da Ta)(Ub Db Tb), re-stabilized:
    collapse the middle, keeping the big scales in the D factors
    (reference pattern: add_slice_sequence_*, src/flavors/DQMC/stack.jl:272-311).
    """
    mid = (Ta @ Ub) * Db[..., None, :]
    mid = mid * Da[..., :, None]
    u, d, r, p = udt_dirty(mid)
    U = Ua @ u
    T = r @ permute_rows(Tb, p)
    return U, d, T
