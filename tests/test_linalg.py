"""UDT / stabilized Green's algebra tests (modeled on reference
test/linalg/old_linalg.jl and the stabilization design of src/linalg/UDT.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu.ops.linalg import (
    udt, udt_dirty, rdiv_dirty, scatter_columns, calculate_greens, udt_mul_udt,
)


def rand(n, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=batch + (n, n)))


def test_udt_reconstruction():
    A = rand(16, 0)
    U, D, T = udt(A)
    assert np.allclose(np.asarray(U @ jnp.diag(D) @ T), np.asarray(A), atol=1e-12)
    # U unitary, D positive
    assert np.allclose(np.asarray(U.T @ U), np.eye(16), atol=1e-12)
    assert (np.asarray(D) > 0).all()


def test_udt_batched():
    A = rand(8, 1, batch=(5,))
    U, D, T = udt(A)
    rec = jnp.einsum("bij,bj,bjk->bik", U, D, T)
    assert np.allclose(np.asarray(rec), np.asarray(A), atol=1e-12)


def test_udt_extreme_scales():
    """Column scales spanning 1e-30..1e30 must be captured in D."""
    rng = np.random.default_rng(2)
    Q, _ = np.linalg.qr(rng.normal(size=(16, 16)))
    scales = np.logspace(-30, 30, 16)
    A = jnp.asarray(Q * scales[None, :])
    U, D, T = udt(A)
    rec = np.asarray(U @ jnp.diag(D) @ T)
    assert np.allclose(rec / scales[None, :], Q, atol=1e-12)


def test_rdiv_dirty():
    A = rand(12, 3)
    B = rand(12, 4)
    U, D, R, piv = udt_dirty(B)
    T = scatter_columns(R, piv)
    X = rdiv_dirty(A, R, piv)
    assert np.allclose(np.asarray(X @ T), np.asarray(A), atol=1e-10)


def test_calculate_greens_well_conditioned():
    n = 16
    A = rand(n, 5)
    B = rand(n, 6)
    Ul, Dl, Tl = udt(A)
    Ur, Dr, Tr = udt(B)
    direct = jnp.linalg.inv(jnp.eye(n) + A @ B.conj().T)
    G = calculate_greens(Ul, Dl, Tl, Ur, Dr, Tr)
    assert np.allclose(np.asarray(G), np.asarray(direct), atol=1e-10)


def _free_fermion_oracle(L, beta, slices, mu=0.5):
    """Exact G = inv(I + B^M) for B = exp(-dtau*K) via eigendecomposition of
    the symmetric hopping matrix — valid to machine precision even when B^M
    overflows elementwise understanding. A small diagonal disorder breaks the
    (massive) lattice-symmetry degeneracy of the spectrum, which would
    otherwise make the one-shot pivot order ill-defined (ties) and the chain
    chaotic at the 1e-2 level for beta=40."""
    N = L * L
    K = np.zeros((N, N))
    idx = lambda x, y: (x % L) * L + (y % L)
    for x in range(L):
        for y in range(L):
            for dx, dy in ((1, 0), (0, 1)):
                K[idx(x, y), idx(x + dx, y + dy)] -= 1.0
                K[idx(x + dx, y + dy), idx(x, y)] -= 1.0
    rng = np.random.default_rng(7)
    np.fill_diagonal(K, -mu + 0.05 * rng.standard_normal(N))
    dtau = beta / slices
    w, V = np.linalg.eigh(K)
    B = V @ np.diag(np.exp(-dtau * w)) @ V.T
    G_exact = V @ np.diag(1.0 / (1.0 + np.exp(-beta * w))) @ V.T
    return B, G_exact


@pytest.mark.parametrize("beta,tol", [(10.0, 1e-9), (40.0, 1e-8)])
def test_stabilized_chain_vs_free_fermions(beta, tol):
    """UDT-accumulated product of M identical slice matrices must reproduce
    the exact free-fermion Green's function (the naive product overflows /
    loses all precision at beta=40). This is the core stability gate
    (cf. reference test/flavortests_DQMC.jl:44-69)."""
    L, slices = 4, int(beta * 10)
    B, G_exact = _free_fermion_oracle(L, beta, slices)
    Bj = jnp.asarray(B)
    n = B.shape[0]
    U, D, T = udt(jnp.eye(n))
    safe_mult = 10
    for start in range(0, slices, safe_mult):
        prod = jnp.eye(n)
        for _ in range(min(safe_mult, slices - start)):
            prod = Bj @ prod
        U, D, T = udt_mul_udt(*udt(prod), U, D, T)
    # G = inv(I + UDT) = calculate_greens with right factor = identity
    Ur, Dr, Tr = udt(jnp.eye(n))
    G = calculate_greens(U, D, T, Ur, Dr, Tr)
    # NOTE: the free-fermion spectrum is massively degenerate, which makes
    # the one-shot pivot order sensitive to ties; interacting DQMC spectra are
    # generic and reach ~1e-12 (see test_dqmc_core self-consistency gates).
    assert np.max(np.abs(np.asarray(G) - G_exact)) < tol


def test_udt_mul_udt():
    A = rand(10, 7)
    B = rand(10, 8)
    U, D, T = udt_mul_udt(*udt(A), *udt(B))
    assert np.allclose(np.asarray(U @ jnp.diag(D) @ T), np.asarray(A @ B), atol=1e-10)


def test_udt_complex():
    """Complex-dtype parity of the UDT layer (reference carries complex
    reflector/UDT paths, src/linalg/UDT.jl:316-469): reconstruction and
    calculate_greens on ill-conditioned complex products."""
    from montecarlo_tpu.ops.linalg import (udt_dirty, udt_dirty_colscaled,
                                           scatter_columns, calculate_greens)
    rng = np.random.default_rng(5)

    def rand_graded_complex(n, decades):
        scales = np.logspace(-decades / 2, decades / 2, n)
        A = (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))) * scales[None, :]
        return jnp.asarray(A)

    for fn in (udt_dirty, udt_dirty_colscaled):
        A = rand_graded_complex(16, 12)
        U, D, R, piv = fn(A)
        # U unitary, D positive real, T unit-magnitude diagonal
        assert np.allclose(np.asarray(U.conj().T @ U), np.eye(16), atol=1e-12)
        assert np.all(np.asarray(D) > 0) and not np.iscomplexobj(np.asarray(D))
        T = scatter_columns(R, piv)
        diag = np.abs(np.diagonal(np.asarray(R)))
        assert np.allclose(diag, 1.0, atol=1e-10)
        recon = np.asarray((U * D[None, :]) @ T)
        assert np.max(np.abs(recon - np.asarray(A))) / np.max(np.abs(np.asarray(A))) < 1e-12

    # calculate_greens on complex UDT pairs vs direct inversion
    Al = rand_graded_complex(12, 6)
    Ar = rand_graded_complex(12, 6)
    Ul, Dl, Rl, pl_ = udt_dirty(Al)
    Ur, Dr, Rr, pr = udt_dirty(Ar)
    Tl = scatter_columns(Rl, pl_)
    Tr = scatter_columns(Rr, pr)
    G = calculate_greens(Ul, Dl, Tl, Ur, Dr, Tr)
    direct = np.linalg.inv(np.eye(12) + np.asarray(Al) @ np.asarray(Ar).conj().T)
    # the unstabilized direct inverse itself carries ~cond*eps error at
    # cond ~ 1e12; 1e-6 agreement certifies the stabilized path
    assert np.max(np.abs(np.asarray(G) - direct)) < 1e-6


# --------------------------------------------------- blocked triangular inverse
def _graded_dirty_R(key, B, N, dtype=jnp.float32, spread=8.0):
    """Dirty-R factors as DQMC produces them: udt_dirty of a strongly
    column-graded random product."""
    from montecarlo_tpu.ops.linalg import udt_dirty
    A = jax.random.normal(key, (B, N, N), dtype)
    scales = jnp.exp(jnp.linspace(spread, -spread, N)).astype(dtype)
    _, _, R, piv = udt_dirty(A * scales[None, None, :])
    return R, piv


# tri_unit_inv is an experimentation-only path (linalg.TRI_INV stays False
# in production — XLA's triangular_solve measured faster end-to-end); keep
# one small fast check, push the big-N variants to the slow tier
@pytest.mark.parametrize("N", [8,
                               pytest.param(64, marks=pytest.mark.slow),
                               pytest.param(72, marks=pytest.mark.slow)])
def test_tri_unit_inv_matches_substitution(N):
    from montecarlo_tpu.ops import linalg
    key = jax.random.PRNGKey(3)
    # B=4: the batch axis adds no coverage here and the interpret-mode
    # udt_dirty that builds R scales linearly in it (B=16 cost 10 s)
    R, _ = _graded_dirty_R(key, 4, N)
    X = jax.random.normal(jax.random.PRNGKey(4), (4, N, N), jnp.float32)
    ref = jax.lax.linalg.triangular_solve(R, X, left_side=False, lower=False)
    got = X @ linalg.tri_unit_inv(R)
    scale = np.max(np.abs(np.asarray(ref)))
    assert np.max(np.abs(np.asarray(ref - got))) < 5e-5 * max(scale, 1.0)


@pytest.mark.slow
def test_tri_unit_inv_exact_inverse_property():
    from montecarlo_tpu.ops import linalg
    R, _ = _graded_dirty_R(jax.random.PRNGKey(5), 8, 64)
    Ri = linalg.tri_unit_inv(R)
    I = jnp.eye(64, dtype=jnp.float32)
    resid = np.max(np.abs(np.asarray(R @ Ri - I)))
    assert resid < 1e-4


@pytest.mark.slow
def test_tri_unit_inv_complex():
    from montecarlo_tpu.ops import linalg
    key = jax.random.PRNGKey(6)
    A = (jax.random.normal(key, (4, 64, 64), jnp.float32)
         + 1j * jax.random.normal(jax.random.PRNGKey(7), (4, 64, 64), jnp.float32)
         ).astype(jnp.complex64)
    scales = jnp.exp(jnp.linspace(6.0, -6.0, 64)).astype(jnp.float32)
    from montecarlo_tpu.ops.linalg import udt_dirty
    _, _, R, _ = udt_dirty(A * scales[None, None, :])
    Ri = linalg.tri_unit_inv(R)
    resid = np.max(np.abs(np.asarray(R @ Ri - jnp.eye(64, dtype=jnp.complex64))))
    assert resid < 1e-3


def test_rdiv_dirty_tri_inv_path_matches_solve_path():
    from montecarlo_tpu.ops import linalg
    # (8, 32): N=32 still exercises the blocked path (2 blocks of 16);
    # (16, 64) spent 11 s of the fast tier on the same comparison
    R, piv = _graded_dirty_R(jax.random.PRNGKey(8), 8, 32)
    A = jax.random.normal(jax.random.PRNGKey(9), (8, 32, 32), jnp.float32)
    old = linalg.TRI_INV
    try:
        linalg.TRI_INV = False
        ref = linalg.rdiv_dirty(A, R, piv)
        linalg.TRI_INV = True
        got = linalg.rdiv_dirty(A, R, piv)
    finally:
        linalg.TRI_INV = old
    scale = np.max(np.abs(np.asarray(ref)))
    assert np.max(np.abs(np.asarray(ref - got))) < 5e-5 * max(scale, 1.0)


def test_argsort_desc_matches_argsort():
    from montecarlo_tpu.ops.linalg import argsort_desc, invert_permutation
    v = jnp.abs(jax.random.normal(jax.random.PRNGKey(10), (32, 64)))
    # inject ties
    v = v.at[:, 10].set(v[:, 20])
    piv, rank = argsort_desc(v)
    ref = jnp.argsort(-v, axis=-1, stable=True)
    assert np.array_equal(np.asarray(piv), np.asarray(ref))
    ipiv = invert_permutation(piv)
    assert np.array_equal(np.take_along_axis(np.asarray(piv),
                                             np.asarray(ipiv), -1),
                          np.broadcast_to(np.arange(64), (32, 64)))
    assert np.array_equal(np.asarray(rank), np.asarray(ipiv))


def test_udt_well_conditioned_contract():
    """CholeskyQR2 UDT (experimental stab_method="cholqr", retired r4): on its
    stated contract — well-conditioned W with explicit column grading D — it
    must reconstruct W·diag(D) with orthonormal U and unit-diagonal T. (Outside
    the contract, deep sm=1 stacks invert the D ordering and the unpivoted
    D_j/D_i fold in T overflows — measured drift 4.4e4 at sm=1, NaN at sm=10;
    see VALIDATION.md r4. The path stays flag-gated, not default anywhere.)
    """
    from montecarlo_tpu.ops.linalg import udt_well_conditioned
    rng = np.random.default_rng(7)
    n, b = 32, 4
    W = jnp.asarray(np.eye(n) + 0.3 * rng.normal(size=(b, n, n)),
                    jnp.float32)  # cond(W) ~ few
    D = jnp.asarray(np.exp(rng.uniform(-3, 3, size=(b, n))), jnp.float32)
    U, d, T, piv = udt_well_conditioned(W, D)
    WD = np.asarray(W) * np.asarray(D)[:, None, :]
    recon = np.einsum('bij,bj,bjk->bik', np.asarray(U), np.asarray(d),
                      np.asarray(T))
    scale = np.max(np.abs(WD))
    assert np.max(np.abs(recon - WD)) < 1e-5 * scale
    orth = np.einsum('bji,bjk->bik', np.asarray(U), np.asarray(U))
    assert np.max(np.abs(orth - np.eye(n))) < 1e-5
    diagT = np.diagonal(np.asarray(T), axis1=-2, axis2=-1)
    assert np.max(np.abs(diagT - 1.0)) < 1e-5
    assert np.array_equal(np.asarray(piv),
                          np.broadcast_to(np.arange(n), (b, n)))
