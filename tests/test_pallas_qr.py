"""Batched Householder QR kernel vs jnp.linalg.qr (interpret mode on CPU).

Validates the fused kernel (ops/pallas_qr.py) on random and graded inputs:
Q orthonormality, reconstruction QR = A, R triangularity, and udt_dirty-level
equivalence of the full decomposition contract U·diag(D)·R[piv] = A.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_tpu.ops import pallas_qr
from montecarlo_tpu.ops.linalg import udt_dirty, scatter_columns


@pytest.fixture(autouse=True)
def _force_kernel():
    old = pallas_qr.ENABLED
    pallas_qr.ENABLED = True
    yield
    pallas_qr.ENABLED = old


def _check_qr(A, rtol=2e-5):
    Q, R = pallas_qr.qr_lanes()(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A)), axis=(-2, -1),
                                   keepdims=True))
    np.testing.assert_allclose(np.asarray(Q @ R) / scale,
                               np.asarray(A) / scale, atol=rtol * n)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q - eye)
    assert np.max(np.abs(ortho)) < rtol * n, np.max(np.abs(ortho))
    lower = np.tril(np.asarray(R), -1)
    assert np.max(np.abs(lower) / scale[..., 0, 0, None, None]) < 1e-6


def test_qr_random_batch():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (16, 16, 16), jnp.float32)
    _check_qr(A)


def _check_qr_mxu(A, rtol=2e-5):
    Q, R = pallas_qr.qr_lanes_mxu()(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A)), axis=(-2, -1),
                                   keepdims=True))
    np.testing.assert_allclose(np.asarray(Q @ R) / scale,
                               np.asarray(A) / scale, atol=rtol * n)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q - eye)
    assert np.max(np.abs(ortho)) < rtol * n, np.max(np.abs(ortho))
    lower = np.tril(np.asarray(R), -1)
    assert np.max(np.abs(lower) / scale[..., 0, 0, None, None]) < 1e-6


def test_qr_mxu_recursive_t_merge(monkeypatch):
    """The recursive-T merge path (T([B1 B2]) block formula): production
    runs it at KB=64 from four KB0=16 base panels, which the N=16/32 tests
    never reach (single base panel there). Exercise the identical merge loop
    cheaply at N=16 with KB=16 built from two KB0=8 base panels."""
    assert pallas_qr.MXU_QR_KB == 64 and pallas_qr.MXU_QR_KB0 == 16
    monkeypatch.setattr(pallas_qr, "MXU_QR_KB", 16)
    monkeypatch.setattr(pallas_qr, "MXU_QR_KB0", 8)
    key = jax.random.PRNGKey(7)
    A = jax.random.normal(key, (3, 16, 16), jnp.float32)
    _check_qr_mxu(A)


def test_qr_mxu_random_batch():
    """Blocked MXU QR (N > 128 dispatch) on random input, incl. a batch
    that is not a chain-block multiple (identity padding path)."""
    key = jax.random.PRNGKey(4)
    A = jax.random.normal(key, (5, 32, 32), jnp.float32)
    _check_qr_mxu(A)


def test_qr_mxu_graded_columns():
    key = jax.random.PRNGKey(5)
    A = jax.random.normal(key, (4, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(12.0, -12.0, 32))[None, None, :]
         ).astype(jnp.float32)
    _check_qr_mxu(A)


def test_qr_mxu_matches_lanes_kernel():
    """Same input through both kernels: decompositions agree up to f32
    rounding (same Householder conventions)."""
    key = jax.random.PRNGKey(6)
    A = jax.random.normal(key, (3, 16, 16), jnp.float32)
    Q1, R1 = pallas_qr.qr_lanes()(A)
    Q2, R2 = pallas_qr.qr_lanes_mxu()(A)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-4)


def test_qr_graded_columns():
    """DQMC-like input: strongly graded column norms (descending, as after
    udt_dirty's pivot sort)."""
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (8, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(12.0, -12.0, 32))[None, None, :]).astype(jnp.float32)
    _check_qr(A)


def test_qr_already_triangular():
    """Zero tails → tau = 0 → H = I (LAPACK convention); kernel must not NaN."""
    key = jax.random.PRNGKey(2)
    R0 = jnp.triu(jax.random.normal(key, (8, 16, 16), jnp.float32))
    Q, R = pallas_qr.qr_lanes()(R0)
    assert np.all(np.isfinite(np.asarray(Q)))
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(R0), atol=1e-4)


def test_qr_under_vmap_folds_batch():
    key = jax.random.PRNGKey(3)
    A = jax.random.normal(key, (8, 2, 16, 16), jnp.float32)
    qr = pallas_qr.qr_lanes()
    Qv, Rv = jax.jit(jax.vmap(qr))(A)
    Qd, Rd = jax.jit(qr)(A.reshape(16, 16, 16))
    np.testing.assert_allclose(np.asarray(Qv).reshape(16, 16, 16),
                               np.asarray(Qd), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Rv).reshape(16, 16, 16),
                               np.asarray(Rd), atol=1e-6)


@pytest.mark.parametrize("N", [24,
                                pytest.param(72, marks=pytest.mark.slow),
                                pytest.param(88, marks=pytest.mark.slow)])
def test_qr_blocked_n_not_multiple_of_16(N):
    """The blocked kernel's row-chunked apply must not index past the ref for
    N % 16 != 0 (e.g. 72 sites = 6x6 honeycomb); CH falls back to 8. N=24
    exercises the same ragged-tail indexing cheaply and stays in the fast
    tier; the realistic sizes (72/88, minutes under the CPU interpreter) are
    slow-marked."""
    key = jax.random.PRNGKey(11)
    A = jax.random.normal(key, (8, N, N), jnp.float32)
    Q, R = jax.jit(lambda A: pallas_qr._qr_batched(A, panel=8))(A)
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A),
                               atol=2e-5 * N)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q - jnp.eye(N))
    assert np.max(np.abs(ortho)) < 2e-5 * N


def test_lane_block_rule():
    """Lane blocks must be 128-multiples or the full batch (Mosaic block
    constraint) — 192 must NOT pick 64."""
    from montecarlo_tpu.ops.pallas_util import pick_lane_block
    assert pick_lane_block(256) == 256
    assert pick_lane_block(128) == 128
    assert pick_lane_block(192) == 192
    assert pick_lane_block(96) == 96
    assert pick_lane_block(512) == 256
    # odd batch through the kernel end-to-end
    key = jax.random.PRNGKey(12)
    A = jax.random.normal(key, (24, 16, 16), jnp.float32)
    Q, R = jax.jit(lambda A: pallas_qr._qr_batched(A))(A)
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(A), atol=3e-4)


def test_qr_large_batch_chunking():
    """Batches beyond 256 are split into 256-chain pallas calls (one call's
    in+out arrays exceed the scoped-VMEM budget on device); the chunked
    result must equal the single-call result exactly."""
    key = jax.random.PRNGKey(9)
    A = jax.random.normal(key, (512, 8, 8), jnp.float32)
    qr = pallas_qr.qr_lanes()
    Q, R = jax.jit(qr)(A)
    Q0, R0 = jax.jit(lambda A: pallas_qr._qr_batched(A))(A[:256])
    np.testing.assert_array_equal(np.asarray(Q[:256]), np.asarray(Q0))
    np.testing.assert_array_equal(np.asarray(R[:256]), np.asarray(R0))
    Q1, R1 = jax.jit(lambda A: pallas_qr._qr_batched(A))(A[256:])
    np.testing.assert_array_equal(np.asarray(Q[256:]), np.asarray(Q1))


@pytest.mark.parametrize("panel", [4,
                                   pytest.param(8, marks=pytest.mark.slow),
                                   pytest.param(16, marks=pytest.mark.slow)])
def test_qr_blocked_panels(panel):
    """Blocked-WY panel kernel (one grid step = `panel` columns) must satisfy
    the same QR contract as the per-column kernel, on graded DQMC-like input."""
    key = jax.random.PRNGKey(7)
    A = jax.random.normal(key, (8, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(8.0, -8.0, 32))[None, None, :]).astype(jnp.float32)
    Q, R = jax.jit(lambda A: pallas_qr._qr_batched(A, panel=panel))(A)
    n = A.shape[-1]
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A))))
    np.testing.assert_allclose(np.asarray(Q @ R) / scale,
                               np.asarray(A) / scale, atol=2e-5 * n)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q - jnp.eye(n))
    assert np.max(np.abs(ortho)) < 2e-5 * n
    assert np.max(np.abs(np.tril(np.asarray(R), -1))) / scale < 1e-6
    # agreement with the per-column kernel (same Householder signs)
    Q1, R1 = jax.jit(lambda A: pallas_qr._qr_batched(A, panel=1))(A)
    np.testing.assert_allclose(np.asarray(Q), np.asarray(Q1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(R) / scale, np.asarray(R1) / scale,
                               atol=2e-4)


def test_udt_dirty_contract_with_kernel():
    """U·diag(D)·R with A[..., :, piv] = U D R, against the XLA-QR result of
    the same contract (decompositions differ by column signs only through Q/R
    pairing — compare reconstructions, D, and |R|)."""
    key = jax.random.PRNGKey(4)
    A = jax.random.normal(key, (8, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(8.0, -8.0, 32))[None, None, :]).astype(jnp.float32)
    U, D, R, piv = jax.jit(udt_dirty)(A)
    recon = (U * D[..., None, :]) @ scatter_columns(R, piv)
    scale = np.max(np.abs(np.asarray(A)))
    np.testing.assert_allclose(np.asarray(recon) / scale,
                               np.asarray(A) / scale, atol=3e-5)
    pallas_qr.ENABLED = False
    U2, D2, R2, piv2 = jax.jit(udt_dirty)(A)
    np.testing.assert_allclose(np.asarray(piv), np.asarray(piv2))
    np.testing.assert_allclose(np.asarray(D), np.asarray(D2), rtol=2e-4)
    np.testing.assert_allclose(np.abs(np.asarray(R)), np.abs(np.asarray(R2)),
                               atol=2e-4)


def _check_qr_cx(A, rtol=3e-5):
    Q, R = pallas_qr.qr_lanes_cx()(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A)), axis=(-2, -1),
                                   keepdims=True))
    np.testing.assert_allclose(np.asarray(Q @ R) / scale,
                               np.asarray(A) / scale, atol=rtol * n)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2).conj() @ Q - eye)
    assert np.max(np.abs(ortho)) < rtol * n, np.max(np.abs(ortho))
    lower = np.tril(np.asarray(R), -1)
    assert np.max(np.abs(lower) / scale[..., 0, 0, None, None]) < 1e-6


def test_qr_complex_random_batch():
    key = jax.random.PRNGKey(7)
    kr, ki = jax.random.split(key)
    A = (jax.random.normal(kr, (8, 16, 16), jnp.float32)
         + 1j * jax.random.normal(ki, (8, 16, 16), jnp.float32)
         ).astype(jnp.complex64)
    _check_qr_cx(A)


def test_qr_complex_graded_columns():
    key = jax.random.PRNGKey(8)
    kr, ki = jax.random.split(key)
    A = (jax.random.normal(kr, (4, 32, 32), jnp.float32)
         + 1j * jax.random.normal(ki, (4, 32, 32), jnp.float32))
    A = (A * jnp.exp(jnp.linspace(10.0, -10.0, 32))[None, None, :]
         ).astype(jnp.complex64)
    _check_qr_cx(A)


def test_qr_complex_zero_imag_matches_real_kernel():
    """A real matrix pushed through the complex kernel must reproduce the
    real kernel's Householder choices exactly (phase = sign for real alpha)."""
    key = jax.random.PRNGKey(9)
    Ar = jax.random.normal(key, (4, 16, 16), jnp.float32)
    Q, R = pallas_qr.qr_lanes()(Ar)
    Qc, Rc = pallas_qr.qr_lanes_cx()(Ar.astype(jnp.complex64))
    assert np.max(np.abs(np.asarray(Qc) - np.asarray(Q))) < 2e-6
    assert np.max(np.abs(np.asarray(Rc) - np.asarray(R))) < 2e-5


def test_udt_dirty_complex_contract_with_kernel():
    """udt_dirty on complex64 input through maybe_qr (kernel forced on):
    reconstruction + D positivity + unit-magnitude dirty diagonal."""
    key = jax.random.PRNGKey(10)
    kr, ki = jax.random.split(key)
    A = (jax.random.normal(kr, (4, 16, 16), jnp.float32)
         + 1j * jax.random.normal(ki, (4, 16, 16), jnp.float32))
    A = (A * jnp.exp(jnp.linspace(6.0, -6.0, 16))[None, None, :]
         ).astype(jnp.complex64)
    U, D, R, piv = jax.jit(udt_dirty)(A)
    recon = (U * D[..., None, :]) @ scatter_columns(R, piv)
    scale = np.max(np.abs(np.asarray(A)))
    np.testing.assert_allclose(np.asarray(recon) / scale,
                               np.asarray(A) / scale, atol=5e-5)
    assert np.all(np.asarray(D) > 0)
    dd = np.abs(np.diagonal(np.asarray(R), axis1=-2, axis2=-1))
    np.testing.assert_allclose(dd, 1.0, atol=1e-4)


def _check_qr_wy(A, rtol=2e-5):
    Q, R = pallas_qr.qr_lanes_wy()(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A)), axis=(-2, -1),
                                   keepdims=True))
    np.testing.assert_allclose(np.asarray(Q @ R) / scale,
                               np.asarray(A) / scale, atol=rtol * n)
    ortho = np.asarray(jnp.swapaxes(Q, -1, -2) @ Q - eye)
    assert np.max(np.abs(ortho)) < rtol * n, np.max(np.abs(ortho))
    lower = np.tril(np.asarray(R), -1)
    assert np.max(np.abs(lower) / scale[..., 0, 0, None, None]) < 1e-6


def test_qr_wy_random_batch():
    """V+tau kernel + outside MXU WY assembly (per-column path, N<=64)."""
    key = jax.random.PRNGKey(13)
    A = jax.random.normal(key, (16, 16, 16), jnp.float32)
    _check_qr_wy(A)


def test_qr_wy_graded_columns():
    key = jax.random.PRNGKey(14)
    A = jax.random.normal(key, (8, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(12.0, -12.0, 32))[None, None, :]
         ).astype(jnp.float32)
    _check_qr_wy(A)


def test_qr_wy_blocked_panel():
    """The blocked V+tau kernel (panel > 1, the N > 64 route) against the
    per-column in-kernel-Q result: same Householder conventions, so Q and R
    agree up to f32 rounding."""
    key = jax.random.PRNGKey(15)
    A = jax.random.normal(key, (8, 32, 32), jnp.float32)
    A = (A * jnp.exp(jnp.linspace(8.0, -8.0, 32))[None, None, :]
         ).astype(jnp.float32)
    Qw, Rw = jax.jit(lambda A: pallas_qr._qr_batched_vtau(A, panel=8))(A)
    Q1, R1 = jax.jit(lambda A: pallas_qr._qr_batched(A, panel=1))(A)
    np.testing.assert_allclose(np.asarray(Qw), np.asarray(Q1), atol=2e-4)
    scale = np.maximum(1.0, np.max(np.abs(np.asarray(A))))
    np.testing.assert_allclose(np.asarray(Rw) / scale,
                               np.asarray(R1) / scale, atol=2e-4)


def test_qr_wy_zero_tail_tau_zero():
    """tau = 0 columns (already-triangular input) must drop out of the WY
    assembly exactly (v = 0, S row = e_j) — no NaN, H = I semantics."""
    key = jax.random.PRNGKey(16)
    R0 = jnp.triu(jax.random.normal(key, (8, 16, 16), jnp.float32))
    Q, R = pallas_qr.qr_lanes_wy()(R0)
    assert np.all(np.isfinite(np.asarray(Q)))
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(R0), atol=1e-4)


def test_qr_wy_matches_inkernel_q():
    """Same reflectors either way: the outside-assembled Q equals the
    in-kernel accumulated Q up to f32 rounding."""
    key = jax.random.PRNGKey(17)
    A = jax.random.normal(key, (8, 16, 16), jnp.float32)
    Qw, Rw = pallas_qr.qr_lanes_wy()(A)
    Q, R = pallas_qr.qr_lanes()(A)
    np.testing.assert_allclose(np.asarray(Qw), np.asarray(Q), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Rw), np.asarray(R), atol=2e-5)


# ---------------------------------------------------------------------------
# fused UDT kernels (QR + postscale [+ solve], ops/pallas_qr.py)
# ---------------------------------------------------------------------------

def _graded(key, B, N, decades=16):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (B, N, N), jnp.float32)
    grade = jnp.exp(jax.random.uniform(k2, (B, N), minval=-decades,
                                       maxval=decades))
    # keep f32 under the x64 test config — the fused kernels are f32-only
    return (A * grade[:, None, :]).astype(jnp.float32)


def test_fused_udt_matches_reference_path(monkeypatch):
    """udt_dirty through the fused kernel must match the unfused XLA
    postscale path bit-for-bit in interpret mode (same fp ops)."""
    from montecarlo_tpu.ops import linalg
    # (3, 32): the fused/unfused comparison is shape-generic (same fp ops
    # either way) and interpret-mode cost scales ~B*N^3 — (6, 64) spent 14 s
    # of the fast tier on identical coverage
    A = _graded(jax.random.PRNGKey(3), 3, 32)
    monkeypatch.setenv("MC_TPU_FUSED_UDT", "0")
    Q0, d0, R0, p0 = linalg.udt_dirty(A)
    monkeypatch.setenv("MC_TPU_FUSED_UDT", "1")
    Q1, d1, R1, p1 = linalg.udt_dirty(A)
    assert bool(jnp.all(p0 == p1))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Q1), np.asarray(Q0), atol=1e-5)
    # full decomposition contract on the fused outputs
    rec = (Q1 * d1[:, None, :]) @ R1
    Ap = jnp.take_along_axis(A, p1[:, None, :], axis=-1)
    scale = np.max(np.abs(np.asarray(Ap)))
    np.testing.assert_allclose(np.asarray(rec) / scale,
                               np.asarray(Ap) / scale, atol=2e-5)


def test_fused_udt_flushed_mode_unit_diag(monkeypatch):
    """Rank-deficient input: flushed modes must get the exact +1 diagonal
    (udt_dirty's fix) through the fused kernel too."""
    from montecarlo_tpu.ops import linalg
    monkeypatch.setenv("MC_TPU_FUSED_UDT", "1")
    A = _graded(jax.random.PRNGKey(4), 2, 16, decades=2)
    A = A.at[:, :, -4:].set(0.0)                  # 4 exactly-zero columns
    Q, d, R, piv = linalg.udt_dirty(A)
    diag = np.asarray(jnp.diagonal(R, axis1=-2, axis2=-1))
    np.testing.assert_allclose(np.abs(diag), 1.0, rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(R)))
    assert np.all(np.asarray(d) > 0)


def test_fused_greens_solve_matches_reference(monkeypatch):
    """calculate_greens via the fused UDT+solve kernel vs the trisolve
    path, on strongly graded UDT factors."""
    from montecarlo_tpu.ops import linalg
    key = jax.random.PRNGKey(5)
    # shape-generic comparison; (4, 64) cost 26 s of interpret time for the
    # same coverage (still multi-panel at N=32: panels are 16 columns)
    B, N = 2, 32

    def rand_udt(k, decades):
        k1, k2, k3 = jax.random.split(k, 3)
        Q, _ = jnp.linalg.qr(jax.random.normal(k1, (B, N, N), jnp.float32))
        D = jnp.sort(jnp.exp(jax.random.uniform(
            k2, (B, N), minval=-decades, maxval=decades)), axis=-1)[:, ::-1]
        T = jnp.triu(0.3 * jax.random.normal(k3, (B, N, N), jnp.float32))
        eye = jnp.eye(N, dtype=jnp.float32)
        T = T - jnp.triu(T) * eye + eye
        return Q.astype(jnp.float32), D.astype(jnp.float32), T

    k1, k2 = jax.random.split(key)
    Ul, Dl, Tl = rand_udt(k1, 20)
    Ur, Dr, Tr = rand_udt(k2, 20)
    monkeypatch.setenv("MC_TPU_FUSED_UDT", "0")
    G0 = linalg.calculate_greens(Ul, Dl, Tl, Ur, Dr, Tr)
    monkeypatch.setenv("MC_TPU_FUSED_UDT", "1")
    G1 = linalg.calculate_greens(Ul, Dl, Tl, Ur, Dr, Tr)
    scale = float(jnp.max(jnp.abs(G0)))
    np.testing.assert_allclose(np.asarray(G1) / scale,
                               np.asarray(G0) / scale, atol=3e-6)
    # the _inv variant with unitary factors must agree exactly with plain
    G2 = linalg.calculate_greens_inv(jnp.swapaxes(Ul, -1, -2), Dl, Tl,
                                     jnp.swapaxes(Ur, -1, -2), Dr, Tr)
    np.testing.assert_allclose(np.asarray(G2) / scale,
                               np.asarray(G1) / scale, atol=3e-6)


def test_permute_rows_identity():
    from montecarlo_tpu.ops import linalg
    key = jax.random.PRNGKey(6)
    A = _graded(key, 2, 16, decades=6)
    Q, d, R, piv = linalg.udt_dirty(A)
    T = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16), jnp.float32)
    lhs = linalg.scatter_columns(R, piv) @ T
    rhs = R @ linalg.permute_rows(T, piv)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-5)


# ---------------------------------------------------------------------------
# double-float (df32) Householder QR (ops/pallas_qr.py::_qr_df_kernel)
# ---------------------------------------------------------------------------

def test_df_qr_strict_f64_contract():
    """Q orthonormal / QR = A / R triangular to double-float (~2^-49)
    accuracy on a graded, 2^50-prescaled f64 input — the exact operand
    class udt_dirty feeds the strict-f64 stabilization path (reference f64
    Householder UDT: src/linalg/UDT.jl:62-123)."""
    from montecarlo_tpu.ops import pallas_qr
    N = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    A = jax.random.normal(k1, (3, N, N), jnp.float64)
    grade = jnp.exp(jax.random.uniform(k2, (3, N), minval=-18.0,
                                       maxval=18.0))
    A = A * grade[:, None, :]
    mx = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    A = A / jnp.exp2(jnp.ceil(jnp.log2(mx)) - 50.0)
    Q, R = pallas_qr.qr_lanes_df()(A)
    I = jnp.eye(N, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(jnp.swapaxes(Q, -1, -2) @ Q - I))) < 1e-13
    assert float(jnp.max(jnp.abs(Q @ R - A)) / jnp.max(jnp.abs(A))) < 1e-12
    assert float(jnp.max(jnp.abs(jnp.tril(R, -1)))
                 / jnp.max(jnp.abs(R))) < 1e-13
    # R diagonal magnitudes must match the native f64 QR
    Rr = jnp.linalg.qr(A)[1]
    dref = np.sort(np.abs(np.asarray(
        jnp.diagonal(Rr, axis1=-2, axis2=-1))), axis=-1)
    dgot = np.sort(np.abs(np.asarray(
        jnp.diagonal(R, axis1=-2, axis2=-1))), axis=-1)
    np.testing.assert_allclose(dgot, dref, rtol=1e-11)


def test_df_qr_zero_tail_column():
    """Already-triangular input: H = I convention (tau = 0) must hold and
    the factorization must stay exact."""
    from montecarlo_tpu.ops import pallas_qr
    N = 8
    R0 = jnp.triu(jax.random.normal(jax.random.PRNGKey(12), (2, N, N),
                                    jnp.float64))
    Q, R = pallas_qr.qr_lanes_df()(R0)
    I = jnp.eye(N, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(jnp.swapaxes(Q, -1, -2) @ Q - I))) < 1e-13
    np.testing.assert_allclose(np.asarray(Q @ R), np.asarray(R0),
                               atol=1e-13)


def test_df_udt_dirty_f64_on_tpu_shape():
    """udt_dirty's f64 path must keep its decomposition contract when the
    QR underneath is the df kernel (exercised here via a direct call — on
    CPU maybe_qr keeps native f64)."""
    from montecarlo_tpu.ops import linalg, pallas_qr
    N = 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    A = jax.random.normal(k1, (2, N, N), jnp.float64)
    grade = jnp.exp(jax.random.uniform(k2, (2, N), minval=-30.0,
                                       maxval=30.0))
    A = A * grade[:, None, :]
    # run udt_dirty with _qr patched to the df kernel (what TPU dispatch does)
    orig = linalg._qr
    try:
        linalg._qr = lambda M: pallas_qr.qr_lanes_df()(M)
        U, D, R, piv = linalg.udt_dirty(A)
    finally:
        linalg._qr = orig
    rec = (U * D[..., None, :]) @ R
    Ap = jnp.take_along_axis(A, piv[:, None, :], axis=-1)
    scale = float(jnp.max(jnp.abs(A)))
    np.testing.assert_allclose(np.asarray(rec) / scale,
                               np.asarray(Ap) / scale, atol=1e-12)
    I = jnp.eye(N, dtype=jnp.float64)
    assert float(jnp.max(jnp.abs(jnp.swapaxes(U, -1, -2) @ U - I))) < 1e-13
