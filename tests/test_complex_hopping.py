"""Complex-Hamiltonian (Peierls-phase) DQMC, gated against ED.

The reference carries complex UDT paths and a `greenseltype` hook
(src/linalg/UDT.jl:316-469, src/flavors/DQMC/DQMC_optional.jl:7-40) without
shipping a complex model; here the capability is exercised end-to-end with an
attractive Hubbard chain carrying PURE-GAUGE Peierls phases θ_ij = φ_i - φ_j:
the Metropolis chain is then exactly the real model's (detratio depends only
on the gauge-invariant G_ii), while the Green's function acquires the phases
e^{i(φ_i - φ_j)} — a sharp check of the whole complex propagation/measurement
path against exact diagonalization with the same complex hopping matrix.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from montecarlo_tpu import DQMC, HubbardModelAttractive
from montecarlo_tpu.dqmc import core
from montecarlo_tpu.dqmc.parameters import DQMCParameters
from tests.ed_oracle import EDSolution


def _gauge_peierls(N, phis):
    th = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            th[i, j] = phis[i] - phis[j]
    return th


def test_make_context_promotes_to_complex():
    model = HubbardModelAttractive(dims=1, L=2, U=4.0, mu=0.1,
                                   peierls=_gauge_peierls(2, [0.0, 0.8]))
    assert model.greens_eltype == np.complex128
    params = DQMCParameters(beta=1.0, delta_tau=0.1)
    ctx, consts = core.make_context(model, params, dtype=jnp.float64)
    assert ctx.is_complex
    assert jnp.dtype(ctx.dtype) == jnp.complex128
    assert jnp.dtype(ctx.rdtype) == jnp.float64
    assert np.iscomplexobj(np.asarray(consts["eT2"]))
    # Hermiticity of the propagator: e^{-dtau T} is Hermitian
    eT2 = np.asarray(consts["eT2"])
    np.testing.assert_allclose(eT2, eT2.conj().T, atol=1e-14)


@pytest.mark.slow
def test_complex_greens_vs_ed():
    N = 2
    phis = [0.0, 0.8]
    model = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15,
                                   peierls=_gauge_peierls(N, phis))
    mc = DQMC(model, beta=1.0, delta_tau=0.1, n_chains=32, seed=11,
              sweeps=3000, thermalization=1000, measure_rate=5)
    mc.run(verbose=False)
    obs = mc.observables()
    occ = np.asarray(obs["occ"]["occ"].mean)                # (F, N) real
    occ_err = np.asarray(obs["occ"]["occ"].std_error)
    G = np.asarray(obs["greens"]["greens"].mean)            # (F, N, N) complex
    G_err = np.asarray(obs["greens"]["greens"].std_error)
    assert np.iscomplexobj(G)

    ed = EDSolution(model.lattice, U=4.0, mu=0.15, attractive=True,
                    T_mat=model.hopping_matrix())
    G_ed = ed.greens(1.0)
    occ_ed = ed.occupation(1.0)

    trotter = 2 * 0.1 ** 2
    assert np.all(np.abs(occ[0] - occ_ed) < trotter + 4 * occ_err[0] + 1e-3)
    diff = np.abs(G[0] - G_ed)
    tol = trotter + 4 * np.maximum(G_err[0], 1e-3)
    assert np.all(diff < tol), (diff, tol)
    # the off-diagonal phase must match ED's (= gauge phase e^{i(φ_0-φ_1)}
    # times the sign of the underlying real-model G_01)
    phase_pred = G_ed[0, 1] / abs(G_ed[0, 1])
    phase_meas = G[0][0, 1] / abs(G[0][0, 1])
    assert abs(phase_meas - phase_pred) < 0.1, (phase_meas, phase_pred)


def test_peierls_survives_checkpoint_roundtrip(tmp_path):
    """parameters() must persist the flux pattern: without it a checkpoint
    resumes as the flux-free REAL model with no error raised."""
    from montecarlo_tpu.io import checkpoint as cp
    N = 2
    th = _gauge_peierls(N, [0.0, 0.8])
    model = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15, peierls=th)
    mc = DQMC(model, beta=1.0, delta_tau=0.1, n_chains=4, seed=3,
              measurements={})
    mc.run(sweeps=2, thermalization=0, verbose=False)
    fn = str(tmp_path / "peierls.mcpkl")
    cp.save(fn, mc)
    mc2 = cp.load(fn)
    assert mc2.model.peierls is not None
    np.testing.assert_allclose(np.asarray(mc2.model.peierls), th)
    assert np.iscomplexobj(mc2.model.hopping_matrix())
    assert mc2.ctx.is_complex
    np.testing.assert_allclose(np.asarray(mc2.state["G"]),
                               np.asarray(mc.state["G"]))


def test_checkerboard_complex_gauge_covariance():
    """The checkerboard-assembled operator must transform covariantly under a
    pure gauge: cb(U T U†) == U·cb(T)·U† exactly (each 2×2 bond exponential
    is gauge-covariant). Guards against the silent imaginary-part drop when
    complex coefficients hit a real operator matrix."""
    from montecarlo_tpu.dqmc.checkerboard import assemble_dense_operator
    from montecarlo_tpu.models.hubbard import HubbardModelAttractive as H
    L = 4
    phis = np.linspace(0.0, 1.3, L)
    model_r = H(dims=1, L=L, U=4.0, mu=0.2)
    model_c = H(dims=1, L=L, U=4.0, mu=0.2, peierls=_gauge_peierls(L, phis))
    op_r, opinv_r = assemble_dense_operator(model_r.lattice,
                                            model_r.hopping_matrix(), 0.1)
    op_c, opinv_c = assemble_dense_operator(model_c.lattice,
                                            model_c.hopping_matrix(), 0.1)
    assert np.iscomplexobj(np.asarray(op_c))
    U = np.diag(np.exp(1j * phis))
    np.testing.assert_allclose(np.asarray(op_c), U @ np.asarray(op_r) @ U.conj().T,
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(op_c) @ np.asarray(opinv_c),
                               np.eye(L), atol=1e-13)


def test_complex_checkerboard_dqmc_matches_gauge_rotated_real():
    """Full DQMC with checkerboard=True and Peierls phases reproduces the
    gauge-rotated real checkerboard run exactly (same Markov chain)."""
    N = 2
    phis = [0.0, 0.8]
    kw = dict(beta=1.0, delta_tau=0.1, n_chains=4, seed=3, measurements={},
              checkerboard=True)
    mc_c = DQMC(HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15,
                                       peierls=_gauge_peierls(N, phis)), **kw)
    mc_r = DQMC(HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15), **kw)
    mc_c.run(sweeps=3, thermalization=0, verbose=False)
    mc_r.run(sweeps=3, thermalization=0, verbose=False)
    np.testing.assert_array_equal(np.asarray(mc_c.state["conf"]),
                                  np.asarray(mc_r.state["conf"]))
    U = np.diag(np.exp(1j * np.asarray(phis)))
    np.testing.assert_allclose(np.asarray(mc_c.state["G"]),
                               U @ np.asarray(mc_r.state["G"]) @ U.conj().T,
                               atol=1e-9)


def test_complex_sweep_runs_and_matches_gauge_rotated_real():
    """One sweep of the complex model must reproduce the gauge-rotated real
    model's Green's function exactly (same seed → same Markov chain, since
    pure-gauge detratios are identical)."""
    N = 2
    phis = [0.0, 0.8]
    model_c = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15,
                                     peierls=_gauge_peierls(N, phis))
    model_r = HubbardModelAttractive(dims=1, L=N, U=4.0, mu=0.15)
    mc_c = DQMC(model_c, beta=1.0, delta_tau=0.1, n_chains=4, seed=3,
                measurements={})
    mc_r = DQMC(model_r, beta=1.0, delta_tau=0.1, n_chains=4, seed=3,
                measurements={})
    mc_c.run(sweeps=3, thermalization=0, verbose=False)
    mc_r.run(sweeps=3, thermalization=0, verbose=False)
    np.testing.assert_array_equal(np.asarray(mc_c.state["conf"]),
                                  np.asarray(mc_r.state["conf"]))
    Gc = np.asarray(mc_c.state["G"])
    Gr = np.asarray(mc_r.state["G"])
    U = np.diag(np.exp(1j * np.asarray(phis)))
    np.testing.assert_allclose(Gc, U @ Gr @ U.conj().T, atol=1e-9)
