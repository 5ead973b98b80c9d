"""Checkerboard slice-matrix tests (reference: test/slice_matrices.jl:36-100)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu import (
    HubbardModelAttractive, SquareLattice, TriangularLattice, Honeycomb,
)
from montecarlo_tpu.dqmc import core, checkerboard as cbm
from montecarlo_tpu.dqmc.parameters import DQMCParameters


def _setup(lat):
    model = HubbardModelAttractive(l=lat, U=4.0, mu=0.3)
    params = DQMCParameters(beta=2.0, delta_tau=0.1)
    ctx, consts = core.make_context(model, params)
    cb = cbm.build_checkerboard(lat, model.hopping_matrix(), params.delta_tau)
    conf = model.rand_conf(jax.random.PRNGKey(0), 1, params.slices)[0]
    return model, params, ctx, consts, cb, conf


@pytest.mark.parametrize("lat", [SquareLattice(4), TriangularLattice(4), Honeycomb(2)])
def test_cb_vs_dense_trotter(lat):
    """B_cb agrees with the dense B = e^{-dtau T} e^{-dtau V} within the
    O(dtau^2) Trotter tolerance (reference gate: 2*dtau,
    test/slice_matrices.jl:86-100)."""
    model, params, ctx, consts, cb, conf = _setup(lat)
    sigma = conf[:, 0]
    B_cb = cbm.slice_matrix_cb(ctx, consts, cb, sigma)
    I = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype), (ctx.F, ctx.N, ctx.N))
    B_dense = core.mult_B_left(ctx, consts, sigma, I)
    assert np.max(np.abs(np.asarray(B_cb - B_dense))) < 2 * params.delta_tau


@pytest.mark.parametrize("lat", [SquareLattice(4), TriangularLattice(4)])
def test_cb_inverse_exact(lat):
    """B_cb^{-1} B_cb = I to machine precision (the group rotations invert
    exactly)."""
    model, params, ctx, consts, cb, conf = _setup(lat)
    sigma = conf[:, 0]
    I = jnp.broadcast_to(jnp.eye(ctx.N, dtype=ctx.dtype), (ctx.F, ctx.N, ctx.N))
    B = cbm.mult_B_left_cb(ctx, consts, cb, sigma, I)
    BinvB = cbm.mult_B_inv_left_cb(ctx, consts, cb, sigma, B)
    assert np.max(np.abs(np.asarray(BinvB) - np.asarray(I))) < 1e-12


def test_cb_left_right_consistent():
    """(B M) and (M B) built from row/column mixing agree with dense matmul
    against the assembled B_cb."""
    lat = SquareLattice(4)
    model, params, ctx, consts, cb, conf = _setup(lat)
    sigma = conf[:, 0]
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.normal(size=(ctx.F, ctx.N, ctx.N)))
    B = cbm.slice_matrix_cb(ctx, consts, cb, sigma)
    left = cbm.mult_B_left_cb(ctx, consts, cb, sigma, M)
    right = cbm.mult_B_right_cb(ctx, consts, cb, sigma, M)
    assert np.allclose(np.asarray(left), np.asarray(B @ M), atol=1e-12)
    assert np.allclose(np.asarray(right), np.asarray(M @ B), atol=1e-12)
    rightinv = cbm.mult_B_inv_right_cb(ctx, consts, cb, sigma, right)
    assert np.allclose(np.asarray(rightinv), np.asarray(M), atol=1e-10)


def test_triangular_hubbard_dqmc_runs():
    """DQMC on a non-square lattice (triangular attractive Hubbard, cf.
    BASELINE config 5) stays numerically self-consistent."""
    from montecarlo_tpu import DQMC
    lat = TriangularLattice(3)
    model = HubbardModelAttractive(l=lat, U=2.0, mu=0.0)
    mc = DQMC(model, beta=2.0, n_chains=4, seed=2, sweeps=20,
              thermalization=10, measure_rate=5, print_rate=10 ** 9)
    assert mc.run(verbose=False)
    assert mc.analysis.propagation_error.max < 1e-7
    occ = mc.observables()["occ"]["occ"].mean
    assert np.all((occ > 0.2) & (occ < 0.8))


def test_dqmc_checkerboard_option():
    """DQMC(checkerboard=True) threads the assembled checkerboard operator
    through the WHOLE propagation (reference: DQMC(checkerboard=true) via
    CBTrue multiplies, slice_matrices.jl:104-222 / stack.jl:185-235):
    B built by the core slice multiply must equal the factor-by-factor
    checkerboard product exactly, and the full simulation must stay
    physical (half filling at mu=0) within the 2*dtau Trotter envelope
    (reference gate: test/slice_matrices.jl:86-100)."""
    from functools import partial
    from montecarlo_tpu import DQMC
    from montecarlo_tpu.dqmc import core
    from montecarlo_tpu.dqmc.parameters import DQMCParameters

    # NOTE: L=2 periodic lattices have doubled bonds; both the reference's
    # checkerboard construction and ours apply the full summed hopping
    # element once per bond occurrence there, so use L>=3 (reference cb
    # tests do the same, test/slice_matrices.jl:86-100).
    lat = SquareLattice(4)
    model = HubbardModelAttractive(l=lat, U=4.0, mu=0.0)
    params = DQMCParameters(beta=1.0, safe_mult=5)
    ctx_cb, consts_cb = core.make_context(model, params, checkerboard=True)
    assert ctx_cb.checkerboard
    ctx_d, consts_d = core.make_context(model, params)
    cb = cbm.build_checkerboard(lat, np.asarray(consts_d["hopping"]),
                                params.delta_tau)
    conf = model.rand_conf(jax.random.PRNGKey(0), 1, params.slices)[0]
    sigma = conf[:, 0]
    I = jnp.broadcast_to(jnp.eye(ctx_cb.N, dtype=ctx_cb.dtype),
                         (ctx_cb.F, ctx_cb.N, ctx_cb.N))
    # core path with cb consts == factor-by-factor checkerboard product
    B_core = core.mult_B_left(ctx_cb, consts_cb, sigma, I)
    B_cb = cbm.slice_matrix_cb(ctx_d, consts_d, cb, sigma)
    assert np.allclose(np.asarray(B_core), np.asarray(B_cb), atol=1e-12)
    # dense vs checkerboard Trotter bound (reference 2*dtau gate)
    B_dense = core.mult_B_left(ctx_d, consts_d, sigma, I)
    assert np.max(np.abs(np.asarray(B_core) - np.asarray(B_dense))) \
        < 2 * params.delta_tau

    # end-to-end: half filling at mu=0 within Trotter+statistical tolerance
    mc = DQMC(model, beta=1.0, n_chains=16, seed=7, sweeps=120,
              thermalization=50, measure_rate=2, print_rate=10 ** 9,
              checkerboard=True)
    assert mc.run(verbose=False)
    assert mc.analysis.propagation_error.max < 1e-7
    occ = mc.observables()["occ"]["occ"].mean
    assert np.max(np.abs(occ - 0.5)) < 0.05


def test_checkerboard_checkpoint_roundtrip(tmp_path):
    from montecarlo_tpu import DQMC
    from montecarlo_tpu.io.checkpoint import save, load
    lat = SquareLattice(2)
    model = HubbardModelAttractive(l=lat, U=2.0, mu=0.0)
    mc = DQMC(model, beta=1.0, n_chains=4, seed=1, sweeps=10,
              thermalization=0, measure_rate=5, print_rate=10 ** 9,
              checkerboard=True)
    mc.run(verbose=False)
    fn = str(tmp_path / "cb.mctpu")
    save(fn, mc)
    mc2 = load(fn)
    assert mc2.ctx.checkerboard
    assert np.allclose(np.asarray(mc2.consts["eT2"]), np.asarray(mc.consts["eT2"]))