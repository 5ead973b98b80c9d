"""custom_measurement: user kernels x lattice iterators vs loop oracles and
the shipped observables (reference: the generic Measurement constructor,
src/flavors/DQMC/measurements/generic.jl:21-41)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import montecarlo_tpu as mc
from montecarlo_tpu import (custom_measurement, selection_matrices,
                            EachSite, EachSitePair, EachSitePairByDistance,
                            EachLocalQuadByDistance, CombinedGreensIterator,
                            Greens)
from montecarlo_tpu.measurements import dqmc_measurements as dm


def _sim(lattice_kw=None, **kw):
    lattice_kw = dict(lattice_kw or dict(dims=2, L=4))
    if lattice_kw.pop("lattice", None) == "triangular":
        lattice_kw = dict(l=mc.TriangularLattice(lattice_kw["L"]))
    model = mc.HubbardModelAttractive(**lattice_kw, U=4.0)
    args = dict(beta=1.0, delta_tau=0.1, n_chains=4, seed=11, sweeps=10,
                thermalization=5, measure_rate=2)
    args.update(kw)
    return mc.DQMC(model, **args), model


def test_custom_by_distance_matches_shipped_cdc_triangular():
    sim, model = _sim(dict(lattice="triangular", L=3))
    sim["cdc_ref"] = dm.charge_density_correlation(sim, model)
    sim["cdc_custom"] = custom_measurement(
        sim, model, dm.cdc_matrix, name="cdc",
        lattice_iterator=EachSitePairByDistance())
    sim.run(verbose=False)
    obs = sim.observables()
    a = np.asarray(obs["cdc_ref"]["cdc"].mean)
    b = np.asarray(obs["cdc_custom"]["cdc"].mean)
    assert np.allclose(a, b, atol=1e-12)


def test_custom_by_distance_vs_loop_oracle():
    """A hand-written kernel run through custom_measurement must equal an
    explicit python loop over all (src, trg) pairs binned by direction,
    applied to the same measured Green's functions (triangular lattice)."""
    def kernel(G):                       # an arbitrary Wick-style matrix
        Gu = G[0]
        return Gu * Gu.T + 0.5 * Gu

    sim, model = _sim(dict(lattice="triangular", L=3))
    sim["k"] = custom_measurement(sim, model, kernel, name="k")
    sim["greens"] = dm.greens_measurement(sim, model)
    sim.run(verbose=False)
    obs = sim.observables()
    got = np.asarray(obs["k"]["k"].per_chain_mean)     # (C, n_dirs)

    lat = model.lattice
    N = len(lat)
    pd = np.asarray(lat.pair_dir)
    # binning is linear, the kernel is not: rebuild the oracle from the same
    # per-measurement G would need raw samples — instead verify on the
    # measured-mean G of each chain with a SINGLE measurement so the binner
    # mean of the kernel equals the kernel of the stored G samples. Use the
    # one-measurement trick: sweeps low, measure_rate high -> 1 sample.
    sim2, model2 = _sim(dict(lattice="triangular", L=3), sweeps=2,
                        thermalization=5, measure_rate=2)
    sim2["k"] = custom_measurement(sim2, model2, kernel, name="k")
    sim2["greens"] = dm.greens_measurement(sim2, model2)
    sim2.run(verbose=False)
    o2 = sim2.observables()
    G = np.asarray(o2["greens"]["greens"].per_chain_mean)  # (C, F, N, N)
    want = np.asarray(o2["k"]["k"].per_chain_mean)
    for c in range(G.shape[0]):
        Gu = G[c, 0]
        K = Gu * Gu.T + 0.5 * Gu
        oracle = np.zeros(lat.n_dirs)
        for s in range(N):
            for t in range(N):
                oracle[pd[s, t]] += K[s, t]
        oracle /= N
        assert np.allclose(want[c], oracle, atol=1e-9)
    assert got.shape[-1] == lat.n_dirs


def test_custom_quad_matches_shipped_pc():
    sim, model = _sim()
    K = 3
    S_np = selection_matrices(model.lattice, K)

    def pc_kernel(G):
        Gu, Gd = G[0], G[-1]
        S = jnp.asarray(S_np, Gu.dtype)
        B = jnp.einsum("kab,bc->kac", S, Gd)
        C = jnp.einsum("kac,qbc->kqab", B, S)
        return Gu[None, None] * C

    sim["pc_ref"] = dm.pairing_correlation(sim, model, K=K)
    sim["pc_custom"] = custom_measurement(
        sim, model, pc_kernel, name="pc",
        lattice_iterator=EachLocalQuadByDistance(K))
    sim.run(verbose=False)
    obs = sim.observables()
    a = np.asarray(obs["pc_ref"]["pc"].mean)
    b = np.asarray(obs["pc_custom"]["pc"].mean)
    assert np.allclose(a, b, atol=1e-12)


def test_custom_combined_matches_shipped_cds():
    sim, model = _sim()
    sim["cds_ref"] = dm.charge_density_susceptibility(sim, model)
    sim["cds_custom"] = custom_measurement(
        sim, model, dm.cdc4_matrix, name="cds",
        greens_iterator=CombinedGreensIterator,
        lattice_iterator=EachSitePairByDistance())
    sim.run(verbose=False)
    obs = sim.observables()
    a = np.asarray(obs["cds_ref"]["cds"].mean)
    b = np.asarray(obs["cds_custom"]["cds"].mean)
    assert np.allclose(a, b, atol=1e-10)


def test_custom_each_site():
    sim, model = _sim()

    def occ_kernel(G):
        return 1.0 - jnp.diagonal(G[0])

    sim["occ_ref"] = dm.occupation(sim, model)
    sim["occ_custom"] = custom_measurement(
        sim, model, occ_kernel, name="n", lattice_iterator=EachSite())
    sim.run(verbose=False)
    obs = sim.observables()
    a = np.asarray(obs["occ_ref"]["occ"].mean)[0]     # up block
    b = np.asarray(obs["occ_custom"]["n"].mean)
    assert np.allclose(a, b, atol=1e-12)


def test_custom_each_site_pair_normalization():
    sim, model = _sim()

    def g_kernel(G):
        return G[0]

    sim["gp"] = custom_measurement(sim, model, g_kernel, name="gp",
                                   lattice_iterator=EachSitePair())
    sim.run(verbose=False)
    v = np.asarray(sim.observables()["gp"]["gp"].mean)
    N = len(model.lattice)
    assert v.shape == (N, N)


def test_custom_classical_mc_measurement_binder():
    """A user-defined classical-MC measurement (Binder cumulant) via the
    generic Measurement bundle (reference: AbstractMeasurement subtyping +
    measure!/finish!, src/Measurements.jl:6-56). measure_fn sees the batched
    configuration; finish_fn derives U4 from the binned moments. Deep in the
    ferromagnetic phase U4 -> 2/3."""
    from montecarlo_tpu.measurements import Measurement

    model = mc.IsingModel(dims=2, L=8)
    sim = mc.MC(model, beta=1.0, n_chains=32, seed=4, sweeps=120,
                thermalization=60)

    def measure(conf, **_):
        m = jnp.abs(jnp.mean(conf.reshape(conf.shape[0], -1).astype(
            jnp.float64), axis=1))
        return {"m2": m ** 2, "m4": m ** 4}

    def finish(stats, _context):
        m2 = np.mean(stats["m2"].per_chain_mean)
        m4 = np.mean(stats["m4"].per_chain_mean)
        return {"U4": float(1.0 - m4 / (3.0 * m2 ** 2))}

    sim["binder"] = Measurement(name="binder",
                                obs_shapes={"m2": (), "m4": ()},
                                measure_fn=measure, finish_fn=finish)
    sim.run(verbose=False)
    obs = sim.observables()
    u4 = obs["binder"]["U4"]
    assert abs(u4 - 2.0 / 3.0) < 0.015, u4
