"""Classical MC / Ising end-to-end tests.

Replaces the reference's seeded golden-value runs (test/integration_tests.jl:1-26,
tied to Julia's RNG stream) with exact-enumeration oracles and fresh
statistical tolerances, per SURVEY §4.
"""

import itertools

import numpy as np
import pytest

from montecarlo_tpu import MC, IsingModel, IsingTc, SquareLattice


def exact_ising_3x3(beta):
    """Exact thermal averages on periodic 3x3 by enumeration (512 states)."""
    lat = SquareLattice(3)
    bonds = lat.bonds[:, :2]
    Es, Ms = [], []
    for bits in itertools.product([-1, 1], repeat=9):
        s = np.array(bits)
        E = -np.sum(s[bonds[:, 0]] * s[bonds[:, 1]])
        Es.append(E)
        Ms.append(abs(s.sum()))
    Es, Ms = np.array(Es), np.array(Ms)
    w = np.exp(-beta * (Es - Es.min()))
    Z = w.sum()
    return (Es * w).sum() / Z, (Ms * w).sum() / Z


@pytest.mark.parametrize("beta", [0.3, 0.5])
def test_ising_vs_exact_enumeration(beta):
    model = IsingModel(dims=2, L=3)
    mc = MC(model, beta=beta, n_chains=64, seed=42, sweeps=800,
            thermalization=200)
    assert mc.run(verbose=False)
    E_exact, M_exact = exact_ising_3x3(beta)
    obs = mc.observables()
    E = obs["Energy"]["E"]
    M = obs["Magn"]["M"]
    assert abs(E.mean - E_exact) < max(4 * E.std_error, 0.05)
    assert abs(M.mean - M_exact) < max(4 * M.std_error, 0.05)


def test_ising_8x8_near_reference_golden():
    """8x8, beta=0.35: reference golden means <m>=0.398, <e>=-0.924
    (test/integration_tests.jl:1-26). Fresh RNG -> statistical tolerance."""
    model = IsingModel(dims=2, L=8)
    mc = MC(model, beta=0.35, n_chains=64, seed=7, sweeps=700,
            thermalization=300)
    assert mc.run(verbose=False)
    obs = mc.observables()
    m = obs["Magn"]["m"].mean
    e = obs["Energy"]["e"].mean
    assert abs(e - (-0.924)) < 0.025
    assert abs(m - 0.398) < 0.06


def test_wolff_accelerates_near_tc():
    """Wolff global moves must run and keep the answer consistent near Tc."""
    model = IsingModel(dims=2, L=8)
    beta = 1.0 / IsingTc
    mc = MC(model, beta=beta, n_chains=32, seed=3, sweeps=250,
            thermalization=100, global_moves=True, global_rate=2)
    assert mc.run(verbose=False)
    assert mc.analysis.acc_global > 0  # clusters actually flipped
    m = mc.observables()["Magn"]["m"].mean
    # near-critical 8x8 magnetization ~ 0.55 (finite-size); generous window
    assert 0.3 < m < 0.8


def test_energy_magnetization_consistency():
    """E from incremental bookkeeping equals direct recomputation."""
    model = IsingModel(dims=2, L=4)
    mc = MC(model, beta=0.4, n_chains=8, seed=1, sweeps=100, thermalization=0)
    assert mc.run(verbose=False)
    energy_fn = model.make_energy_fn()
    E = np.asarray(energy_fn(mc.conf))
    bonds = model.lattice.bonds[:, :2]
    conf = np.asarray(mc.conf)
    E_ref = -np.sum(conf[:, bonds[:, 0]] * conf[:, bonds[:, 1]], axis=1)
    assert np.array_equal(E, E_ref)
