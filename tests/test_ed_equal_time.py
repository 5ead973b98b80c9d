"""DQMC vs exact diagonalization — equal-time observables.

Port of the reference's central correctness gate (test/ED/ED_tests.jl:91-363):
2x2 repulsive and attractive Hubbard at beta=1, dtau=0.1, all equal-time
observables within the Trotter tolerance atol = rtol = 2*dtau^2 = 0.02.
"""

import numpy as np
import pytest

from montecarlo_tpu import (
    DQMC, HubbardModelAttractive, HubbardModelRepulsive, SquareLattice,
)
from montecarlo_tpu.measurements import dqmc_measurements as dm

from ed_oracle import EDSolution

ATOL = 2 * 0.1 ** 2  # 2*dtau^2


def _run_dqmc(model, seed=21):
    mc = DQMC(model, beta=1.0, delta_tau=0.1, safe_mult=5, n_chains=32,
              seed=seed, thermalization=300, sweeps=1500, measure_rate=3,
              print_rate=10 ** 9, measurements={})
    mc.measurements.add("G", dm.greens_measurement(mc, model), mc.n_chains)
    mc.measurements.add("occ", dm.occupation(mc, model), mc.n_chains)
    mc.measurements.add("CDC", dm.charge_density_correlation(mc, model), mc.n_chains)
    for d in ("x", "y", "z"):
        mc.measurements.add(f"M{d}", dm.magnetization(mc, model, d), mc.n_chains)
        mc.measurements.add(f"SDC{d}", dm.spin_density_correlation(mc, model, d),
                            mc.n_chains)
    mc.measurements.add("PC", dm.pairing_correlation(mc, model, K=4), mc.n_chains)
    assert mc.run(verbose=False)
    assert mc.analysis.propagation_error.count == 0
    return mc


def _check(name, dqmc_val, ed_val, atol=ATOL):
    err = np.max(np.abs(np.asarray(dqmc_val) - np.asarray(ed_val)))
    assert err < atol, (f"{name}: max|dqmc-ed| = {err:.4f} > {atol}\n"
                        f"dqmc={np.round(np.asarray(dqmc_val), 4)}\n"
                        f"ed={np.round(np.asarray(ed_val), 4)}")


@pytest.mark.slow
@pytest.mark.parametrize("which", ["attractive", "repulsive"])
def test_dqmc_vs_ed_equal_time(which):
    if which == "attractive":
        model = HubbardModelAttractive(dims=2, L=2, U=1.0, mu=1.0, t=1.0)
        ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=1.0, attractive=True)
    else:
        model = HubbardModelRepulsive(dims=2, L=2, U=1.0, t=1.0)
        ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=0.0, attractive=False)

    mc = _run_dqmc(model)
    obs = mc.observables()
    beta = 1.0

    # Greens (up block)
    G_dqmc = obs["G"]["greens"].mean  # (F, N, N)
    _check("greens_up", G_dqmc[0], ed.greens_spin(beta, 0, 0))
    if model.nflavors == 2:
        _check("greens_dn", G_dqmc[1], ed.greens_spin(beta, 1, 1))

    # Occupation
    occ = obs["occ"]["occ"].mean  # (F, N)
    n_up = 1.0 - np.diag(ed.greens_spin(beta, 0, 0))
    _check("occupation_up", occ[0], n_up)
    if model.nflavors == 2:
        n_dn = 1.0 - np.diag(ed.greens_spin(beta, 1, 1))
        _check("occupation_dn", occ[1], n_dn)

    # Charge density correlation
    _check("CDC", obs["CDC"]["cdc"].mean, ed.cdc_by_distance(beta))

    # Magnetizations
    for d in ("x", "y", "z"):
        _check(f"M{d}", obs[f"M{d}"][f"m_{d}"].mean, ed.magnetization(beta, d))

    # Spin density correlations
    for d in ("x", "y", "z"):
        _check(f"SDC{d}", obs[f"SDC{d}"][f"sdc_{d}"].mean,
               ed.sdc_by_distance(beta, d))

    # Pairing correlation
    _check("PC", obs["PC"]["pc"].mean, ed.pc_by_distance(beta, K=4))
