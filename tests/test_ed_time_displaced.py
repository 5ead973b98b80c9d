"""DQMC vs exact diagonalization — time-displaced observables.

Port of the unequal-time half of the reference's ED gate
(test/ED/ED_tests.jl:252-363): unequal-time Green's functions at several
(k, l) pairs, plus charge/spin/pairing/current-current susceptibilities,
within the Trotter tolerance 2*dtau^2 = 0.02.
"""

import numpy as np
import pytest

from montecarlo_tpu import DQMC, HubbardModelAttractive, HubbardModelRepulsive
from montecarlo_tpu.measurements import dqmc_measurements as dm

from ed_oracle import EDSolution

DTAU = 0.1
ATOL = 2 * DTAU ** 2

# (k, l) pairs as in the reference (l2s, l1s at ED_tests.jl:119-120)
KL_PAIRS = [(1, 0), (7, 3), (5, 5), (2, 7), (1, 3), (10, 0)]


def _run_dqmc(model, seed=33):
    mc = DQMC(model, beta=1.0, delta_tau=DTAU, safe_mult=5, n_chains=32,
              seed=seed, thermalization=300, sweeps=1500, measure_rate=3,
              print_rate=10 ** 9, measurements={})
    C = mc.n_chains
    for i, (k, l) in enumerate(KL_PAIRS):
        mc.measurements.add(f"UTG{i}", dm.greens_measurement(
            mc, model, greens_at=(k, l)), C)
    mc.measurements.add("CDS", dm.charge_density_susceptibility(mc, model), C)
    for d in ("x", "y", "z"):
        mc.measurements.add(f"SDS{d}", dm.spin_density_susceptibility(
            mc, model, d), C)
    mc.measurements.add("PS", dm.pairing_susceptibility(mc, model, K=4), C)
    mc.measurements.add("CCS", dm.current_current_susceptibility(
        mc, model, K=4), C)
    assert mc.run(verbose=False)
    return mc


def _check(name, dqmc_val, ed_val, atol=ATOL):
    err = np.max(np.abs(np.asarray(dqmc_val) - np.asarray(ed_val)))
    assert err < atol, (f"{name}: max|dqmc-ed| = {err:.4f} > {atol}\n"
                        f"dqmc={np.round(np.asarray(dqmc_val), 4)}\n"
                        f"ed={np.round(np.asarray(ed_val), 4)}")


@pytest.mark.slow
@pytest.mark.parametrize("which", ["attractive", "repulsive"])
def test_dqmc_vs_ed_time_displaced(which):
    if which == "attractive":
        model = HubbardModelAttractive(dims=2, L=2, U=1.0, mu=1.0, t=1.0)
        ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=1.0, attractive=True)
    else:
        model = HubbardModelRepulsive(dims=2, L=2, U=1.0, t=1.0)
        ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=0.0, attractive=False)

    mc = _run_dqmc(model)
    obs = mc.observables()
    beta = 1.0

    for i, (k, l) in enumerate(KL_PAIRS):
        utg = obs[f"UTG{i}"]["greens"].mean  # (F, N, N)
        ed_utg = ed.utg_spin(beta, k * DTAU, l * DTAU, 0, 0)
        _check(f"UTG(k={k},l={l}) up", utg[0], ed_utg)
        if model.nflavors == 2:
            ed_utg_d = ed.utg_spin(beta, k * DTAU, l * DTAU, 1, 1)
            _check(f"UTG(k={k},l={l}) dn", utg[1], ed_utg_d)

    _check("CDS", obs["CDS"]["cds"].mean, ed.cds_by_distance(beta, DTAU))
    for d in ("x", "y", "z"):
        _check(f"SDS{d}", obs[f"SDS{d}"][f"sds_{d}"].mean,
               ed.sds_by_distance(beta, DTAU, d))
    _check("PS", obs["PS"]["ps"].mean, ed.ps_by_distance(beta, DTAU, K=4))
    T = model.hopping_matrix()
    _check("CCS", obs["CCS"]["ccs"].mean,
           ed.ccs_by_distance(beta, DTAU, K=4, T=T))
