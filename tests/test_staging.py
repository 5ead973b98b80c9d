"""Thermalization- vs measurement-stage registries
(reference: TH/ME staging, src/Measurements.jl:265-367)."""

import numpy as np

from montecarlo_tpu import MC, DQMC, IsingModel, HubbardModelAttractive
from montecarlo_tpu.measurements.ising import IsingEnergyMeasurement
from montecarlo_tpu.measurements import dqmc_measurements as dm


def test_mc_thermalization_stage():
    model = IsingModel(dims=2, L=4)
    mc = MC(model, beta=0.5, n_chains=4, seed=0, sweeps=40, thermalization=20)
    mc.thermalization_measurements.add(
        "E_th", IsingEnergyMeasurement(mc, model), mc.n_chains)
    assert mc.run(verbose=False, chunk=10)
    th = mc.observables("TH")["E_th"]["E"]
    me = mc.observables("ME")["Energy"]["E"]
    assert th.count == 20       # one push per thermalization sweep
    assert me.count == 40       # one per measurement sweep
    # thermalization energies start hotter (random init) than equilibrated
    assert np.isfinite(th.mean) and np.isfinite(me.mean)


def test_dqmc_measure_rate_counts():
    model = HubbardModelAttractive(dims=2, L=2, U=2.0)
    mc = DQMC(model, beta=1.0, n_chains=4, seed=1, sweeps=20,
              thermalization=10, measure_rate=4, print_rate=10 ** 9)
    assert mc.run(verbose=False, chunk=10)
    occ = mc.observables()["occ"]["occ"]
    # sweeps 11..30, measured when sweep % 4 == 0 -> 12,16,20,24,28
    assert occ.count == 5


def test_delitem_and_reset():
    model = HubbardModelAttractive(dims=2, L=2, U=2.0)
    mc = DQMC(model, beta=1.0, n_chains=2, seed=2, sweeps=6,
              thermalization=0, measure_rate=2, print_rate=10 ** 9)
    del mc["greens"]
    assert "greens" not in mc.measurements.measurements
    assert mc.run(verbose=False, chunk=6)
    assert mc.observables()["occ"]["occ"].count == 3
    mc.reset()
    assert mc.observables()["occ"]["occ"].count == 0
    assert mc.last_sweep == 0
