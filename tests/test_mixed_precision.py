"""Mixed-precision DQMC (f32 hot path between f64 stabilizations).

The speed mode for TPUs without native f64: Green's-function wraps and rank-1
Metropolis updates run in float32 (G is O(1)-ranged), while UDT stacks and
boundary recomputations stay float64 and reset the f32 drift every safe_mult
slices. Validated here against the same exact-diagonalization gate as the
default mode (tolerance 2*dtau^2 — far above the f32 drift).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu import DQMC, HubbardModelAttractive
from montecarlo_tpu.measurements import dqmc_measurements as dm

from ed_oracle import EDSolution

ATOL = 2 * 0.1 ** 2


@pytest.mark.slow
def test_f32_sm1_vs_ed():
    """Full-float32 with per-slice stabilization (the TPU-native fast mode,
    bench default) passes the ED gate."""
    model = HubbardModelAttractive(dims=2, L=2, U=1.0, mu=1.0, t=1.0)
    ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=1.0, attractive=True)
    mc = DQMC(model, beta=1.0, delta_tau=0.1, safe_mult=1, n_chains=32,
              seed=13, dtype=jnp.float32,
              thermalization=300, sweeps=1500, measure_rate=3,
              print_rate=10 ** 9, measurements={})
    mc.measurements.add("G", dm.greens_measurement(mc, model), mc.n_chains)
    mc.measurements.add("CDC", dm.charge_density_correlation(mc, model),
                        mc.n_chains)
    assert mc.run(verbose=False)
    obs = mc.observables()
    G = obs["G"]["greens"].mean[0]
    assert np.max(np.abs(G - ed.greens_spin(1.0, 0, 0))) < ATOL
    assert np.max(np.abs(obs["CDC"]["cdc"].mean -
                         ed.cdc_by_distance(1.0))) < ATOL


@pytest.mark.slow
def test_mixed_precision_vs_ed():
    model = HubbardModelAttractive(dims=2, L=2, U=1.0, mu=1.0, t=1.0)
    ed = EDSolution(model.lattice, t=1.0, U=1.0, mu=1.0, attractive=True)
    mc = DQMC(model, beta=1.0, delta_tau=0.1, safe_mult=5, n_chains=32,
              seed=11, update_dtype=jnp.float32,
              thermalization=300, sweeps=1500, measure_rate=3,
              print_rate=10 ** 9, measurements={})
    mc.measurements.add("G", dm.greens_measurement(mc, model), mc.n_chains)
    mc.measurements.add("occ", dm.occupation(mc, model), mc.n_chains)
    mc.measurements.add("CDC", dm.charge_density_correlation(mc, model),
                        mc.n_chains)
    assert mc.run(verbose=False)

    obs = mc.observables()
    beta = 1.0
    G = obs["G"]["greens"].mean[0]
    err = np.max(np.abs(G - ed.greens_spin(beta, 0, 0)))
    assert err < ATOL, f"greens err {err}"
    occ = obs["occ"]["occ"].mean[0]
    n_exact = 1.0 - np.diag(ed.greens_spin(beta, 0, 0))
    assert np.max(np.abs(occ - n_exact)) < ATOL
    cdc_err = np.max(np.abs(obs["CDC"]["cdc"].mean - ed.cdc_by_distance(beta)))
    assert cdc_err < ATOL, f"cdc err {cdc_err}"


@pytest.mark.slow
def test_mixed_matches_f64_statistically():
    """Half-filled 4x4 at beta=5: mixed and f64 occupations agree within
    combined statistical error (and with the exact 0.5)."""
    def run(**kw):
        model = HubbardModelAttractive(dims=2, L=4, U=4.0, mu=0.0)
        mc = DQMC(model, beta=5.0, n_chains=8, seed=4, thermalization=50,
                  sweeps=200, measure_rate=2, print_rate=10 ** 9, **kw)
        assert mc.run(verbose=False, chunk=50)
        occ = mc.observables()["occ"]["occ"]
        return occ.mean.mean(), mc

    occ64, _ = run()
    occ32, mc32 = run(update_dtype=jnp.float32)
    assert abs(occ64 - 0.5) < 0.02
    assert abs(occ32 - 0.5) < 0.02
    assert abs(occ64 - occ32) < 0.02
    assert mc32.ctx.prop_err_threshold == 1.0
