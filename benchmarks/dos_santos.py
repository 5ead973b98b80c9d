"""Literature cross-check: attractive Hubbard on a triangular lattice vs
dos Santos, PRB 48, 3976 (reference: commented-out test,
test/integration_tests.jl:272-334).

L=4 triangular, U=4, t=1, beta=5, dtau=0.125: occupation (2*<n_sigma>) and
s-wave pairing correlation vs the paper's figures for a range of mu.
Run on TPU (f32 + per-slice stabilization):  python benchmarks/dos_santos.py
"""

import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from montecarlo_tpu import DQMC, HubbardModelAttractive, TriangularLattice  # noqa: E402
from montecarlo_tpu.measurements import dqmc_measurements as dm  # noqa: E402

# (mu, literature occupation, literature s-wave PC)
POINTS = [(-2.0, 0.12, 1.0), (-1.2, 0.48, 1.50), (0.0, 0.88, 0.95),
          (1.2, 1.25, 1.55), (2.0, 2.00, 0.0)]


def main():
    for mu, lit_oc, lit_pc in POINTS:
        model = HubbardModelAttractive(l=TriangularLattice(4), t=1.0, U=4.0,
                                       mu=mu)
        mc = DQMC(model, beta=5.0, delta_tau=0.125, safe_mult=1, n_chains=64,
                  seed=1, dtype=jnp.float32, thermalization=400, sweeps=1000,
                  measure_rate=2, print_rate=10 ** 9, measurements={})
        mc["occ"] = dm.occupation(mc, model)
        mc["PC"] = dm.pairing_correlation(mc, model, K=7)
        t0 = time.time()
        mc.run(verbose=False, chunk=200)
        obs = mc.observables()
        occ = 2.0 * float(np.mean(obs["occ"]["occ"].mean))
        occ_err = 2.0 * float(np.mean(obs["occ"]["occ"].std_error))
        pc = obs["PC"]["pc"].mean
        swave = float(np.sum(pc[:, 0, 0]))
        swave_err = float(np.sqrt(np.sum(obs["PC"]["pc"].std_error[:, 0, 0] ** 2)))
        print(f"mu={mu:+.1f}: occ={occ:.3f}±{occ_err:.3f} (lit {lit_oc})  "
              f"s-wave PC={swave:.3f}±{swave_err:.3f} (lit {lit_pc})  "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
