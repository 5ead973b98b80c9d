"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): DQMC sweeps/sec on 8x8 attractive Hubbard, beta=10,
256 chains. One sweep = a full [down;up] pass over all 100 imaginary-time
slices (2*M*N = 12,800 Metropolis site updates + UDT-stabilized propagation),
matching the reference's sweep definition (run! loop, DQMC.jl:420-436).

vs_baseline: the reference (ffreyer/MonteCarlo.jl) publishes no numbers and
Julia is not available in this image; the baseline is an estimate of the
reference's single-core CPU throughput for this config: ~0.6 GFLOP/sweep of
small-matrix f64 work at ~12 GFLOP/s effective (LoopVectorization @avx on
64x64 kernels) ≈ 20 sweeps/sec aggregate. Recorded as BASELINE_EST_SWEEPS_PER_S.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

BASELINE_EST_SWEEPS_PER_S = 20.0

N_CHAINS = int(os.environ.get("BENCH_CHAINS", "256"))
L = int(os.environ.get("BENCH_L", "8"))
BETA = float(os.environ.get("BENCH_BETA", "10.0"))
SWEEPS = int(os.environ.get("BENCH_SWEEPS", "8"))
DTYPE = os.environ.get("BENCH_DTYPE", "float64")


def main():
    from montecarlo_tpu import DQMC, HubbardModelAttractive

    model = HubbardModelAttractive(dims=2, L=L, U=4.0, mu=0.0)
    mc = DQMC(model, beta=BETA, safe_mult=10, n_chains=N_CHAINS, seed=0,
              dtype=jnp.dtype(DTYPE), thermalization=0, sweeps=SWEEPS,
              measure_rate=10 ** 9, print_rate=10 ** 9, measurements={})

    # warmup / compile
    mc.run(sweeps=1, verbose=False, chunk=1)
    t0 = time.time()
    mc.run(sweeps=1 + SWEEPS, verbose=False, chunk=max(1, SWEEPS // 2))
    dt = time.time() - t0
    sweeps_per_s = N_CHAINS * SWEEPS / dt

    # correctness guard: stabilized propagation must stay clean
    prop_err = mc.analysis.propagation_error.max
    ok = prop_err < (1e-6 if DTYPE == "float64" else 1e-1)

    print(json.dumps({
        "metric": f"DQMC sweeps/sec ({L}x{L} Hubbard, beta={BETA}, "
                  f"{N_CHAINS} chains)",
        "value": round(sweeps_per_s, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / BASELINE_EST_SWEEPS_PER_S, 3),
        "dtype": DTYPE,
        "chains": N_CHAINS,
        "ms_per_sweep_batch": round(1e3 * dt / SWEEPS, 3),
        "propagation_error_max": float(prop_err),
        "propagation_ok": bool(ok),
        "baseline_estimate_note": "reference CPU single-core estimate, "
                                  "20 sweeps/s (no published numbers)",
    }))


if __name__ == "__main__":
    main()
