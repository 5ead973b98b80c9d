"""Pre-derive the cross-sm gate anchor pools used by bench.py.

The sm=1 anchor runs are the expensive half of every cross-safe_mult gate
(montecarlo_tpu/validation.py): drift-proof, so ~5-10x slower per sweep than
the shipped modes. They are ground truth for a FIXED protocol and therefore
disk-cached (.jax_bench_cache/anchors). This script derives any anchor that
is missing so a driver-budgeted bench run (bench.py, DEADLINE_S=1450) always
hits the cache — the L=16 gate in particular never landed in a driver
artifact while its anchor had to be derived in-run (VERDICT r4 weak #6).

Run on the real chip; obeys the same jax config as bench.py (x64 enabled,
shared persistent compile cache) so the compiled programs are reused too.

Usage: python benchmarks/derive_anchors.py [headline l16 complex]
"""

import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_cache_dir = os.environ.get("BENCH_CACHE_DIR",
                            os.path.join(_REPO, ".jax_bench_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

from montecarlo_tpu.validation import (  # noqa: E402
    DEFAULT_OBSERVABLES, EQUAL_TIME_OBSERVABLES, _anchor_cache_path,
    load_or_run_anchor)

L = int(os.environ.get("BENCH_L", "8"))
BETA = float(os.environ.get("BENCH_BETA", "10.0"))
USE_PALLAS = os.environ.get("BENCH_PALLAS", "1") == "1"

_BASE = dict(U=4.0, mu=0.0, dtype="float32", measure_rate=5,
             seeds=(123, 321))


def _complex_theta():
    # the SAME pure-gauge pattern as bench.py's gate_complex
    rng = np.random.default_rng(0)
    phis = rng.uniform(0.0, 2 * np.pi, L * L)
    return phis[:, None] - phis[None, :]


# protocol dicts must stay bit-identical to the cross_sm_check calls in
# bench.py main() — the anchor cache key hashes every field
ANCHORS = {
    "headline": dict(_BASE, L=L, beta=BETA, n_chains=64, sweeps=300,
                     thermalization=100, peierls=None,
                     observables=DEFAULT_OBSERVABLES),
    "complex": dict(_BASE, L=L, beta=BETA, n_chains=64, sweeps=300,
                    thermalization=100, peierls=_complex_theta(),
                    observables=DEFAULT_OBSERVABLES),
    "l16": dict(_BASE, L=16,
                beta=float(os.environ.get("BENCH_L16_GATE_BETA", "2.0")),
                n_chains=32, sweeps=200, thermalization=60, peierls=None,
                observables=EQUAL_TIME_OBSERVABLES),
}


def main():
    names = sys.argv[1:] or list(ANCHORS)
    for name in names:
        cfg = ANCHORS[name]
        key_cfg = dict(cfg, safe_mult=1, use_pallas=USE_PALLAS, version=1)
        path = _anchor_cache_path(key_cfg)
        if path and os.path.exists(path):
            print(f"{name}: cached at {path}", flush=True)
            continue
        print(f"{name}: deriving (sm=1, {cfg['sweeps']}+"
              f"{cfg['thermalization']} sweeps, "
              f"{len(cfg['seeds'])}x{cfg['n_chains']} chains)...", flush=True)
        t0 = time.time()
        out = load_or_run_anchor(key_cfg, safe_mult=1, use_pallas=USE_PALLAS,
                                 **cfg)
        print(f"{name}: derived in {time.time() - t0:.0f}s -> {path} "
              f"(acc={out['_acc']})", flush=True)


if __name__ == "__main__":
    main()
