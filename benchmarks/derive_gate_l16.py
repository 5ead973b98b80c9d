"""Standalone derivation of the bench's gate_l16 artifacts.

Runs the exact cross_sm_check bench.py's gate_l16 phase runs (L=16,
beta=BENCH_L16_GATE_BETA, candidate sm=10 vs the disk-cached sm=1 anchor,
32 chains, 200 sweeps) and writes BOTH persistent artifacts the driver's
budget-limited bench run depends on:

  * .jax_bench_cache/anchors/anchor_<key>.npz  (written by cross_sm_check)
  * .jax_bench_cache/gates/gate_l16.json       (the cached-result fallback)

Run this once per fresh machine (or after a kernel change that alters the
N=256 trajectories) so the driver's run can attach the gate result when the
live phase does not fit its budget. ~15-30 min cold.
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CACHE = os.path.join(_REPO, ".jax_bench_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, _REPO)


def main():
    print("devices:", jax.devices(), flush=True)
    from montecarlo_tpu.validation import (EQUAL_TIME_OBSERVABLES,
                                           cross_sm_check)
    gate_beta = float(os.environ.get("BENCH_L16_GATE_BETA", "2.0"))
    t0 = time.time()
    g = cross_sm_check(L=16, beta=gate_beta, dtype="float32", safe_mult=10,
                       use_pallas=True, n_chains=32, sweeps=200,
                       thermalization=60,
                       observables=EQUAL_TIME_OBSERVABLES)
    elapsed = time.time() - t0
    g.pop("_anchor_pool", None)
    fields = {k: g[k] for k in ("ok", "seeds", "anchor_cached", "z", "z_tol",
                                "candidate", "anchor") if k in g}
    fields["beta"] = gate_beta
    fields["derived_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    fields["derived_elapsed_s"] = round(elapsed, 1)
    path = os.path.join(_CACHE, "gates", "gate_l16.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(fields, f)
    print(f"gate_l16 ok={g['ok']} elapsed={elapsed:.1f}s -> {path}",
          flush=True)
    print(json.dumps({k: v for k, v in fields.items()
                      if k in ("ok", "z", "z_tol", "beta")}), flush=True)


if __name__ == "__main__":
    main()
