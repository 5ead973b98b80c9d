"""Populate the cross-process probe-result cache (pallas_util.cached_probe)
for every kernel/shape the bench touches, so no bench phase ever pays a
Mosaic config-search compile. Run once per kernel-source change; results
land in mc_tpu_probes_<ns>.json next to the XLA compilation cache.
"""
import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
sys.path.insert(0, _REPO)

from montecarlo_tpu.ops import pallas_qr as pq  # noqa: E402
from montecarlo_tpu.ops import pallas_site_sweep as ps  # noqa: E402


def probe(tag, fn, *args):
    t0 = time.time()
    try:
        out = fn(*args)
    except Exception as e:  # pragma: no cover - report, keep warming
        out = f"ERROR {e!r}"
    print(f"{tag:40s} -> {out}   ({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for N, F in ((64, 1), (64, 2), (256, 1)):
        probe(f"colread N={N} F={F}", ps._colread_ok, N, F)
        probe(f"site_pair N={N} F={F}", ps._pair_ok, N, F)
        probe(f"gt_scratch batched N={N} F={F}",
              ps._gt_scratch_ok, "batched", N, F)
        probe(f"sitemajor N={N} F={F}", ps._sitemajor_cfg, N, F)
        probe(f"sitemajor_delayed N={N} F={F}",
              ps._sitemajor_delayed_cfg, N, F)
        probe(f"wrap_fuse N={N} F={F}", ps.wrap_fuse_ok, N, F)
    # complex kernels (N=64 F=1 is the bench's complex operating point)
    probe("gt_scratch batched_cx N=64 F=1",
          ps._gt_scratch_ok, "batched_cx", 64, 1)
    probe("sitemajor_cx N=64 F=1", ps._sitemajor_cfg_cx, 64, 1)
    probe("cx_qr N=64", pq._cx_qr_ok, 64)
    # QR kernels
    for N in (64,):
        probe(f"fused_udt N={N}", pq.fused_udt_ok, N, "udt")
        probe(f"fused_udt_solve N={N}", pq.fused_udt_ok, N, "solve")
        probe(f"df_qr N={N}", pq.df_qr_ok, N)
    probe("mxu_qr N=256", pq._mxu_qr_ok, 256)
    print("done", flush=True)
