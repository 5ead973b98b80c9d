"""Shared helpers for the chain-on-lanes Pallas kernels (pallas_qr,
pallas_site_sweep).

Mosaic block constraints on the lane (trailing) dimension: a block's lane
size must be a multiple of 128 OR equal to the full array dimension, and
blocks must tile the array exactly. On top of that, one pallas_call's whole
input+output arrays for chain batches beyond ~256 exceed the 16 MB
scoped-VMEM budget on v5e — larger batches are split into <=256-chain calls.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax.numpy as jnp

LANE_CHUNK = 256

# conservative scoped-VMEM budget for resident kernel blocks (vs the 16 MB
# v5e limit, leaving room for the small row/vector buffers)
VMEM_BUDGET = 13 * 2 ** 20


def pick_vmem_lane_chunk(per_lane_bytes: int,
                         budget: int = VMEM_BUDGET) -> int:
    """Chunk step for a lane-batched kernel whose resident VMEM scales as
    per_lane_bytes per lane: the largest of (256, 128) that fits the budget,
    else the largest 8-aligned count <= 128 that does (a full-array block of
    any size is legal when it is not a 128-multiple)."""
    for c in (256, 128):
        if c * per_lane_bytes <= budget:
            return c
    c = int(budget // per_lane_bytes)
    # power of two so the step divides the common 256/512-chain batches:
    # uniform chunks take the lax.map path (one chunk live at a time) instead
    # of ragged unrolled calls, whose operands XLA double-buffers in VMEM
    p = 8
    while p * 2 <= min(128, c):
        p *= 2
    return p


def pick_vmem_lane_block(B: int, per_lane_bytes: int,
                         budget: int = VMEM_BUDGET) -> int:
    """Lane BLOCK for an already-chunked batch B under the same budget: a
    128-multiple divisor of B if one fits, else the full batch (block ==
    array dim is always legal)."""
    for cb in (256, 128):
        if B % cb == 0 and cb * per_lane_bytes <= budget:
            return cb
    return B


def pick_lane_block(B: int) -> int:
    """Largest valid lane block for a batch of B chains: a 128-multiple
    divisor if one exists, else the full batch (block == array dim is always
    legal)."""
    for cb in (256, 128):
        if B % cb == 0:
            return cb
    return B


def map_lane_chunks_seq(fn, *args, step: int = LANE_CHUNK):
    """Like map_lane_chunks, but runs uniform chunks through a lax.map scan
    so only ONE chunk's pallas call is live at a time. With unrolled chunk
    calls XLA double-buffers adjacent kernels' operands in scoped VMEM —
    a kernel that fits at 2 chunks OOMs at 8 (measured on v5e at N=256,
    256 chains) — and the scan also compiles the kernel body once instead
    of per chunk. Falls back to the unrolled form for ragged batches."""
    import jax
    B = args[0].shape[0]
    if B <= step:
        return fn(*args)
    if B % step == 0:
        resh = tuple(a.reshape((B // step, step) + a.shape[1:]) for a in args)
        out = jax.lax.map(lambda xs: fn(*xs), resh)
        if isinstance(out, tuple):
            return tuple(o.reshape((-1,) + o.shape[2:]) for o in out)
        return out.reshape((-1,) + out.shape[2:])
    return map_lane_chunks(fn, *args, step=step)


# ---------------------------------------------------------------------------
# cross-process probe-result cache
# ---------------------------------------------------------------------------
#
# The kernel dispatchers pick their configuration (chain block, scratch
# layout, fallbacks) with AOT compile probes at production shapes, because
# Mosaic VMEM fit is only visible to the real compiler. Successful compiles
# land in jax's persistent compilation cache, but FAILED attempts are never
# cached by XLA — at N=256 a config search can burn minutes of failing
# Mosaic compiles in every fresh process (measured: the L=16 bench phase
# cost 471 s against a fully warm XLA cache, almost all of it re-probing).
# This layer persists the probe RESULTS themselves. Keyed by a namespace
# hash of (kernel sources, jax version, device platform+kind), so any code
# or hardware change invalidates the file wholesale; the value side holds
# bools / config tuples / None.

_PROBE_NS = None


def _probe_ns() -> str:
    global _PROBE_NS
    if _PROBE_NS is None:
        import jax
        h = hashlib.sha256()
        here = os.path.dirname(os.path.abspath(__file__))
        for fname in ("pallas_util.py", "pallas_qr.py",
                      "pallas_site_sweep.py"):
            try:
                with open(os.path.join(here, fname), "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(fname.encode())
        h.update(jax.__version__.encode())
        try:
            dev = jax.devices()[0]
            h.update(f"{dev.platform}:{dev.device_kind}".encode())
        except Exception:
            h.update(b"nodev")
        _PROBE_NS = h.hexdigest()[:16]
    return _PROBE_NS


def _probe_path():
    """Disk location for probe results, or None to stay in-process-only.
    Defaults alongside jax's persistent compilation cache (the probes are
    only worth persisting when the compiles themselves are); override the
    directory with MC_TPU_PROBE_CACHE_DIR, disable with ''. """
    import jax
    try:
        d = jax.config.jax_compilation_cache_dir
    except Exception:  # pragma: no cover - config attr always exists today
        d = None
    d = os.environ.get("MC_TPU_PROBE_CACHE_DIR", d or "")
    if not d:
        return None
    return os.path.join(d, f"mc_tpu_probes_{_probe_ns()}.json")


def cached_probe(mem_cache: dict, key, tag: str, compute):
    """Two-level probe memo: the per-process dict, then the disk file.
    `compute()` runs only when both miss; its result (bool, tuple, or None)
    is stored in both. Disk IO failures fall back to compute — the cache
    can only ever save time, never change behavior."""
    if key in mem_cache:
        return mem_cache[key]
    path = _probe_path()
    skey = f"{tag}:{key!r}"
    data = {}
    if path:
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            data = {}
        if skey in data:
            val = data[skey]
            val = tuple(val) if isinstance(val, list) else val
            mem_cache[key] = val
            return val
    val = compute()
    mem_cache[key] = val
    if path:
        try:
            # RE-READ before writing: compute() may itself have probed (a
            # dispatcher probe can trigger nested probes) and written this
            # file — writing the dict loaded at entry would clobber those
            # entries (observed: the colread probe's nested site_pair
            # result vanished from every run's probe file).
            try:
                with open(path) as f:
                    data = json.load(f)
            except Exception:
                data = {}
            data[skey] = list(val) if isinstance(val, tuple) else val
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(data, f, sort_keys=True)
            os.replace(tmp, path)
        except Exception:  # pragma: no cover - permissions/readonly fs
            pass
    return val


def map_lane_chunks(fn, *args, step: int = LANE_CHUNK):
    """Apply `fn` to <=step-sized chunks of the leading (chain) axis of every
    arg and concatenate the outputs (tuple-valued fns supported). Chunks need
    not divide the batch evenly."""
    B = args[0].shape[0]
    if B <= step:
        return fn(*args)
    parts = [fn(*(a[i:min(i + step, B)] for a in args))
             for i in range(0, B, step)]
    if isinstance(parts[0], tuple):
        return tuple(jnp.concatenate([p[k] for p in parts], axis=0)
                     for k in range(len(parts[0])))
    return jnp.concatenate(parts, axis=0)
