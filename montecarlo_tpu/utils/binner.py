"""Logarithmic binning analysis (LogBinner).

The reference delegates statistics to the external packages
MonteCarloObservable.jl / BinningAnalysis.jl (Project.toml deps; used e.g. at
src/flavors/DQMC/measurements/generic.jl:39 and src/Measurements.jl:87-114).
This is a native, jit-friendly reimplementation:

* fixed depth D of binning levels; level k holds means of 2^k consecutive
  samples,
* the state is a flat pytree of arrays with static shapes, so ``push`` can live
  inside ``jit``/``vmap``/``lax.scan`` (a per-chain batch axis is just a leading
  axis on the observable shape),
* mean / var / std_error / autocorrelation time tau are computed host-side from
  the final state.

The carry cascade ("two values at level k emit their mean to level k+1") is a
``lax.scan`` over levels with a (value, active) carry.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_DEPTH = 32


class LogBinner:
    """Factory/namespace for logarithmic binner state and operations.

    State layout (dict pytree):
      count:       (D,) int64    samples pushed into each level
      total:       (D, *shape)   running sum per level
      sumsq:       (D, *shape)   running sum of |x|^2 per level (real)
      pending:     (D, *shape)   carry slot per level
      has_pending: (D,) bool
    """

    def __init__(self, shape: Tuple[int, ...] = (), dtype=jnp.float64,
                 depth: int = DEFAULT_DEPTH):
        self.shape = tuple(shape)
        self.dtype = jnp.dtype(dtype)
        self.depth = int(depth)
        from .host import real_dtype as _rd
        self.real_dtype = _rd(dtype)

    # ------------------------------------------------------------------ state
    def empty_state(self):
        D = self.depth
        s = self.shape
        return {
            "count": jnp.zeros((D,), jnp.int64),
            "total": jnp.zeros((D,) + s, self.dtype),
            "sumsq": jnp.zeros((D,) + s, self.real_dtype),
            "pending": jnp.zeros((D,) + s, self.dtype),
            "has_pending": jnp.zeros((D,), jnp.bool_),
        }

    # ------------------------------------------------------------------- push
    def push(self, state, value):
        """Push one sample. Pure function, safe under jit/scan."""
        value = jnp.asarray(value, self.dtype)

        def level(carry, xs):
            val, active = carry
            count, total, sumsq, pending, has_pending = xs
            count = count + jnp.where(active, 1, 0)
            total = total + jnp.where(active, val, 0)
            sumsq = sumsq + jnp.where(active, jnp.abs(val) ** 2, 0)
            emit = active & has_pending
            new_val = jnp.where(emit, (pending + val) * 0.5, val)
            pending = jnp.where(active & ~has_pending, val, pending)
            has_pending = jnp.where(active, ~has_pending, has_pending)
            return (new_val, emit), (count, total, sumsq, pending, has_pending)

        (_, _), ys = jax.lax.scan(
            level,
            (value, jnp.asarray(True)),
            (state["count"], state["total"], state["sumsq"],
             state["pending"], state["has_pending"]),
        )
        count, total, sumsq, pending, has_pending = ys
        return {"count": count, "total": total, "sumsq": sumsq,
                "pending": pending, "has_pending": has_pending}

    # ------------------------------------------------------------ statistics
    # All host-side on materialized state. A vmapped push produces states with
    # leading batch axes BEFORE the level axis, i.e. count: (*B, D) and
    # total: (*B, D, *obs_shape); these are normalized to level-axis-first.

    @staticmethod
    def _normalized(state):
        from .host import to_host  # complex-safe device->host fetch
        count = to_host(state["count"])
        nb = count.ndim - 1  # number of leading batch axes
        counts = count.reshape(-1, count.shape[-1])[0]  # identical across batch
        total = np.moveaxis(to_host(state["total"]), nb, 0)
        sumsq = np.moveaxis(to_host(state["sumsq"]), nb, 0)
        return counts, total, sumsq

    @staticmethod
    def count(state, level: int = 0) -> int:
        counts, _, _ = LogBinner._normalized(state)
        return int(counts[level])

    @staticmethod
    def mean(state):
        counts, total, _ = LogBinner._normalized(state)
        if counts[0] == 0:
            return np.zeros_like(total[0])
        return total[0] / counts[0]

    @staticmethod
    def _level_stats(state):
        """Per-level (count, variance-of-level-samples, sq-std-error-of-mean)."""
        counts, total, sumsq = LogBinner._normalized(state)
        out = []
        for k in range(len(counts)):
            n = counts[k]
            if n < 2:
                out.append((int(n), None, None))
                continue
            m = total[k] / n
            var = (sumsq[k] / n - np.abs(m) ** 2) * n / (n - 1)
            var = np.maximum(var, 0.0)
            out.append((int(n), var, var / n))
        return out

    @staticmethod
    def var(state, level: int = 0):
        stats = LogBinner._level_stats(state)
        n, var, _ = stats[level]
        if var is None:
            _, total, _ = LogBinner._normalized(state)
            return np.zeros_like(total[0], dtype=float)
        return var

    @staticmethod
    def std_error(state, min_count: int = 32):
        """Std error of the mean from the binning plateau: the largest
        per-level error estimate among levels with >= min_count samples
        (conservative plateau detection, as in BinningAnalysis.jl)."""
        stats = LogBinner._level_stats(state)
        candidates = [se for (n, _, se) in stats if se is not None and n >= min_count]
        if not candidates:
            candidates = [se for (n, _, se) in stats if se is not None]
        if not candidates:
            _, total, _ = LogBinner._normalized(state)
            return np.zeros_like(total[0], dtype=float)
        return np.sqrt(np.max(np.stack(candidates, 0), axis=0))

    @staticmethod
    def tau(state, min_count: int = 32):
        """Integrated autocorrelation time estimate:
        tau = 0.5 * (2^k * var_k / var_0 - 1) at the plateau level."""
        stats = LogBinner._level_stats(state)
        n0, var0, _ = stats[0]
        if var0 is None:
            _, total, _ = LogBinner._normalized(state)
            return np.zeros_like(total[0], dtype=float)
        best = np.zeros_like(var0)
        for k, (n, var, se) in enumerate(stats):
            if var is None or n < min_count:
                continue
            tau_k = 0.5 * ((2.0 ** k) * var / np.where(var0 == 0, 1.0, var0) - 1.0)
            best = np.maximum(best, tau_k)
        return best

    # --------------------------------------------------- chain-axis reduction
    @staticmethod
    def combined_mean(state, chain_axis: int = 0):
        """Mean over samples and the chain batch axis."""
        m = LogBinner.mean(state)
        return np.mean(m, axis=chain_axis)

    @staticmethod
    def combined_std_error(state, chain_axis: int = 0, min_count: int = 32):
        """Std error of the chain-averaged mean: chains are independent, so
        se = sqrt(sum_c se_c^2) / C."""
        se = LogBinner.std_error(state, min_count)
        C = se.shape[chain_axis]
        return np.sqrt(np.sum(se ** 2, axis=chain_axis)) / C
