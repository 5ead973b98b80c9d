"""Generic measurement engine.

TPU-native counterpart of the reference's measurement layer
(src/Measurements.jl:6-508): a measurement is a named bundle of

* a jittable ``measure_fn(context) -> {obs_name: per-chain value}``,
* one LogBinner state per observable (batched over chains),
* an optional ``finish_fn`` computing derived observables from binner
  statistics at the end of a run (reference: `finish!`,
  src/Measurements.jl:46-56).

Measurements are staged as thermalization-stage vs measurement-stage dicts
exactly like the reference (src/Measurements.jl:265-367); ``mc[key]`` sugar is
provided by the flavor drivers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.binner import LogBinner


@dataclass
class Measurement:
    """One measurement: jittable kernel + per-observable logarithmic binners.

    obs_shapes maps observable name -> per-chain shape (without the chain axis).
    measure_fn(context) must return {name: array of shape (C, *obs_shape)}.
    finish_fn(stats: {name: ObservableResult}, context) -> {name: value} may
    derive additional observables (e.g. specific heat from E and E2).
    """

    name: str
    obs_shapes: Dict[str, Tuple[int, ...]]
    measure_fn: Callable[..., Dict[str, jnp.ndarray]]
    finish_fn: Optional[Callable] = None
    dtype: Any = jnp.float64
    # Greens requirement (reference: Greens / GreensAt{k,l} /
    # CombinedGreensIterator markers, src/flavors/DQMC/measurements/
    # generic.jl:108-150, used by generate_groups to share Green's
    # computations between measurements):
    #   "equal"      measure_fn(greens=G_phys, conf=conf)
    #   "greens_at"  measure_fn(utg=G(k,l)_phys, greens=..., conf=...)
    #   "combined"   measure_fn is a STEP function
    #                (G00, G0l, Gl0, Gll) -> {name: contribution}; the driver
    #                sums it over l = 1..M and multiplies by delta_tau
    kind: str = "equal"
    greens_at: Optional[Tuple[int, int]] = None
    # Combined (susceptibility) fast path: when set, the driver carries RAW
    # kernel-matrix accumulators of these shapes (in the Green's-function
    # dtype) through the l-scan and applies ``combined_finish_fn(acc)`` ONCE
    # after the scan to reduce them to obs_shapes — moving the direction
    # binning out of the τ-loop (M× fewer binning contractions; the binning
    # itself is a one-hot matmul on the MXU). When None, measure_fn's
    # contributions are summed directly into float64 obs_shapes accumulators.
    combined_acc_shapes: Optional[Dict[str, Tuple[int, ...]]] = None
    combined_finish_fn: Optional[Callable] = None
    # filled at bind time
    binners: Dict[str, LogBinner] = field(default_factory=dict)

    def bind(self, n_chains: int):
        """Create binner factories and empty states for a chain batch."""
        self.binners = {
            k: LogBinner(shape=shape, dtype=self.dtype)
            for k, shape in self.obs_shapes.items()
        }
        states = {}
        for k, b in self.binners.items():
            # jit the construction: EAGER creation of complex arrays is
            # unimplemented on some TPU runtimes (compiled creation works)
            states[k] = jax.jit(
                jax.vmap(lambda _: b.empty_state()))(jnp.arange(n_chains))
        return states

    def push(self, states, values):
        """Push one batch of per-chain observable values (jittable)."""
        out = {}
        for k, b in self.binners.items():
            out[k] = jax.vmap(b.push)(states[k], values[k])
        return out


class ObservableResult:
    """Host-side statistics view of one observable's binner state
    (reference: stat forwarding mean/var/std_error/tau,
    src/Measurements.jl:87-114)."""

    def __init__(self, state):
        self._state = state

    # All statistics are HOST numpy: the device->host transfer happens once
    # in LogBinner._normalized via utils.host.to_host (complex binner states
    # cannot be fetched as complex buffers on some TPU runtimes).

    @property
    def per_chain_mean(self):
        return LogBinner.mean(self._state)

    @property
    def mean(self):
        return LogBinner.combined_mean(self._state)

    @property
    def std_error(self):
        return LogBinner.combined_std_error(self._state)

    @property
    def per_chain_std_error(self):
        return LogBinner.std_error(self._state)

    @property
    def var(self):
        return LogBinner.var(self._state)

    @property
    def tau(self):
        """Per-component integrated autocorrelation time, per chain — the full
        array, as the reference forwards it (src/Measurements.jl:87-114)."""
        return LogBinner.tau(self._state)

    @property
    def max_tau(self):
        """Scalar summary: the worst component's tau."""
        t = self.tau
        return float(np.max(t)) if np.ndim(t) else float(t)

    @property
    def count(self):
        return LogBinner.count(self._state)

    def __repr__(self):
        m = self.mean
        if np.ndim(m) == 0:
            return f"{float(m):.6g} ± {float(self.std_error):.2g} (n={self.count})"
        return f"<ObservableResult shape={np.shape(m)} n={self.count}>"


class MeasurementRegistry:
    """Named measurements + their device-side binner states for one stage."""

    def __init__(self):
        self.measurements: Dict[str, Measurement] = {}
        self.states: Dict[str, Dict] = {}

    def add(self, key: str, meas: Measurement, n_chains: int):
        self.measurements[key] = meas
        self.states[key] = meas.bind(n_chains)

    def remove(self, key: str):
        self.measurements.pop(key, None)
        self.states.pop(key, None)

    def restore_states(self, saved: Dict, what: str = ""):
        """Load checkpointed binner states. Warns loudly for saved keys with
        no matching measurement definition instead of silently dropping them
        (reference restores the complete tree, src/Measurements.jl:519-592)."""
        import warnings
        for k, st in saved.items():
            if k in self.states:
                # jit the device upload: EAGER creation/conversion of complex
                # arrays is unimplemented on some TPU runtimes (mirror of the
                # jitted construction in Measurement.bind)
                self.states[k] = jax.jit(
                    lambda t: jax.tree_util.tree_map(jnp.asarray, t))(st)
            else:
                warnings.warn(
                    f"checkpoint carries {what} state for measurement {k!r} "
                    "but the rebuilt simulation has no such measurement — its "
                    "accumulated data is dropped. Re-add the measurement via "
                    "mc[key] = ... before load_state/resume to keep it.")

    def keys(self):
        return self.measurements.keys()

    def __contains__(self, key):
        return key in self.measurements

    def __getitem__(self, key) -> Dict[str, ObservableResult]:
        meas = self.measurements[key]
        states = self.states[key]
        return {k: ObservableResult(states[k]) for k in meas.obs_shapes}

    def observables(self, context=None) -> Dict[str, Dict[str, Any]]:
        """All observable results, with finish_fn-derived values included
        (reference: observables(mc), src/Measurements.jl:303-367)."""
        out = {}
        for key, meas in self.measurements.items():
            stats = self[key]
            if meas.finish_fn is not None:
                stats = dict(stats)
                stats.update(meas.finish_fn(stats, context))
            out[key] = stats
        return out
