"""Classical Monte Carlo flavor (reference: src/flavors/MC/MC.jl).

TPU-native design: the simulation state is a pytree batched over a leading
``chains`` axis; `run` dispatches jitted device blocks that fuse
[sweep → optional Wolff global move → measurement pushes] inside one
``lax.scan``, so the host loop only handles staging, printing, configuration
recording and time-boxed checkpointing (reference run! loop structure at
src/flavors/MC/MC.jl:190-309).
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..measurements.core import Measurement, MeasurementRegistry
from ..io.recorder import ConfigRecorder, Discarder
from ..utils.timing import timer


@dataclass
class MCParameters:
    """(reference: MCParameters, src/flavors/MC/MC.jl:16-25; `T` keyword is
    converted to beta as in MC.jl:66-69)."""

    beta: float = 1.0
    sweeps: int = 1000
    thermalization: int = 0
    global_moves: bool = False
    global_rate: int = 5
    measure_rate: int = 1
    print_rate: int = 1000

    def as_dict(self):
        return dataclasses.asdict(self)


@dataclass
class MCAnalysis:
    """Acceptance bookkeeping (reference: MCAnalysis, src/flavors/MC/MC.jl:4-11)."""

    acc_rate: float = 0.0
    prop_local: int = 0
    acc_local: int = 0
    acc_rate_global: float = 0.0
    prop_global: int = 0
    acc_global: int = 0


class MC:
    """Classical Monte Carlo simulation driver.

    Differences from the reference are deliberate TPU-first choices:
    `n_chains` independent Markov chains run batched on-device; observables are
    recorded per chain and combined in the results.
    """

    def __init__(self, model, n_chains: int = 32, seed: int = 0,
                 beta: float = None, T: float = None,
                 measurements: str | Dict = "default",
                 thermalization_measurements: Optional[Dict] = None,
                 recorder=None, recording_rate: int = None,
                 last_sweep: int = 0, **params):
        if T is not None:
            beta = 1.0 / T
        if beta is not None:
            params["beta"] = beta
        self.model = model
        self.parameters = MCParameters(**params)
        self.p = self.parameters  # reference-style alias (mc.p)
        self.analysis = MCAnalysis()
        self.a = self.analysis
        self.n_chains = int(n_chains)
        self.last_sweep = int(last_sweep)

        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.conf = model.rand_conf(init_key, self.n_chains)

        self.configs = recorder if recorder is not None else Discarder()
        if recording_rate is not None:
            self.configs.rate = recording_rate

        # measurement staging (reference: src/Measurements.jl:265-367)
        self.measurements = MeasurementRegistry()
        self.thermalization_measurements = MeasurementRegistry()
        if measurements == "default":
            for k, m in model.default_measurements(self).items():
                self.measurements.add(k, m, self.n_chains)
        elif isinstance(measurements, dict):
            for k, m in measurements.items():
                self.measurements.add(k, m, self.n_chains)
        for k, m in (thermalization_measurements or {}).items():
            self.thermalization_measurements.add(k, m, self.n_chains)

        self._block_fns = {}

    def reset(self):
        """Rebuild all measurement binners (reference: reset!,
        src/flavors/abstract.jl:34-44)."""
        for registry in (self.measurements, self.thermalization_measurements):
            for k, meas in registry.measurements.items():
                registry.states[k] = meas.bind(self.n_chains)
        self.last_sweep = 0
        return self

    def __setitem__(self, key, measurement):
        """mc[key] = measurement sugar (reference: push!,
        src/Measurements.jl:392-508)."""
        self.measurements.add(key, measurement, self.n_chains)
        self._block_fns.clear()

    def __delitem__(self, key):
        self.measurements.remove(key)
        self._block_fns.clear()

    def __getitem__(self, key):
        """mc[:key] observable sugar (reference: src/Measurements.jl:370-374)."""
        return self.measurements[key]

    def __repr__(self):
        return (f"MC simulation of {self.model!r} (beta={self.parameters.beta}, "
                f"{self.n_chains} chains)")

    # ----------------------------------------------------------- device block
    def _build_block(self, stage: str, measure: bool, record: bool):
        """Jitted scan over `n` sweeps: sweep + scheduled global move +
        scheduled measurement pushes. Returns (conf, key, binner_states,
        counters, recorded_confs)."""
        p = self.parameters
        sweep_fn = self.model.make_sweep_fn(p.beta)
        global_fn = (self.model.make_global_move_fn(p.beta)
                     if p.global_moves else None)
        registry = (self.measurements if stage == "ME"
                    else self.thermalization_measurements)
        meas_items = list(registry.measurements.items()) if measure else []

        def one_sweep(carry, sweep_idx):
            conf, key, states, acc_local, acc_global, prop_global = carry
            conf, key, n_acc = sweep_fn(conf, key)
            acc_local = acc_local + n_acc
            if global_fn is not None:
                def do_global(args):
                    conf, key = args
                    c2, k2, csize = global_fn(conf, key)
                    return c2, k2, jnp.sum(csize > 1, dtype=jnp.int64), jnp.int64(1)

                def no_global(args):
                    conf, key = args
                    return conf, key, jnp.int64(0), jnp.int64(0)

                conf, key, g_acc, g_prop = jax.lax.cond(
                    sweep_idx % p.global_rate == 0, do_global, no_global,
                    (conf, key))
                acc_global = acc_global + g_acc
                prop_global = prop_global + g_prop
            if meas_items:
                def do_measure(states):
                    new_states = {}
                    for mkey, meas in meas_items:
                        vals = meas.measure_fn(conf)
                        new_states[mkey] = meas.push(states[mkey], vals)
                    return new_states

                states = jax.lax.cond(
                    sweep_idx % p.measure_rate == 0, do_measure,
                    lambda s: s, states)
            out = conf if record else None
            return (conf, key, states, acc_local, acc_global, prop_global), out

        @partial(jax.jit, static_argnames=("n",))
        def block(conf, key, states, n, start_sweep):
            acc0 = jnp.zeros((), jnp.int64)
            carry = (conf, key, states, acc0, acc0, acc0)
            idxs = start_sweep + jnp.arange(n)
            carry, recs = jax.lax.scan(one_sweep, carry, idxs)
            return carry, recs

        return block

    def _get_block(self, stage, measure, record):
        key = (stage, measure, record)
        if key not in self._block_fns:
            self._block_fns[key] = self._build_block(stage, measure, record)
        return self._block_fns[key]

    # ------------------------------------------------------------------- run
    def run(self, sweeps: int = None, thermalization: int = None,
            verbose: bool = True, safe_before: float = None,
            safe_every: float = None, grace_period: float = 60.0,
            filename: str = None, chunk: int = 256) -> bool:
        """Run the simulation (reference: run!, src/flavors/MC/MC.jl:190-309).

        safe_before: absolute wall-clock deadline (time.time() seconds) —
            a resumable checkpoint is written and False returned before it
            (reference time-boxed saving, MC.jl:280-294).
        safe_every: period in seconds for regular checkpoint saves.
        """
        p = self.parameters
        sweeps = sweeps if sweeps is not None else p.sweeps
        thermalization = (thermalization if thermalization is not None
                          else p.thermalization)
        total = sweeps + thermalization
        t_start = time.time()
        last_save = t_start
        max_chunk_dur = 0.0

        record_active = not isinstance(self.configs, Discarder)
        if record_active:
            chunk = math.gcd(chunk, self.configs.rate) or chunk

        i = self.last_sweep
        while i < total:
            in_th = i < thermalization
            stage = "TH" if in_th else "ME"
            registry = (self.thermalization_measurements if in_th
                        else self.measurements)
            limit = thermalization if in_th else total
            n = min(chunk, limit - i)
            measure = len(registry.measurements) > 0 and not in_th or (
                in_th and len(self.thermalization_measurements.measurements) > 0)
            block = self._get_block(stage, measure, record_active)

            t0 = time.time()
            with timer("mc_block"):
                carry, recs = block(self.conf, self.key, registry.states,
                                    n, i + 1)
            conf, key, states, acc_l, acc_g, prop_g = carry
            conf.block_until_ready()
            dur = time.time() - t0
            max_chunk_dur = max(max_chunk_dur, dur)

            self.conf, self.key = conf, key
            registry.states = states
            self.analysis.prop_local += n * self.n_chains * len(self.model.lattice)
            self.analysis.acc_local += int(acc_l)
            self.analysis.prop_global += int(prop_g) * self.n_chains
            self.analysis.acc_global += int(acc_g)
            if record_active and not in_th:
                host_recs = np.asarray(recs)
                for j in range(n):
                    self.configs.push(i + 1 + j, host_recs[j])
            i += n
            self.last_sweep = i

            if verbose and (i % p.print_rate < chunk):
                acc = self.analysis.acc_local / max(1, self.analysis.prop_local)
                print(f"[MC] sweep {i}/{total}  acc={acc:.3f}  "
                      f"({dur / n * 1e3:.2f} ms/sweep)")

            now = time.time()
            if safe_before is not None and now + 2 * max_chunk_dur + grace_period > safe_before:
                self._timed_save(filename, verbose)
                return False
            if safe_every is not None and now - last_save > safe_every:
                self._timed_save(filename, verbose)
                last_save = now

        self.analysis.acc_rate = (self.analysis.acc_local /
                                  max(1, self.analysis.prop_local))
        if self.analysis.prop_global > 0:
            self.analysis.acc_rate_global = (self.analysis.acc_global /
                                             self.analysis.prop_global)
        return True

    def _timed_save(self, filename, verbose):
        from ..io.checkpoint import save
        filename = filename or f"mc_checkpoint_{int(time.time())}.mctpu"
        save(filename, self, overwrite=True)
        if verbose:
            print(f"[MC] saved resumable checkpoint to {filename}")

    # ----------------------------------------------------------------- replay
    def replay(self, configurations=None, verbose: bool = False) -> bool:
        """Re-measure observables from recorded configurations
        (reference: replay!, src/flavors/MC/MC.jl:353-437)."""
        configurations = configurations if configurations is not None else self.configs
        # rebuild fresh measurement states
        for k, meas in self.measurements.measurements.items():
            self.measurements.states[k] = meas.bind(self.n_chains)

        @jax.jit
        def measure_all(states, conf):
            new_states = {}
            for mkey, meas in self.measurements.measurements.items():
                vals = meas.measure_fn(conf)
                new_states[mkey] = meas.push(states[mkey], vals)
            return new_states

        states = self.measurements.states
        for conf in configurations:
            states = measure_all(states, jnp.asarray(conf))
        self.measurements.states = states
        return True

    # ------------------------------------------------------------ observables
    def observables(self, stage: str = "ME"):
        registry = (self.measurements if stage == "ME"
                    else self.thermalization_measurements)
        return registry.observables(context=self)

    # ------------------------------------------------------------- persistence
    def state_dict(self):
        return {
            "type": "MC",
            "parameters": self.parameters.as_dict(),
            "n_chains": self.n_chains,
            "last_sweep": self.last_sweep,
            "conf": np.asarray(self.conf),
            "key": np.asarray(self.key),
            "configs": self.configs.state_dict(),
            "measurement_states": jax.tree_util.tree_map(
                np.asarray, self.measurements.states),
            "th_measurement_states": jax.tree_util.tree_map(
                np.asarray, self.thermalization_measurements.states),
            "analysis": dataclasses.asdict(self.analysis),
            "model": {
                "type": type(self.model).__name__,
                "parameters": self.model.parameters(),
                "lattice": self.model.lattice.state_dict(),
            },
        }

    def load_state(self, state):
        self.parameters = MCParameters(**state["parameters"])
        self.p = self.parameters
        self.last_sweep = int(state["last_sweep"])
        self.conf = jnp.asarray(state["conf"])
        self.key = jnp.asarray(state["key"])
        rec_state = state["configs"]
        self.configs = (ConfigRecorder.from_state(rec_state)
                        if rec_state["type"] == "ConfigRecorder"
                        else Discarder.from_state(rec_state))
        self.measurements.restore_states(state["measurement_states"], "ME")
        self.thermalization_measurements.restore_states(
            state.get("th_measurement_states", {}), "TH")
        self.analysis = MCAnalysis(**state["analysis"])
        self.a = self.analysis
