"""DQMC simulation driver (reference: src/flavors/DQMC/DQMC.jl).

Host-side orchestration of the pure device kernels in core.py: the run loop
dispatches jitted blocks that scan whole [down;up] sweep pairs (vmapped over
chains) and push measurements on-device; the host handles staging, printing,
recording, sign-problem / propagation-error reporting and time-boxed
checkpointing (reference run! structure, DQMC.jl:369-515).
"""

from __future__ import annotations

import dataclasses
import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .parameters import DQMCParameters
from . import core
from . import unequal_time as ut
from ..measurements.core import MeasurementRegistry
from ..io.recorder import ConfigRecorder, Discarder
from ..utils.timing import timer
from ..utils.host import tree_to_host


@dataclass
class MagnitudeStats:
    """Min/max/geometric-mean/count magnitude tracker (reference:
    MagnitudeStats, DQMC.jl:4-31 — the reference stores log10(|v|) min/max/
    sum/count; here min/max are kept linear and the sum stays in the log10
    domain, so `mean` is the same geometric mean the reference reports)."""

    min: float = math.inf
    max: float = 0.0
    log_sum: float = 0.0
    count: int = 0

    @property
    def mean(self):
        return 10.0 ** (self.log_sum / self.count) if self.count else 0.0

    def absorb_device(self, log_min, log_max, log_sum, count):
        """Fold in device-side per-chain (log10 min, log10 max, log10 sum,
        count) reductions. Non-finite min/max (no magnitudes recorded — the
        fused Pallas kernel tracks only the count) leave the extrema alone."""
        n = int(count)
        if n == 0:
            return
        lm, lx = float(log_min), float(log_max)
        if math.isfinite(lm):
            self.min = min(self.min, 10.0 ** lm)
        if math.isfinite(lx):
            self.max = max(self.max, 10.0 ** lx)
        self.log_sum += float(log_sum)
        self.count += n


@dataclass
class DQMCAnalysis:
    """(reference: DQMCAnalysis, DQMC.jl:36-47)."""

    acc_rate: float = 0.0
    prop_local: int = 0
    acc_local: int = 0
    sweep_duration: float = 0.0
    negative_probability: MagnitudeStats = dataclasses.field(default_factory=MagnitudeStats)
    # complex sessions: |Im(detratio)| > core.IMAG_PROB_THRESHOLD events
    # (reference: imaginary_probability, DQMC.jl:554-562)
    imaginary_probability: MagnitudeStats = dataclasses.field(default_factory=MagnitudeStats)
    propagation_error: MagnitudeStats = dataclasses.field(default_factory=MagnitudeStats)
    # mean configuration-weight phase over chains at the last drain — the
    # average-sign diagnostic; |avg_phase| << 1 means the phase problem is
    # killing the signal (complex sessions only; 1.0 otherwise)
    avg_phase: complex = 1.0 + 0.0j
    # window-end drift distribution (see core.PROP_ERR_EDGES)
    prop_err_sum: float = 0.0
    prop_err_n: int = 0
    prop_err_hist: list = dataclasses.field(default_factory=lambda: [0, 0, 0, 0])

    @property
    def prop_err_mean(self):
        return self.prop_err_sum / max(1, self.prop_err_n)


class DQMC:
    """Determinant quantum Monte Carlo over a batch of independent chains."""

    def __init__(self, model, n_chains: int = 16, seed: int = 0,
                 dtype=jnp.float64, update_dtype=None, use_pallas=None,
                 stab_method: str = "qr", delay: int = None,
                 checkerboard: bool = False, g_refresh: bool = False,
                 measurements: str | Dict = "default",
                 thermalization_measurements: Optional[Dict] = None,
                 recorder=None, recording_rate: int = None,
                 last_sweep: int = 0, **params):
        if jnp.dtype(dtype) == jnp.float64 and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        if use_pallas is None:
            # auto: fused kernels ON for TPU backends (the physics-validated
            # bench default — eligibility by dtype/size is still filtered in
            # make_context, and f64 sessions fall through to XLA anyway);
            # OFF on cpu/gpu where the Pallas path is the test interpreter.
            use_pallas = jax.default_backend() not in ("cpu", "gpu")
        self.model = model
        self.parameters = DQMCParameters(**params)
        self.p = self.parameters
        self.analysis = DQMCAnalysis()
        self.a = self.analysis
        self.n_chains = int(n_chains)
        self.last_sweep = int(last_sweep)
        self.ctx, self.consts = core.make_context(model, self.parameters, dtype,
                                                  update_dtype=update_dtype,
                                                  use_pallas=use_pallas,
                                                  stab_method=stab_method,
                                                  delay=delay,
                                                  checkerboard=checkerboard,
                                                  g_refresh=g_refresh)

        # seed may be a sequence: the independent streams are folded into the
        # chain axis (chains i*n_chains..(i+1)*n_chains-1 get seed[i]'s RNG
        # keys and initial configurations, exactly as len(seed) separate
        # sessions would) — one batched run replaces per-seed runs in the
        # cross-sm validation gates. Trajectories are identically keyed but
        # not bit-identical across batch sizes: matmul blocking depends on
        # the batch, so f32 rounding differs at ~1e-6/sweep (statistically
        # immaterial — the gates use cross-chain scatter, not matched pairs)
        seeds = tuple(seed) if isinstance(seed, (tuple, list)) else (seed,)
        confs, key_blocks = [], []
        for s in seeds:
            root = jax.random.PRNGKey(s)
            init_key, sweep_key = jax.random.split(root)
            confs.append(model.rand_conf(init_key, self.n_chains,
                                         self.parameters.slices))
            key_blocks.append(jax.random.split(sweep_key, self.n_chains))
        self.n_chains *= len(seeds)
        conf = jnp.concatenate(confs, axis=0)
        chain_keys = jnp.concatenate(key_blocks, axis=0)
        self.state = core.jitted_vmapped("init_state", self.ctx,
                                         self.consts)(conf, chain_keys)

        self.configs = recorder if recorder is not None else Discarder()
        if recording_rate is not None:
            self.configs.rate = recording_rate

        self.measurements = MeasurementRegistry()
        self.thermalization_measurements = MeasurementRegistry()
        if measurements == "default":
            for k, m in self.default_measurements().items():
                self.measurements.add(k, m, self.n_chains)
        elif isinstance(measurements, dict):
            for k, m in measurements.items():
                self.measurements.add(k, m, self.n_chains)
        for k, m in (thermalization_measurements or {}).items():
            self.thermalization_measurements.add(k, m, self.n_chains)

        self._block_fns = {}

    # ------------------------------------------------------------- defaults
    def default_measurements(self):
        from ..measurements import dqmc_measurements as dm
        out = {
            "occ": dm.occupation(self, self.model),
            "greens": dm.greens_measurement(self, self.model),
        }
        if self.ctx.is_complex:
            # complex sessions always carry the average-sign observable: its
            # mean deviating from 1 is THE signal that the phase problem is
            # biasing Re-projected estimators
            out["sign"] = dm.sign_measurement(self, self.model)
        return out

    @property
    def conf(self):
        return self.state["conf"]

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
        return self.measurements[key]

    def __repr__(self):
        p = self.parameters
        return (f"DQMC simulation of {self.model!r} (beta={p.beta}, "
                f"dtau={p.delta_tau}, M={p.slices}, {self.n_chains} chains)")

    # ----------------------------------------------------------- device block
    def _build_block(self, measure: bool, stage: str):
        ctx, consts = self.ctx, self.consts
        p = self.parameters
        registry = (self.measurements if stage == "ME"
                    else self.thermalization_measurements)
        meas_items = list(registry.measurements.items()) if measure else []
        vsweep = core.jitted_vmapped("sweep_pair", ctx, consts)
        vunwrap = core.jitted_vmapped("unwrap_greens", ctx, consts)

        def one_sweep(carry, sweep_idx):
            states, bstates = carry
            states, G_meas, conf_meas = vsweep(states)
            phase_meas = states.get("phase_meas")
            if meas_items:
                def do_measure(bstates):
                    return self._measure_all(meas_items, bstates, G_meas,
                                             conf_meas, phase_meas)

                bstates = lax.cond(sweep_idx % p.measure_rate == 0,
                                   do_measure, lambda b: b, bstates)
            return (states, bstates), None

        @partial(jax.jit, static_argnames=("n",))
        def block(states, bstates, n, start_sweep):
            idxs = start_sweep + jnp.arange(n)
            (states, bstates), _ = lax.scan(one_sweep, (states, bstates), idxs)
            return states, bstates

        return block

    def _measure_all(self, meas_items, bstates, G_meas, conf_meas,
                     phase_meas=None):
        """Measurement pass, grouped by Green's-function requirement so each
        required G is computed once (reference: generate_groups,
        src/flavors/DQMC/measurements/generic.jl:121-150). Jittable.

        G_meas: effective equal-time G at the measurement point (C, F, N, N);
        conf_meas: HS field snapshot at the measurement point (C, N, M);
        phase_meas: configuration-weight phase snapshot (C,) for complex
        sessions (None otherwise) — consumed by sign_measurement.
        """
        ctx, consts = self.ctx, self.consts
        # Full-precision matmuls for the whole measurement pass: sweep_pair
        # scopes its own context, so without this the unequal-time iterators
        # and measurement contractions traced here would run at the TPU's
        # default single-pass bf16 MXU precision — catastrophic for the
        # graded-factor UDT algebra at large beta (measured: PS per-chain
        # values reaching ~4e6 at beta=10/f32 before this guard).
        _prec = ctx.matmul_precision()
        _prec.__enter__()
        vunwrap = core.jitted_vmapped("unwrap_greens", ctx, consts)
        equal = [(k, m) for k, m in meas_items if m.kind == "equal"]
        gat = [(k, m) for k, m in meas_items if m.kind == "greens_at"]
        comb = [(k, m) for k, m in meas_items if m.kind == "combined"]
        new = dict(bstates)
        G_phys = vunwrap(G_meas)
        for k, m in equal:
            vals = m.measure_fn(greens=G_phys, conf=conf_meas,
                                phase=phase_meas)
            new[k] = m.push(bstates[k], vals)
        if gat:
            utgs = {}
            for _, m in gat:
                if m.greens_at not in utgs:
                    kk, ll = m.greens_at
                    utg_eff = jax.vmap(
                        lambda c: ut.greens_kl(ctx, consts, c, kk, ll)
                    )(conf_meas)
                    utgs[m.greens_at] = vunwrap(utg_eff)
            for k, m in gat:
                vals = m.measure_fn(utg=utgs[m.greens_at], greens=G_phys,
                                    conf=conf_meas)
                new[k] = m.push(bstates[k], vals)
        if comb:
            dtau = self.parameters.delta_tau

            def per_chain(c, G00_eff, G00_phys):
                # Measurements with combined_acc_shapes carry raw kernel-
                # matrix accumulators (Green's dtype) through the l-scan and
                # reduce them once afterwards; the rest sum their binned
                # contributions directly in float64.
                #
                # Precision trade-off (deliberate): in an f32 session the
                # fast-path accumulators sum M per-slice kernel matrices in
                # f32 — worst-case relative rounding ~sqrt(M)*eps_f32 ≈ 1e-6
                # at M=100, orders of magnitude below the statistical errors
                # of any realistic run, while f64 accumulation would push the
                # whole tau-loop into emulated arithmetic on TPU (~30x).
                acc0 = {}
                for k, m in comb:
                    if m.combined_acc_shapes is not None:
                        acc0[k] = {n: jnp.zeros(s, ctx.dtype)
                                   for n, s in m.combined_acc_shapes.items()}
                    else:
                        acc0[k] = {n: jnp.zeros(s, jnp.float64)
                                   for n, s in m.obs_shapes.items()}

                def step_fn(acc, G0l, Gl0, Gll):
                    out = dict(acc)
                    for k, m in comb:
                        contrib = m.measure_fn(G00=G00_phys, G0l=G0l,
                                               Gl0=Gl0, Gll=Gll)
                        out[k] = {n: acc[k][n] + contrib[n] for n in contrib}
                    return out

                acc = ut.combined_greens_apply(ctx, consts, c, G00_eff,
                                               acc0, step_fn)
                acc = {k: (m.combined_finish_fn(acc[k])
                           if m.combined_finish_fn is not None else acc[k])
                       for k, m in comb}
                # finish! integral weight factor = delta_tau
                # (reference: generic.jl:240 + :279-294)
                return jax.tree_util.tree_map(lambda x: x * dtau, acc)

            accs = jax.vmap(per_chain)(conf_meas,
                                       G_meas.astype(self.ctx.dtype), G_phys)
            for k, m in comb:
                new[k] = m.push(bstates[k], accs[k])
        _prec.__exit__(None, None, None)
        return new

    def _get_block(self, measure, stage):
        key = (measure, stage)
        if key not in self._block_fns:
            self._block_fns[key] = self._build_block(measure, stage)
        return self._block_fns[key]

    # ------------------------------------------------------------------- run
    def run(self, sweeps: int = None, thermalization: int = None,
            verbose: bool = True, safe_before: float = None,
            safe_every: float = None, grace_period: float = 60.0,
            filename: str = None, chunk: int = 16) -> bool:
        """(reference: run!, DQMC.jl:369-515). One sweep = one full
        [down; up] pass over imaginary time (2*slices*N site updates)."""
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
            measure = len(registry.measurements) > 0
            block = self._get_block(measure, stage)

            t0 = time.time()
            with timer("dqmc_block"):
                self.state, registry.states = block(
                    self.state, registry.states, n, i + 1)
            jax.block_until_ready(self.state["G"])
            dur = time.time() - t0
            max_chunk_dur = max(max_chunk_dur, dur)
            self.analysis.sweep_duration = dur / n
            self._drain_counters()

            i += n
            self.last_sweep = i
            if record_active and not in_th:
                self.configs.push(i, np.asarray(self.state["conf"]))

            if verbose and (i % p.print_rate < chunk):
                print(f"[DQMC] sweep {i}/{total}  "
                      f"acc={self.analysis.acc_rate:.3f}  "
                      f"({dur / n * 1e3:.1f} ms/sweep)  "
                      f"prop_err_max={self.analysis.propagation_error.max:.2e}")

            now = time.time()
            if safe_before is not None and now + 2 * max_chunk_dur + grace_period > safe_before:
                self._timed_save(filename, verbose)
                return False
            if safe_every is not None and now - last_save > safe_every:
                self._timed_save(filename, verbose)
                last_save = now

        if verbose and not p.silent:
            self._report_errors()
        return True

    def _drain_counters(self):
        """Accumulate the per-chain device counters into host-side Python
        ints and reset them, so the int32 device counters (core.init_state)
        can never overflow in long production runs."""
        st = self.state
        self.analysis.prop_local += int(np.sum(np.asarray(st["prop"])))
        self.analysis.acc_local += int(np.sum(np.asarray(st["acc"])))
        self.analysis.acc_rate = (self.analysis.acc_local /
                                  max(1, self.analysis.prop_local))
        self.analysis.negative_probability.absorb_device(
            np.min(np.asarray(st["ls_neg_min"])),
            np.max(np.asarray(st["ls_neg_max"])),
            np.sum(np.asarray(st["ls_neg_sum"])),
            np.sum(np.asarray(st["neg_prob"])))
        self.analysis.propagation_error.max = max(
            self.analysis.propagation_error.max,
            float(np.max(np.asarray(st["prop_err_max"]))))
        self.analysis.propagation_error.count += int(
            np.sum(np.asarray(st["prop_err_count"])))
        self.analysis.prop_err_sum += float(np.sum(np.asarray(st["prop_err_sum"])))
        self.analysis.prop_err_n += int(np.sum(np.asarray(st["prop_err_n"])))
        self.analysis.prop_err_hist = [
            a + int(b) for a, b in zip(
                self.analysis.prop_err_hist,
                np.sum(np.asarray(st["prop_err_hist"]), axis=0))]
        reset_keys = ["prop", "acc", "neg_prob", "prop_err_max",
                      "prop_err_count", "prop_err_sum", "prop_err_n",
                      "prop_err_hist", "ls_neg_sum"]
        if self.ctx.is_complex:
            from ..utils.host import to_host
            self.analysis.imaginary_probability.absorb_device(
                np.min(np.asarray(st["ls_imag_min"])),
                np.max(np.asarray(st["ls_imag_max"])),
                np.sum(np.asarray(st["ls_imag_sum"])),
                np.sum(np.asarray(st["ls_imag_count"])))
            self.analysis.avg_phase = complex(np.mean(to_host(st["ls_phase"])))
            reset_keys += ["ls_imag_count", "ls_imag_sum"]
        zeros = {k: jnp.zeros_like(st[k]) for k in reset_keys}
        # magnitude extrema reset to their empty values, not zero
        inf_keys = ["ls_neg_min", "ls_neg_max"]
        if self.ctx.is_complex:
            inf_keys += ["ls_imag_min", "ls_imag_max"]
        for k in inf_keys:
            sign = 1.0 if k.endswith("_min") else -1.0
            zeros[k] = jnp.full_like(st[k], sign * np.inf)
        self.state = {**st, **zeros}

    def _report_errors(self):
        """End-of-run numerical sanitizer report (reference: DQMC.jl:483-505)."""
        a = self.analysis
        if a.negative_probability.count > 0:
            n = a.negative_probability
            print(f"[DQMC] {n.count} negative probabilities (sign problem?) "
                  f"|p|: min {n.min:.2e} / geo-mean {n.mean:.2e} / "
                  f"max {n.max:.2e}")
        if a.imaginary_probability.count > 0:
            im = a.imaginary_probability
            print(f"[DQMC] {im.count} imaginary probabilities "
                  f"(|Im detratio| > {core.IMAG_PROB_THRESHOLD:g} — phase "
                  f"problem!) |Im|: min {im.min:.2e} / geo-mean {im.mean:.2e} "
                  f"/ max {im.max:.2e}")
        if self.ctx.is_complex:
            ph = a.avg_phase
            print(f"[DQMC] average weight phase ⟨s⟩ = "
                  f"{ph.real:+.4f}{ph.imag:+.4f}i (|⟨s⟩| = {abs(ph):.4f}; "
                  f"values far from 1 mean Re-projected estimators are "
                  f"biased — see the 'sign' observable)")
        if a.propagation_error.count > 0:
            print(f"[DQMC] {a.propagation_error.count} propagation "
                  f"instabilities > {self.ctx.prop_err_threshold:g} "
                  f"(max {a.propagation_error.max:.2e})")

    def _timed_save(self, filename, verbose):
        from ..io.checkpoint import save
        filename = filename or f"dqmc_checkpoint_{int(time.time())}.mctpu"
        save(filename, self, overwrite=True)
        if verbose:
            print(f"[DQMC] saved resumable checkpoint to {filename}")

    # ---------------------------------------------------------------- greens
    def greens(self, slice_idx: int = 0, l: int = None):
        """Physical Green's function (C, F, N, N), recomputed from the
        current configurations. ``greens()`` / ``greens(slice)`` is the
        equal-time G at a slice (reference: greens(mc), DQMC.jl:700-731);
        ``greens(k, l)`` is the time-displaced G(kΔτ ← lΔτ) for
        0 ≤ k, l ≤ slices (reference: greens(mc, k, l),
        unequal_time_stack.jl:271-304)."""
        if l is None:
            fn = jax.jit(jax.vmap(lambda c: core.unwrap_greens(
                self.ctx, self.consts,
                core.greens_from_scratch(self.ctx, self.consts, c, slice_idx))))
        else:
            from . import unequal_time as ut
            fn = jax.jit(jax.vmap(lambda c: core.unwrap_greens(
                self.ctx, self.consts,
                ut.greens_kl(self.ctx, self.consts, c, slice_idx, l))))
        return fn(self.state["conf"])

    # ---------------------------------------------------------------- replay
    def replay(self, configurations=None, verbose: bool = False) -> bool:
        """Re-measure observables from recorded configurations
        (reference: replay!, DQMC.jl:605-697)."""
        configurations = (configurations if configurations is not None
                          else self.configs)
        for k, meas in self.measurements.measurements.items():
            self.measurements.states[k] = meas.bind(self.n_chains)

        meas_items = list(self.measurements.measurements.items())

        @jax.jit
        def measure_all(bstates, conf):
            G_eff = jax.vmap(lambda c: core.greens_from_scratch(
                self.ctx, self.consts, c, 0))(conf)
            phase = (jax.vmap(lambda c: core.phase_from_conf(
                self.ctx, self.consts, c))(conf)
                if self.ctx.is_complex else None)
            return self._measure_all(meas_items, bstates, G_eff, conf, phase)

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

    # ------------------------------------------------------------ persistence
    def state_dict(self):
        return {
            "type": "DQMC",
            "parameters": {k: v for k, v in self.parameters.as_dict().items()
                           if k not in ("warn_round",)},
            # numeric operating mode — MUST round-trip so a resumed run keeps
            # the same numerics (an f32 checkpoint resumes f32, etc.)
            "numerics": {
                "dtype": str(self.ctx.dtype),
                "update_dtype": (None if self.ctx.update_dtype is None
                                 else str(self.ctx.update_dtype)),
                "stab_method": self.ctx.stab_method,
                "use_pallas": bool(self.ctx.use_pallas),
                "delay": int(self.ctx.delay),
                "checkerboard": bool(self.ctx.checkerboard),
                "g_refresh": bool(self.ctx.g_refresh),
            },
            "n_chains": self.n_chains,
            "last_sweep": self.last_sweep,
            "conf": np.asarray(self.state["conf"]),
            "key": np.asarray(self.state["key"]),
            "configs": self.configs.state_dict(),
            # tree_to_host: complex binner states (Peierls sessions) cannot
            # be fetched as complex buffers on some TPU runtimes
            "measurement_states": tree_to_host(self.measurements.states),
            "th_measurement_states": tree_to_host(
                self.thermalization_measurements.states),
            "analysis": {
                "acc_rate": self.analysis.acc_rate,
                "prop_local": self.analysis.prop_local,
                "acc_local": self.analysis.acc_local,
                "neg_prob_count": self.analysis.negative_probability.count,
                "neg_prob_stats": dataclasses.asdict(
                    self.analysis.negative_probability),
                "imag_prob_stats": dataclasses.asdict(
                    self.analysis.imaginary_probability),
                "avg_phase": [self.analysis.avg_phase.real,
                              self.analysis.avg_phase.imag],
                "prop_err_max": self.analysis.propagation_error.max,
                "prop_err_count": self.analysis.propagation_error.count,
            },
            "model": {
                "type": type(self.model).__name__,
                "parameters": self.model.parameters(),
                "lattice": self.model.lattice.state_dict(),
            },
        }

    def load_state(self, state):
        """Rebuild from a checkpoint: stacks and Green's functions are derived
        state and are reconstructed from conf (reference invariant:
        FileIO.jl:140-156 + DQMC.jl:412-414)."""
        self.parameters = DQMCParameters(**state["parameters"])
        self.p = self.parameters
        self.last_sweep = int(state["last_sweep"])
        conf = jnp.asarray(state["conf"])
        keys = jnp.asarray(state["key"])
        self.state = core.jitted_vmapped("init_state", self.ctx,
                                         self.consts)(conf, keys)
        rec_state = state["configs"]
        self.configs = (ConfigRecorder.from_state(rec_state)
                        if rec_state["type"] == "ConfigRecorder"
                        else Discarder.from_state(rec_state))
        self.measurements.restore_states(state["measurement_states"], "ME")
        self.thermalization_measurements.restore_states(
            state.get("th_measurement_states", {}), "TH")
        an = state.get("analysis")
        if an:
            self.analysis.acc_rate = float(an.get("acc_rate", 0.0))
            self.analysis.prop_local = int(an.get("prop_local", 0))
            self.analysis.acc_local = int(an.get("acc_local", 0))
            self.analysis.negative_probability.count = int(
                an.get("neg_prob_count", 0))
            for key, target in (("neg_prob_stats",
                                 self.analysis.negative_probability),
                                ("imag_prob_stats",
                                 self.analysis.imaginary_probability)):
                saved = an.get(key)
                if saved:
                    for f, v in saved.items():
                        setattr(target, f, type(getattr(target, f))(v))
            ph = an.get("avg_phase")
            if ph is not None:
                self.analysis.avg_phase = complex(ph[0], ph[1])
            self.analysis.propagation_error.max = float(
                an.get("prop_err_max", 0.0))
            self.analysis.propagation_error.count = int(
                an.get("prop_err_count", 0))
