"""montecarlo_tpu — a TPU-native (JAX/XLA/Pallas) Markov-chain Monte Carlo framework.

A ground-up rebuild of the capabilities of ffreyer/MonteCarlo.jl (reference at
/root/reference) designed TPU-first:

* simulation state is a pure pytree batched over a leading ``chains`` axis
  (``vmap``); hundreds of independent Markov chains run per chip so that the
  small per-lattice matrices saturate the MXU,
* the imaginary-time loop is ``lax.scan``; lattices, checkerboard colorings and
  measurement index maps are static host-built arrays baked into the trace,
* multi-chip scaling is a chain-sharded ``jax.sharding.Mesh`` (``shard_map``)
  with ``psum``-reduced measurement accumulators,
* RNG is counter-based ``jax.random`` with per-chain split keys, so runs are
  checkpointable and exactly resumable.

Two simulation flavors mirror the reference's API surface
(src/MonteCarlo.jl:42-72):

* :class:`MC` — classical Metropolis/Wolff Monte Carlo for spin models
  (:class:`IsingModel`),
* :class:`DQMC` — determinant quantum Monte Carlo for interacting fermions
  (:class:`HubbardModelAttractive`, :class:`HubbardModelRepulsive`), with
  UDT-stabilized propagation, equal-time and time-displaced Green's functions
  and Wick-theorem observable kernels.
"""

import importlib

__version__ = "0.1.0"

# name -> submodule, resolved lazily (PEP 562) so partial builds stay importable
_EXPORTS = {
    # utils
    "absdiff": "utils.compare", "reldiff": "utils.compare",
    "effreldiff": "utils.compare", "compare": "utils.compare",
    "timer": "utils.timing", "enable_benchmarks": "utils.timing",
    "disable_benchmarks": "utils.timing", "print_timer": "utils.timing",
    "reset_timer": "utils.timing",
    "LogBinner": "utils.binner",
    # lattices
    "Lattice": "lattices", "UnitCell": "lattices", "Chain": "lattices",
    "SquareLattice": "lattices", "CubicLattice": "lattices",
    "TriangularLattice": "lattices", "Honeycomb": "lattices",
    "GenericLattice": "lattices", "choose_lattice": "lattices",
    "ALPSLattice": "lattices", "ArbitraryLattice": "lattices",
    "EachSite": "lattices", "EachSiteAndFlavor": "lattices", "OnSite": "lattices",
    "EachSitePair": "lattices", "EachSitePairByDistance": "lattices",
    "EachLocalQuadByDistance": "lattices", "EachLocalQuadBySyncedDistance": "lattices",
    # models
    "IsingModel": "models", "IsingTc": "models", "HubbardModel": "models",
    "HubbardModelAttractive": "models", "HubbardModelRepulsive": "models",
    # flavors
    "MC": "mc", "MCParameters": "mc",
    "DQMC": "dqmc", "DQMCParameters": "dqmc",
    # measurements
    "greens_measurement": "measurements", "occupation": "measurements",
    "boson_energy_measurement": "measurements",
    "charge_density_correlation": "measurements",
    "charge_density_susceptibility": "measurements",
    "magnetization": "measurements",
    "spin_density_correlation": "measurements",
    "spin_density_susceptibility": "measurements",
    "pairing_correlation": "measurements",
    "pairing_susceptibility": "measurements",
    "current_current_susceptibility": "measurements",
    "Greens": "measurements", "GreensAt": "measurements",
    "CombinedGreensIterator": "measurements",
    "custom_measurement": "measurements", "selection_matrices": "measurements",
    "charge_density": "measurements", "spin_density": "measurements",
    "pairing": "measurements",
    "fourier_transform": "measurements.postprocessing",
    "structure_factor": "measurements.postprocessing",
    "uniform_fourier": "measurements.postprocessing",
    "apply_symmetry": "measurements.postprocessing",
    "superfluid_density": "measurements.postprocessing",
    # io
    "save": "io.checkpoint", "load": "io.checkpoint", "resume": "io.checkpoint",
    "ConfigRecorder": "io.recorder", "Discarder": "io.recorder",
}


def __getattr__(name):
    if name in _EXPORTS:
        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))


def run(mc, **kwargs):
    """Run a simulation (reference: `run!`, src/flavors/abstract.jl:20)."""
    return mc.run(**kwargs)


def replay(mc, **kwargs):
    """Re-measure observables from recorded configurations
    (reference: `replay!`, src/flavors/MC/MC.jl:353, DQMC.jl:605)."""
    return mc.replay(**kwargs)


def greens(mc, *args):
    """Current physical equal-time Green's function of a DQMC simulation
    (reference: greens(mc), src/flavors/DQMC/DQMC.jl:700-731)."""
    return mc.greens(*args)


def reset(mc):
    """Reset measurements (reference: reset!, src/flavors/abstract.jl:34-44)."""
    return mc.reset()


def measurements(mc, stage="ME"):
    """Measurement registry of a simulation (reference: measurements(mc),
    src/Measurements.jl:265-303)."""
    return (mc.measurements if stage == "ME"
            else mc.thermalization_measurements)


def observables(mc, stage="ME"):
    """All observable results (reference: observables(mc),
    src/Measurements.jl:303-367)."""
    return mc.observables(stage)


def lattice(model_or_mc):
    """(reference: lattice accessor)."""
    obj = getattr(model_or_mc, "model", model_or_mc)
    return obj.lattice


def model(mc):
    return mc.model


def parameters(mc):
    """(reference: parameters(mc) merges flavor and model parameters)."""
    out = dict(mc.parameters.as_dict())
    out.update(mc.model.parameters())
    return out
