"""User-defined DQMC measurements: any Wick kernel × any lattice iterator.

TPU-native counterpart of the reference's fully generic measurement
constructor ``Measurement(mc, model, greens_iterator, lattice_iterator,
kernel)`` (src/flavors/DQMC/measurements/generic.jl:21-41 + the ``apply!``
dispatch :194-362): the per-index-tuple kernel of the reference becomes a
whole-array kernel returning a kernel MATRIX (or vector), and the lattice
iterator selects the reduction that bins it — realized as precomputed one-hot
contractions on the MXU, exactly like the shipped observables
(measurements/dqmc_measurements.py).

Kernel signatures (all per chain; G arrays are (F, N, N) with F the flavor
block axis, G[0] = spin-up block, G[-1] = spin-down):

* equal-time / greens_at:   ``kernel(G) -> raw``
* combined (susceptibility): ``kernel(G00, G0l, Gl0, Gll) -> raw`` — summed
  over the M imaginary-time slices and weighted by delta_tau by the driver.

Required ``raw`` shape per lattice iterator (N = sites, K = quad directions):

| lattice iterator                | raw           | stored observable        |
|---------------------------------|---------------|--------------------------|
| EachSite / OnSite               | (N,)          | (N,)                     |
| EachSiteAndFlavor               | (F, N)        | (F, N)                   |
| EachSitePair                    | (N, N)        | (N, N) / N               |
| EachSitePairByDistance          | (N, N)        | (n_dirs,)   [/N binned]  |
| EachLocalQuadByDistance(K)      | (K, K, N, N)  | (n_dirs, K, K)           |
| EachLocalQuadBySyncedDistance(K)| (K, N, N)     | (n_dirs, K)              |

For quad kernels use ``selection_matrices(lattice, K)`` to gather the
direction-k targets: ``S[k] @ G @ S[q].T`` gives ``G[t(s1,k), t(s2,q)]``
indexed ``[s1, s2]`` (zero rows mask invalid targets).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..lattices import iterators as it
from .core import Measurement
from .dqmc_measurements import (Greens, GreensAt, CombinedGreensIterator,
                                _bin_by_dir, _dir_onehot, _session_eltype,
                                _selection_matrices)


def selection_matrices(lattice, K: int):
    """Public (K, N, N) one-hot target-selection matrices for quad kernels
    (reference quad iterators: EachLocalQuadByDistance,
    src/lattices/lattice_iterators.jl:258-355)."""
    return _selection_matrices(lattice, K)


def custom_measurement(mc, model, kernel: Callable, *, name: str = "custom",
                       lattice_iterator=None, greens_iterator=Greens,
                       dtype=None) -> Measurement:
    """Build a Measurement from a user kernel and a lattice iterator
    (reference ergonomics: Measurement(mc, model, GI, LI, kernel),
    generic.jl:21-41). Register it with ``mc[name] = measurement``.

    greens_iterator: Greens (equal-time, default), GreensAt(k, l), or
    CombinedGreensIterator (tau-integrated susceptibility kernel).
    lattice_iterator: an instance from montecarlo_tpu.lattices.iterators
    (default EachSitePairByDistance()).
    """
    lat = model.lattice
    N = len(lat)
    li = lattice_iterator if lattice_iterator is not None \
        else it.EachSitePairByDistance()
    if isinstance(li, type):
        li = li()
    eltype = dtype if dtype is not None else _session_eltype(mc, model)
    out_shape = tuple(li.output_size(lat))

    # ---- reduction of the kernel's raw output to the stored observable
    if isinstance(li, it.EachSitePairByDistance):
        P_np = _dir_onehot(lat)
        raw_shape = (N, N)

        def reduce_fn(raw):
            return _bin_by_dir(raw, P_np, N)
    elif isinstance(li, it.EachLocalQuadByDistance):
        P_np = _dir_onehot(lat)
        raw_shape = (li.K, li.K, N, N)

        def reduce_fn(raw):
            # (..., K, K, N, N) -> (..., K, K, n_dirs) -> (..., n_dirs, K, K);
            # destination -3 keeps any leading chain axis in place (the
            # equal-time path reduces post-vmap, the combined path per chain)
            return jnp.moveaxis(_bin_by_dir(raw, P_np, N), -1, -3)
    elif isinstance(li, it.EachLocalQuadBySyncedDistance):
        P_np = _dir_onehot(lat)
        raw_shape = (li.K, N, N)

        def reduce_fn(raw):
            return jnp.swapaxes(_bin_by_dir(raw, P_np, N), -1, -2)
    elif isinstance(li, it.EachSitePair):
        raw_shape = (N, N)

        def reduce_fn(raw):
            return raw / N                   # finish! norm, generic.jl:283-294
    elif isinstance(li, (it.EachSite, it.OnSite, it.EachSiteAndFlavor)):
        raw_shape = out_shape

        def reduce_fn(raw):
            return raw
    else:
        raise TypeError(f"unsupported lattice iterator: {li!r}")

    gi = greens_iterator
    if gi is Greens or isinstance(gi, Greens):
        def measure(greens, **_):
            return {name: reduce_fn(jax.vmap(kernel)(greens))}

        return Measurement(name, {name: out_shape}, measure, dtype=eltype)

    if isinstance(gi, GreensAt):
        def measure_at(utg, **_):
            return {name: reduce_fn(jax.vmap(kernel)(utg))}

        return Measurement(name, {name: out_shape}, measure_at,
                           kind="greens_at", dtype=eltype, greens_at=gi.kl)

    if gi is CombinedGreensIterator or isinstance(gi, CombinedGreensIterator):
        def step(G00, G0l, Gl0, Gll, **_):
            return {name: kernel(G00, G0l, Gl0, Gll)}

        def finish(acc):
            return {name: reduce_fn(acc[name])}

        return Measurement(name, {name: out_shape}, step, kind="combined",
                           dtype=eltype,
                           combined_acc_shapes={name: raw_shape},
                           combined_finish_fn=finish)

    raise TypeError(f"unsupported greens iterator: {gi!r}")
