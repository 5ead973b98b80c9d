"""Lattice iterators as static index maps.

The reference's lattice iterators (src/lattices/lattice_iterators.jl) yield
index tuples one at a time; the TPU-native equivalents are *whole index arrays*
built once on the host. A measurement contraction over an iterator becomes a
vectorized gather + segment_sum over direction bins (see
measurements/dqmc_measurements.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .lattice import Lattice


@dataclass(frozen=True)
class EachSiteAndFlavor:
    """Iterate 0 : N*flavors-1 (reference: src/lattices/lattice_iterators.jl:16-36)."""
    lattice: Lattice
    flavors: int = 1

    @property
    def indices(self):
        return np.arange(len(self.lattice) * self.flavors)

    def output_size(self, lattice):
        return (len(lattice) * self.flavors,)


@dataclass(frozen=True)
class EachSite:
    """Iterate every site (reference: src/lattices/lattice_iterators.jl:41-60)."""
    @property
    def indices(self):
        return None

    def output_size(self, lattice):
        return (len(lattice),)


@dataclass(frozen=True)
class OnSite:
    """(site, site) pairs (reference: src/lattices/lattice_iterators.jl:65-85)."""
    def output_size(self, lattice):
        return (len(lattice),)


@dataclass(frozen=True)
class EachSitePair:
    """All (src, trg) pairs (reference: src/lattices/lattice_iterators.jl:90-111)."""
    def output_size(self, lattice):
        return (len(lattice), len(lattice))


@dataclass(frozen=True)
class EachSitePairByDistance:
    """All (src, trg) pairs binned by unique periodic displacement, output
    indexed by direction (reference: src/lattices/lattice_iterators.jl:131-221).

    Index data: lattice.pair_dir (N,N) int32 and lattice.n_dirs.
    """
    def output_size(self, lattice):
        return (lattice.n_dirs,)


@dataclass(frozen=True)
class EachLocalQuadByDistance:
    """(src1, trg1, src2, trg2) quads with trg_i restricted to the K smallest
    directions from src_i, binned by (dir12, dir1, dir2)
    (reference: src/lattices/lattice_iterators.jl:258-355)."""
    K: int

    def output_size(self, lattice):
        return (lattice.n_dirs, self.K, self.K)


@dataclass(frozen=True)
class EachLocalQuadBySyncedDistance:
    """Like EachLocalQuadByDistance but with dir1 == dir2
    (reference: src/lattices/lattice_iterators.jl:384-467)."""
    K: int

    def output_size(self, lattice):
        return (lattice.n_dirs, self.K)
