"""Lattice layer tests (modeled on reference test/lattices.jl:1-50)."""

import numpy as np
import pytest

from montecarlo_tpu import (
    Chain, SquareLattice, CubicLattice, TriangularLattice, Honeycomb,
)


ALL = [
    (Chain(4), 4, 4, 2),
    (SquareLattice(4), 16, 32, 4),
    (CubicLattice(3), 27, 81, 6),
    (TriangularLattice(4), 16, 48, 6),
    (Honeycomb(3), 18, 27, 3),
]


@pytest.mark.parametrize("lat,nsites,nbonds,coord", ALL)
def test_counts(lat, nsites, nbonds, coord):
    assert len(lat) == nsites
    assert lat.n_bonds == nbonds
    assert lat.coordination == coord
    # every directed bond has its mirror (reference test/lattices.jl:1-32)
    dirbonds = {(int(s), int(t)) for s, t in lat.neighbors(directed=True)}
    for (s, t) in list(dirbonds):
        assert (t, s) in dirbonds
    # bonds unique
    und = lat.neighbors(directed=False)
    assert len({tuple(sorted(b)) for b in map(tuple, und)}) == len(und)


@pytest.mark.parametrize("lat,nsites,nbonds,coord", ALL)
def test_neighbor_table(lat, nsites, nbonds, coord):
    table = lat.neighbor_table
    assert table.shape == (nsites, coord)
    assert (table >= 0).all()  # all these lattices are regular
    for i in range(nsites):
        assert len(set(table[i])) == coord


@pytest.mark.parametrize("lat,nsites,nbonds,coord", ALL)
def test_checkerboard(lat, nsites, nbonds, coord):
    """Checkerboard groups partition the bonds into vertex-disjoint sets
    (reference: build_checkerboard, src/flavors/DQMC/abstract.jl:23-54)."""
    groups = lat.checkerboard_groups
    total = sum(len(g) for g in groups)
    assert total == lat.n_bonds
    for g in groups:
        sites = g.reshape(-1)
        assert len(set(sites.tolist())) == len(sites)  # vertex disjoint


def test_checkerboard_square_exact():
    """A 4x4 square lattice decomposes into 4 groups of 8 bonds
    (cf. reference test/integration_tests.jl:24 structure)."""
    lat = SquareLattice(4)
    groups = lat.checkerboard_groups
    assert sum(len(g) for g in groups) == 32
    for g in groups:
        assert len(g) <= lat.n_sites // 2


@pytest.mark.parametrize("lat,nsites,nbonds,coord", ALL)
def test_pair_dir(lat, nsites, nbonds, coord):
    pd = lat.pair_dir
    N = len(lat)
    assert pd.shape == (N, N)
    # direction 0 is onsite: exactly the diagonal for single-basis lattices
    if lat.n_basis == 1:
        assert (np.diag(pd) == 0).all()
        assert (pd[~np.eye(N, dtype=bool)] > 0).all()
    # every direction bin has the same multiplicity on a Bravais lattice
    counts = np.bincount(pd.reshape(-1))
    if lat.n_basis == 1:
        assert (counts == N).all()
    assert pd.max() + 1 == lat.n_dirs
    assert lat.directions.shape == (lat.n_dirs, lat.dim)
    # directions sorted by norm
    norms = np.linalg.norm(lat.directions, axis=1)
    assert norms[0] <= 1e-9
    assert (np.diff(np.round(norms, 6)) >= -1e-9).all()


def test_target_by_direction():
    lat = SquareLattice(4)
    K = 5  # onsite + 4 nearest neighbors
    trg, mask = lat.target_by_direction(K)
    assert mask.all()
    assert (trg[:, 0] == np.arange(16)).all()  # dir 0 = onsite
    # dirs 1..4 are the 4 nearest neighbors
    for src in range(16):
        assert set(trg[src, 1:].tolist()) == set(lat.neighbor_table[src].tolist())


def test_positions_and_vectors():
    lat = SquareLattice(4)
    assert lat.positions.shape == (16, 2)
    assert np.allclose(lat.lattice_vectors(), np.diag([4.0, 4.0]))
    B = lat.reciprocal_vectors()
    A = lat.unitcell.primitive_vectors
    assert np.allclose(A @ B.T, 2 * np.pi * np.eye(2))
