"""Concrete lattices (reference: src/lattices/{chain,square,cubic,triangular,
honeycomb}.jl), all realized through the generic Bravais-with-basis builder."""

from __future__ import annotations

import numpy as np

from .lattice import Lattice, UnitCell


def Chain(L: int) -> Lattice:
    """1D periodic chain (reference: src/lattices/chain.jl)."""
    uc = UnitCell(
        name="chain",
        primitive_vectors=np.eye(1),
        basis=np.zeros((1, 1)),
        bonds=((0, 0, (1,), 0),),
    )
    return Lattice(uc, (L,))


def SquareLattice(L: int) -> Lattice:
    """2D periodic square lattice (reference: src/lattices/square.jl:25-46,
    bonds = up and right neighbor per site)."""
    uc = UnitCell(
        name="square",
        primitive_vectors=np.eye(2),
        basis=np.zeros((1, 2)),
        bonds=((0, 0, (1, 0), 0), (0, 0, (0, 1), 0)),
    )
    return Lattice(uc, (L, L))


def CubicLattice(L: int) -> Lattice:
    """3D periodic cubic lattice (reference: src/lattices/cubic.jl)."""
    uc = UnitCell(
        name="cubic",
        primitive_vectors=np.eye(3),
        basis=np.zeros((1, 3)),
        bonds=((0, 0, (1, 0, 0), 0), (0, 0, (0, 1, 0), 0), (0, 0, (0, 0, 1), 0)),
    )
    return Lattice(uc, (L, L, L))


def TriangularLattice(L: int, Lx: int = None, Ly: int = None) -> Lattice:
    """2D triangular lattice, 6 nearest neighbors
    (reference: src/lattices/triangular.jl:24-102; the reference's sheared
    coordinates are replaced by the standard 60-degree primitive vectors)."""
    Lx = Lx or L
    Ly = Ly or L
    a1 = np.array([1.0, 0.0])
    a2 = np.array([0.5, np.sqrt(3) / 2])
    uc = UnitCell(
        name="triangular",
        primitive_vectors=np.stack([a1, a2]),
        basis=np.zeros((1, 2)),
        bonds=((0, 0, (1, 0), 0), (0, 0, (0, 1), 0), (0, 0, (1, -1), 0)),
    )
    return Lattice(uc, (Lx, Ly))


def Honeycomb(L: int) -> Lattice:
    """2D honeycomb lattice with a 2-site basis (the reference's
    src/lattices/honeycomb.jl:1-136 is entirely commented out; this is the
    native 2-site-basis implementation that replaces the LatPhys bridge)."""
    a1 = np.array([np.sqrt(3), 0.0])
    a2 = np.array([np.sqrt(3) / 2, 1.5])
    basis = np.array([[0.0, 0.0], [np.sqrt(3) / 2, 0.5]])
    uc = UnitCell(
        name="honeycomb",
        primitive_vectors=np.stack([a1, a2]),
        basis=basis,
        bonds=(
            (0, 1, (0, 0), 0),
            (0, 1, (-1, 0), 0),
            (0, 1, (0, -1), 0),
        ),
    )
    return Lattice(uc, (L, L))


def GenericLattice(primitive_vectors, basis, bonds, shape, name="generic") -> Lattice:
    """Arbitrary unit-cell lattice — the native replacement for the reference's
    LatPhys bridge (src/lattices/LatPhys.jl) and ALPS XML lattices
    (src/lattices/ALPS.jl)."""
    uc = UnitCell(
        name=name,
        primitive_vectors=np.asarray(primitive_vectors, dtype=float),
        basis=np.asarray(basis, dtype=float),
        bonds=tuple((int(a), int(b), tuple(int(o) for o in off), int(t))
                    for (a, b, off, t) in bonds),
    )
    return Lattice(uc, shape)


def choose_lattice(dims: int, L: int) -> Lattice:
    """Pick Chain/Square/Cubic by dimensionality (reference: choose_lattice,
    src/models/Ising/IsingModel.jl:17-34 uses the same rule)."""
    if dims == 1:
        return Chain(L)
    if dims == 2:
        return SquareLattice(L)
    if dims == 3:
        return CubicLattice(L)
    raise ValueError(f"No default lattice for dims={dims}")
