"""Lattice layer: host-built static geometry baked into XLA traces.

TPU-native counterpart of the reference's lattice layer
(src/lattices/abstract.jl:4-92 and concrete lattices). Lattices here are plain
host-side numpy data: neighbor tables, bond tables, positions and periodicity
vectors. Device kernels never see a "lattice object" — they see static int32
index arrays (gathers) produced once at trace time, which is the idiomatic JAX
replacement for the reference's HasNeighborsTable / HasBondsTable traits.

The generic Bravais-with-basis builder covers every concrete lattice of the
reference (Chain, Square, Cubic, Triangular — src/lattices/{chain,square,cubic,
triangular}.jl) plus Honeycomb (stubbed in the reference, src/lattices/
honeycomb.jl:1-136) and arbitrary user unit cells (the role of the LatPhys /
ALPS bridges, src/lattices/LatPhys.jl, src/lattices/ALPS.jl).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import cached_property
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass(frozen=True)
class UnitCell:
    """A Bravais lattice with a basis.

    primitive_vectors: (dim, dim) rows are the primitive lattice vectors a_i.
    basis: (n_basis, dim) fractional-free cartesian positions inside the cell.
    bonds: sequence of (basis_from, basis_to, cell_offset, bond_type) where
        cell_offset is a dim-tuple of unit-cell displacements.
    """

    name: str
    primitive_vectors: np.ndarray
    basis: np.ndarray
    bonds: Tuple[Tuple[int, int, Tuple[int, ...], int], ...]


class Lattice:
    """A finite periodic lattice with static index tables.

    Attributes (all host numpy):
      n_sites            total number of sites N
      positions          (N, dim) cartesian positions
      cell_vectors       (dim, dim) full periodicity vectors (L_i * a_i)
      neighbor_table     (N, z_max) int32 site indices of directed neighbors,
                         -1 padded (reference: `l.neighs`, transposed layout)
      bonds              (n_bonds, 3) int32 (src, trg, type) — each undirected
                         bond appears ONCE (reference: `l.bonds`)
    """

    def __init__(self, unitcell: UnitCell, shape: Sequence[int]):
        uc = unitcell
        self.unitcell = uc
        self.shape = tuple(int(s) for s in shape)
        dim = uc.primitive_vectors.shape[0]
        assert len(self.shape) == dim, "shape must have one extent per dimension"
        self.dim = dim
        nb = uc.basis.shape[0]
        self.n_basis = nb

        # site index = basis + nb * (c_0 + L_0 * (c_1 + L_1 * (...)))
        cells = list(itertools.product(*[range(L) for L in reversed(self.shape)]))
        # store cell coords in natural order (c_0 fastest)
        cells = [tuple(reversed(c)) for c in cells]
        self._cells = np.array(sorted(cells, key=lambda c: self._cell_rank(c)), dtype=np.int64)
        self.n_cells = len(self._cells)
        self.n_sites = self.n_cells * nb

        A = uc.primitive_vectors
        self.positions = np.zeros((self.n_sites, dim))
        for ci, c in enumerate(self._cells):
            r = c @ A
            for b in range(nb):
                self.positions[nb * ci + b] = r + uc.basis[b]
        self.cell_vectors = (np.array(self.shape)[:, None] * A).astype(float)

        self._build_bonds()
        self._build_neighbor_table()

    # ------------------------------------------------------------------ build
    def _cell_rank(self, c) -> int:
        rank = 0
        for L, x in zip(reversed(self.shape), reversed(c)):
            rank = rank * L + x
        return rank

    def _cell_index(self, c) -> int:
        c = tuple(int(x) % L for x, L in zip(c, self.shape))
        return self._cell_rank(c)

    def site_index(self, cell, basis: int = 0) -> int:
        return self.n_basis * self._cell_index(cell) + basis

    def _build_bonds(self):
        uc = self.unitcell
        bonds = []
        for ci, c in enumerate(self._cells):
            for (b_from, b_to, off, btype) in uc.bonds:
                src = self.n_basis * ci + b_from
                trg = self.site_index(np.array(c) + np.array(off), b_to)
                bonds.append((src, trg, btype))
        self.bonds = np.array(bonds, dtype=np.int32).reshape(-1, 3)
        self.n_bonds = len(self.bonds)

    def _build_neighbor_table(self):
        nbrs: List[List[int]] = [[] for _ in range(self.n_sites)]
        for (src, trg, _t) in self.bonds:
            nbrs[src].append(int(trg))
            if trg != src:
                nbrs[trg].append(int(src))
        z = max((len(x) for x in nbrs), default=0)
        table = -np.ones((self.n_sites, z), dtype=np.int32)
        for i, x in enumerate(nbrs):
            table[i, : len(x)] = x
        self.neighbor_table = table
        self.coordination = z

    # -------------------------------------------------------------- interface
    def __len__(self):
        return self.n_sites

    @property
    def size(self):
        return self.shape

    def neighbors(self, directed: bool = True) -> np.ndarray:
        """(n, 2) array of (src, trg) pairs. directed=True lists both
        orientations of every bond (reference: neighbors(l, Val(true)),
        src/lattices/abstract.jl:61-115)."""
        und = self.bonds[:, :2]
        if not directed:
            return und
        return np.concatenate([und, und[:, ::-1]], axis=0)

    def lattice_vectors(self) -> np.ndarray:
        return self.cell_vectors

    def reciprocal_vectors(self) -> np.ndarray:
        """Reciprocal primitive vectors (reference: src/lattices/abstract.jl:118-123)."""
        A = self.unitcell.primitive_vectors
        B = 2 * np.pi * np.linalg.inv(A).T
        return B

    # --------------------------------------------------------- checkerboard
    @cached_property
    def checkerboard_groups(self) -> List[np.ndarray]:
        """Greedy edge coloring of the bond list into groups of vertex-disjoint
        bonds (reference: build_checkerboard, src/flavors/DQMC/abstract.jl:23-54).
        Returns a list of (n_g, 2) int arrays of (src, trg)."""
        bonds = [(int(s), int(t)) for (s, t, _ty) in self.bonds]
        n_bonds = len(bonds)
        used = np.zeros(n_bonds, dtype=bool)
        groups = []
        while not used.all():
            sites_used = np.zeros(self.n_sites, dtype=bool)
            group = []
            for bid, (src, trg) in enumerate(bonds):
                if used[bid] or sites_used[src] or sites_used[trg]:
                    continue
                used[bid] = True
                sites_used[src] = True
                sites_used[trg] = True
                group.append((src, trg))
            groups.append(np.array(group, dtype=np.int32))
        return groups

    def state_dict(self):
        """Serializable description sufficient to rebuild the lattice."""
        uc = self.unitcell
        return {
            "name": uc.name,
            "primitive_vectors": np.asarray(uc.primitive_vectors),
            "basis": np.asarray(uc.basis),
            "bonds": [[a, b, list(off), t] for (a, b, off, t) in uc.bonds],
            "shape": list(self.shape),
        }

    @cached_property
    def site_colors(self) -> List[np.ndarray]:
        """Greedy graph coloring of SITES (no two adjacent sites share a
        color). Used for parallel checkerboard Metropolis sweeps: all sites of
        one color can be updated simultaneously. Square/cubic lattices get the
        classic 2-color checkerboard."""
        N = self.n_sites
        color = -np.ones(N, dtype=np.int64)
        for i in range(N):
            used = {color[j] for j in self.neighbor_table[i] if j >= 0 and color[j] >= 0}
            c = 0
            while c in used:
                c += 1
            color[i] = c
        ncolors = color.max() + 1
        return [np.where(color == c)[0].astype(np.int32) for c in range(ncolors)]

    # ------------------------------------------------------ direction binning
    @cached_property
    def _pair_binning(self):
        return _bin_pairs_by_distance(self.positions, self.cell_vectors)

    @property
    def pair_dir(self) -> np.ndarray:
        """(N, N) int32: pair_dir[src, trg] = direction-bin index of the
        minimal periodic displacement pos[src] - pos[trg], sorted by
        directed norm with dir 0 = onsite (reference: EachSitePairByDistance,
        src/lattices/lattice_iterators.jl:131-221, 0-based here)."""
        return self._pair_binning[0]

    @property
    def directions(self) -> np.ndarray:
        """(n_dirs, dim) displacement vector of each direction bin
        (reference: directions(...), src/lattices/lattice_iterators.jl:482-526)."""
        return self._pair_binning[1]

    @property
    def n_dirs(self) -> int:
        return self._pair_binning[1].shape[0]

    def target_by_direction(self, K: int) -> Tuple[np.ndarray, np.ndarray]:
        """(N, K) int32 table trg[src, k] = the site at direction k from src,
        plus a (N, K) validity mask. Directions with multiple targets from one
        site cannot occur on a periodic Bravais-basis lattice; missing ones are
        masked. Used by EachLocalQuadByDistance{K}
        (src/lattices/lattice_iterators.jl:258-355)."""
        pd = self.pair_dir
        N = self.n_sites
        trg = -np.ones((N, K), dtype=np.int32)
        for src in range(N):
            for t in range(N):
                d = pd[src, t]
                if d < K:
                    trg[src, d] = t
        mask = trg >= 0
        return trg, mask


def _directed_norm(v: np.ndarray, eps: float = 1e-6) -> float:
    """norm + eps * polar angle, to give directions a unique sort key
    (reference: directed_norm, src/lattices/lattice_iterators.jl:146-156)."""
    l = np.linalg.norm(v)
    if v.shape[0] == 2 and l > eps:
        ang = np.arccos(np.clip(v[0] / l, -1.0, 1.0))
        if v[1] < 0:
            ang = 2 * np.pi - ang
        return l + eps * ang
    return l


def _bin_pairs_by_distance(positions: np.ndarray, cell_vectors: np.ndarray,
                           eps: float = 1e-6):
    """Bin all (src, trg) pairs by their minimal periodic displacement
    pos[src] - pos[trg] (reference: EachSitePairByDistance constructor,
    src/lattices/lattice_iterators.jl:157-199)."""
    N, dim = positions.shape
    shifts = _generate_combinations(cell_vectors)
    # all displacements: (N, N, dim)
    disp = positions[:, None, :] - positions[None, :, :]
    # choose wrap minimizing directed norm
    cand = disp[:, :, None, :] + shifts[None, None, :, :]  # (N,N,S,dim)
    norms = np.linalg.norm(cand, axis=-1)
    if dim == 2:
        l = norms
        with np.errstate(invalid="ignore", divide="ignore"):
            ang = np.arccos(np.clip(cand[..., 0] / np.where(l > eps, l, 1.0), -1, 1))
        ang = np.where(cand[..., 1] < 0, 2 * np.pi - ang, ang)
        key = np.where(l > eps, l + eps * ang, l)
    else:
        key = norms
    best = np.argmin(key + 1e-12 * np.arange(len(shifts)), axis=-1)
    md = np.take_along_axis(cand, best[:, :, None, None], axis=2)[:, :, 0, :]

    # unique directions within eps
    dirs: List[np.ndarray] = []
    pair_dir = np.zeros((N, N), dtype=np.int32)
    # quantize for fast uniqueness
    q = np.round(md / eps).astype(np.int64)
    uniq, inv = np.unique(q.reshape(-1, dim), axis=0, return_inverse=True)
    uniq_vecs = uniq * eps
    keys = np.array([_directed_norm(v, eps) for v in uniq_vecs])
    order = np.argsort(keys, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    pair_dir = rank[inv].reshape(N, N).astype(np.int32)
    dirs = uniq_vecs[order]
    # snap near-zero to exact zero
    dirs[np.abs(dirs) < eps / 2] = 0.0
    return pair_dir, dirs


def _generate_combinations(vs: np.ndarray) -> np.ndarray:
    """All {-1, 0, +1} integer combinations of the periodicity vectors
    (reference: generate_combinations, src/lattices/lattice_iterators.jl:136-143)."""
    out = [np.zeros(vs.shape[1])]
    for v in vs:
        out = [e - v for e in out] + out + [e + v for e in out]
    return np.stack(out, axis=0)
