"""ALPS XML lattice import (reference: src/lattices/ALPS.jl:18-91)."""

import numpy as np
import pytest

from montecarlo_tpu import ALPSLattice, ArbitraryLattice, SquareLattice
from montecarlo_tpu import DQMC, HubbardModelAttractive


def _write_square_xml(path, L=2):
    """A periodic LxL square lattice as an ALPS GRAPH file (1-based ids)."""
    lat = SquareLattice(L)
    lines = [f'<GRAPH vertices="{lat.n_sites}" dimension="2">']
    for i, p in enumerate(lat.positions):
        lines.append(f'  <VERTEX id="{i+1}"><COORDINATE>{p[0]} {p[1]}'
                     f'</COORDINATE></VERTEX>')
    for b, (s, t, ty) in enumerate(lat.bonds):
        d = lat.positions[t] - lat.positions[s]
        lines.append(f'  <EDGE source="{s+1}" target="{t+1}" id="{b+1}" '
                     f'type="{ty}" vector="{d[0]} {d[1]}"/>')
    lines.append("</GRAPH>")
    path.write_text("\n".join(lines))
    return lat


def test_alps_parse_matches_native(tmp_path):
    fn = tmp_path / "square.xml"
    native = _write_square_xml(fn, L=2)
    lat = ALPSLattice(str(fn))
    assert len(lat) == native.n_sites
    assert lat.n_bonds == native.n_bonds
    assert np.array_equal(lat.bonds, native.bonds)
    assert np.allclose(lat.positions, native.positions)
    # neighbor tables carry the same multisets
    for i in range(len(lat)):
        assert sorted(lat.neighbor_table[i]) == sorted(native.neighbor_table[i])
    assert len(lat.checkerboard_groups) >= 2
    assert sum(len(g) for g in lat.checkerboard_groups) == lat.n_bonds


def test_alps_dqmc_end_to_end(tmp_path):
    """DQMC on an imported ALPS lattice reproduces half filling at mu=0."""
    fn = tmp_path / "square.xml"
    _write_square_xml(fn, L=2)
    lat = ALPSLattice(str(fn))
    model = HubbardModelAttractive(l=lat, U=4.0, mu=0.0)
    mc = DQMC(model, beta=1.0, n_chains=16, seed=3, sweeps=80,
              thermalization=40, measure_rate=2, print_rate=10 ** 9)
    assert mc.run(verbose=False)
    occ = mc.observables()["occ"]["occ"].mean
    assert np.max(np.abs(occ - 0.5)) < 0.05


def test_alps_checkpoint_roundtrip(tmp_path):
    from montecarlo_tpu.io.checkpoint import save, load
    fn = tmp_path / "square.xml"
    _write_square_xml(fn, L=2)
    lat = ALPSLattice(str(fn))
    model = HubbardModelAttractive(l=lat, U=2.0, mu=0.0)
    mc = DQMC(model, beta=1.0, n_chains=4, seed=1, sweeps=10,
              thermalization=0, print_rate=10 ** 9)
    mc.run(verbose=False)
    ck = str(tmp_path / "alps.mctpu")
    save(ck, mc)
    mc2 = load(ck)
    assert isinstance(mc2.model.lattice, ArbitraryLattice)
    assert np.array_equal(np.asarray(mc2.state["conf"]),
                          np.asarray(mc.state["conf"]))


def test_arbitrary_lattice_no_positions_errors():
    lat = ArbitraryLattice(n_sites=4, bonds=[[0, 1, 0], [1, 2, 0],
                                             [2, 3, 0], [3, 0, 0]])
    with pytest.raises(ValueError, match="positions"):
        _ = lat.pair_dir


def test_alps_rejects_unsorted_edges(tmp_path):
    fn = tmp_path / "bad.xml"
    fn.write_text('<GRAPH vertices="2" dimension="1">'
                  '<EDGE source="1" target="2" id="7"/></GRAPH>')
    with pytest.raises(ValueError, match="sorted"):
        ALPSLattice(str(fn))
