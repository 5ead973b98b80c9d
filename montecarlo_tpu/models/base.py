"""Model abstraction (reference: src/models/abstract.jl:5-25).

A model bundles a lattice with Hamiltonian parameters and provides pure,
batch-ready kernel builders for its flavor:

* classical MC models (reference interface src/flavors/MC/MC_mandatory.jl:6-30:
  `rand`, `propose_local`, `accept_local!`, `energy`) provide
  ``rand_conf`` / ``make_sweep_fn`` / ``make_energy_fn`` / ``make_global_move_fn``
  — the per-site propose/accept pair is fused into a checkerboard-colored
  batched sweep kernel, the TPU-idiomatic equivalent.

* DQMC models (reference interface src/flavors/DQMC/DQMC_mandatory.jl:6-84:
  `rand`, `nflavors`, `hopping_matrix`, `interaction_matrix_exp!`,
  `propose_local`, `accept_local!`) provide ``hopping_matrix``,
  ``make_interaction_exp_fn`` and ``make_local_update_fn`` returning pure
  functions over (conf, greens) pytrees.
"""

from __future__ import annotations

from typing import Dict

from ..lattices.lattice import Lattice


class Model:
    """Base class for Hamiltonians."""

    lattice: Lattice

    def parameters(self) -> Dict:
        raise NotImplementedError

    def __len__(self):
        return len(self.lattice)
