"""Ising model (reference: src/models/Ising/IsingModel.jl).

H = - sum_<i,j> sigma_i sigma_j  (J = 1, reference energy at
src/models/Ising/IsingModel.jl:149-185).

Kernels are built per-lattice as pure jittable functions batched over a leading
chains axis:

* Metropolis sweep: checkerboard-colored parallel updates — sites of one
  graph-coloring class have no mutual bonds, so the reference's sequential
  per-site propose/accept loop (src/flavors/MC/MC.jl:316-332 +
  IsingModel.jl:74-89) becomes one batched flip decision per color class,
* Wolff cluster (reference: global_move, IsingModel.jl:111-140) as an
  on-device masked BFS inside ``lax.while_loop``, batched over chains.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .base import Model
from ..lattices.library import choose_lattice
from ..lattices.lattice import Lattice

#: Exact critical temperature of the 2D Ising model
#: (reference: IsingTc, src/models/Ising/IsingModel.jl:7)
IsingTc = 2.0 / math.log(1.0 + math.sqrt(2.0))


class IsingModel(Model):
    """Ising model on a Chain/Square/Cubic (or any) lattice
    (reference: src/models/Ising/IsingModel.jl:17-44)."""

    def __init__(self, dims: int = None, L: int = None, l: Lattice = None, **kwargs):
        if l is None:
            if dims is None or L is None:
                raise ValueError("IsingModel requires either l=lattice or dims and L")
            l = choose_lattice(dims, L)
        self.lattice = l

    def parameters(self) -> Dict:
        return {"dims": self.lattice.dim, "L": self.lattice.shape[0]}

    def __repr__(self):
        return f"IsingModel({len(self.lattice)} sites)"

    # -------------------------------------------------------------- conf init
    def rand_conf(self, key, n_chains: int):
        """Random ±1 spin configurations, (C, N) int8
        (reference: `rand(MC, model)`, src/models/Ising/IsingModel.jl)."""
        N = len(self.lattice)
        bits = jax.random.bernoulli(key, 0.5, (n_chains, N))
        return (2 * bits.astype(jnp.int8) - 1)

    # --------------------------------------------------------------- kernels
    def make_energy_fn(self):
        """E(conf) per chain: -sum_bonds s_src s_trg
        (reference: energy, IsingModel.jl:149-185)."""
        bonds = jnp.asarray(self.lattice.bonds[:, :2], jnp.int32)

        def energy(conf):  # conf (C, N) int8
            s = conf.astype(jnp.float64)
            return -jnp.sum(s[:, bonds[:, 0]] * s[:, bonds[:, 1]], axis=1)

        return energy

    def make_magnetization_fn(self):
        def magnetization(conf):
            return jnp.abs(jnp.sum(conf.astype(jnp.float64), axis=1))

        return magnetization

    def make_sweep_fn(self, beta: float):
        """One full checkerboard Metropolis sweep over all sites
        (replaces the sequential loop of src/flavors/MC/MC.jl:316-332 with
        per-color batched updates; Delta E = 2 s_i sum_nn s_j as in
        IsingModel.jl:74-81)."""
        lat = self.lattice
        table = jnp.asarray(lat.neighbor_table, jnp.int32)  # (N, z)
        colors = [jnp.asarray(c, jnp.int32) for c in lat.site_colors]
        beta = float(beta)

        def sweep(conf, key):
            # conf: (C, N) int8
            C = conf.shape[0]
            n_acc = jnp.zeros((), jnp.int64)
            for idx in colors:  # static unroll over color classes
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (C, idx.shape[0]), jnp.float64)
                nbr = table[idx]  # (n_c, z)
                s = conf.astype(jnp.int32)
                nnsum = jnp.sum(s[:, nbr], axis=2)  # (C, n_c)
                dE = (2 * s[:, idx] * nnsum).astype(jnp.float64)
                accept = (dE <= 0) | (u < jnp.exp(-beta * dE))
                flip = (1 - 2 * accept.astype(jnp.int8))
                conf = conf.at[:, idx].multiply(flip)
                n_acc = n_acc + jnp.sum(accept, dtype=jnp.int64)
            return conf, key, n_acc

        return sweep

    def make_global_move_fn(self, beta: float):
        """Wolff cluster update (reference: global_move, IsingModel.jl:111-140)
        as a batched masked BFS: per iteration every frontier site tries to
        activate its bonds to equal-spin non-cluster neighbors with
        probability p = 1 - exp(-2 beta); terminates when every chain's
        frontier is empty. Each candidate bond is tried at most once, matching
        the sequential stack algorithm."""
        lat = self.lattice
        table = jnp.asarray(lat.neighbor_table, jnp.int32)  # (N, z)
        N = len(lat)
        z = table.shape[1]
        p_add = 1.0 - math.exp(-2.0 * float(beta))

        def global_move(conf, key):
            C = conf.shape[0]
            key, k_seed = jax.random.split(key)
            seeds = jax.random.randint(k_seed, (C,), 0, N)
            in_cluster = jnp.zeros((C, N), bool).at[jnp.arange(C), seeds].set(True)
            seed_spin = jnp.take_along_axis(conf, seeds[:, None], axis=1)  # (C,1)

            def cond(carry):
                in_cluster, frontier, key = carry
                return jnp.any(frontier)

            def body(carry):
                in_cluster, frontier, key = carry
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (C, N, z), jnp.float64)
                nbr_spin = conf[:, table]                      # (C, N, z)
                nbr_in = in_cluster[:, table]                  # (C, N, z)
                try_add = (
                    frontier[:, :, None]
                    & (nbr_spin == seed_spin[:, :, None])
                    & ~nbr_in
                    & (u < p_add)
                )  # (C, N, z): site i's bond k activates neighbor table[i,k]
                # scatter-or onto targets
                flat_t = table.reshape(-1)                      # (N*z,)
                add = try_add.reshape(C, -1)
                new_sites = jnp.zeros((C, N), bool).at[:, flat_t].max(add)
                new_frontier = new_sites & ~in_cluster
                return in_cluster | new_frontier, new_frontier, key

            in_cluster, _, key = jax.lax.while_loop(
                cond, body, (in_cluster, in_cluster, key)
            )
            flipped = jnp.where(in_cluster, -conf, conf)
            cluster_size = jnp.sum(in_cluster, axis=1)
            return flipped, key, cluster_size

        return global_move

    def default_measurements(self, mc):
        from ..measurements.ising import (
            IsingEnergyMeasurement, IsingMagnetizationMeasurement,
        )
        return {
            "Energy": IsingEnergyMeasurement(mc, self),
            "Magn": IsingMagnetizationMeasurement(mc, self),
        }
