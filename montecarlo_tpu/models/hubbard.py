"""Hubbard models for DQMC (reference: src/models/HubbardModel/).

Both models use a discrete Hirsch Hubbard-Stratonovich field sigma(i, l) = ±1
(reference: HubbardConf, src/models/HubbardModel/HubbardModel.jl:4-5), stored
here as an int8 array of shape (chains, N, slices).

The flavor-block structure replaces the reference's BlockDiagonal matrices
(src/models/HubbardModel/HubbardModelRepulsive.jl:68-69): Green's functions and
propagators carry a leading flavor axis F (F=1 attractive — spin-symmetric,
F=2 repulsive — up/down blocks with opposite HS coupling), and all linear
algebra broadcasts over it.

Local update data (used by dqmc/sweep.py):
  lambda      = acosh(exp(U*dtau/2))   Hirsch coupling
  flavor_signs (F,): +1 attractive; (+1, -1) repulsive
  delta_f     = exp(sign_f * dE_boson) - 1 with dE_boson = -2*lambda*sigma
  r_f         = 1 + delta_f*(1 - G_f[i,i])
  detratio    = prod_f r_f ** (2/F)    (attractive squares its single block,
                reference HubbardModelAttractive.jl:113-127; repulsive takes
                the 2x2 block-diagonal determinant, HubbardModelRepulsive.jl:128-156)
  Metropolis weight = exp(-dE_boson * use_boson_weight) * detratio
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .base import Model
from ..lattices.lattice import Lattice
from ..lattices.library import choose_lattice


class _HubbardBase(Model):
    nflavors: int = 1
    flavor_signs = (1.0,)
    use_boson_weight: bool = True

    def __init__(self, dims: int = 2, L: int = None, l: Lattice = None,
                 t: float = 1.0, U: float = 1.0, mu: float = 0.0,
                 peierls=None):
        """peierls: optional (N, N) real antisymmetric phase matrix θ —
        hopping acquires Peierls factors T[i, j] = -t·e^{iθ[i,j]} (magnetic
        flux / complex Hamiltonian support; the Green's function and all
        propagators become complex — reference `greenseltype` hook,
        src/flavors/DQMC/DQMC_optional.jl:7-40, with the complex UDT paths
        of src/linalg/UDT.jl:316-469)."""
        if l is None:
            if L is None:
                raise ValueError("need l=lattice or L (+dims)")
            l = choose_lattice(dims, L)
        self.lattice = l
        self.l = l
        self.t = float(t)
        self.U = float(U)
        assert self.U >= 0.0, "U is the absolute interaction strength"
        self.mu = float(mu)
        if peierls is not None:
            peierls = np.asarray(peierls, np.float64)
            assert peierls.shape == (len(l), len(l)), "peierls must be (N, N)"
            assert np.allclose(peierls, -peierls.T), \
                "peierls phases must be antisymmetric (Hermitian hopping)"
        self.peierls = peierls

    @property
    def greens_eltype(self):
        """Element type of the Green's function (reference: greenseltype,
        DQMC_optional.jl:7-14)."""
        return np.complex128 if self.peierls is not None else np.float64

    def parameters(self) -> Dict:
        p = {"t": self.t, "U": self.U, "mu": self.mu}
        if self.peierls is not None:
            # persist the flux pattern: without it a checkpoint would silently
            # resume as the flux-free real model
            p["peierls"] = np.asarray(self.peierls)
        if hasattr(self.lattice, "unitcell"):
            p.update(dims=self.lattice.dim, L=self.lattice.shape[0])
        return p

    # ------------------------------------------------------------------ conf
    def rand_conf(self, key, n_chains: int, n_slices: int):
        """Random ±1 HS field, (C, N, M) int8 (reference:
        rand(DQMC, m, nslices), HubbardModel.jl:46-48)."""
        N = len(self.lattice)
        bits = jax.random.bernoulli(key, 0.5, (n_chains, N, n_slices))
        return 2 * bits.astype(jnp.int8) - 1

    # --------------------------------------------------------------- physics
    def hopping_matrix(self) -> np.ndarray:
        """(N, N) hopping matrix incl. chemical potential
        (reference: HubbardModelAttractive.jl:78-91 — -t on NN bonds, -mu on
        the diagonal; the repulsive model has mu = 0,
        HubbardModelRepulsive.jl:86-100)."""
        N = len(self.lattice)
        cplx = self.peierls is not None
        T = np.zeros((N, N), np.complex128 if cplx else np.float64)
        np.fill_diagonal(T, -self.mu)
        for (src, trg) in self.lattice.neighbors(directed=True):
            amp = -self.t
            if cplx:
                amp = amp * np.exp(1j * self.peierls[trg, src])
            T[trg, src] += amp
        return T

    def lamb(self, delta_tau: float) -> float:
        """Hirsch lambda = acosh(exp(U*dtau/2))
        (reference: HubbardModelAttractive.jl:100-110)."""
        return math.acosh(math.exp(0.5 * self.U * float(delta_tau)))

    def interaction_exp_diag(self, conf_slice, delta_tau: float, power: float = 1.0):
        """diag of exp(-power*dtau*V(slice)) as an (..., F, N) array.
        conf_slice: (..., N) int8 field at one time slice
        (reference: interaction_matrix_exp!, HubbardModelAttractive.jl:100-110
        and HubbardModelRepulsive.jl:113-126)."""
        lam = self.lamb(delta_tau)
        signs = jnp.asarray(self.flavor_signs)
        s = conf_slice.astype(jnp.float64)
        return jnp.exp(math.copysign(1.0, power) * lam *
                       signs[..., :, None] * s[..., None, :])

    def energy_boson(self, conf, delta_tau: float):
        """Bosonic (HS-field) energy per chain
        (reference: energy_boson, HubbardModelAttractive.jl:161-166;
        repulsive has none, HubbardModelRepulsive.jl:238-243)."""
        if not self.use_boson_weight:
            return jnp.zeros(conf.shape[0], jnp.float64)
        lam = self.lamb(delta_tau)
        return lam * jnp.sum(conf, axis=(1, 2)).astype(jnp.float64)

    def __repr__(self):
        return (f"{type(self).__name__}({len(self.lattice)} sites, t={self.t}, "
                f"U={self.U}, mu={self.mu})")


class HubbardModelAttractive(_HubbardBase):
    """Attractive (-|U|) Hubbard model, spin-symmetric: one flavor block,
    detratio = r^2 (reference: src/models/HubbardModel/HubbardModelAttractive.jl)."""

    nflavors = 1
    flavor_signs = (1.0,)
    use_boson_weight = True


class HubbardModelRepulsive(_HubbardBase):
    """Repulsive (+|U|) Hubbard model: two flavor blocks with opposite HS
    coupling, no bosonic weight (reference:
    src/models/HubbardModel/HubbardModelRepulsive.jl)."""

    nflavors = 2
    flavor_signs = (1.0, -1.0)
    use_boson_weight = False

    def __init__(self, dims: int = 2, L: int = None, l: Lattice = None,
                 t: float = 1.0, U: float = 1.0, mu: float = 0.0,
                 peierls=None):
        assert mu == 0.0, "the repulsive model is defined at half filling (mu=0)"
        super().__init__(dims=dims, L=L, l=l, t=t, U=U, mu=0.0,
                         peierls=peierls)

    def parameters(self) -> Dict:
        p = super().parameters()
        p.pop("mu", None)
        return p


def HubbardModel(*args, U: float = 1.0, **kwargs):
    """Dispatch on the sign of U (reference: HubbardModel,
    src/models/HubbardModel/HubbardModel.jl:14-20): U > 0 -> repulsive,
    U < 0 -> attractive (with |U|)."""
    if U > 0:
        return HubbardModelRepulsive(*args, U=U, **kwargs)
    return HubbardModelAttractive(*args, U=-U, **kwargs)
