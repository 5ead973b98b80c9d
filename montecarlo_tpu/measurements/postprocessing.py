"""Measurement post-processing (reference:
src/flavors/DQMC/measurements/extensions.jl).

Host-side numpy transforms of distance-binned measurement results:
reciprocal-lattice discretization, Fourier transforms / structure factors,
symmetry-weighted sums and the superfluid density derived from the
current-current susceptibility.
"""

from __future__ import annotations

import numpy as np


def reciprocal_discretization(lattice, L: int = None):
    """All q points of the reciprocal parallelogram folded to minimal norm
    (reference: reciprocal_distretization, extensions.jl:1-21)."""
    B = lattice.reciprocal_vectors()
    if lattice.dim != 2:
        raise NotImplementedError("reciprocal discretization is 2D only")
    v1, v2 = B[0], B[1]
    L = L or lattice.shape[0]
    qs = []
    for i in range(L):
        for j in range(L):
            best, bestn = None, np.inf
            for n in (-1, 0, 1):
                for m in (-1, 0, 1):
                    q = v1 * (n + i / L) + v2 * (m + j / L)
                    if np.linalg.norm(q) < bestn:
                        bestn = np.linalg.norm(q)
                        best = q
            qs.append(best)
    return np.array(qs)


def fourier_transform(qs, dirs, values):
    """F(q) = Σ_dir exp(i q·dir) · value[dir]
    (reference: fourier_transform, extensions.jl:24-42)."""
    qs = np.asarray(qs)
    dirs = np.asarray(dirs)
    values = np.asarray(values)
    phases = np.exp(1j * qs @ dirs.T)  # (nq, ndirs)
    return phases @ values


def structure_factor(qs, dirs, values):
    """Alias of fourier_transform (reference: extensions.jl:24)."""
    return fourier_transform(qs, dirs, values)


def uniform_fourier(values):
    """q = 0 component = plain sum (reference: uniform_fourier,
    extensions.jl:46-47)."""
    return np.sum(np.asarray(values), axis=0)


def apply_symmetry(data, weights=(1.0,)):
    """Contract the trailing direction axes of a (dirs[, K[, K]]) binned
    result with symmetry weights (e.g. s-wave/extended-s-wave form factors)
    (reference: apply_symmetry, extensions.jl:51-77)."""
    data = np.asarray(data)
    w = np.asarray(weights)
    if data.ndim == 1:
        return np.sum(w * data[: len(w)])
    if data.ndim == 2:
        return data[:, : len(w)] @ w
    if data.ndim == 3:
        return np.einsum("ijk,j,k->i", data[:, : len(w), : len(w)], w, w)
    raise ValueError(f"unsupported data rank {data.ndim}")


def superfluid_density(data, lattice, dirs=None):
    """Superfluid density from the (n_dirs, K) current-current susceptibility:
    rho_s ∝ Λ_T - Λ_L via the difference of transverse/longitudinal q→0 limits
    (reference: superfluid_density, extensions.jl:82-96)."""
    data = np.asarray(data)
    B = lattice.reciprocal_vectors()
    qx = B[0] / lattice.shape[0]
    qy = B[1] / lattice.shape[1]
    if dirs is None:
        dirs = lattice.directions
    out = 0.0 + 0.0j
    K = data.shape[1]
    for i in range(data.shape[0]):
        for j in range(K):
            d = dirs[j]
            out += (np.exp(1j * qy @ d) - np.exp(1j * qx @ d)) * data[i, j]
    return out
