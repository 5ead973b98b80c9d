"""Standard DQMC observables via Wick's theorem.

TPU-native rewrite of the reference's measurement kernels
(src/flavors/DQMC/measurements/measurements.jl): the per-index kernels become
whole-array contractions — an (N,N) kernel matrix is formed with elementwise/
outer-product algebra and reduced over direction bins with `segment_sum`
(replacing the EachSitePairByDistance loop, generic.jl:331-336); quad
iterators become K×K gathered kernel matrices.

Spin structure: Green's functions carry a flavor-block axis (F, N, N).
G[up block] = G[0]; G[down block] = G[F-1] (attractive F=1: both are the same
block, automatically reproducing the reference's collapsed attractive kernels,
HubbardModelAttractive.jl:219-267; repulsive F=2: the reference's
BlockDiagonal generic kernels with all cross-spin entries = 0).

Normalization follows generic.jl:283-294: distance-binned and quad outputs are
divided by N; susceptibility integrals are weighted by delta_tau (later).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .core import Measurement


def _blocks(G):
    """(G_up, G_dn) views of a (F, N, N) Green's function."""
    return G[0], G[-1]


def _updn(G):
    Gu, Gd = _blocks(G)
    N = Gu.shape[-1]
    I = jnp.eye(N, dtype=Gu.dtype)
    return Gu, Gd, I


# ---------------------------------------------------------------- kernel mats
def cdc_matrix(G):
    """Charge density correlation kernel matrix K[i, j]
    (reference: cdc_kernel, measurements.jl:60-74)."""
    Gu, Gd, I = _updn(G)
    du = 1.0 - jnp.diagonal(Gu)
    dd = 1.0 - jnp.diagonal(Gd)
    nn = (du[:, None] * du[None, :] + du[:, None] * dd[None, :] +
          dd[:, None] * du[None, :] + dd[:, None] * dd[None, :])
    return nn + (I - Gu.T) * Gu + (I - Gd.T) * Gd


def sdc_x_matrix(G):
    """(reference: sdc_x_kernel, measurements.jl:148-154; cross-spin entries
    vanish for block-diagonal G)."""
    Gu, Gd, I = _updn(G)
    return (I - Gu.T) * Gd + (I - Gd.T) * Gu


sdc_y_matrix = sdc_x_matrix  # identical for block-diagonal G


def sdc_z_matrix(G):
    """(reference: sdc_z_kernel, measurements.jl:181-187)."""
    Gu, Gd, I = _updn(G)
    du = 1.0 - jnp.diagonal(Gu)
    dd = 1.0 - jnp.diagonal(Gd)
    nn = (du[:, None] * du[None, :] - du[:, None] * dd[None, :] -
          dd[:, None] * du[None, :] + dd[:, None] * dd[None, :])
    return nn + (I - Gu.T) * Gu + (I - Gd.T) * Gd


def mz_vector(G):
    """m_z(i) = G_dn[i,i] - G_up[i,i] (reference: mz_kernel,
    measurements.jl:124-127)."""
    Gu, Gd = _blocks(G)
    return jnp.diagonal(Gd) - jnp.diagonal(Gu)


# ------------------------------------------------------------- reductions
def _segment_by_dir(K, pair_dir_flat, n_dirs, N):
    return jax.ops.segment_sum(K.reshape(-1), pair_dir_flat, n_dirs) / N


# ----------------------------------------------------------- measurements
def greens_measurement(mc, model, **kwargs) -> Measurement:
    """Full equal-time Green's function, shape (F, N, N)
    (reference: greens_measurement, measurements.jl:31-37)."""
    F = model.nflavors
    N = len(model.lattice)

    def measure(greens, **_):
        return {"greens": greens}

    return Measurement("greens", {"greens": (F, N, N)}, measure)


def occupation(mc, model, **kwargs) -> Measurement:
    """n(i) = 1 - G[i, i] per flavor, shape (F, N)
    (reference: occupation, measurements.jl:41-44)."""
    F = model.nflavors
    N = len(model.lattice)

    def measure(greens, **_):
        occ = 1.0 - jnp.diagonal(greens, axis1=-2, axis2=-1)
        return {"occ": occ}

    return Measurement("occupation", {"occ": (F, N)}, measure)


def boson_energy_measurement(mc, model, **kwargs) -> Measurement:
    """HS-field energy (reference: boson_energy_measurement,
    measurements.jl:321-323)."""
    dtau = mc.parameters.delta_tau

    def measure(conf, **_):
        return {"E_boson": model.energy_boson(conf, dtau)}

    return Measurement("boson_energy", {"E_boson": ()}, measure)


def _by_distance_measurement(mc, model, name, matrix_fn: Callable) -> Measurement:
    lat = model.lattice
    N = len(lat)
    pair_dir_flat = jnp.asarray(lat.pair_dir.reshape(-1), jnp.int32)
    n_dirs = lat.n_dirs

    def measure(greens, **_):
        def per_chain(G):
            K = matrix_fn(G)
            return _segment_by_dir(K, pair_dir_flat, n_dirs, N)
        return {name: jax.vmap(per_chain)(greens)}

    return Measurement(name, {name: (n_dirs,)}, measure)


def charge_density_correlation(mc, model, **kwargs) -> Measurement:
    """⟨n_i n_j⟩ binned by distance (reference:
    charge_density_correlation, measurements.jl:48-56)."""
    return _by_distance_measurement(mc, model, "cdc", cdc_matrix)


def spin_density_correlation(mc, model, dir: str, **kwargs) -> Measurement:
    """⟨S^a_i S^a_j⟩, a = x/y/z, binned by distance (reference:
    spin_density_correlation, measurements.jl:131-144)."""
    fn = {"x": sdc_x_matrix, "y": sdc_y_matrix, "z": sdc_z_matrix}[dir]
    return _by_distance_measurement(mc, model, f"sdc_{dir}", fn)


def magnetization(mc, model, dir: str, **kwargs) -> Measurement:
    """m_a(i) per site (reference: magnetization, measurements.jl:104-127).
    x and y vanish identically for block-diagonal G (no spin-flip terms)."""
    N = len(model.lattice)

    def measure(greens, **_):
        if dir in ("x", "y"):
            m = jnp.zeros(greens.shape[:1] + (N,), greens.dtype)
        else:
            m = jax.vmap(mz_vector)(greens)
        return {f"m_{dir}": m}

    return Measurement(f"magnetization_{dir}", {f"m_{dir}": (N,)}, measure)


def pairing_correlation(mc, model, K: int = None, **kwargs) -> Measurement:
    """s/extended-s-wave pairing correlation
    P[dir12, k1, k2] = 1/N Σ_{(s1,s2)∈dir12} G_up[s1,s2]·G_dn[t1,t2],
    t_i = site at direction k_i from s_i (reference: pairing_correlation +
    pc_kernel, measurements.jl:199-219; EachLocalQuadByDistance)."""
    lat = model.lattice
    N = len(lat)
    if K is None:
        K = 1 + lat.coordination
    trg, mask = lat.target_by_direction(K)
    trg_j = jnp.asarray(np.where(mask, trg, 0), jnp.int32)
    mask_j = jnp.asarray(mask)
    pair_dir_flat = jnp.asarray(lat.pair_dir.reshape(-1), jnp.int32)
    n_dirs = lat.n_dirs

    def measure(greens, **_):
        def per_chain(G):
            Gu, Gd = _blocks(G)
            out = []
            for k1 in range(K):
                row = []
                for k2 in range(K):
                    t1 = trg_j[:, k1]
                    t2 = trg_j[:, k2]
                    Kmat = Gu * Gd[t1[:, None], t2[None, :]]
                    valid = (mask_j[:, k1][:, None] & mask_j[:, k2][None, :])
                    Kmat = jnp.where(valid, Kmat, 0.0)
                    row.append(_segment_by_dir(Kmat, pair_dir_flat, n_dirs, N))
                out.append(jnp.stack(row, -1))
            return jnp.stack(out, -2)  # (n_dirs, K, K)
        return {"pc": jax.vmap(per_chain)(greens)}

    return Measurement("pairing_correlation", {"pc": (n_dirs, K, K)}, measure)
