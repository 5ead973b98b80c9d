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


class Greens:
    """Marker: measurement needs the equal-time Green's function
    (reference: src/flavors/DQMC/measurements/generic.jl:108-110)."""


class GreensAt:
    """Marker factory: measurement needs G(k, l)
    (reference: GreensAt{k,l}, generic.jl:111-114). Use
    greens_measurement(mc, model, greens_at=(k, l))."""

    def __init__(self, k, l):
        self.kl = (int(k), int(l))


class CombinedGreensIterator:
    """Marker: measurement integrates over (G(0,l), G(l,0), G(l,l))
    (reference: unequal_time_stack.jl:746+). Susceptibility constructors use
    this implicitly (Measurement.kind == "combined")."""


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


# ------------------------------------------------- time-displaced kernel mats
def cdc4_matrix(G00, G0l, Gl0, Gll):
    """Charge density susceptibility step kernel
    (reference: cdc_kernel NTuple{4}, measurements.jl:75-90)."""
    Gu0, Gd0, I = _updn(G00)
    GuL, GdL = _blocks(Gll)
    du = 1.0 - jnp.diagonal(GuL)
    dd = 1.0 - jnp.diagonal(GdL)
    eu = 1.0 - jnp.diagonal(Gu0)
    ed = 1.0 - jnp.diagonal(Gd0)
    nn = ((du + dd)[:, None] * (eu + ed)[None, :])
    G0lu, G0ld = _blocks(G0l)
    Gl0u, Gl0d = _blocks(Gl0)
    return nn - G0lu.T * Gl0u - G0ld.T * Gl0d


def sdc_x4_matrix(G00, G0l, Gl0, Gll):
    """(reference: sdc_x_kernel NTuple{4}, measurements.jl:156-163;
    cross-spin entries vanish for block-diagonal G)."""
    G0lu, G0ld = _blocks(G0l)
    Gl0u, Gl0d = _blocks(Gl0)
    return -(G0lu.T * Gl0d + G0ld.T * Gl0u)


sdc_y4_matrix = sdc_x4_matrix  # identical for block-diagonal G


def sdc_z4_matrix(G00, G0l, Gl0, Gll):
    """(reference: sdc_z_kernel NTuple{4}, measurements.jl:189-195)."""
    GuL, GdL = _blocks(Gll)
    Gu0, Gd0 = _blocks(G00)
    du = 1.0 - jnp.diagonal(GuL)
    dd = 1.0 - jnp.diagonal(GdL)
    eu = 1.0 - jnp.diagonal(Gu0)
    ed = 1.0 - jnp.diagonal(Gd0)
    nn = ((du - dd)[:, None] * (eu - ed)[None, :])
    G0lu, G0ld = _blocks(G0l)
    Gl0u, Gl0d = _blocks(Gl0)
    return nn - G0lu.T * Gl0u - G0ld.T * Gl0d


# ----------------------------------------------------------- measurements
def greens_measurement(mc, model, greens_at=None, **kwargs) -> Measurement:
    """Full equal-time Green's function, shape (F, N, N); with
    ``greens_at=(k, l)`` the time-displaced G(k·dtau ← l·dtau)
    (reference: greens_measurement, measurements.jl:31-37 and the GreensAt
    marker, generic.jl:108-114)."""
    F = model.nflavors
    N = len(model.lattice)

    if greens_at is None:
        def measure(greens, **_):
            return {"greens": greens}

        return Measurement("greens", {"greens": (F, N, N)}, measure)

    def measure_at(utg, **_):
        return {"greens": utg}

    return Measurement(f"greens_at_{greens_at}", {"greens": (F, N, N)},
                       measure_at, kind="greens_at",
                       greens_at=(int(greens_at[0]), int(greens_at[1])))


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


def charge_density_susceptibility(mc, model, **kwargs) -> Measurement:
    """τ-integrated ⟨n_i(τ) n_j(0)⟩ by distance (reference:
    charge_density_susceptibility, measurements.jl:54-56)."""
    return _by_distance_susceptibility(mc, model, "cds", cdc4_matrix)


def spin_density_susceptibility(mc, model, dir: str, **kwargs) -> Measurement:
    """τ-integrated ⟨S^a_i(τ) S^a_j(0)⟩ by distance (reference:
    spin_density_susceptibility, measurements.jl:144-146)."""
    fn = {"x": sdc_x4_matrix, "y": sdc_y4_matrix, "z": sdc_z4_matrix}[dir]
    return _by_distance_susceptibility(mc, model, f"sds_{dir}", fn)


def _by_distance_susceptibility(mc, model, name, matrix4_fn) -> Measurement:
    lat = model.lattice
    N = len(lat)
    pair_dir_flat = jnp.asarray(lat.pair_dir.reshape(-1), jnp.int32)
    n_dirs = lat.n_dirs

    def step(G00, G0l, Gl0, Gll, **_):
        K = matrix4_fn(G00, G0l, Gl0, Gll)
        return {name: _segment_by_dir(K, pair_dir_flat, n_dirs, N)}

    return Measurement(name, {name: (n_dirs,)}, step, kind="combined")


def pairing_susceptibility(mc, model, K: int = None, **kwargs) -> Measurement:
    """τ-integrated pairing susceptibility
    (reference: pairing_susceptibility + pc_kernel NTuple{4},
    measurements.jl:206-219: Gl0[s1,s2]·Gl0[t1+N,t2+N])."""
    lat = model.lattice
    N = len(lat)
    if K is None:
        K = 1 + lat.coordination
    trg, mask = lat.target_by_direction(K)
    trg_j = jnp.asarray(np.where(mask, trg, 0), jnp.int32)
    mask_j = jnp.asarray(mask)
    pair_dir_flat = jnp.asarray(lat.pair_dir.reshape(-1), jnp.int32)
    n_dirs = lat.n_dirs

    def step(G00, G0l, Gl0, Gll, **_):
        Gl0u, Gl0d = _blocks(Gl0)
        out = []
        for k1 in range(K):
            row = []
            for k2 in range(K):
                t1 = trg_j[:, k1]
                t2 = trg_j[:, k2]
                Kmat = Gl0u * Gl0d[t1[:, None], t2[None, :]]
                valid = (mask_j[:, k1][:, None] & mask_j[:, k2][None, :])
                Kmat = jnp.where(valid, Kmat, 0.0)
                row.append(_segment_by_dir(Kmat, pair_dir_flat, n_dirs, N))
            out.append(jnp.stack(row, -1))
        return {"ps": jnp.stack(out, -2)}

    return Measurement("pairing_susceptibility", {"ps": (n_dirs, K, K)}, step,
                       kind="combined")


def current_current_susceptibility(mc, model, K: int = None, **kwargs) -> Measurement:
    """τ-integrated current-current correlation, binned by (dir12, dir)
    with synced bond directions (reference: current_current_susceptibility +
    cc_kernel, measurements.jl:223-317; EachLocalQuadBySyncedDistance).

    cc_kernel (block-diagonal form): with t_i = site at direction k from s_i
    and j_b(s) = T[s,t]·G_b[t,s] - T[t,s]·G_b[s,t],
      Σ_{b1,b2} j_{b1,l}(s1)·j_{b2,0}(s2)
      + Σ_b [ T[t1,s1]T[t2,s2]·(-G0l_b[s2,t1])·Gl0_b[s1,t2]
            - T[s1,t1]T[t2,s2]·(-G0l_b[s2,s1])·Gl0_b[t1,t2]
            - T[t1,s1]T[s2,t2]·(-G0l_b[t2,t1])·Gl0_b[s1,s2]
            + T[s1,t1]T[s2,t2]·(-G0l_b[t2,s1])·Gl0_b[t1,s2] ]
    """
    lat = model.lattice
    N = len(lat)
    if K is None:
        K = 1 + lat.coordination
    trg, mask = lat.target_by_direction(K)
    trg_np = np.where(mask, trg, 0)
    trg_j = jnp.asarray(trg_np, jnp.int32)
    mask_j = jnp.asarray(mask)
    pair_dir_flat = jnp.asarray(lat.pair_dir.reshape(-1), jnp.int32)
    n_dirs = lat.n_dirs
    T_host = model.hopping_matrix()
    # per direction k: hopping elements along/against the bond
    T_st = jnp.asarray(np.stack([T_host[np.arange(N), trg_np[:, k]]
                                 for k in range(K)], -1))  # T[s, t(s,k)]
    T_ts = jnp.asarray(np.stack([T_host[trg_np[:, k], np.arange(N)]
                                 for k in range(K)], -1))  # T[t(s,k), s]

    def step(G00, G0l, Gl0, Gll, **_):
        blocks0 = _blocks(G00)
        blocksL = _blocks(Gll)
        blocks0l = _blocks(G0l)
        blocksl0 = _blocks(Gl0)
        out = []
        for k in range(K):
            t = trg_j[:, k]
            tst = T_st[:, k]   # T[s, t]
            tts = T_ts[:, k]   # T[t, s]
            # current densities j_b at time l (from Gll) and 0 (from G00)
            jl = sum(tst * Gb[t, jnp.arange(N)] - tts * Gb[jnp.arange(N), t]
                     for Gb in blocksL)
            j0 = sum(tst * Gb[t, jnp.arange(N)] - tts * Gb[jnp.arange(N), t]
                     for Gb in blocks0)
            Kmat = jl[:, None] * j0[None, :]
            for G0b, Gl0b in zip(blocks0l, blocksl0):
                # rows indexed by s1 (and t1 = t[s1]), cols by s2 (t2 = t[s2])
                G0l_s2_t1 = G0b.T[t, :]          # [s1, s2] = G0l[s2, t1]
                G0l_s2_s1 = G0b.T                # [s1, s2] = G0l[s2, s1]
                G0l_t2_t1 = G0b.T[t][:, t]       # [s1, s2] = G0l[t2, t1]
                G0l_t2_s1 = G0b.T[:, t]          # [s1, s2] = G0l[t2, s1]
                Gl0_s1_t2 = Gl0b[:, t]           # [s1, s2] = Gl0[s1, t2]
                Gl0_t1_t2 = Gl0b[t][:, t]        # [s1, s2] = Gl0[t1, t2]
                Gl0_s1_s2 = Gl0b                 # [s1, s2] = Gl0[s1, s2]
                Gl0_t1_s2 = Gl0b[t, :]           # [s1, s2] = Gl0[t1, s2]
                Kmat = Kmat + (
                    (tts[:, None] * tts[None, :]) * (-G0l_s2_t1) * Gl0_s1_t2
                    - (tst[:, None] * tts[None, :]) * (-G0l_s2_s1) * Gl0_t1_t2
                    - (tts[:, None] * tst[None, :]) * (-G0l_t2_t1) * Gl0_s1_s2
                    + (tst[:, None] * tst[None, :]) * (-G0l_t2_s1) * Gl0_t1_s2
                )
            valid = mask_j[:, k][:, None] & mask_j[:, k][None, :]
            Kmat = jnp.where(valid, Kmat, 0.0)
            out.append(_segment_by_dir(Kmat, pair_dir_flat, n_dirs, N))
        return {"ccs": jnp.stack(out, -1)}

    return Measurement("current_current_susceptibility",
                       {"ccs": (n_dirs, K)}, step, kind="combined")


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


def charge_density(mc, model, greens_iterator=Greens, **kwargs):
    """Dispatch on the required Green's function (reference: charge_density,
    measurements.jl:48-56)."""
    if greens_iterator is Greens:
        return charge_density_correlation(mc, model, **kwargs)
    return charge_density_susceptibility(mc, model, **kwargs)


def spin_density(mc, model, dir, greens_iterator=Greens, **kwargs):
    """(reference: spin_density, measurements.jl:131-146)."""
    if greens_iterator is Greens:
        return spin_density_correlation(mc, model, dir, **kwargs)
    return spin_density_susceptibility(mc, model, dir, **kwargs)


def pairing(mc, model, greens_iterator=Greens, **kwargs):
    """(reference: pairing, measurements.jl:199-207)."""
    if greens_iterator is Greens:
        return pairing_correlation(mc, model, **kwargs)
    return pairing_susceptibility(mc, model, **kwargs)
