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


def _session_eltype(mc, model):
    """Binner dtype matching the session's Green's element type (reference:
    greenseltype hook, src/flavors/DQMC/DQMC_optional.jl:7-40 — the reference
    keeps greenseltype-wide binners for every G-derived measurement).

    Complex-hopping (Peierls) sessions produce complex kernel values whose
    imaginary parts are genuine data (their statistics detect the phase
    problem); a float64 binner would silently discard them in
    LogBinner.push's dtype cast. Width follows the session dtype so a
    complex64 session never allocates complex128 binners (x64-disabled TPU
    runtimes cannot create them)."""
    eltype = np.dtype(getattr(model, "greens_eltype", np.float64))
    ctx = getattr(mc, "ctx", None)
    if ctx is not None and ctx.is_complex:
        eltype = np.dtype(jnp.dtype(ctx.dtype).name)
    return eltype


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
def _dir_onehot(lat):
    """One-hot direction-binning matrix P of shape (N², n_dirs):
    P[i·N+j, d] = 1 iff dir(i, j) == d. The EachSitePairByDistance reduction
    (reference: generic.jl:331-336) becomes ``K.reshape(N²) @ P / N`` — an MXU
    matmul instead of a VPU scatter (segment_sum)."""
    N = len(lat)
    P = np.zeros((N * N, lat.n_dirs), np.float32)
    P[np.arange(N * N), lat.pair_dir.reshape(-1)] = 1.0
    return P


def _bin_by_dir(K, P_np, N):
    """Reduce (..., N, N) kernel matrices over direction bins → (..., n_dirs)."""
    P = jnp.asarray(P_np, K.dtype)
    return K.reshape(K.shape[:-2] + (N * N,)) @ P / N


def _selection_matrices(lat, K):
    """One-hot target-selection matrices S of shape (K, N, N):
    S[k, s, trg(s, k)] = 1 where the k-th direction target exists (else the
    row is zero, which reproduces the reference's validity mask). Gathers like
    G[trg(s1,k1), trg(s2,k2)] become S_{k1} @ G @ S_{k2}ᵀ — MXU matmuls
    (reference quad iterators: EachLocalQuadByDistance,
    lattice_iterators.jl:258-355)."""
    N = len(lat)
    trg, mask = lat.target_by_direction(K)
    S = np.zeros((K, N, N), np.float32)
    kk, ss = np.meshgrid(np.arange(K), np.arange(N), indexing="ij")
    S[kk, ss, np.where(mask, trg, 0).T] = mask.T
    return S


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
    eltype = _session_eltype(mc, model)

    if greens_at is None:
        def measure(greens, **_):
            return {"greens": greens}

        return Measurement("greens", {"greens": (F, N, N)}, measure,
                           dtype=eltype)

    def measure_at(utg, **_):
        return {"greens": utg}

    return Measurement(f"greens_at_{greens_at}", {"greens": (F, N, N)},
                       measure_at, kind="greens_at", dtype=eltype,
                       greens_at=(int(greens_at[0]), int(greens_at[1])))


def occupation(mc, model, **kwargs) -> Measurement:
    """n(i) = 1 - G[i, i] per flavor, shape (F, N)
    (reference: occupation, measurements.jl:41-44)."""
    F = model.nflavors
    N = len(model.lattice)

    def measure(greens, **_):
        # real part: n(i) is real for Hermitian H (complex-hopping sessions
        # carry phases only off the diagonal up to statistical noise)
        occ = 1.0 - jnp.real(jnp.diagonal(greens, axis1=-2, axis2=-1))
        return {"occ": occ}

    return Measurement("occupation", {"occ": (F, N)}, measure)


def sign_measurement(mc, model, **kwargs) -> Measurement:
    """Average sign/phase ⟨s⟩ of the configuration weight.

    Complex-hopping sessions accept with p = Re(exp(-dE)·detratio) (reference
    semantics, DQMC.jl:573); the discarded phase is tracked per chain
    (core._track_detratio) and snapshotted at the measurement point. ⟨s⟩
    close to 1 certifies the run phase-problem-free; |⟨s⟩| << 1 means the
    Re-projected estimators are biased and the flux pattern needs proper
    phase reweighting (not implemented — match the reference, which also
    only monitors). Real sessions measure the constant 1."""
    eltype = _session_eltype(mc, model)

    def measure(phase=None, greens=None, **_):
        if phase is None:
            C = greens.shape[0]
            return {"sign": jnp.ones((C,), eltype)}
        return {"sign": phase.astype(eltype)}

    return Measurement("sign", {"sign": ()}, measure, dtype=eltype)


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
    P_np = _dir_onehot(lat)
    n_dirs = lat.n_dirs

    def measure(greens, **_):
        K = jax.vmap(matrix_fn)(greens)
        return {name: _bin_by_dir(K, P_np, N)}

    return Measurement(name, {name: (n_dirs,)}, measure,
                       dtype=_session_eltype(mc, model))


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

    return Measurement(f"magnetization_{dir}", {f"m_{dir}": (N,)}, measure,
                       dtype=_session_eltype(mc, model))


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
    P_np = _dir_onehot(lat)
    n_dirs = lat.n_dirs

    def step(G00, G0l, Gl0, Gll, **_):
        return {name: matrix4_fn(G00, G0l, Gl0, Gll)}

    def finish(acc):
        return {name: _bin_by_dir(acc[name], P_np, N)}

    return Measurement(name, {name: (n_dirs,)}, step, kind="combined",
                       dtype=_session_eltype(mc, model),
                       combined_acc_shapes={name: (N, N)},
                       combined_finish_fn=finish)


def pairing_susceptibility(mc, model, K: int = None, **kwargs) -> Measurement:
    """τ-integrated pairing susceptibility
    (reference: pairing_susceptibility + pc_kernel NTuple{4},
    measurements.jl:206-219: Gl0[s1,s2]·Gl0[t1+N,t2+N])."""
    lat = model.lattice
    N = len(lat)
    if K is None:
        K = 1 + lat.coordination
    S_np = _selection_matrices(lat, K)
    P_np = _dir_onehot(lat)
    n_dirs = lat.n_dirs

    def step(G00, G0l, Gl0, Gll, **_):
        Gl0u, Gl0d = _blocks(Gl0)
        S = jnp.asarray(S_np, Gl0u.dtype)
        # Gl0d[t1(s1,k1), t2(s2,k2)] = (S_{k1} Gl0d S_{k2}ᵀ)[s1, s2]
        B = jnp.einsum("kab,bc->kac", S, Gl0d)
        C = jnp.einsum("kac,qbc->kqab", B, S)
        return {"ps": Gl0u[None, None] * C}

    def finish(acc):
        # (K, K, n_dirs) → (n_dirs, K, K)
        return {"ps": jnp.moveaxis(_bin_by_dir(acc["ps"], P_np, N), -1, 0)}

    return Measurement("pairing_susceptibility", {"ps": (n_dirs, K, K)}, step,
                       kind="combined", dtype=_session_eltype(mc, model),
                       combined_acc_shapes={"ps": (K, K, N, N)},
                       combined_finish_fn=finish)


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
    S_np = _selection_matrices(lat, K)
    P_np = _dir_onehot(lat)
    trg, mask = lat.target_by_direction(K)
    trg_np = np.where(mask, trg, 0)
    n_dirs = lat.n_dirs
    T_host = np.asarray(model.hopping_matrix())
    # per direction k: hopping elements along/against the bond, (K, N)
    T_st_np = np.stack([T_host[np.arange(N), trg_np[:, k]]
                        for k in range(K)], 0)  # T[s, t(s,k)]
    T_ts_np = np.stack([T_host[trg_np[:, k], np.arange(N)]
                        for k in range(K)], 0)  # T[t(s,k), s]

    def _dedup(G):
        """(unique flavor blocks, multiplicity) of a (F, N, N) Green's
        function — attractive F=1 has G_up ≡ G_dn, so compute once, weight
        by 2 (reference collapses these kernels the same way,
        HubbardModelAttractive.jl:219-267)."""
        if G.shape[0] == 1:
            return [G[0]], 2.0
        return [G[0], G[-1]], 1.0

    def step(G00, G0l, Gl0, Gll, **_):
        """All quad gathers expressed through the one-hot selection matrices
        S_k (zero rows mask invalid targets, standing in for the reference's
        validity mask): X[t(s1,k), ·] = (S_k X)[s1, ·] etc. Everything is a
        (K,·)-batched N×N matmul on the MXU; the hopping constants are cast
        to the Green's dtype so an f32 session never promotes to (emulated)
        f64."""
        dt = Gl0.dtype
        S = jnp.asarray(S_np, dt)                       # (K, N, N)
        tst = jnp.asarray(T_st_np, dt)                  # (K, N) = T[s, t]
        tts = jnp.asarray(T_ts_np, dt)                  # (K, N) = T[t, s]

        def j_density(G):
            bs, mult = _dedup(G)
            total = 0.0
            for Gb in bs:
                d1 = jnp.einsum("ksa,as->ks", S, Gb)    # Gb[t(s,k), s]
                d2 = jnp.einsum("sa,ksa->ks", Gb, S)    # Gb[s, t(s,k)]
                total = total + (tst * d1 - tts * d2)
            return mult * total                          # (K, N)

        jl = j_density(Gll)
        j0 = j_density(G00)
        Kmat = jl[:, :, None] * j0[:, None, :]           # (K, N, N)

        b0l, mult = _dedup(G0l)
        bl0, _ = _dedup(Gl0)
        for G0b, Gl0b in zip(b0l, bl0):
            G0T = G0b.T
            A1 = jnp.einsum("kab,bc->kac", S, G0T)       # G0l[s2, t1]
            A3 = jnp.einsum("kab,kcb->kac", A1, S)       # G0l[t2, t1]
            B1 = jnp.einsum("ab,kcb->kac", G0T, S)       # G0l[t2, s1]
            A4 = jnp.einsum("kab,bc->kac", S, Gl0b)      # Gl0[t1, s2]
            A5 = jnp.einsum("kab,kcb->kac", A4, S)       # Gl0[t1, t2]
            B2 = jnp.einsum("ab,kcb->kac", Gl0b, S)      # Gl0[s1, t2]
            Kmat = Kmat + mult * (
                (tts[:, :, None] * tts[:, None, :]) * (-A1) * B2
                - (tst[:, :, None] * tts[:, None, :]) * (-G0T)[None] * A5
                - (tts[:, :, None] * tst[:, None, :]) * (-A3) * Gl0b[None]
                + (tst[:, :, None] * tst[:, None, :]) * (-B1) * A4
            )
        return {"ccs": Kmat}

    def finish(acc):
        # (K, n_dirs) → (n_dirs, K)
        return {"ccs": _bin_by_dir(acc["ccs"], P_np, N).T}

    return Measurement("current_current_susceptibility",
                       {"ccs": (n_dirs, K)}, step, kind="combined",
                       dtype=_session_eltype(mc, model),
                       combined_acc_shapes={"ccs": (K, N, N)},
                       combined_finish_fn=finish)


def pairing_correlation(mc, model, K: int = None, **kwargs) -> Measurement:
    """s/extended-s-wave pairing correlation
    P[dir12, k1, k2] = 1/N Σ_{(s1,s2)∈dir12} G_up[s1,s2]·G_dn[t1,t2],
    t_i = site at direction k_i from s_i (reference: pairing_correlation +
    pc_kernel, measurements.jl:199-219; EachLocalQuadByDistance)."""
    lat = model.lattice
    N = len(lat)
    if K is None:
        K = 1 + lat.coordination
    S_np = _selection_matrices(lat, K)
    P_np = _dir_onehot(lat)
    n_dirs = lat.n_dirs

    def measure(greens, **_):
        def per_chain(G):
            Gu, Gd = _blocks(G)
            S = jnp.asarray(S_np, Gu.dtype)
            # Gd[t1(s1,k1), t2(s2,k2)] = (S_{k1} Gd S_{k2}ᵀ)[s1, s2]
            B = jnp.einsum("kab,bc->kac", S, Gd)
            C = jnp.einsum("kac,qbc->kqab", B, S)
            binned = _bin_by_dir(Gu[None, None] * C, P_np, N)
            return jnp.moveaxis(binned, -1, 0)  # (n_dirs, K, K)
        return {"pc": jax.vmap(per_chain)(greens)}

    return Measurement("pairing_correlation", {"pc": (n_dirs, K, K)}, measure,
                       dtype=_session_eltype(mc, model))


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
