"""Exact diagonalization oracle for small Hubbard clusters.

Numpy port of the reference's ED test oracle (test/ED/ED.jl): full 4^N
many-body Hamiltonian in the occupation-number basis with Jordan-Wigner sign
tracking, thermal and imaginary-time-displaced expectation values.

Hamiltonian (test/ED/ED.jl:68-115):
    H = -t Σ_{<ij>σ, directed} c†_{jσ} c_{iσ}
        + U Σ_i (n_i↑ - 1/2)(n_i↓ - 1/2)        (U < 0 attractive)
        - μ Σ_i (n_i↑ + n_i↓)

Orbital ordering: orbital(site i, spin s) = 2*i + s  (s = 0 up, 1 down).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def _orbital(site, spin):
    return 2 * site + spin


def build_operators(n_sites):
    """Dense annihilation operators C[o] in the 4^n_sites basis."""
    n_orb = 2 * n_sites
    dim = 1 << n_orb
    Cs = []
    states = np.arange(dim)
    for o in range(n_orb):
        occ = (states >> o) & 1
        below = states & ((1 << o) - 1)
        # parity of occupied orbitals below o
        par = np.zeros(dim, dtype=np.int64)
        b = below.copy()
        while b.any():
            par ^= b & 1
            b >>= 1
        sign = 1.0 - 2.0 * par
        C = np.zeros((dim, dim))
        rows = states[occ == 1] ^ (1 << o)
        cols = states[occ == 1]
        C[rows, cols] = sign[occ == 1]
        Cs.append(C)
    return Cs


class EDSolution:
    """Eigen-decomposed Hubbard cluster with expectation-value helpers."""

    def __init__(self, lattice, t=1.0, U=1.0, mu=0.0, attractive=True,
                 T_mat=None):
        """U is the magnitude; attractive=True flips its sign in H and keeps
        mu; attractive=False (repulsive) forces mu=0 (as in ED_tests.jl:92-95).

        T_mat: optional explicit single-particle hopping matrix (possibly
        complex Hermitian, e.g. Peierls phases) INCLUDING the chemical
        potential on its diagonal — replaces the -t/-mu construction, so the
        kinetic term is H_kin = Σ_{s,ij} T[i,j] c†_{i,s} c_{j,s}.
        """
        self.lattice = lattice
        N = len(lattice)
        self.N = N
        Ueff = -abs(U) if attractive else abs(U)
        mueff = mu if attractive else 0.0
        C = build_operators(N)
        dim = C[0].shape[0]
        cplx = T_mat is not None and np.iscomplexobj(T_mat)
        H = np.zeros((dim, dim), np.complex128 if cplx else np.float64)
        if T_mat is not None:
            T_mat = np.asarray(T_mat)
            assert np.allclose(T_mat, T_mat.conj().T), "T_mat must be Hermitian"
            for i in range(N):
                for j in range(N):
                    if T_mat[i, j] != 0:
                        for s in (0, 1):
                            H += T_mat[i, j] * (
                                C[_orbital(i, s)].T @ C[_orbital(j, s)])
        else:
            # directed neighbor hopping, duplicates included (2x2 doubles
            # bonds, matching the DQMC hopping matrix construction)
            for (src, trg) in lattice.neighbors(directed=True):
                for s in (0, 1):
                    H -= t * (C[_orbital(trg, s)].T @ C[_orbital(src, s)])
        for i in range(N):
            nu = C[_orbital(i, 0)].T @ C[_orbital(i, 0)]
            nd = C[_orbital(i, 1)].T @ C[_orbital(i, 1)]
            H += Ueff * (nu - 0.5 * np.eye(dim)) @ (nd - 0.5 * np.eye(dim))
            if T_mat is None:
                H -= mueff * (nu + nd)
        self.E, self.V = np.linalg.eigh(H)
        self.E -= self.E.min()
        self.C = C

    def _rho_weights(self, beta):
        w = np.exp(-beta * self.E)
        return w / w.sum()

    def _to_eigen(self, A):
        return self.V.conj().T @ A @ self.V

    def expect(self, A, beta):
        """⟨A⟩ = tr(e^{-βH} A)/Z (test/ED/ED.jl:462-493). Returns a python
        float for real spectra, complex for complex-Hamiltonian clusters."""
        w = self._rho_weights(beta)
        Ae = self._to_eigen(A)
        return np.sum(w * np.diag(Ae)).item()

    def expect_td(self, A, B, tau1, tau2, beta):
        """⟨A(τ1) B(τ2)⟩ for τ1 ≥ τ2 (test/ED/ED.jl:527-588):
        Σ_{mn} w_m e^{Δ(E_m - E_n)} A_mn B_nm, Δ = τ1 - τ2."""
        dt = tau1 - tau2
        w = np.exp(-(beta - dt) * self.E)
        Z = np.sum(np.exp(-beta * self.E))
        Ae = self._to_eigen(A)
        Be = self._to_eigen(B)
        mid = np.exp(-dt * self.E)
        # .item() (not float()) — complex-Hamiltonian clusters return complex
        return (np.einsum("m,mn,n,nm->", w, Ae, mid, Be) / Z).item()

    # -------------------------------------------------------------- operators
    def c(self, site, spin):
        return self.C[_orbital(site, spin)]

    def cdag(self, site, spin):
        return self.C[_orbital(site, spin)].T

    def n_op(self, site, spin=None):
        if spin is None:
            return self.n_op(site, 0) + self.n_op(site, 1)
        return self.cdag(site, spin) @ self.c(site, spin)

    # ---------------------------------------------------- observable bundles
    def greens(self, beta):
        """G[i,j] = ⟨c_{i↑} c†_{j↑}⟩ (spin-symmetric)."""
        N = self.N
        G = np.zeros((N, N), self.V.dtype)
        for i in range(N):
            for j in range(N):
                G[i, j] = self.expect(self.c(i, 0) @ self.cdag(j, 0), beta)
        return G

    def greens_spin(self, beta, s1, s2):
        N = self.N
        G = np.zeros((N, N))
        for i in range(N):
            for j in range(N):
                G[i, j] = self.expect(self.c(i, s1) @ self.cdag(j, s2), beta)
        return G

    def occupation(self, beta, spin=0):
        return np.array([self.expect(self.n_op(i, spin), beta)
                         for i in range(self.N)])

    def cdc_by_distance(self, beta):
        """⟨n_i n_j⟩ summed per direction bin / N (matches the DQMC
        charge_density_correlation output layout)."""
        N = self.N
        pd = self.lattice.pair_dir
        out = np.zeros(self.lattice.n_dirs)
        for i in range(N):
            for j in range(N):
                val = self.expect(self.n_op(i) @ self.n_op(j), beta)
                out[pd[i, j]] += val
        return out / N

    def _spin_op(self, i, dir):
        """S^a without 1/2 factors, as implied by the DQMC kernels:
        x: c†↑c↓ + c†↓c↑ ; z: n↑ - n↓ ; y: (c†↑c↓ - c†↓c↑) [times -i dropped,
        matching the reference's my_kernel note at measurements.jl:96-101]."""
        if dir == "x":
            return self.cdag(i, 0) @ self.c(i, 1) + self.cdag(i, 1) @ self.c(i, 0)
        if dir == "z":
            return self.n_op(i, 0) - self.n_op(i, 1)
        if dir == "y":  # the DQMC sdc_y kernel computes ⟨(iS^y)_i (iS^y)_j⟩
            return self.cdag(i, 0) @ self.c(i, 1) - self.cdag(i, 1) @ self.c(i, 0)
        raise ValueError(dir)

    def sdc_by_distance(self, beta, dir):
        N = self.N
        pd = self.lattice.pair_dir
        out = np.zeros(self.lattice.n_dirs)
        sign = -1.0 if dir == "y" else 1.0  # ⟨(iS^y)(iS^y)⟩ = -⟨S^y S^y⟩ style
        for i in range(N):
            for j in range(N):
                val = self.expect(self._spin_op(i, dir) @ self._spin_op(j, dir),
                                  beta)
                out[pd[i, j]] += sign * val
        return out / N

    def magnetization(self, beta, dir):
        return np.array([self.expect(self._spin_op(i, dir), beta)
                         for i in range(self.N)])

    # ----------------------------------------------- time-displaced bundles
    def utg_spin(self, beta, tau1, tau2, s1=0, s2=0):
        """⟨T c_{i,s1}(τ1) c†_{j,s2}(τ2)⟩ (reference:
        calculate_Greens_matrix, test/ED/ED.jl:590-621)."""
        N = self.N
        G = np.zeros((N, N))
        for i in range(N):
            for j in range(N):
                if tau1 >= tau2:
                    G[i, j] = self.expect_td(self.c(i, s1), self.cdag(j, s2),
                                             tau1, tau2, beta)
                else:
                    G[i, j] = -self.expect_td(self.cdag(j, s2), self.c(i, s1),
                                              tau2, tau1, beta)
        return G

    def integrated(self, A, B, beta, step):
        """dtau * Σ_{l=1..M} ⟨A(l·dtau) B(0)⟩ (reference:
        expectation_value_integrated, test/ED/ED.jl:625-674 — Riemann sum over
        τ = beta, beta-step, ..., step)."""
        Ae = self._to_eigen(A)
        Be = self._to_eigen(B)
        Z = np.sum(np.exp(-beta * self.E))
        taus = np.arange(step, beta + 0.5 * step, step)
        # P_mn = Σ_τ step * exp(-(beta-τ)E_m - τE_n)
        P = np.zeros((len(self.E), len(self.E)))
        for t in taus:
            P += step * np.outer(np.exp(-(beta - t) * self.E),
                                 np.exp(-t * self.E))
        return float(np.sum(P * Ae * Be.T) / Z)

    def cds_by_distance(self, beta, step):
        """τ-integrated ⟨n_trg(τ) n_src(0)⟩ per direction bin / N
        (reference: ED_tests.jl CDS block)."""
        N = self.N
        pd = self.lattice.pair_dir
        out = np.zeros(self.lattice.n_dirs)
        for i in range(N):
            for j in range(N):
                out[pd[i, j]] += self.integrated(self.n_op(j), self.n_op(i),
                                                 beta, step)
        return out / N

    def sds_by_distance(self, beta, step, dir):
        N = self.N
        pd = self.lattice.pair_dir
        out = np.zeros(self.lattice.n_dirs)
        sign = -1.0 if dir == "y" else 1.0  # ED m_y includes -i: (-i)^2 = -1
        for i in range(N):
            for j in range(N):
                val = self.integrated(self._spin_op(j, dir),
                                      self._spin_op(i, dir), beta, step)
                out[pd[i, j]] += sign * val
        return out / N

    def ps_by_distance(self, beta, step, K):
        """τ-integrated pairing susceptibility in (n_dirs, K, K) layout
        (reference: ED_tests.jl PS block: A = c_{s1↑} c_{t1↓} at τ,
        B = c†_{t2↓} c†_{s2↑} at 0)."""
        N = self.N
        lat = self.lattice
        pd = lat.pair_dir
        trg, mask = lat.target_by_direction(K)
        out = np.zeros((lat.n_dirs, K, K))
        for s1 in range(N):
            for s2 in range(N):
                for k1 in range(K):
                    if not mask[s1, k1]:
                        continue
                    for k2 in range(K):
                        if not mask[s2, k2]:
                            continue
                        t1, t2 = trg[s1, k1], trg[s2, k2]
                        A = self.c(s1, 0) @ self.c(t1, 1)
                        B = self.cdag(t2, 1) @ self.cdag(s2, 0)
                        out[pd[s1, s2], k1, k2] += self.integrated(A, B, beta,
                                                                   step)
        return out / N

    def current_op(self, s, t, T):
        """j(s,t) = Σ_σ (T[t,s]·c†_t c_s - T[s,t]·c†_s c_t)
        (reference: current_density, test/ED/ED.jl:403-436)."""
        J = np.zeros_like(self.C[0])
        for sp in (0, 1):
            J += T[t, s] * (self.cdag(t, sp) @ self.c(s, sp))
            J -= T[s, t] * (self.cdag(s, sp) @ self.c(t, sp))
        return J

    def ccs_by_distance(self, beta, step, K, T):
        """τ-integrated ⟨j(s1,t1)(τ) j(s2,t2)(0)⟩ with synced bond direction,
        (n_dirs, K) layout (reference: ED_tests.jl CCS block)."""
        N = self.N
        lat = self.lattice
        pd = lat.pair_dir
        trg, mask = lat.target_by_direction(K)
        out = np.zeros((lat.n_dirs, K))
        for k in range(K):
            Js = {s: self.current_op(s, trg[s, k], T)
                  for s in range(N) if mask[s, k]}
            for s1 in range(N):
                if not mask[s1, k]:
                    continue
                for s2 in range(N):
                    if not mask[s2, k]:
                        continue
                    out[pd[s1, s2], k] += self.integrated(Js[s1], Js[s2],
                                                          beta, step)
        return out / N

    def pc_by_distance(self, beta, K):
        """⟨Δ(s1,t1) Δ†(s2,t2)⟩, Δ(s,t) = c_{s↑} c_{t↓}, in the
        (n_dirs, K, K) layout of pairing_correlation."""
        N = self.N
        lat = self.lattice
        pd = lat.pair_dir
        trg, mask = lat.target_by_direction(K)
        out = np.zeros((lat.n_dirs, K, K))
        for s1 in range(N):
            for s2 in range(N):
                for k1 in range(K):
                    if not mask[s1, k1]:
                        continue
                    for k2 in range(K):
                        if not mask[s2, k2]:
                            continue
                        t1, t2 = trg[s1, k1], trg[s2, k2]
                        op = (self.c(s1, 0) @ self.c(t1, 1) @
                              self.cdag(t2, 1) @ self.cdag(s2, 0))
                        out[pd[s1, s2], k1, k2] += self.expect(op, beta)
        return out / N
