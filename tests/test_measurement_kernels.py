"""Equivalence of the MXU-matmul measurement kernels with naive loops.

The quad/binning kernels in measurements/dqmc_measurements.py express the
reference's gather-based formulas (pc_kernel / cc_kernel + EachSitePair-
ByDistance / EachLocalQuad iterators, measurements.jl:199-317,
lattice_iterators.jl:131-467) as one-hot selection-matrix matmuls. This file
checks them against direct python-loop oracles on random Green's functions —
the physics itself is gated by the ED tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from montecarlo_tpu.lattices.library import SquareLattice
from montecarlo_tpu.measurements import dqmc_measurements as dm


class _FakeModel:
    def __init__(self, lat, F=1):
        self.lattice = lat
        self.nflavors = F
        N = len(lat)
        rng = np.random.default_rng(7)
        T = np.zeros((N, N))
        for (s, t, _b) in lat.bonds:
            T[s, t] = -1.0
        T += np.diag(rng.normal(0, 0.1, N))
        self._T = T

    def hopping_matrix(self):
        return self._T


@pytest.fixture(scope="module")
def setup():
    lat = SquareLattice(4)
    model = _FakeModel(lat)
    N = len(lat)
    rng = np.random.default_rng(3)
    Gs = [rng.normal(size=(1, N, N)) for _ in range(4)]
    return lat, model, N, [jnp.asarray(G) for G in Gs], [G[0] for G in Gs]


def _oracle_bin(K, lat):
    N = len(lat)
    out = np.zeros(lat.n_dirs)
    for i in range(N):
        for j in range(N):
            out[lat.pair_dir[i, j]] += K[i, j]
    return out / N


def test_bin_by_dir_matches_segment(setup):
    lat, model, N, Gs, Gn = setup
    K = Gn[0]
    got = np.asarray(dm._bin_by_dir(jnp.asarray(K), dm._dir_onehot(lat), N))
    np.testing.assert_allclose(got, _oracle_bin(K, lat), rtol=1e-12)


def test_pairing_susceptibility_kernel(setup):
    lat, model, N, Gs, Gn = setup
    K = 1 + lat.coordination
    meas = dm.pairing_susceptibility(None, model)
    step = meas.measure_fn(G00=Gs[0], G0l=Gs[1], Gl0=Gs[2], Gll=Gs[3])
    got = np.asarray(meas.combined_finish_fn(step)["ps"])

    trg, mask = lat.target_by_direction(K)
    Gl0 = Gn[2]
    want = np.zeros((lat.n_dirs, K, K))
    for k1 in range(K):
        for k2 in range(K):
            for s1 in range(N):
                for s2 in range(N):
                    if mask[s1, k1] and mask[s2, k2]:
                        d = lat.pair_dir[s1, s2]
                        want[d, k1, k2] += (
                            Gl0[s1, s2] * Gl0[trg[s1, k1], trg[s2, k2]])
    np.testing.assert_allclose(got, want / N, rtol=1e-10, atol=1e-12)


def test_pairing_correlation_kernel(setup):
    lat, model, N, Gs, Gn = setup
    K = 1 + lat.coordination
    meas = dm.pairing_correlation(None, model)
    got = np.asarray(meas.measure_fn(greens=Gs[0][None])["pc"][0])

    trg, mask = lat.target_by_direction(K)
    G = Gn[0]
    want = np.zeros((lat.n_dirs, K, K))
    for k1 in range(K):
        for k2 in range(K):
            for s1 in range(N):
                for s2 in range(N):
                    if mask[s1, k1] and mask[s2, k2]:
                        d = lat.pair_dir[s1, s2]
                        want[d, k1, k2] += (
                            G[s1, s2] * G[trg[s1, k1], trg[s2, k2]])
    np.testing.assert_allclose(got, want / N, rtol=1e-10, atol=1e-12)


def test_ccs_kernel(setup):
    lat, model, N, Gs, Gn = setup
    K = 1 + lat.coordination
    meas = dm.current_current_susceptibility(None, model)
    step = meas.measure_fn(G00=Gs[0], G0l=Gs[1], Gl0=Gs[2], Gll=Gs[3])
    got = np.asarray(meas.combined_finish_fn(step)["ccs"])

    trg, mask = lat.target_by_direction(K)
    T = model.hopping_matrix()
    G00, G0l, Gl0, Gll = Gn
    want = np.zeros((lat.n_dirs, K))
    # F=1: both spin blocks identical -> factor 2 on each block sum
    for k in range(K):
        for s1 in range(N):
            if not mask[s1, k]:
                continue
            t1 = trg[s1, k]
            for s2 in range(N):
                if not mask[s2, k]:
                    continue
                t2 = trg[s2, k]
                jl = 2 * (T[s1, t1] * Gll[t1, s1] - T[t1, s1] * Gll[s1, t1])
                j0 = 2 * (T[s2, t2] * G00[t2, s2] - T[t2, s2] * G00[s2, t2])
                val = jl * j0
                val += 2 * (
                    T[t1, s1] * T[t2, s2] * (-G0l[s2, t1]) * Gl0[s1, t2]
                    - T[s1, t1] * T[t2, s2] * (-G0l[s2, s1]) * Gl0[t1, t2]
                    - T[t1, s1] * T[s2, t2] * (-G0l[t2, t1]) * Gl0[s1, s2]
                    + T[s1, t1] * T[s2, t2] * (-G0l[t2, s1]) * Gl0[t1, s2])
                want[lat.pair_dir[s1, s2], k] += val
    np.testing.assert_allclose(got, want / N, rtol=1e-9, atol=1e-11)


def test_ccs_two_flavor_blocks(setup):
    """F=2 path: block dedup must NOT trigger; compare against summing the
    F=1 oracle over two independent blocks."""
    lat, model, N, Gs, Gn = setup
    rng = np.random.default_rng(11)
    G2 = [jnp.asarray(rng.normal(size=(2, N, N))) for _ in range(4)]
    meas = dm.current_current_susceptibility(None, model)
    step = meas.measure_fn(G00=G2[0], G0l=G2[1], Gl0=G2[2], Gll=G2[3])
    got = np.asarray(meas.combined_finish_fn(step)["ccs"])

    K = 1 + lat.coordination
    trg, mask = lat.target_by_direction(K)
    T = model.hopping_matrix()
    want = np.zeros((lat.n_dirs, K))
    G00, G0l, Gl0, Gll = [np.asarray(g) for g in G2]
    for k in range(K):
        for s1 in range(N):
            if not mask[s1, k]:
                continue
            t1 = trg[s1, k]
            for s2 in range(N):
                if not mask[s2, k]:
                    continue
                t2 = trg[s2, k]
                jl = sum(T[s1, t1] * Gll[b, t1, s1] - T[t1, s1] * Gll[b, s1, t1]
                         for b in range(2))
                j0 = sum(T[s2, t2] * G00[b, t2, s2] - T[t2, s2] * G00[b, s2, t2]
                         for b in range(2))
                val = jl * j0
                for b in range(2):
                    val += (
                        T[t1, s1] * T[t2, s2] * (-G0l[b, s2, t1]) * Gl0[b, s1, t2]
                        - T[s1, t1] * T[t2, s2] * (-G0l[b, s2, s1]) * Gl0[b, t1, t2]
                        - T[t1, s1] * T[s2, t2] * (-G0l[b, t2, t1]) * Gl0[b, s1, s2]
                        + T[s1, t1] * T[s2, t2] * (-G0l[b, t2, s1]) * Gl0[b, t1, s2])
                want[lat.pair_dir[s1, s2], k] += val
    np.testing.assert_allclose(got, want / N, rtol=1e-9, atol=1e-11)
