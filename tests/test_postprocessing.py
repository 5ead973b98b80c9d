"""Post-processing and instrumentation tests
(reference: measurements/extensions.jl, helpers.jl)."""

import numpy as np

from montecarlo_tpu import (
    SquareLattice, fourier_transform, structure_factor, uniform_fourier,
    apply_symmetry, superfluid_density, timer, enable_benchmarks,
    disable_benchmarks, print_timer, reset_timer,
    absdiff, reldiff, effreldiff, compare,
)
from montecarlo_tpu.measurements.postprocessing import reciprocal_discretization


def test_reciprocal_discretization():
    lat = SquareLattice(4)
    qs = reciprocal_discretization(lat)
    assert qs.shape == (16, 2)
    # q=0 present; all |q| <= pi*sqrt(2) after folding
    assert np.any(np.all(np.abs(qs) < 1e-12, axis=1))
    assert np.max(np.linalg.norm(qs, axis=1)) <= np.pi * np.sqrt(2) + 1e-9


def test_fourier_transform_constant():
    lat = SquareLattice(4)
    qs = reciprocal_discretization(lat)
    vals = np.ones(lat.n_dirs)
    F = fourier_transform(qs, lat.directions, vals)
    # sum over all dirs at q=0 equals n_dirs
    q0 = np.where(np.all(np.abs(qs) < 1e-12, axis=1))[0][0]
    assert abs(F[q0] - lat.n_dirs) < 1e-9
    assert np.allclose(structure_factor(qs, lat.directions, vals), F)


def test_uniform_fourier_and_symmetry():
    data = np.arange(12.0).reshape(4, 3)
    assert uniform_fourier(data[:, 0]) == np.sum(data[:, 0])
    # s-wave weights (1,) pick the K=0 component summed over dirs
    sym = apply_symmetry(data, (1.0,))
    assert np.allclose(sym, data[:, 0])
    cube = np.arange(8.0).reshape(2, 2, 2)
    s = apply_symmetry(cube, (1.0, 0.5))
    expected = np.einsum("ijk,j,k->i", cube, [1, 0.5], [1, 0.5])
    assert np.allclose(s, expected)


def test_superfluid_density_runs():
    lat = SquareLattice(4)
    data = np.random.default_rng(0).normal(size=(lat.n_dirs, 5))
    rho = superfluid_density(data, lat)
    assert np.isfinite(rho.real) and np.isfinite(rho.imag)


def test_timer_registry():
    reset_timer()
    enable_benchmarks()
    with timer("outer"):
        with timer("inner"):
            pass
    from montecarlo_tpu.utils.timing import timer_data
    data = timer_data()
    assert "outer" in data and "inner" in data["outer"]["children"]
    assert data["outer"]["count"] == 1
    disable_benchmarks()
    with timer("outer"):
        pass
    assert timer_data()["outer"]["count"] == 1  # no-op when disabled
    import io
    buf = io.StringIO()
    print_timer(buf)
    assert "outer" in buf.getvalue()


def test_compare_helpers():
    assert absdiff([1.0, 2.0], [1.0, 2.5]) == 0.5
    assert reldiff([1.0], [1.0]) == 0.0
    assert effreldiff([1.0, 1e-20], [1.0, 2e-20]) == 0.0  # below atol
    assert compare([1.0], [1.0 + 1e-8])
    assert not compare([1.0], [1.1])
