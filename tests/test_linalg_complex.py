"""Complex-dtype audit of the UDT linear algebra (VERDICT r1 missing #6).

The reference carries complex UDT/reflector paths (src/linalg/UDT.jl:316-469)
and a `greenseltype` hook; these tests pin the same capability here: the
decomposition contract, triangular solves, and the Dmax/Dmin-split Green's
algebra must hold for complex (graded) inputs. CPU, complex128.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_tpu.ops.linalg import (udt_dirty, udt_dirty_colscaled,
                                       scatter_columns, rdiv_dirty,
                                       calculate_greens)


def _graded_complex(key, b, n, span):
    kr, ki = jax.random.split(jax.random.PRNGKey(key))
    A = (jax.random.normal(kr, (b, n, n)) +
         1j * jax.random.normal(ki, (b, n, n)))
    return A * jnp.exp(jnp.linspace(span, -span, n))[None, None, :]


@pytest.mark.parametrize("udt_fn", [udt_dirty, udt_dirty_colscaled])
def test_udt_complex_contract(udt_fn):
    A = _graded_complex(0, 4, 24, 12.0)
    U, D, R, piv = jax.jit(udt_fn)(A)
    assert jnp.iscomplexobj(U) and jnp.iscomplexobj(R)
    assert not jnp.iscomplexobj(D)
    assert np.all(np.asarray(D) > 0)
    # unitarity
    eye = np.eye(24)
    err = np.max(np.abs(np.asarray(
        jnp.swapaxes(U, -1, -2).conj() @ U) - eye))
    assert err < 1e-12, err
    # reconstruction, column-relative (graded columns)
    recon = (U * D[..., None, :]) @ scatter_columns(R, piv)
    colscale = np.max(np.abs(np.asarray(A)), axis=-2, keepdims=True)
    np.testing.assert_allclose(np.asarray(recon) / colscale,
                               np.asarray(A) / colscale, atol=1e-11)
    # dirty T: unit-MAGNITUDE diagonal (phase allowed), upper triangular
    diag = np.abs(np.diagonal(np.asarray(R), axis1=-2, axis2=-1))
    np.testing.assert_allclose(diag, 1.0, atol=1e-10)
    assert np.max(np.abs(np.tril(np.asarray(R), -1))) < 1e-10


def test_rdiv_dirty_complex():
    A = _graded_complex(1, 4, 16, 4.0)
    X = _graded_complex(2, 4, 16, 0.0)
    U, D, R, piv = udt_dirty(A)
    T = scatter_columns(R, piv)
    Z = rdiv_dirty(X, R, piv)
    np.testing.assert_allclose(np.asarray(Z @ T), np.asarray(X), atol=1e-9)


def _adj_np(A):
    return jnp.swapaxes(A, -1, -2).conj()


def test_calculate_greens_complex():
    """G = [I + Al·Ar]^{-1} for graded complex factors via the Dmax/Dmin
    split algebra, vs direct inversion of a moderately conditioned case."""
    n = 16
    Al = _graded_complex(3, 2, n, 6.0)
    Ar = _graded_complex(4, 2, n, 6.0)
    Ul, Dl, Rl, pl_ = udt_dirty(Al)
    Tl = scatter_columns(Rl, pl_)
    # decompose Ar† so that Tr† Dr Ur† = (Ur Dr Tr)† = Ar
    Ur, Dr, Rr, pr = udt_dirty(_adj_np(Ar))
    Tr = scatter_columns(Rr, pr)
    G = jax.jit(calculate_greens)(Ul, Dl, Tl, Ur, Dr, Tr)
    direct = np.linalg.inv(np.eye(n) + np.asarray(Al) @ np.asarray(Ar))
    np.testing.assert_allclose(np.asarray(G), direct, atol=1e-8)
