"""Transfer-safe device→host conversion.

Some TPU runtimes (the tunneled axon backend in particular) implement
device→host copies only for real/integer dtypes — fetching a complex buffer
raises UNIMPLEMENTED. Complex-hopping sessions carry complex64 Green's
functions and binner accumulators, so every host conversion in the library
goes through `to_host`, which splits complex arrays into two real transfers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def real_dtype(dtype):
    """The real counterpart of a (possibly complex) dtype, computed from
    HOST-side numpy metadata: an eager device op on a complex scalar (the
    obvious jnp.zeros((), dtype).real route) crashes TPU runtimes without
    complex support."""
    return jnp.dtype(np.zeros((), np.dtype(jnp.dtype(dtype).name)).real.dtype)


def to_host(x):
    """np.asarray(x) that works for complex device arrays on runtimes
    without complex transfer support (fetched as a real/imag pair)."""
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def tree_to_host(tree):
    """to_host over every leaf of a pytree."""
    return jax.tree_util.tree_map(to_host, tree)
