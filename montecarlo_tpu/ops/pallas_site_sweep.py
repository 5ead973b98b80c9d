"""Pallas TPU kernel: fused Metropolis site sweep over one time slice.

The sequential site loop (reference: sweep_spatial, DQMC.jl:546-582 — each
site's accept/reject depends on the rank-1-updated G of the previous site) is
inherently serial per chain, but in plain XLA it lowers to ~8 small ops per
site -> ~10^5 dispatches per sweep, making the hot path latency-bound. This
kernel runs the WHOLE site loop for one chain inside VMEM: G resident
on-chip, rank-1 updates as VPU outer products, no HBM traffic between sites.

float32 only (the mixed-precision / f32 hot path — f64 is not supported by
Mosaic); the f64 UDT stabilization outside resets the drift every safe_mult
slices.

Written per-chain (no grid): the chain batch is added by `vmap`, which lifts
the call into a grid dimension. Verified bit-exact against the XLA
`core.sweep_slice` path in interpreter mode for both Hubbard models.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _kernel(lamb, signs, det_power, use_boson, N, F,
            sigma_ref, u_ref, G_ref, sigma_out, G_out, acc_out, nneg_out):
    # operands are 2D-ified ((1, N) rows) to satisfy Mosaic block constraints
    sigma0 = sigma_ref[0, :]                     # (N,) int32
    u = u_ref[0, :]                              # (N,)
    G0 = G_ref[...]                              # (F, N, N)

    def body(i, carry):
        G, sigma, acc, nneg = carry
        s = sigma[i].astype(jnp.float32)
        dEb = jnp.float32(-2.0 * lamb) * s
        # signs is a static python tuple — unrolled so the kernel captures no
        # constant arrays
        delta = jnp.stack([jnp.exp(jnp.float32(sg) * dEb) - 1.0
                           for sg in signs])                           # (F,)
        row_i = lax.dynamic_slice_in_dim(G, i, 1, axis=1)              # (F,1,N)
        col_i = lax.dynamic_slice_in_dim(G, i, 1, axis=2)              # (F,N,1)
        gii = lax.dynamic_slice_in_dim(row_i, i, 1, axis=2)[:, 0, 0]   # (F,)
        r = 1.0 + delta * (1.0 - gii)
        detratio = jnp.prod(r) ** det_power
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        p = w * detratio
        accept = u[i] < p
        nneg = nneg + (detratio < 0).astype(jnp.int32)
        x = jnp.where(accept, delta / r, jnp.zeros_like(r))            # (F,)
        onehot = (lax.broadcasted_iota(jnp.int32, (N, 1), 0) == i
                  ).astype(jnp.float32)                                # (N,1)
        IG = onehot[None, :, :] - col_i                                # (F,N,1)
        G = G - x[:, None, None] * (IG * row_i)
        sigma = sigma.at[i].set(jnp.where(accept, -sigma[i], sigma[i]))
        acc = acc + accept.astype(jnp.int32)
        return (G, sigma, acc, nneg)

    G, sigma, acc, nneg = lax.fori_loop(
        0, N, body, (G0, sigma0, jnp.int32(0), jnp.int32(0)))
    G_out[...] = G
    sigma_out[0, :] = sigma
    acc_out[0, 0] = acc
    nneg_out[0, 0] = nneg


@functools.partial(jax.jit, static_argnames=("lamb", "signs", "det_power",
                                             "use_boson"))
def site_sweep_pallas(G, sigma, u, *, lamb, signs, det_power, use_boson):
    """Fused site sweep for ONE chain. G: (F,N,N) f32, sigma: (N,) int32,
    u: (N,) f32. Returns (G, sigma, acc, nneg). Batch with vmap."""
    F, N, _ = G.shape
    kern = functools.partial(_kernel, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F)
    interpret = jax.default_backend() == "cpu"  # CPU: interpreter fallback
    sigma_out, G_out, acc, nneg = pl.pallas_call(
        kern,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), sigma.dtype),
            jax.ShapeDtypeStruct((F, N, N), G.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(sigma[None, :], u[None, :], G)
    return G_out, sigma_out[0], acc[0, 0], nneg[0, 0]
