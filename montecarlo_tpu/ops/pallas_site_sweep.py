"""Pallas TPU kernel: fused Metropolis site sweep over one time slice.

The sequential site loop (reference: sweep_spatial, DQMC.jl:546-582 — each
site's accept/reject depends on the rank-1-updated G of the previous site) is
inherently serial per chain, but in plain XLA it lowers to ~8 small ops per
site -> ~10^5 dispatches per sweep, making the hot path latency-bound. This
kernel runs the WHOLE site loop for one chain inside VMEM: G resident
on-chip, rank-1 updates as VPU outer products, no HBM traffic between sites.

float32 only (the f32 / mixed-precision hot path — f64 is not supported by
Mosaic); the UDT stabilization outside resets drift every safe_mult slices.

Mosaic constraints honored: dynamic indexing only through refs (G lives in
the output ref and is updated in place), operands 2D-ified so vmap-lifted
blocks satisfy the (8, 128)-or-full tiling rule. Written per-chain (no
grid): the chain batch is added by `vmap`. Verified bit-exact against the
XLA `core.sweep_slice` path in interpreter mode.
"""

from __future__ import annotations

import functools
import sys

# the kernel is traced inside already-deep scan nests (segments → slices →
# pallas); the default 1000-frame recursion limit is not enough
if sys.getrecursionlimit() < 100000:
    sys.setrecursionlimit(100000)

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
    # G and sigma live in the OUTPUT refs so the site loop can index them
    # dynamically (Mosaic only supports dynamic slicing through refs)
    G_out[...] = G_ref[...]

    # sigma sits in SMEM where only scalar accesses are legal: copy entrywise
    def copy_body(k, carry):
        sigma_out[0, k] = sigma_ref[0, k]
        return carry

    lax.fori_loop(jnp.int32(0), jnp.int32(N), copy_body, jnp.int32(0))

    acc_out[0, 0] = jnp.int32(0)
    nneg_out[0, 0] = jnp.int32(0)

    def body(i, carry):
        s = sigma_out[0, i].astype(jnp.float32)
        dEb = jnp.float32(-2.0 * lamb) * s
        # signs is a static python tuple — unrolled, no captured constants
        delta = jnp.stack([jnp.exp(jnp.float32(sg) * dEb) - 1.0
                           for sg in signs])                           # (F,)
        onehot = jnp.where(lax.broadcasted_iota(jnp.int32, (N, 1), 0) == i,
                           jnp.float32(1.0), jnp.float32(0.0))[:, 0]   # (N,)
        row_i = G_out[:, i, :]                                         # (F,N)
        # dynamic LANE indexing (G[:, :, i]) crashes the Mosaic compiler —
        # extract the column and the diagonal entry with onehot contractions
        col_i = jnp.sum(G_out[...] * onehot[None, None, :], axis=2)    # (F,N)
        gii = jnp.sum(row_i * onehot[None, :], axis=1)                 # (F,)
        r = 1.0 + delta * (1.0 - gii)
        # static unroll (Mosaic has no reduce_prod): F is 1 or 2
        rprod = r[0]
        for f in range(1, len(signs)):
            rprod = rprod * r[f]
        detratio = rprod ** det_power
        w = jnp.exp(-dEb) if use_boson else jnp.float32(1.0)
        p = w * detratio
        accept = u_ref[0, i] < p
        # NOTE: bool→numeric astype hits an infinite recursion in the Mosaic
        # convert_element_type lowering — use where() instead; counters live
        # in SMEM refs so the fori body carries nothing
        nneg_out[0, 0] = nneg_out[0, 0] + jnp.where(detratio < 0,
                                                    jnp.int32(1), jnp.int32(0))
        x = jnp.where(accept, delta / r, jnp.zeros_like(r))            # (F,)
        IG = onehot[None, :] - col_i                                   # (F,N)
        G_out[...] = (G_out[...]
                      - (x[:, None] * IG)[:, :, None] * row_i[:, None, :])
        sigma_out[0, i] = jnp.where(accept, -sigma_out[0, i],
                                    sigma_out[0, i])
        acc_out[0, 0] = acc_out[0, 0] + jnp.where(accept, jnp.int32(1),
                                                  jnp.int32(0))
        return carry

    # 32-bit loop bounds: under jax_enable_x64 a python-int fori index is
    # int64, and int32->int64 conversion infinitely recurses in the Mosaic
    # lowering fallback
    lax.fori_loop(jnp.int32(0), jnp.int32(N), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("lamb", "signs", "det_power",
                                             "use_boson"))
def site_sweep_pallas(G, sigma, u, *, lamb, signs, det_power, use_boson):
    """Fused site sweep for ONE chain. G: (F,N,N) f32, sigma: (N,) int32,
    u: (N,) f32. Returns (G, sigma, acc, nneg). Batch with vmap."""
    F, N, _ = G.shape
    kern = functools.partial(_kernel, float(lamb), tuple(signs),
                             int(det_power), bool(use_boson), N, F)
    interpret = jax.default_backend() == "cpu"  # CPU: interpreter fallback
    # sigma / uniforms / counters live in SMEM (scalar loads+stores are only
    # legal there); G stays in VMEM
    smem = {} if interpret else {"memory_space": pltpu.SMEM}
    vmem = {} if interpret else {"memory_space": pltpu.VMEM}
    sigma_out, G_out, acc, nneg = pl.pallas_call(
        kern,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(**smem),
            pl.BlockSpec(**smem),
            pl.BlockSpec(**vmem),
        ],
        out_specs=[
            pl.BlockSpec(**smem),
            pl.BlockSpec(**vmem),
            pl.BlockSpec(**smem),
            pl.BlockSpec(**smem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), sigma.dtype),
            jax.ShapeDtypeStruct((F, N, N), G.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
    )(sigma[None, :], u[None, :], G)
    return G_out, sigma_out[0], acc[0, 0], nneg[0, 0]
