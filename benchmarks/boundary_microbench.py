"""Microbenchmark: split the stack-boundary cost (extend + calculate_greens)
into components at the headline config (N=64, 256 chains, f32).

The slice-path microbench showed the boundary pair costs ~2.2 ms while its
flop content is ~1.3 GFLOP (~0.04 ms at MXU rate) — this script locates the
50x gap op by op so the fusion work targets the real cost.

Measurement discipline (ROADMAP round-3 lessons): host-fetch sync, timed
lax.scan chains with the mutated operand in the carry (no hoisting).

Usage: python -m benchmarks.boundary_microbench   (on the TPU runtime)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)

from montecarlo_tpu.ops import linalg  # noqa: E402

C = int(os.environ.get("MICRO_CHAINS", "256"))
N = int(os.environ.get("MICRO_N", "64"))
K = int(os.environ.get("MICRO_K", "300"))
SM = int(os.environ.get("MICRO_SM", "10"))


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jnp.real(jax.tree_util.tree_leaves(out)[0])))
        best = min(best, time.time() - t0)
    print(f"{name:42s} {best / K * 1e3:8.4f} ms / call", flush=True)
    return best / K * 1e3


def scan_chain(body):
    """K-iteration scan threading the operand through the carry."""
    @jax.jit
    def run(A):
        def step(carry, _):
            out = body(carry)
            # renormalize so the carry stays finite over K iterations
            out = out / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30)
            return out + 1e-3, None
        out, _ = lax.scan(step, A, None, length=K)
        return out
    return run


def main():
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (C, N, N), jnp.float32)
    # graded scales like a DQMC window product
    g = jnp.exp(jnp.linspace(8.0, -8.0, N))
    Ag = A * g[None, None, :]
    eT2 = jax.random.normal(key, (N, N), jnp.float32) * 0.1 + jnp.eye(N)
    expV = jnp.exp(jax.random.normal(key, (SM, C, N), jnp.float32) * 0.5)

    print(f"config: N={N} chains={C} K={K} sm={SM}", flush=True)

    # --- full ops -----------------------------------------------------
    def udt_full(A):
        U, D, R, piv = linalg.udt_dirty(A)
        return U + R

    timed("udt_dirty (full)", scan_chain(udt_full), Ag)

    # --- udt pieces ---------------------------------------------------
    timed("qr only", scan_chain(lambda A: sum(linalg._qr(A))), Ag)

    def norms_pivot_gather(A):
        norms = jnp.linalg.norm(A, axis=-2)
        piv, _ = linalg.argsort_desc(norms)
        return jnp.take_along_axis(A, piv[..., None, :], axis=-1)

    timed("norms + argsort + gather", scan_chain(norms_pivot_gather), Ag)

    def prescale(A):
        mx = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
        mx = jnp.maximum(mx, jnp.finfo(A.dtype).tiny)
        mx = jnp.exp2(jnp.ceil(jnp.log2(mx)) - 50.0)
        return A / mx

    timed("prescale (max/exp2/div)", scan_chain(prescale), Ag)

    def postscale(R):
        d = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))
        d = jnp.maximum(d, 2.0 ** -70)
        Rs = R / d[..., :, None]
        diag_vals = jnp.diagonal(Rs, axis1=-2, axis2=-1)
        fixed = jnp.where(jnp.abs(diag_vals) < 0.5,
                          jnp.ones_like(diag_vals), diag_vals)
        return Rs + (fixed - diag_vals)[..., :, None] * jnp.eye(
            N, dtype=Rs.dtype)

    timed("D extract + R scale + diag fix", scan_chain(postscale), Ag)

    # --- extend pieces ------------------------------------------------
    def bmults(U):
        def step(U, ev):
            return (eT2 @ (ev[..., None] * U)), None
        out, _ = lax.scan(step, U, jnp.moveaxis(expV, 0, 0))
        return out

    timed(f"{SM} B-mults (shared eT2 einsum)", scan_chain(bmults), Ag)

    # --- calculate_greens pieces -------------------------------------
    Tl = jnp.triu(A) + jnp.eye(N) * 2.0
    D = jnp.exp(jnp.linspace(6.0, -6.0, N))[None, :] * jnp.ones((C, 1))

    def cg_pre(Ul):
        X = Tl @ linalg._adj(Tl)
        Dlp = jnp.maximum(D, 1.0)
        Dlm = jnp.minimum(D, 1.0)
        M = (linalg._adj(Ul) @ Ul) / Dlp[..., :, None] / Dlp[..., None, :]
        return M + (Dlm[..., :, None] * X) * Dlm[..., None, :]

    timed("cg: X + M assembly (2 matmuls)", scan_chain(cg_pre), Ag)

    piv = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (C, N))
    R1 = jnp.triu(A * 0.05) + jnp.eye(N)

    def cg_post(Ur):
        Z = linalg.rdiv_dirty(Ur, R1, piv)
        Z = Z / D[..., None, :]
        W = linalg._adj(Ur) / jnp.maximum(D, 1.0)[..., None, :]
        return Z @ (W @ linalg._adj(Ur))

    timed("cg: rdiv + 2 matmuls", scan_chain(cg_post), Ag)

    def trisolve(Ur):
        return lax.linalg.triangular_solve(R1, Ur, left_side=False,
                                           lower=False)

    timed("trisolve only", scan_chain(trisolve), Ag)

    def batched_matmul(Ur):
        return Ur @ Ur

    timed("one batched matmul (C,N,N)@(C,N,N)", scan_chain(batched_matmul), Ag)

    def full_cg(Ul):
        G = linalg.calculate_greens(Ul, D, Tl, Ul, D, Tl)
        return G

    timed("calculate_greens (full)", scan_chain(full_cg), Ag)


if __name__ == "__main__":
    main()
