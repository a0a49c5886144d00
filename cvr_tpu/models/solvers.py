"""Iterative solvers driven by the SpMV kernels.

Conjugate gradient and power iteration: the standard HPC payloads for the
reference's non-scale-free (stencil/FEM) matrix suite (CVR paper Table 2,
"EngSci" domain).  All solvers are jit-traceable with lax control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conjugate_gradient(
    matvec,
    b: jax.Array,
    x0: jax.Array | None = None,
    tol: float = 1e-6,
    max_iters: int = 1000,
):
    """Solve A x = b for SPD A.  Returns (x, iterations, residual_norm)."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.vdot(r, r)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, _, _, rs, it = state
        return jnp.logical_and(
            jnp.sqrt(rs) / b_norm > tol, it < max_iters
        )

    def body(state):
        x, r, p, rs, it = state
        Ap = matvec(p)
        alpha = rs / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, iters = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.int32(0))
    )
    return x, iters, jnp.sqrt(rs) / b_norm


def power_iteration(
    matvec,
    n: int,
    tol: float = 1e-9,
    max_iters: int = 500,
    seed: int = 0,
):
    """Dominant eigenpair of A.  Returns (eigenvalue, eigenvector, iters)."""
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0)

    def cond(state):
        _, _, delta, it = state
        return jnp.logical_and(delta > tol, it < max_iters)

    def body(state):
        v, lam, _, it = state
        w = matvec(v)
        lam_new = jnp.vdot(v, w)
        w_norm = jnp.maximum(jnp.linalg.norm(w), 1e-30)
        v_new = w / w_norm
        delta = jnp.abs(lam_new - lam)
        return v_new, lam_new, delta, it + 1

    v, lam, delta, iters = jax.lax.while_loop(
        cond,
        body,
        (v0, jnp.float32(0.0), jnp.float32(jnp.inf), jnp.int32(0)),
    )
    return lam, v, iters
