"""Batched (preconditioned) conjugate gradients for kernel systems."""

import jax
import jax.numpy as jnp
from jax import lax
from .. import config

__all__ = ["batched_cg"]


@config.pin_matmul_precision
def batched_cg(matvec, b, *, precond=None, tol=1e-6, max_iters=1000, x0=None):
    """Solve ``A X = B`` for SPD matrix-free ``A`` with multiple right-hand
    sides simultaneously (they share each Gram-tile evaluation).

    Args:
        matvec: callable ``(n, p) -> (n, p)`` applying ``A``.
        b: right-hand sides ``(n, p)``.
        precond: optional callable applying ``P^{-1}``.
        tol: relative residual tolerance (per column, on the max).
        max_iters: iteration cap.

    Returns:
        ``(x, info)`` with ``info = {"iters", "rel_residual"}``.
    """
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    p = precond if precond is not None else (lambda r: r)

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = p(r)
    d = z
    rz = jnp.sum(r * z, axis=0)
    b_norm = jnp.maximum(jnp.linalg.norm(b, axis=0), 1e-30)

    def cond(state):
        x, r, z, d, rz, it = state
        rel = jnp.max(jnp.linalg.norm(r, axis=0) / b_norm)
        return jnp.logical_and(it < max_iters, rel > tol)

    def body(state):
        x, r, z, d, rz, it = state
        Ad = matvec(d)
        dAd = jnp.sum(d * Ad, axis=0)
        alpha = rz / jnp.where(dAd == 0, 1.0, dAd)
        x = x + alpha[None, :] * d
        r = r - alpha[None, :] * Ad
        z = p(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        d = z + beta[None, :] * d
        return x, r, z, d, rz_new, it + 1

    x, r, z, d, rz, iters = lax.while_loop(
        cond, body, (x, r, z, d, rz, jnp.int32(0))
    )
    rel = jnp.max(jnp.linalg.norm(r, axis=0) / b_norm)
    info = {"iters": iters, "rel_residual": rel}
    return (x[:, 0] if squeeze else x), info
