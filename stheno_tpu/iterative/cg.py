"""Batched (preconditioned) conjugate gradients for kernel systems."""

import jax
import jax.numpy as jnp
from jax import lax
from .. import config

__all__ = ["batched_cg"]


@config.pin_matmul_precision
def batched_cg(
    matvec,
    b,
    *,
    precond=None,
    tol=1e-6,
    max_iters=1000,
    x0=None,
    min_iters=0,
    track_tridiag=0,
):
    """Solve ``A X = B`` for SPD matrix-free ``A`` with multiple right-hand
    sides simultaneously (they share each Gram-tile evaluation).

    Args:
        matvec: callable ``(n, p) -> (n, p)`` applying ``A``.
        b: right-hand sides ``(n, p)``.
        precond: optional callable applying ``P^{-1}``.
        tol: relative residual tolerance (per column, on the max).
        max_iters: iteration cap.
        min_iters: run at least this many iterations even after the residual
            converges (used to collect enough Lanczos quadrature nodes).
        track_tridiag: record the first ``track_tridiag`` CG coefficients
            ``(alpha_t, beta_t)`` per column — the mBCG trick (Gardner et
            al., 2018): CG's coefficients ARE the Lanczos tridiagonal of the
            (preconditioned) operator with the rhs as start vector, so a
            stochastic logdet estimate falls out of the solve for free (see
            ``slq.py:tridiag_quadrature``). Coefficients are only recorded
            while the column is unconverged (``steps`` marks how many are
            valid); converged columns' ratios are rounding noise.

    Returns:
        ``(x, info)`` with ``info = {"iters", "rel_residual"}`` plus, when
        ``track_tridiag > 0``, ``info["tridiag"] = (alphas (m, p),
        betas (m, p), steps (p,))``.
    """
    b = jnp.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    p_apply = precond if precond is not None else (lambda r: r)
    ncols = b.shape[1]
    m = int(track_tridiag)

    if x0 is None:
        x = jnp.zeros_like(b)
    else:
        x0 = jnp.asarray(x0)
        # A warm start from a previous (squeezed) solve re-upranks.
        x = x0[:, None] if squeeze and x0.ndim == 1 else x0
    r = b - matvec(x)
    z = p_apply(r)
    d = z
    rz = jnp.sum(r * z, axis=0)
    b_norm = jnp.maximum(jnp.linalg.norm(b, axis=0), 1e-30)

    alphas0 = jnp.zeros((m, ncols), b.dtype)
    betas0 = jnp.zeros((m, ncols), b.dtype)
    steps0 = jnp.zeros((ncols,), jnp.int32)

    def cond(state):
        x, r, z, d, rz, it, alphas, betas, steps = state
        rel = jnp.max(jnp.linalg.norm(r, axis=0) / b_norm)
        return jnp.logical_and(
            it < max_iters, jnp.logical_or(rel > tol, it < min_iters)
        )

    # Recording floor: coefficients stay valid Lanczos nodes until the
    # residual hits the rounding regime, *independent* of the user's solve
    # tolerance — a converged-to-tol column keeps contributing quadrature
    # nodes for as long as the loop still runs for other columns.
    rec_floor = jnp.sqrt(jnp.finfo(b.dtype).eps)

    def body(state):
        x, r, z, d, rz, it, alphas, betas, steps = state
        active = jnp.linalg.norm(r, axis=0) / b_norm > rec_floor
        Ad = matvec(d)
        dAd = jnp.sum(d * Ad, axis=0)
        alpha = rz / jnp.where(dAd == 0, 1.0, dAd)
        x = x + alpha[None, :] * d
        r = r - alpha[None, :] * Ad
        z = p_apply(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        d = z + beta[None, :] * d
        if m > 0:
            # Record only contiguous prefixes (steps == it): once a column
            # converges its coefficient ratios are rounding noise, and a
            # residual that wobbles back above tol must not append
            # non-contiguous nodes.
            record = active & (it < m) & (steps == it)
            t = jnp.minimum(it, m - 1)
            zero = jnp.zeros_like(t)
            alphas = lax.dynamic_update_slice(
                alphas, jnp.where(record, alpha, alphas[t])[None, :], (t, zero)
            )
            betas = lax.dynamic_update_slice(
                betas, jnp.where(record, beta, betas[t])[None, :], (t, zero)
            )
            steps = steps + record.astype(jnp.int32)
        return x, r, z, d, rz_new, it + 1, alphas, betas, steps

    x, r, z, d, rz, iters, alphas, betas, steps = lax.while_loop(
        cond,
        body,
        (x, r, z, d, rz, jnp.int32(0), alphas0, betas0, steps0),
    )
    rel = jnp.max(jnp.linalg.norm(r, axis=0) / b_norm)
    info = {"iters": iters, "rel_residual": rel}
    if m > 0:
        info["tridiag"] = (alphas, betas, steps)
    return (x[:, 0] if squeeze else x), info
