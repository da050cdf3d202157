"""Partial pivoted-Cholesky preconditioner for kernel systems.

A rank-``k`` pivoted Cholesky of the kernel matrix (greedy trace-error
pivoting) gives ``K ~ L L^T``; the preconditioner ``P = noise I + L L^T`` is
applied through the Woodbury identity, cutting CG iteration counts for
smooth kernels dramatically (the GPyTorch recipe)."""

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import elwise, pairwise
from ..matrix import dense
from .. import config

__all__ = ["pivoted_cholesky", "woodbury_preconditioner"]


@config.pin_matmul_precision
def pivoted_cholesky(k, x, rank):
    """Rank-``rank`` pivoted Cholesky of ``k(x, x)`` — returns ``L (n, rank)``.

    Matrix-free: each step evaluates one kernel row."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    d = elwise(k, x)[:, 0]  # Residual diagonal.
    L = jnp.zeros((n, rank), x.dtype)
    # Early-stopping tolerance: once the largest residual-diagonal entry
    # falls to the round-off floor of the largest initial diagonal entry,
    # the matrix is numerically exhausted — dividing the (noise-level)
    # residual row by sqrt(pivot) would amplify round-off into enormous
    # spurious columns (smooth kernels like EQ reach this floor well before
    # rank 50 in f64). Size-independent on purpose: scaling with the trace
    # would stop at O(N * eps) and cripple the preconditioner at large N in
    # f32. Dead steps write zero columns, which downstream Woodbury/sqrt
    # ops treat as an identity block.
    tol = 100 * jnp.finfo(x.dtype).eps * jnp.maximum(jnp.max(d), 1e-30)

    def body(i, carry):
        d, L = carry
        piv = jnp.argmax(d).astype(jnp.int32)
        live = d[piv] > tol
        x_piv = lax.dynamic_slice(x, (piv, jnp.int32(0)), (1, x.shape[1]))
        row = jnp.asarray(dense(pairwise(k, x, x_piv)))[:, 0]
        row = row - L @ L[piv]
        pivot_val = jnp.sqrt(jnp.maximum(d[piv], 1e-30))
        l_i = jnp.where(live, row / pivot_val, 0.0)
        L = L.at[:, i].set(l_i)
        d = jnp.maximum(d - l_i**2, 0.0)
        d = d.at[piv].set(jnp.where(live, 0.0, d[piv]))
        return d, L

    _, L = lax.fori_loop(0, rank, body, (d, L))
    return L


@config.pin_matmul_precision
def preconditioner_sqrt_ops(L, noise):
    """For ``P = noise I + L L^T``: returns ``(apply_P_half_inv,
    apply_P_half, logdet_P)``.

    ``P^{-1/2}`` whitens operators for variance-reduced quadrature
    (``logdet K = logdet P + tr log(P^{-1/2} K P^{-1/2})``, near-identity
    when ``P ~ K``); ``P^{1/2}`` draws probes ``z = P^{1/2} u ~ N(0, P)``
    so the mBCG quadrature of a *preconditioned* CG solve is unbiased
    (``slq.py:cg_quadrature_logdet``)."""
    noise = jnp.asarray(noise)
    n, k = L.shape
    U, S, _ = jnp.linalg.svd(L, full_matrices=False)
    lam = noise + S**2

    sqrt_noise = jnp.sqrt(noise)
    inv_sqrt_noise = 1.0 / sqrt_noise
    coeff_inv = 1.0 / jnp.sqrt(lam) - inv_sqrt_noise
    coeff_fwd = jnp.sqrt(lam) - sqrt_noise

    def _apply(v, base, coeff):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        Uv = U.T @ v2
        out = v2 * base + U @ (coeff[:, None] * Uv)
        return out[:, 0] if squeeze else out

    def apply_half_inv(v):
        return _apply(v, inv_sqrt_noise, coeff_inv)

    def apply_half(v):
        return _apply(v, sqrt_noise, coeff_fwd)

    logdet_p = jnp.sum(jnp.log(lam)) + (n - k) * jnp.log(noise)
    return apply_half_inv, apply_half, logdet_p


@config.pin_matmul_precision
def woodbury_preconditioner(L, noise):
    """``P^{-1}`` for ``P = noise I + L L^T`` via the Woodbury identity."""
    noise = jnp.asarray(noise)
    rank = L.shape[1]
    core = jnp.eye(rank, dtype=L.dtype) + (L.T @ L) / noise
    core_chol = jnp.linalg.cholesky(core)

    def apply(r):
        squeeze = r.ndim == 1
        r2 = r[:, None] if squeeze else r
        rhs = L.T @ r2 / noise
        sol = jax.scipy.linalg.cho_solve((core_chol, True), rhs)
        out = r2 / noise - (L @ sol) / noise
        return out[:, 0] if squeeze else out

    return apply
