"""Stochastic Lanczos quadrature for matrix-free log-determinants."""

import jax
import jax.numpy as jnp
from jax import lax
from .. import config

__all__ = ["lanczos", "slq_logdet", "cg_quadrature_logdet"]


@config.pin_matmul_precision
def lanczos(matvec, z, num_steps):
    """Batched Lanczos tridiagonalisation.

    Args:
        matvec: ``(n, p) -> (n, p)`` SPD operator.
        z: start vectors ``(n, p)``.
        num_steps: Lanczos steps ``m``.

    Returns:
        ``(alphas (m, p), betas (m-1, p))`` — the tridiagonal coefficients
        for each probe.
    """
    n, p = z.shape
    q = z / jnp.maximum(jnp.linalg.norm(z, axis=0, keepdims=True), 1e-30)

    def body(carry, _):
        q_prev, q_cur, beta_prev = carry
        w = matvec(q_cur) - beta_prev[None, :] * q_prev
        alpha = jnp.sum(q_cur * w, axis=0)
        w = w - alpha[None, :] * q_cur
        # One round of reorthogonalisation against the two live vectors
        # keeps the recurrence stable enough for quadrature.
        w = w - jnp.sum(q_cur * w, axis=0)[None, :] * q_cur
        w = w - jnp.sum(q_prev * w, axis=0)[None, :] * q_prev
        beta = jnp.linalg.norm(w, axis=0)
        # Breakdown: the Krylov space is exhausted (e.g. the preconditioner
        # whitens the operator to ~identity, so the residual after one step
        # is numerical noise). Zero out the recurrence instead of dividing
        # noise by ~0: the tridiagonal then decouples into [T_valid, 0], and
        # the zero block's eigenvectors have zero first component, so it
        # contributes nothing to the e1-quadrature.
        tol = jnp.sqrt(jnp.finfo(z.dtype).eps) * jnp.maximum(
            jnp.abs(alpha), 1.0
        )
        live = beta > tol
        beta = jnp.where(live, beta, 0.0)
        q_next = jnp.where(
            live[None, :], w / jnp.maximum(beta, 1e-30)[None, :], 0.0
        )
        return (q_cur, q_next, beta), (alpha, beta)

    (_, _, _), (alphas, betas) = lax.scan(
        body, (jnp.zeros_like(q), q, jnp.zeros(p, z.dtype)), None, length=num_steps
    )
    return alphas, betas[:-1]


def _e1_quadrature(diag, off, z_norms):
    """``mean_j z_norms[j] * e1^T log(T_j) e1`` for symmetric tridiagonals
    given as ``diag (m, p)`` and ``off (m-1, p)`` stacks."""
    m, p = diag.shape
    T = jnp.zeros((p, m, m), diag.dtype)
    idx = jnp.arange(m)
    T = T.at[:, idx, idx].set(diag.T)
    if m > 1:
        oidx = jnp.arange(m - 1)
        T = T.at[:, oidx, oidx + 1].set(off.T)
        T = T.at[:, oidx + 1, oidx].set(off.T)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, jnp.finfo(diag.dtype).tiny)
    w1 = evecs[:, 0, :] ** 2
    quad = jnp.sum(w1 * jnp.log(evals), axis=1)
    return jnp.mean(z_norms * quad)


@config.pin_matmul_precision
def cg_quadrature_logdet(alphas, betas, steps, z_norms):
    """Stochastic logdet estimate from CG's own coefficients (the mBCG
    identity, Gardner et al. 2018): CG on ``A x = b`` implicitly runs
    Lanczos on ``A`` with start ``b/||b||``, and its step sizes map to the
    Lanczos tridiagonal as

        T[0, 0] = 1/alpha_0
        T[t, t] = 1/alpha_t + beta_{t-1}/alpha_{t-1}
        T[t-1, t] = T[t, t-1] = sqrt(beta_{t-1})/alpha_{t-1}

    so ``b^T log(A) b ~ ||b||^2 e1^T log(T) e1``. For preconditioned CG the
    same coefficients tridiagonalise the *whitened* operator
    ``P^{-1/2} A P^{-1/2}`` with start ``P^{-1/2} b`` — hence probes drawn
    as ``b = P^{1/2} u`` with ``u ~ N(0, I)`` give an unbiased Hutchinson
    estimate of ``tr log(P^{-1/2} A P^{-1/2})`` at zero extra matvecs.

    Args:
        alphas, betas: ``(m, p)`` coefficient buffers from
            ``batched_cg(..., track_tridiag=m)``.
        steps: ``(p,)`` number of valid rows per column.
        z_norms: ``(p,)`` squared norms ``||u_j||^2`` of the *unwhitened*
            start vectors.

    Returns:
        scalar estimate of ``tr log`` of the operator CG iterated on.
    """
    m, p = alphas.shape
    t_idx = jnp.arange(m)[:, None]
    valid = t_idx < steps[None, :]
    safe_a = jnp.where(valid, alphas, 1.0)
    prev_b = jnp.concatenate([jnp.zeros((1, p), alphas.dtype), betas[:-1]], 0)
    prev_a = jnp.concatenate([jnp.ones((1, p), alphas.dtype), safe_a[:-1]], 0)
    diag = 1.0 / safe_a + prev_b / prev_a
    # Padded rows become an identity block decoupled from the quadrature.
    diag = jnp.where(valid, diag, 1.0)
    if m > 1:
        off = jnp.sqrt(jnp.maximum(betas[:-1], 0.0)) / safe_a[:-1]
        off = jnp.where(valid[1:], off, 0.0)
    else:
        off = jnp.zeros((0, p), alphas.dtype)
    return _e1_quadrature(diag, off, z_norms)


@config.pin_matmul_precision
def slq_logdet(matvec, z, *, num_steps=24):
    """Estimate ``logdet(A)`` for SPD matrix-free ``A`` via SLQ.

    ``E_z[z^T log(A) z] = tr log A`` for ``z ~ N(0, I)`` probes ``(n, p)``;
    each probe's quadrature uses the eigendecomposition of its Lanczos
    tridiagonal."""
    dtype = z.dtype
    alphas, betas = lanczos(matvec, z, num_steps)
    m, p = alphas.shape
    # Assemble tridiagonal matrices (p, m, m).
    T = jnp.zeros((p, m, m), dtype)
    diag_idx = jnp.arange(m)
    T = T.at[:, diag_idx, diag_idx].set(alphas.T)
    off_idx = jnp.arange(m - 1)
    T = T.at[:, off_idx, off_idx + 1].set(betas.T)
    T = T.at[:, off_idx + 1, off_idx].set(betas.T)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 1e-30)
    w1 = evecs[:, 0, :] ** 2  # First components of each eigenvector.
    quad = jnp.sum(w1 * jnp.log(evals), axis=1)  # e1^T log(T) e1 per probe.
    z_norms = jnp.sum(z * z, axis=0)
    return jnp.mean(z_norms * quad)
