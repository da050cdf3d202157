"""Stochastic variational GP inference (uncollapsed ELBO, minibatchable).

The reference's sparse path (``PseudoObs``/VFE, Titsias 2009 — cf.
``/root/reference/stheno/model/observations.py:279-336``) *collapses* the
variational posterior q(u) analytically, which requires touching all N
observations per objective evaluation. This module adds the uncollapsed
formulation (Hensman, Fusi & Lawrence 2013, "Gaussian Processes for Big
Data"): q(u) = N(m, S) is kept explicit, so the ELBO decomposes into a sum
over data points and can be estimated from *minibatches* — the streaming /
epoch-based training regime of large-scale production GPs. The reference has
no analogue; at full batch with q(u) set optimally the ELBO provably equals
the collapsed VFE ELBO (tested in ``tests/model/test_svgp.py``).

Everything is a pure function of a parameter pytree, so the whole training
step jits, grads, and shards: the likelihood term is a per-point sum, so
sharding the batch over a mesh axis data-parallelises the step with one
``psum`` (GSPMD inserts it from input shardings — no shard_map needed).

**Whitened parameterisation.** q(u) is stored in the whitened coordinates
``u = L_z eps`` with ``q(eps) = N(m, S S^T)`` (``L_z = chol(K_z)``,
``q_sqrt = S`` lower-triangular): the KL becomes the identity-prior form
``KL = 1/2 (||m||^2 + ||S||_F^2 - M - 2 sum log diag S)`` and its geometry
is independent of the kernel hyperparameters — the standard conditioning
trick for joint (hyper, variational) optimisation.

**Natural gradients.** For a Gaussian likelihood the ELBO's natural-gradient
step in the (whitened) natural parameters is closed-form (the SVI update of
Hensman et al. 2013; no autodiff through the M x M factorisation):

    Lam <- (1 - rho) Lam + rho (I + (N/B) A_b A_b^T / noise)
    nu  <- (1 - rho) nu  + rho (N/B) A_b y_b / noise

with ``A_b = L_z^{-1} K_{z,x_b}``; ``rho = 1`` at full batch jumps straight
to the optimal q(u), recovering the collapsed bound in one step.
"""

import jax
import jax.numpy as jnp

from .. import config
from ..kernels import elwise, mean_eval, pairwise
from ..matrix import cholesky, dense, solve

__all__ = ["svgp_init", "svgp_elbo", "svgp_predict", "svgp_natgrad_step"]


def _as_col(y):
    y = jnp.asarray(y)
    return y[:, None] if y.ndim == 1 else y


def _as_mean(mean):
    """Promote numbers/callables to a mean expression (as ``GP`` does,
    reference ``gp.py:81-87``)."""
    from ..kernels import OneMean
    from ..kernels.mean import Mean

    if isinstance(mean, Mean):
        return mean
    return mean * OneMean()


def _whitened_A(k, params, x):
    """``A = L_z^{-1} k(z, x)`` (M, B), via the library's structured ops so
    the jitter policy, the pinned matmul precision, and the fast-Cholesky
    carried ``inv(L)`` (which turns this solve into a GEMM at large M —
    see ``matrix/ops.py:_chol_dense``) all apply."""
    z = params["z"]
    L = cholesky(pairwise(k, z))
    K_zx = dense(pairwise(k, z, x))
    return dense(solve(L, K_zx))


def _whitened_stats(k, params, x):
    """``A`` plus the prior kernel diagonal at ``x`` (for variances)."""
    A = _whitened_A(k, params, x)
    k_diag = jnp.squeeze(jnp.asarray(elwise(k, x)), -1)  # (B,)
    return A, k_diag


def _marginals(A, k_diag, m_w, S):
    """Whitened-posterior predictive marginals: mean ``A^T m`` (B, 1) and
    ``Var[f_i] = k_ii - a_i^T a_i + a_i^T S S^T a_i`` clamped at zero."""
    f_mean = jnp.matmul(jnp.swapaxes(A, -1, -2), m_w)  # (B, 1)
    SA = jnp.matmul(jnp.swapaxes(S, -1, -2), A)  # (M, B)
    f_var = k_diag - jnp.sum(A * A, axis=-2) + jnp.sum(SA * SA, axis=-2)
    return f_mean, jnp.maximum(f_var, 0)


@config.pin_matmul_precision
def svgp_init(k, z, dtype=None):
    """Initial SVGP parameter pytree for inducing inputs ``z`` ``(M, d)``.

    ``q(eps) = N(0, I)`` (the whitened prior), i.e. the initial predictive
    equals the prior. ``z`` is part of the pytree and can be optimised."""
    z = jnp.asarray(z)
    if z.ndim == 1:
        z = z[:, None]
    if dtype is not None:
        z = z.astype(dtype)
    m = z.shape[0]
    return {
        "z": z,
        "q_mu": jnp.zeros((m, 1), z.dtype),
        "q_sqrt": jnp.eye(m, dtype=z.dtype),
    }


@config.pin_matmul_precision
def svgp_elbo(k, params, x, y, noise, num_data, mean=None):
    """Minibatch evidence lower bound (natural units, to be *maximised*).

    Args:
        k: kernel expression (may depend on traced hyperparameters).
        params: pytree from :func:`svgp_init` (``z``, ``q_mu``, ``q_sqrt``).
        x: batch inputs ``(B, d)`` or ``(B,)``.
        y: batch targets ``(B,)`` or ``(B, 1)``.
        noise: Gaussian observation-noise *variance* (scalar).
        num_data: total dataset size N (the likelihood term is scaled by
            ``N / B`` so minibatch ELBOs are unbiased estimates of the full
            bound).
        mean: optional mean expression; subtracted from ``y``.

    Sharding: ``x``/``y`` sharded over a mesh axis data-parallelise the
    likelihood sum (GSPMD reduces it); all other terms are O(M^2)."""
    y = _as_col(y)
    if mean is not None:
        y = y - jnp.asarray(mean_eval(_as_mean(mean), x))
    A, k_diag = _whitened_stats(k, params, x)
    m_w, S = params["q_mu"], jnp.tril(params["q_sqrt"])
    b = y.shape[-2]
    noise = jnp.asarray(noise)
    f_mean, f_var = _marginals(A, k_diag, m_w, S)

    resid2 = jnp.squeeze((y - f_mean), -1) ** 2
    lik = -0.5 * jnp.sum(
        jnp.log(2 * jnp.pi * noise) + (resid2 + f_var) / noise
    )
    m_dim = m_w.shape[-2]
    # KL(N(m, SS^T) || N(0, I)).
    kl = 0.5 * (
        jnp.sum(m_w**2)
        + jnp.sum(S**2)
        - m_dim
        - 2 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(S))))
    )
    scale = jnp.asarray(num_data, y.dtype) / b
    return scale * lik - kl


@config.pin_matmul_precision
def svgp_predict(k, params, x_new, noise=None, mean=None):
    """Predictive marginals ``(mean, var)`` at ``x_new`` (diagonal only).

    ``noise=None`` returns the latent-function marginals; a scalar adds
    observation noise to the variance."""
    A, k_diag = _whitened_stats(k, params, x_new)
    m_w, S = params["q_mu"], jnp.tril(params["q_sqrt"])
    f_mean, f_var = _marginals(A, k_diag, m_w, S)
    f_mean = jnp.squeeze(f_mean, -1)
    if mean is not None:
        f_mean = f_mean + jnp.squeeze(jnp.asarray(mean_eval(_as_mean(mean), x_new)), -1)
    if noise is not None:
        f_var = f_var + jnp.asarray(noise)
    return f_mean, f_var


@config.pin_matmul_precision
def svgp_natgrad_step(k, params, x, y, noise, num_data, rho, mean=None):
    """One natural-gradient step on ``(q_mu, q_sqrt)`` (Gaussian likelihood).

    Closed form in the whitened natural parameters — no autodiff through the
    factorisation, one M x M Cholesky. ``rho = 1`` with the full dataset as
    the batch lands exactly on the optimal q(u) (collapsed-VFE optimum);
    ``rho ~ 0.1..0.5`` is typical for minibatches. Returns a new params
    pytree (``z`` untouched — optimise it and the hyperparameters with the
    ordinary gradient of :func:`svgp_elbo`)."""
    y = _as_col(y)
    if mean is not None:
        y = y - jnp.asarray(mean_eval(_as_mean(mean), x))
    A = _whitened_A(k, params, x)
    m_w, S = params["q_mu"], jnp.tril(params["q_sqrt"])
    m_dim = m_w.shape[-2]
    noise = jnp.asarray(noise)
    scale = jnp.asarray(num_data, y.dtype) / y.shape[-2]
    eye = jnp.eye(m_dim, dtype=A.dtype)

    # Current natural parameters: Lam = Sigma^{-1}, nu = Sigma^{-1} m.
    # S is already a lower-triangular factor of Sigma = S S^T, so cho_solve
    # on S directly inverts it exactly — no re-factorisation, no jitter,
    # and the conditioning of S rather than its square.
    Lam = jax.scipy.linalg.cho_solve((S, True), eye)
    nu = jax.scipy.linalg.cho_solve((S, True), m_w)

    # Batch statistics of the optimal update.
    Lam_hat = eye + scale * jnp.matmul(A, jnp.swapaxes(A, -1, -2)) / noise
    nu_hat = scale * jnp.matmul(A, y) / noise

    Lam_new = (1 - rho) * Lam + rho * Lam_hat
    nu_new = (1 - rho) * nu + rho * nu_hat

    # Back to (m, S): Sigma = Lam^{-1} via Cholesky, S = chol(Sigma).
    L_lam = jnp.linalg.cholesky(Lam_new)
    Sigma_new = jax.scipy.linalg.cho_solve((L_lam, True), eye)
    Sigma_new = 0.5 * (Sigma_new + jnp.swapaxes(Sigma_new, -1, -2))
    S_new = jnp.linalg.cholesky(
        Sigma_new + config.jitter(A.dtype) * 1e-2 * eye
    )
    m_new = jax.scipy.linalg.cho_solve((L_lam, True), nu_new)
    return {**params, "q_mu": m_new, "q_sqrt": S_new}
