"""Distributed exact-GP inference: sharded Gram build, NLML with a custom
VJP, and posterior prediction — the multi-chip path for N >= 10^5 exact GPs
(BASELINE.json north star).

Design: inputs are small (N x d) and replicated; the N x N Gram is row-block
sharded over the mesh ``data`` axis. The Gram build is plain jnp under GSPMD
with a sharding constraint (XLA partitions the distance matmul); the
factorisation uses :func:`dist_cholesky` (shard_map + ICI collectives). The
NLML gradient is supplied analytically — ``dK = 0.5 (K^{-1} - a a^T)`` with
``a = K^{-1} y`` — so the blocked factorisation loop never needs reverse-mode
unrolling."""

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..kernels import pairwise
from ..matrix import dense
from .cholesky import dist_cholesky, dist_cholesky_with_inv, dist_solve_lower
from .. import config

__all__ = ["sharded_gram", "dist_nlml", "dist_posterior_predict"]

_LOG_2_PI = math.log(2 * math.pi)


@config.pin_matmul_precision
def sharded_gram(kernel, x, mesh, axis="data", noise=None):
    """Dense Gram matrix ``k(x, x) (+ noise I)`` with rows sharded over
    ``axis``. ``x``: (N, d) replicated; returns (N, N) row-sharded."""
    K = jnp.asarray(dense(pairwise(kernel, x)))
    if noise is not None:
        K = K + noise * jnp.eye(K.shape[-1], dtype=K.dtype)
    return jax.lax.with_sharding_constraint(K, NamedSharding(mesh, P(axis, None)))


def _logdet_from_L(L):
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def dist_nlml(K, y, mesh, axis="data", block=256):
    """Negative log marginal likelihood for a row-sharded ``K``;
    differentiable w.r.t. ``K`` (and ``y``) via the analytic gradient.

    ``y`` may be ``(N,)`` or ``(N, m)``: with ``m`` columns this is the sum
    of the ``m`` per-column NLMLs of independent outputs sharing ``K``,
    ``0.5 (m logdet K + sum_j y_j^T K^{-1} y_j + m N log 2pi)``."""
    return _dist_nlml(K, y, mesh, axis, block)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dist_nlml(K, y, mesh, axis, block):
    nlml, _ = _dist_nlml_fwd(K, y, mesh, axis, block)
    return nlml


@config.pin_matmul_precision
def _dist_nlml_fwd(K, y, mesh, axis, block):
    N = K.shape[-1]
    # The recursion carries L^{-1} alongside L (GSPMD-balanced GEMMs). The
    # L path never consumes the inverse parts, and `half` is computed by
    # substitution against L, so a value-only (undifferentiated) jitted
    # call drops the residuals and XLA prunes every inverse GEMM away.
    L, Linv = dist_cholesky_with_inv(K, mesh, axis=axis, block=block)
    y2 = y if y.ndim == 2 else y[:, None]
    m = y2.shape[-1]
    half = dist_solve_lower(L, y2, mesh, axis=axis, block=block)  # L^{-1} y
    quad = jnp.sum(half * half)
    nlml = 0.5 * (m * _logdet_from_L(L) + quad + m * N * _LOG_2_PI)
    # Residuals hold ONE N x N array (L^{-1}); L itself is not needed by the
    # backward (logdet already reduced), keeping backward peak memory at or
    # below the forward's. Stash `y` as given (not `y2`): the bwd keys the
    # cotangent's shape on the primal's own ndim.
    return nlml, (Linv, half, y)


@config.pin_matmul_precision
def _dist_nlml_bwd(mesh, axis, block, residuals, g):
    Linv, half, y = residuals
    m = y.shape[-1] if y.ndim == 2 else 1
    shard = NamedSharding(mesh, P(axis, None))
    # alpha = K^{-1} y = L^{-T} (L^{-1} y): one skinny GEMM on the carried
    # inverse — no N-column substitution, no explicit K^{-1} staging beyond
    # the single L^{-T} L^{-1} product below.
    alpha = jax.lax.with_sharding_constraint(
        jnp.matmul(Linv.T, half, preferred_element_type=Linv.dtype), shard
    )
    Kinv = jax.lax.with_sharding_constraint(
        jnp.matmul(Linv.T, Linv, preferred_element_type=Linv.dtype), shard
    )
    Kbar = 0.5 * g * (m * Kinv - jnp.matmul(alpha, alpha.T))
    ybar = g * alpha
    return Kbar, ybar if y.ndim == 2 else ybar[:, 0]


def _solve_upper_from_lower(L, b, mesh, axis, block):
    """Solve ``L^T x = b`` using the lower solver on the reversed system.

    ``(L^T)^{-1} = J (J L^T J)^{-1} J`` where ``J`` is the reversal — and
    ``J L^T J`` is lower-triangular."""
    Lr = L[::-1, ::-1].T  # J L^T J: lower-triangular.
    br = b[::-1]
    Lr = jax.lax.with_sharding_constraint(
        Lr, NamedSharding(mesh, P(axis, None))
    )
    br = jax.lax.with_sharding_constraint(br, NamedSharding(mesh, P(axis, None)))
    xr = dist_solve_lower(Lr, br, mesh, axis=axis, block=block)
    return xr[::-1]


_dist_nlml.defvjp(_dist_nlml_fwd, _dist_nlml_bwd)


@config.pin_matmul_precision
def dist_posterior_predict(kernel, x, y, x_new, noise, mesh, axis="data", block=256):
    """Posterior mean and variance-diagonal at ``x_new`` for an exact GP with
    row-sharded O(N^3/D) math."""
    K = sharded_gram(kernel, x, mesh, axis=axis, noise=noise)
    L = dist_cholesky(K, mesh, axis=axis, block=block)
    y2 = y if y.ndim == 2 else y[:, None]
    half = dist_solve_lower(L, y2, mesh, axis=axis, block=block)
    alpha = _solve_upper_from_lower(L, half, mesh, axis, block)
    K_xs = jnp.asarray(dense(pairwise(kernel, x, x_new)))  # (N, M)
    K_xs = jax.lax.with_sharding_constraint(
        K_xs, NamedSharding(mesh, P(axis, None))
    )
    mean = jnp.matmul(K_xs.T, alpha)
    V = dist_solve_lower(L, K_xs, mesh, axis=axis, block=block)  # L^{-1} K_xs
    from ..kernels import elwise

    prior_diag = jnp.asarray(elwise(kernel, x_new))[:, 0]
    var = prior_diag - jnp.sum(V * V, axis=0)
    return mean[:, 0], jnp.maximum(var, 0.0)
