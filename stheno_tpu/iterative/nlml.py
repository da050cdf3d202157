"""Matrix-free exact-GP NLML with stochastic (Hutchinson) gradients.

The scalable-exact-GP training path for N where the N x N Gram cannot be
materialised (BASELINE.json north star: N = 262,144 on limited HBM). The
forward pass runs preconditioned CG for ``K^{-1}[y, Z]`` and SLQ for
``logdet K``; the backward pass uses the unbiased estimators

    d logdet / d theta  ~  (1/p) sum_i  u_i^T (dK/dtheta) z_i,  u_i = K^{-1} z_i
    d (y^T K^{-1} y)    =  - alpha^T (dK/dtheta) alpha,          alpha = K^{-1} y

realised by differentiating a surrogate ``0.5 (mean_i u_i^T K z_i -
alpha^T K alpha)`` with the solves stop-gradiented — so gradients flow
through the (differentiable, blocked) Gram matvec only."""

import math
from functools import partial

import jax
import jax.numpy as jnp

from .cg import batched_cg
from .matvec import kernel_matvec
from .pchol import (
    pivoted_cholesky,
    preconditioner_sqrt_ops,
    woodbury_preconditioner,
)
from .slq import slq_logdet
from .. import config

__all__ = ["iterative_nlml", "iterative_posterior_mean"]

_LOG_2_PI = math.log(2 * math.pi)


@config.pin_matmul_precision
def iterative_nlml(
    kernel_fn,
    params,
    x,
    y,
    noise,
    key,
    *,
    num_probes=8,
    cg_tol=1e-4,
    max_cg_iters=500,
    slq_steps=20,
    precond_rank=64,
    block=4096,
):
    """Stochastic estimate of the exact-GP NLML, differentiable w.r.t.
    ``params``, ``noise``, ``y`` (and ``x``).

    Note: Gram tiles stay in the input dtype. bf16 tiles
    (``kernel_matvec(tile_dtype=...)``) are measurably unsafe *inside this
    CG/SLQ pipeline* — rounding breaks operator symmetry enough to destroy
    CG convergence — so they are deliberately not plumbed through here.

    Args:
        kernel_fn: ``params -> Kernel`` expression builder.
        params: parameter pytree.
        x: inputs ``(n, d)`` or ``(n,)``.
        y: observations ``(n,)``.
        noise: scalar observation-noise variance.
        key: PRNG key for the Hutchinson/SLQ probe vectors.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    k1, k2 = jax.random.split(jax.lax.stop_gradient(key))
    z_cg = jax.random.normal(k1, (n, num_probes), dtype=y.dtype)
    z_slq = jax.random.normal(k2, (n, num_probes), dtype=y.dtype)
    matvec_fn = lambda k, xx, v, nz: kernel_matvec(k, xx, v, noise=nz, block=block)
    return _nlml(
        params, y, jnp.asarray(noise), x, z_cg, z_slq, kernel_fn, matvec_fn,
        None, cg_tol, max_cg_iters, slq_steps, precond_rank,
    )


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _nlml(params, y, noise, x, z_cg, z_slq, kernel_fn, matvec_fn,
          surrogate_grad_fn, cg_tol, max_cg_iters, slq_steps, precond_rank):
    """Shared stochastic-NLML core.

    ``matvec_fn(k, x, v, noise)`` supplies the Gram matvec for the forward
    solves (single-chip blocked or mesh-sharded; it is never differentiated).
    ``surrogate_grad_fn(params, noise, x, U, z, alpha) -> (p_bar, noise_bar,
    x_bar)`` supplies the backward-pass surrogate gradient; ``None`` selects
    the single-chip default (``jax.grad`` through ``matvec_fn``)."""
    val, _ = _nlml_fwd(params, y, noise, x, z_cg, z_slq, kernel_fn, matvec_fn,
                       surrogate_grad_fn, cg_tol, max_cg_iters, slq_steps,
                       precond_rank)
    return val


@config.pin_matmul_precision
def _nlml_fwd(params, y, noise, x, z_cg, z_slq, kernel_fn, matvec_fn,
              surrogate_grad_fn, cg_tol, max_cg_iters, slq_steps,
              precond_rank):
    n = x.shape[0]
    k = kernel_fn(jax.tree.map(jax.lax.stop_gradient, params))
    noise_sg = jax.lax.stop_gradient(noise)
    y_sg = jax.lax.stop_gradient(y)
    x_sg = jax.lax.stop_gradient(x)

    mv = lambda v: matvec_fn(k, x_sg, v, noise_sg)

    precond = None
    half_inv, logdet_p = None, 0.0
    if precond_rank and precond_rank > 0:
        L = pivoted_cholesky(k, x_sg, precond_rank)
        precond = woodbury_preconditioner(L, noise_sg)
        half_inv, logdet_p = preconditioner_sqrt_ops(L, noise_sg)

    rhs = jnp.concatenate([y_sg[:, None], z_cg], axis=1)
    sol, info = batched_cg(
        mv, rhs, precond=precond, tol=cg_tol, max_iters=max_cg_iters
    )
    alpha, U = sol[:, 0], sol[:, 1:]

    if half_inv is not None:
        # Variance-reduced SLQ: whiten by the preconditioner; the Hutchinson
        # variance scales with ||log(P^{-1/2} K P^{-1/2})||_F^2 ~ 0.
        mv_white = lambda v: half_inv(mv(half_inv(v)))
        logdet = logdet_p + slq_logdet(mv_white, z_slq, num_steps=slq_steps)
    else:
        logdet = slq_logdet(mv, z_slq, num_steps=slq_steps)
    quad = jnp.sum(y_sg * alpha)
    nlml = 0.5 * (logdet + quad + n * _LOG_2_PI)
    residuals = (params, noise, x, alpha, U, z_cg)
    return nlml, residuals


@config.pin_matmul_precision
def _nlml_bwd(kernel_fn, matvec_fn, surrogate_grad_fn, cg_tol, max_cg_iters,
              slq_steps, precond_rank, residuals, g):
    params, noise, x, alpha, U, z = residuals
    alpha = jax.lax.stop_gradient(alpha)
    U = jax.lax.stop_gradient(U)
    z = jax.lax.stop_gradient(z)

    if surrogate_grad_fn is None:
        surrogate_grad_fn = make_surrogate_grad(kernel_fn, matvec_fn)

    p_bar, noise_bar, x_bar = surrogate_grad_fn(params, noise, x, U, z, alpha)
    p_bar = jax.tree.map(lambda t: t * g, p_bar)
    y_bar = g * alpha
    return p_bar, y_bar, noise_bar * g, x_bar * g, jnp.zeros_like(z), jnp.zeros_like(z)


def make_surrogate_grad(kernel_fn, matvec_fn):
    """Single-chip surrogate gradient: differentiate the Hutchinson surrogate
    ``0.5 (mean_i u_i^T K z_i - alpha^T K alpha)`` straight through the
    blocked matvec."""

    def surrogate_grad(params, noise, x, U, z, alpha):
        def surrogate(params, noise, x):
            k = kernel_fn(params)
            Kz = matvec_fn(k, x, z, noise)
            Ka = matvec_fn(k, x, alpha[:, None], noise)[:, 0]
            trace_est = jnp.mean(jnp.sum(U * Kz, axis=0))
            quad_term = jnp.sum(alpha * Ka)
            return 0.5 * (trace_est - quad_term)

        return jax.grad(surrogate, argnums=(0, 1, 2))(params, noise, x)

    return surrogate_grad


_nlml.defvjp(_nlml_fwd, _nlml_bwd)


@config.pin_matmul_precision
def iterative_posterior_mean(kernel_fn, params, x, y, noise, x_new, *,
                             cg_tol=1e-6, max_cg_iters=1000,
                             precond_rank=64, block=4096):
    """Matrix-free posterior mean at ``x_new``: solve ``K alpha = y`` by
    preconditioned CG, then one blocked cross-Gram matvec."""
    k = kernel_fn(params)
    mv = lambda v: kernel_matvec(k, x, v, noise=noise, block=block)
    precond = None
    if precond_rank and precond_rank > 0:
        L = pivoted_cholesky(k, x, precond_rank)
        precond = woodbury_preconditioner(L, noise)
    alpha, info = batched_cg(
        mv, jnp.asarray(y), precond=precond, tol=cg_tol, max_iters=max_cg_iters
    )
    # Cross matvec: scan over x_new row blocks.
    from ..kernels import pairwise
    from ..matrix import dense
    from jax import lax

    x_arr = jnp.asarray(x)
    if x_arr.ndim == 1:
        x_arr = x_arr[:, None]
    xn = jnp.asarray(x_new)
    if xn.ndim == 1:
        xn = xn[:, None]
    m = xn.shape[0]
    blk = min(block, m)
    nb = -(-m // blk)
    xn_pad = jnp.zeros((nb * blk, xn.shape[1]), xn.dtype).at[:m].set(xn)

    def body(carry, xb):
        Kb = jnp.asarray(dense(pairwise(k, xb, x_arr)))
        return carry, Kb @ alpha

    _, out = lax.scan(body, None, xn_pad.reshape(nb, blk, xn.shape[1]))
    return out.reshape(nb * blk)[:m], info
