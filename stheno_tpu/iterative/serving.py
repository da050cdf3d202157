"""One-object amortised serving for extreme-N exact GPs.

The r4 amortised pieces — representer weights (``nlml.posterior_weights``)
and the LOVE-style variance cache (``variance.variance_cache``) — make
posterior prediction at N ~ 10^5-10^6 pure GEMM work per query, but left
the orchestration to the user. :class:`AmortisedPosterior` bundles them:
build once after training, then ``mean`` / ``var`` / ``mean_var`` /
``marginal_credible_bounds`` serve arbitrary batches of test points with
no CG in the query path.

This is the scale-N counterpart of the reference's posterior-measure
workflow ``post = prior | (f(x, noise), y); post(x_new).marginals()``
(``/root/reference/stheno/model/measure.py:362-401``,
``/root/reference/stheno/random.py:204-238``) — same outputs, but the
O(N^3) dense pipeline is replaced by one matrix-free CG solve + an
O(N r) cache, amortised across every later query.

Axon/tunnel note: the cache arrays are large (U and S are ``(n, rank)``),
so the query programs take them as ARGUMENTS of internally-jitted
functions — a >~100 MB array closed over by a jitted function would be
serialised into the remote compile request (HTTP 413; see CLAUDE.md).
"""

import jax
import jax.numpy as jnp

from .. import config
from .nlml import cached_posterior_mean, posterior_weights
from .variance import (
    cached_posterior_mean_var,
    cached_posterior_var,
    variance_cache,
)

__all__ = ["AmortisedPosterior"]


def _pad_rows(xn, mult):
    """Pad ``xn`` (2-D) up to a row-count multiple of ``mult`` by
    repeating the first row; returns ``(padded, true_m)``. Query shapes
    are quantised BEFORE hitting the jitted functions so serving
    arbitrary batch sizes compiles one program per bucket, not one per
    distinct size (remote compiles through the axon tunnel cost
    seconds-to-minutes — r4 self-review finding)."""
    m = xn.shape[0]
    m_pad = -(-m // mult) * mult
    if m_pad == m:
        return xn, m
    pad = jnp.broadcast_to(xn[:1], (m_pad - m,) + xn.shape[1:])
    return jnp.concatenate([xn, pad], axis=0), m


class AmortisedPosterior:
    """Amortised posterior of an exact GP at large N.

    Build (one-time, runs one preconditioned CG solve for the weights and
    one cache build for the variance)::

        post = AmortisedPosterior(
            kernel_fn, params, x, y, noise,
            rank=512, key=jax.random.PRNGKey(0),
        )

    then serve (each call is blocked cross-Gram + thin-GEMM work only,
    jitted internally with the big operands passed as arguments)::

        mu = post.mean(x_new)
        sig2 = post.var(x_new)
        mu, lo, hi = post.marginal_credible_bounds(x_new)

    Args:
        kernel_fn: ``params -> Kernel`` expression builder.
        params: hyperparameter pytree (fixed at build time).
        x: training inputs ``(n, d)`` or ``(n,)``.
        y: training targets ``(n,)``.
        noise: scalar observation noise.
        rank: variance-cache basis width (see
            :func:`stheno_tpu.iterative.variance_cache`).
        key: PRNG key for the cache's subspace probes (required unless
            ``precond_state`` is given).
        precond_state: optional ``(U, lam)`` from ``eig_precond_state`` —
            shared with the training loop; reused for both the weights
            solve's preconditioner and the variance basis. When its width
            is below ``rank`` and a ``key`` is given, the variance basis
            is widened to ``rank`` (warm-started subspace sweep — see
            :func:`variance_cache`); narrower with no ``key`` warns and
            builds at the state's width.
        cg_tol / max_cg_iters: weights-solve tolerances.
        refine / var_cg_tol / var_max_cg_iters: variance-cache refinement
            controls (see :func:`variance_cache`).
        block: Gram-tile row-block size.
        chunk: test-point chunk width for variance queries.
    """

    def __init__(self, kernel_fn, params, x, y, noise, *, rank=512,
                 key=None, precond_state=None, cg_tol=1e-4,
                 max_cg_iters=200, refine=True, var_cg_tol=1e-3,
                 var_max_cg_iters=50, power_iters=2, block=4096,
                 chunk=1024):
        self.kernel_fn = kernel_fn
        self.params = params
        self.noise = jnp.asarray(noise)
        x = jnp.asarray(x)
        self.x = x[:, None] if x.ndim == 1 else x
        self.block = block
        self.chunk = chunk
        precond_rank = (
            precond_state[0].shape[-1] if precond_state is not None
            else min(64, rank)
        )
        # The weights solve runs EAGERLY (r5): its heavy pieces (the
        # whitened-CG while_loop, the matvec programs) each compile as
        # their own bounded program anyway, the few extra dispatches cost
        # ~0.1 s of tunnel on a ~1 s solve — and eagerness is what lets
        # the small-noise auto policy resolve AND the compensated path
        # run its segmented host-driven CG (a single many-minute device
        # program faults the remote chip; pchol.make_whitened_solver).
        # Large operands still flow as arguments of the internally
        # compiled programs, not closures (axon HTTP 413 — ADVICE r4 #1).
        self.alpha, self.solve_info = posterior_weights(
            kernel_fn, params, self.x, jnp.asarray(y), noise,
            cg_tol=cg_tol, max_cg_iters=max_cg_iters,
            precond_rank=precond_rank, precond_state=precond_state,
            block=block,
        )
        self.cache = jax.jit(
            lambda p, xx, ps: variance_cache(
                kernel_fn, p, xx, noise, rank=rank, key=key,
                precond_state=ps, power_iters=power_iters,
                refine=refine, cg_tol=var_cg_tol,
                max_cg_iters=var_max_cg_iters, block=block,
            )
        )(params, self.x, precond_state)
        self._mean_fn = jax.jit(
            lambda p, xx, a, xn: cached_posterior_mean(
                kernel_fn, p, xx, a, xn, block=block
            )
        )
        self._var_fn = jax.jit(
            lambda p, xx, c, xn: cached_posterior_var(
                kernel_fn, p, xx, c, xn, chunk=chunk
            )
        )
        self._mean_var_fn = jax.jit(
            lambda p, xx, a, c, xn: cached_posterior_mean_var(
                kernel_fn, p, xx, a, c, xn, chunk=chunk
            )
        )

    def _prep(self, x_new, mult):
        xn = jnp.asarray(x_new)
        if xn.ndim == 1:
            xn = xn[:, None]
        return _pad_rows(xn, mult)

    def mean(self, x_new):
        """Posterior mean at ``x_new`` — blocked cross-Gram matvec.

        Queries are bucketed to a multiple of ``min(block, 256)`` rows,
        not the full Gram row-block: quantising a few-point query up to
        ``block`` (4096) made it pay the full ``n x 4096`` cross-Gram —
        up to ~400x the needed GEMM work (ADVICE r4 #3).
        ``cached_posterior_mean`` clamps its internal block to the padded
        size, so compile bucketing is preserved."""
        xn, m = self._prep(x_new, min(self.block, 256))
        return self._mean_fn(self.params, self.x, self.alpha, xn)[:m]

    def var(self, x_new):
        """Posterior variance diagonal at ``x_new`` — cache GEMMs only."""
        xn, m = self._prep(x_new, self.chunk)
        return self._var_fn(self.params, self.x, self.cache, xn)[:m]

    def mean_var(self, x_new):
        """``(mean, var)`` at ``x_new`` — fused query: the per-chunk
        cross-Gram build (the dominant cost) is shared between the mean
        matvec and the variance reduction."""
        xn, m = self._prep(x_new, self.chunk)
        mean, var = self._mean_var_fn(
            self.params, self.x, self.alpha, self.cache, xn
        )
        return mean[:m], var[:m]

    def marginal_credible_bounds(self, x_new):
        """``(mean, lower, upper)`` central 95% credible bounds — the
        reference's ``marginal_credible_bounds`` surface
        (``random.py:229-238``)."""
        mean, var = self.mean_var(x_new)
        sd = jnp.sqrt(var)
        return mean, mean - 1.96 * sd, mean + 1.96 * sd
