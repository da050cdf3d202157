"""Pathwise posterior sampling (Matheron's rule + random features).

Draws posterior *functions* — callables evaluable at arbitrary test points —
instead of pointwise multivariate-normal samples (the only sampling the
reference supports, ``/root/reference/stheno/random.py:331-363``). The
decoupled construction of Wilson et al., "Efficiently sampling functions
from Gaussian process posteriors" (ICML 2020):

    f_s(.) = phi(.)^T w_s  +  k(., X) K_n^{-1} (y - Phi w_s - eps_s)

with ``w_s ~ N(0, I)`` a random-feature prior draw (`kernels/features.py`)
and ``eps_s ~ N(0, noise I)``. One linear solve against the observations is
shared by all samples; evaluating a sample at ``n_new`` points then costs
O(n_new (N + F)) — no n_new x n_new covariance, no per-point Cholesky —
which is what makes posterior function draws servable at production scale.

TPU notes: the evaluation path is two matmuls (MXU); the cross-Gram term
streams through the blocked ``kernel_matvec`` so arbitrarily large test
batches stay O(block * N) in memory; the solve can run dense (Cholesky) or
matrix-free (preconditioned CG) for large N.
"""

import jax
import jax.numpy as jnp

from ..iterative.cg import batched_cg
from ..iterative.matvec import kernel_matvec
from ..iterative.pchol import make_whitened_solver
from ..kernels import pairwise
from ..kernels.features import feature_map
from ..matrix import add, as_matrix, dense, fill_diag, solve
from .. import config

__all__ = ["pathwise_sampler"]


@config.pin_matmul_precision
def pathwise_sampler(
    kernel,
    x,
    y,
    noise,
    key,
    *,
    num_samples=1,
    num_features=2048,
    solver="chol",
    block=4096,
    cg_tol=1e-6,
    max_cg_iters=1000,
    precond_rank=64,
    mesh=None,
    axis="data",
    return_info=False,
    compensated="auto",
):
    """Build posterior function draws for an exact GP.

    Args:
        kernel: kernel expression (must admit a random-feature expansion —
            see :func:`stheno_tpu.kernels.features.feature_map`).
        x: observation inputs ``(n,)`` or ``(n, d)``.
        y: observations ``(n,)``.
        noise: scalar observation-noise variance.
        key: PRNG key.
        num_samples: number of function draws sharing the solve.
        num_features: random-feature budget for the prior draws.
        solver: ``"chol"`` (dense, O(n^3) once) or ``"cg"`` (matrix-free,
            O(n) memory — for n beyond HBM's dense range).
        block: row-block size for the streamed cross-Gram evaluation.
        mesh: optional ``jax.sharding.Mesh`` — distributes the CG matvecs
            and every sample evaluation row-wise over ``axis``.
        compensated: two-float matvec policy for the single-chip whitened
            CG solve (``"auto"`` default: switches on below half the
            plain-f32 noise wall ``||K||*eps*sqrt(n)``; see
            ``iterative/compensated.py``). The r5 fix turning the r4
            small-noise stall WARNING into a working path — at
            N=262,144 with noise=0.01 the plain update solve stalls and
            the draws come out O(1000)x wrong; compensated converges.
            Not available on the mesh path (pass a larger noise there,
            or solve single-chip).

    Returns:
        ``(sample_fn, key)`` — ``sample_fn(x_new)`` evaluates all draws at
        ``x_new``, returning ``(n_new, num_samples)``. The draws are fixed:
        calling ``sample_fn`` twice evaluates the *same* functions. With
        ``return_info=True``, ``(sample_fn, key, cg_info)`` where
        ``cg_info`` is the update solve's health dict (``iters``,
        ``rel_residual``; ``None`` for the dense solver) — check it when
        building under an outer ``jit``, where the eager stall warning
        cannot fire.
    """
    x = jnp.asarray(x)
    x2 = x[:, None] if x.ndim == 1 else x
    y = jnp.asarray(y)
    n, d = x2.shape
    noise = jnp.asarray(noise, y.dtype)

    key, k_feat, k_w, k_eps = jax.random.split(key, 4)
    phi, n_feat = feature_map(kernel, k_feat, num_features, d, dtype=y.dtype)

    w = jax.random.normal(k_w, (n_feat, num_samples), y.dtype)
    prior_obs = phi(x2) @ w  # (n, s)
    eps = jnp.sqrt(noise) * jax.random.normal(k_eps, (n, num_samples), y.dtype)
    resid = y[:, None] - prior_obs - eps

    cg_info = None
    if solver == "chol":
        K = add(
            as_matrix(pairwise(kernel, x2)), fill_diag(noise, n)
        )
        v = solve(K, resid)  # Structure-aware; Cholesky under the hood.
        v = jnp.asarray(dense(v)) if not isinstance(v, jnp.ndarray) else v
    elif solver == "cg":
        if mesh is not None:
            from ..parallel.iterative import sharded_kernel_matvec

            mv = lambda u: sharded_kernel_matvec(
                kernel, x2, u, mesh, axis=axis, noise=noise, block=block
            )
        else:
            mv = lambda u: kernel_matvec(
                kernel, x2, u, noise=noise, block=block
            )
        if precond_rank and precond_rank > 0 and jnp.ndim(noise) == 0:
            # Whitened eig-preconditioned solve — the f32-at-scale path
            # (un-whitened PCG stalls at large N; see
            # iterative/pchol.py:eig_preconditioner_factors).
            if mesh is not None:
                from ..parallel.iterative import sharded_kernel_matvec as _skm

                mv_raw = lambda u: _skm(
                    kernel, x2, u, mesh, axis=axis, block=block
                )
                mv_comp = None  # No compensated sharded matvec (yet).
            else:
                mv_raw = lambda u: kernel_matvec(kernel, x2, u, block=block)
                mv_comp = lambda u: kernel_matvec(
                    kernel, x2, u, block=block, compensated=True
                )
            solver = make_whitened_solver(
                mv_raw, x2.shape[0], noise, precond_rank,
                dtype=resid.dtype, mv_raw_comp=mv_comp,
                compensated=compensated if mv_comp is not None else False,
            )
            v, cg_info = solver(resid, tol=cg_tol, max_iters=max_cg_iters)
        else:
            v, cg_info = batched_cg(
                mv, resid, tol=cg_tol, max_iters=max_cg_iters
            )
        # Loud on a stall (round-1 lesson, extended here in r4: a stalled
        # solve fed every draw junk update weights with no signal — the
        # f32 validity region at extreme N requires noise >~ ||K|| eps
        # sqrt(N), see docs/scaling.md "Training loops"). The build runs
        # eagerly in the usual case, so a host-side warning works; under
        # an outer trace the caller should check the returned info
        # (``return_info=True``) instead.
        rel = cg_info["rel_residual"]
        # `not (rel <= tol)` rather than `rel > tol`: a NaN residual (fully
        # diverged solve) must trip the warning too, and NaN compares
        # False both ways.
        if not isinstance(rel, jax.core.Tracer) and not (float(rel) <= cg_tol):
            import warnings

            warnings.warn(
                f"pathwise_sampler: CG STALLED — rel residual "
                f"{float(rel):.3e} > tol {cg_tol:.1e} after "
                f"{int(cg_info['iters'])} iterations; the draws' update "
                f"weights are unreliable. Pass compensated=True (two-float "
                f"matvec — the plain-f32 path needs noise >~ "
                f"||K||*eps*sqrt(N)), raise the preconditioner rank, or "
                f"max_cg_iters.",
                stacklevel=2,
            )
    else:
        raise ValueError(f"Unknown solver {solver!r} (use 'chol' or 'cg').")

    def sample_fn(x_new):
        x_new = jnp.asarray(x_new)
        xn = x_new[:, None] if x_new.ndim == 1 else x_new
        prior_part = phi(xn) @ w  # (n_new, s)
        if mesh is not None:
            from ..parallel.iterative import _cross_matvec_sharded

            update = _cross_matvec_sharded(
                kernel, xn, x2, v, mesh, axis=axis, block=block
            )
        else:
            update = kernel_matvec(kernel, xn, v, block=block, x_cols=x2)
        return prior_part + update

    # Pin the closure: its GEMMs trace at call time, outside this function's
    # own pinned context.
    pinned = config.pin_matmul_precision(sample_fn)
    if return_info:
        # Solver-health dict of the shared update solve (None for the
        # dense path): jit-composable callers check ``rel_residual``
        # themselves — the host-side stall warning above cannot fire
        # under a trace.
        return pinned, key, cg_info
    return pinned, key
