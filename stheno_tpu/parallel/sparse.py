"""Distributed pseudo-point (inducing-point) inference: VFE / FITC / DTC
ELBO and predictive posterior with the *data* axis sharded over the mesh.

This is the scale-out form of the reference's sparse path
(``/root/reference/stheno/model/observations.py:279-336``): N observations
are row-sharded across chips while the M inducing points stay replicated
(M is small by construction). Every O(N) quantity — the M x N cross-Gram,
the diagonal corrections, the moment accumulations ``B K_n^{-1} B^T`` and
``B K_n^{-1} y`` — partitions cleanly along N, and the only cross-chip
traffic is the M x M / M-vector reductions, which XLA lowers to a single
``psum`` ride over ICI. All O(M^3) work (Cholesky of ``K_z`` and of the
subspace matrix ``A``) is replicated: at M <= a few thousand it is cheaper
than communicating it.

The math is identical to the single-device path, so no custom VJP is
needed: ``jax.grad`` of :func:`dist_elbo` differentiates M-sized Choleskys
only, and the N-sized pieces are elementwise/GEMM.

Sharding is expressed with GSPMD constraints (``with_sharding_constraint``)
rather than ``shard_map``: the per-N work is embarrassingly parallel, so the
partitioner's choices are exactly the hand-written ones.
"""

import math

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config
from ..kernels import elwise, pairwise
from ..matrix import dense

__all__ = ["dist_elbo", "dist_sparse_posterior"]

_LOG_2_PI = math.log(2 * math.pi)


def _shard(a, mesh, axis, spec):
    return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))


def _chol(K):
    """Cholesky with escalating jitter (always adaptive on this path: in
    float32 on the MXU, rounding alone makes a rank-deficient inducing Gram
    indefinite by ~||K|| * eps_f32 * sqrt(n) — measured lambda_min ~ -1.5e-4
    for a 512-point EQ Gram with lambda_max ~ 123 — so no fixed absolute
    jitter works across problem scales)."""
    from ..matrix import adaptive_jitter_eps

    n = K.shape[-1]
    eps = adaptive_jitter_eps(K, config.jitter(K.dtype))
    return jnp.linalg.cholesky(K + eps * jnp.eye(n, dtype=K.dtype))


def _solve_tri(L, b, lower=True):
    return jax.scipy.linalg.solve_triangular(L, b, lower=lower)


def _sparse_core(kernel, z, x, y, noise, mesh, axis, method, noise_z):
    """Shared pipeline. Returns ``(elbo, L_z, L_A, c)`` where the optimal
    ``q(u)`` is ``N(L_z L_A^{-T} L_A^{-1} c, L_z A^{-1} L_z^T)`` (zero prior
    mean convention; see reference ``observations.py:322-330``)."""
    if method not in ("vfe", "fitc", "dtc"):
        raise ValueError(f'Invalid approximation method "{method}".')
    x = jnp.asarray(x)
    y = jnp.asarray(y).reshape(-1)
    n = y.shape[0]
    dtype = y.dtype
    noise = jnp.broadcast_to(jnp.asarray(noise, dtype), (n,))

    # Pad N up to a multiple of the mesh axis; padded rows carry zero mask
    # weight, so every O(N) term below is exactly unchanged.
    d = mesh.shape[axis]
    pad = (-n) % d
    mask = jnp.concatenate([jnp.ones(n, dtype), jnp.zeros(pad, dtype)])
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
        y = jnp.concatenate([y, jnp.zeros(pad, dtype)])
        noise = jnp.concatenate([noise, jnp.ones(pad, dtype)])

    # Row-shard the data; replicate the inducing points.
    xspec = P(axis) if x.ndim == 1 else P(axis, None)
    x = _shard(x, mesh, axis, xspec)
    y = _shard(y, mesh, axis, P(axis))
    noise = _shard(noise, mesh, axis, P(axis))
    mask = _shard(mask, mesh, axis, P(axis))

    # M x M inducing Gram (replicated) and M x N cross-Gram (column-sharded).
    K_z = jnp.asarray(dense(pairwise(kernel, z)))
    if noise_z is not None:
        K_z = K_z + noise_z * jnp.eye(K_z.shape[-1], dtype=dtype)
    K_zx = jnp.asarray(dense(pairwise(kernel, z, x)))
    K_zx = _shard(K_zx, mesh, axis, P(None, axis))

    L_z = _chol(K_z)
    Bm = _solve_tri(L_z, K_zx)  # L_z^{-1} K_zx, M x N column-sharded.

    if method in ("vfe", "fitc"):
        K_x_diag = jnp.asarray(dense(elwise(kernel, x)))[..., 0]
        q_diag = jnp.sum(Bm * Bm, axis=0)
        correction = jnp.maximum(K_x_diag - q_diag, 0.0)

    if method == "vfe":
        trace_part = jnp.sum(mask * correction / noise)
    elif method == "fitc":
        noise = noise + correction
        trace_part = 0.0
    else:  # dtc
        trace_part = 0.0

    # A = I + B K_n^{-1} B^T: per-shard GEMM, psum-reduced by the partitioner.
    Bw = Bm * (mask / noise)  # M x N
    A = jnp.eye(K_z.shape[-1], dtype=dtype) + jnp.matmul(
        Bw, Bm.T, preferred_element_type=dtype
    )
    c = jnp.matmul(Bw, y, preferred_element_type=dtype)  # B K_n^{-1} y, (M,)
    L_A = _chol(A)
    w = _solve_tri(L_A, c)  # L_A^{-1} c

    det_part = jnp.sum(mask * jnp.log(noise)) + n * _LOG_2_PI + 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L_A))
    )
    iqf_part = jnp.sum(mask * y * y / noise) - jnp.sum(w * w)
    elbo = -0.5 * (det_part + iqf_part + trace_part)
    return elbo, L_z, L_A, c


@config.pin_matmul_precision
def dist_elbo(kernel, z, x, y, noise, mesh, axis="data", method="vfe", noise_z=None):
    """Collapsed evidence lower bound for a zero-mean sparse GP with the N
    observations row-sharded over mesh ``axis``.

    Matches ``PseudoObs(u(z), (f(x, noise), y)).elbo(measure)`` (and the
    FITC/DTC variants) for ``f = GP(kernel)``; reference semantics at
    ``/root/reference/stheno/model/observations.py:332-336``. ``noise`` is a
    scalar or an (N,)-vector (diagonal noise, as the reference requires).
    Differentiable in ``kernel`` hyperparameters, ``z``, ``y``, ``noise``.
    """
    elbo, _, _, _ = _sparse_core(kernel, z, x, y, noise, mesh, axis, method, noise_z)
    return elbo


@config.pin_matmul_precision
def dist_sparse_posterior(
    kernel, z, x, y, noise, x_new, mesh, axis="data", method="vfe", noise_z=None
):
    """Predictive mean and variance-diagonal at ``x_new`` of the optimal
    sparse approximation: ``mean = k_*z K_z^{-1} m_u`` and ``var = k_** -
    ||L_z^{-1} k_z*||^2 + ||L_A^{-1} L_z^{-1} k_z*||^2`` with
    ``q(u) = N(m_u, L_z A^{-1} L_z^T)`` (reference
    ``observations.py:255-277`` via PosteriorKernel + SubspaceKernel)."""
    _, L_z, L_A, c = _sparse_core(kernel, z, x, y, noise, mesh, axis, method, noise_z)
    K_zs = jnp.asarray(dense(pairwise(kernel, z, x_new)))  # M x S
    v = _solve_tri(L_z, K_zs)  # L_z^{-1} k_z*
    w = _solve_tri(L_A, v)  # L_A^{-1} v
    # mean = k_*z K_z^{-1} L_z A^{-1} c = v^T A^{-1} c = (L_A^{-1} v)^T (L_A^{-1} c).
    mean = jnp.matmul(w.T, _solve_tri(L_A, c))
    prior_diag = jnp.asarray(dense(elwise(kernel, x_new)))[..., 0]
    var = prior_diag - jnp.sum(v * v, axis=0) + jnp.sum(w * w, axis=0)
    return mean, jnp.maximum(var, 0.0)
