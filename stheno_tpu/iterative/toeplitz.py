"""O(N log N) stationary-kernel matvecs on uniform grids via circulant
embedding.

On a uniform 1-D grid the Gram matrix of any stationary kernel is symmetric
Toeplitz; on a full d-dimensional tensor grid it is multilevel (block)
Toeplitz. Either embeds into a circulant operator of twice the size per
axis, whose matvec is three FFTs — ``irfftn(rfftn(pad(v)) * spectrum)`` —
so ``K @ v`` costs O(N log N) instead of the O(N^2) blocked-Gram sweep of
``kernel_matvec``. Plugged into the CG/SLQ machinery of
``iterative/nlml.py`` this gives *exact* GP training on gridded data
(time series, images, regular spatio-temporal lattices) at N far beyond
what even the matrix-free dense sweep can reach.

The reference has no analogue: its only levers on N are pseudo-point
approximations (``/root/reference/stheno/model/observations.py:279-336``).
This module is a TPU-native scaling lever — the FFTs lower to XLA's native
TPU FFT, and the whole path is differentiable (hyperparameter gradients
flow through the O(N) lag-grid kernel evaluation, not through an N x N
object).

Accuracy: the circulant spectrum of a symmetric embedding is real; rounding
leaves an O(eps * sqrt(N)) relative error in the matvec, comfortably below
the CG tolerances (1e-2..1e-6) this path feeds. In float32 at N ~ 1e6 that
is ~1e-4 relative — same order as the MXU tile products of the dense sweep.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..kernels import elwise
from .. import config
from .cg import batched_cg
from .nlml import _nlml
from .pchol import make_whitened_solver

__all__ = [
    "circulant_spectrum",
    "grid_coords",
    "grid_matvec",
    "grid_iterative_nlml",
    "grid_posterior_mean",
    "grid_posterior_var",
]


def _check_stationary(k):
    if not k.stationary:
        raise ValueError(
            f"Circulant embedding requires a stationary kernel; got {k}."
        )


def _as_axes(axes):
    """Normalise ``axes`` to a tuple of 1-D arrays (a single array is a
    1-D grid)."""
    if isinstance(axes, (tuple, list)):
        return tuple(jnp.asarray(a).reshape(-1) for a in axes)
    return (jnp.asarray(axes).reshape(-1),)


def grid_coords(axes):
    """Full tensor-grid coordinates ``(prod N_i, d)`` in row-major
    (``indexing="ij"``) order — the flattening convention every function in
    this module uses for vectors living on the grid."""
    axes = _as_axes(axes)
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([g.reshape(-1) for g in mesh], axis=-1)


def _lag_axis(axis):
    """Wrap-around lag coordinates of the 2N-point circulant embedding of a
    uniform N-point axis: ``[0, d, ..., Nd, -(N-1)d, ..., -d]``. Index
    ``m > N`` maps to the negative lag ``(m - 2N) d``; by stationarity
    (``k(-l) = k(l)`` for the isotropic kernels this module accepts) the
    resulting first column is even, so the circulant spectrum is real."""
    n = axis.shape[0]
    delta = axis[1] - axis[0] if n > 1 else jnp.ones((), axis.dtype)
    m = jnp.arange(2 * n)
    return delta * jnp.where(m <= n, m, m - 2 * n)


@config.pin_matmul_precision
def circulant_spectrum(k, axes):
    """Real spectrum of the circulant embedding of ``k``'s Gram on the
    uniform grid ``axes``: shape ``(2 N_1, ..., 2 N_{d-1}, N_d + 1)``
    (the rFFT layout). Differentiable w.r.t. the kernel's hyperparameters
    through the O(N) lag-grid evaluation."""
    _check_stationary(k)
    axes = _as_axes(axes)
    lag_pts = grid_coords(tuple(_lag_axis(a) for a in axes))
    c = elwise(k, lag_pts, jnp.zeros_like(lag_pts))[..., 0]
    c = c.reshape(tuple(2 * a.shape[0] for a in axes))
    return jnp.real(jnp.fft.rfftn(c))


@config.pin_matmul_precision
def grid_matvec(k, axes, v, *, noise=None, spectrum=None):
    """Compute ``(K [+ noise I]) @ v`` for the Gram of stationary ``k`` on
    the uniform grid ``axes`` in O(N log N).

    Args:
        k: stationary kernel expression.
        axes: 1-D array (single-axis grid) or tuple of 1-D uniform arrays.
        v: ``(n,)`` or ``(n, p)`` with ``n = prod(len(axis))``, flattened in
            ``grid_coords`` (row-major) order.
        noise: optional scalar or ``(n,)`` diagonal noise.
        spectrum: optional precomputed ``circulant_spectrum(k, axes)`` —
            pass it when applying many matvecs with fixed hyperparameters.

    Returns:
        ``(n,)`` or ``(n, p)`` matching ``v``.
    """
    axes = _as_axes(axes)
    shape = tuple(a.shape[0] for a in axes)
    n = math.prod(shape)
    if spectrum is None:
        spectrum = circulant_spectrum(k, axes)
    v_in = jnp.asarray(v)
    v2 = v_in[:, None] if v_in.ndim == 1 else v_in
    if v2.shape[0] != n:
        raise ValueError(f"v has {v2.shape[0]} rows; the grid has {n} points.")

    big = tuple(2 * s for s in shape)
    inner = tuple(slice(0, s) for s in shape)

    def apply_col(col):
        g = jnp.zeros(big, col.dtype).at[inner].set(col.reshape(shape))
        out = jnp.fft.irfftn(jnp.fft.rfftn(g) * spectrum, s=big)
        return out[inner].reshape(-1).astype(col.dtype)

    out = jax.vmap(apply_col, in_axes=1, out_axes=1)(v2)
    if noise is not None:
        noise = jnp.asarray(noise)
        out = out + (noise[:, None] if noise.ndim == 1 else noise) * v2
    return out[:, 0] if v_in.ndim == 1 else out


def _axes_from_coords(x, shape):
    """Recover the per-axis 1-D arrays from row-major ``grid_coords`` output
    given the static ``shape`` — lets jit-traced code round-trip the grid
    through a single coordinate array (gradients w.r.t. ``x`` flow through
    the recovered origins/spacings)."""
    d = len(shape)
    axes = []
    stride = 1
    for i in reversed(range(d)):
        n_i = shape[i]
        start = x[0, i]
        delta = (
            x[stride, i] - start if n_i > 1 else jnp.ones((), x.dtype)
        )
        axes.append(start + delta * jnp.arange(n_i, dtype=x.dtype))
        stride *= n_i
    return tuple(reversed(axes))


@config.pin_matmul_precision
def grid_iterative_nlml(
    kernel_fn,
    params,
    axes,
    y,
    noise,
    key,
    *,
    num_probes=8,
    cg_tol=1e-4,
    max_cg_iters=500,
    slq_steps=20,
    precond_rank=64,
    precond_method="eig",
    precond_power_iters=1,
):
    """Stochastic exact-GP NLML on a uniform grid with circulant matvecs:
    the ``iterative_nlml`` estimator (CG + preconditioned SLQ forward,
    Hutchinson-surrogate backward — ``iterative/nlml.py``) with every
    O(N^2) Gram sweep replaced by the O(N log N) FFT matvec.

    Args:
        kernel_fn: ``params -> Kernel`` (must build a stationary kernel).
        params: parameter pytree.
        axes: 1-D array or tuple of uniform 1-D arrays (the grid).
        y: observations ``(n,)`` in ``grid_coords`` order.
        noise: scalar observation-noise variance.
        key: PRNG key for probe vectors.

    Differentiable w.r.t. ``params``, ``noise``, and ``y``.
    """
    axes = _as_axes(axes)
    shape = tuple(int(a.shape[0]) for a in axes)
    _check_stationary(kernel_fn(params))
    x = grid_coords(axes)
    y = jnp.asarray(y)
    n = x.shape[0]
    k1, k2 = jax.random.split(jax.lax.stop_gradient(key))
    u = jax.random.normal(k1, (n, num_probes), dtype=y.dtype)
    om = None
    if precond_method == "eig" and precond_rank and precond_rank > 0:
        om = jax.random.normal(k2, (n, min(precond_rank, n)), dtype=y.dtype)

    def matvec_fn(k, xx, v, nz):
        return grid_matvec(k, _axes_from_coords(xx, shape), v, noise=nz)

    val, _ = _nlml(
        params, y, jnp.asarray(noise), x, u, om, None, kernel_fn, matvec_fn,
        None, cg_tol, max_cg_iters, slq_steps, precond_rank,
        precond_method, precond_power_iters,
    )
    return val


@config.pin_matmul_precision
def grid_posterior_mean(
    kernel_fn,
    params,
    axes,
    y,
    noise,
    x_new,
    *,
    cg_tol=1e-6,
    max_cg_iters=1000,
    precond_rank=64,
    block=4096,
):
    """Posterior mean at arbitrary ``x_new`` from gridded observations:
    ``K alpha = y`` solved with O(N log N) circulant matvecs inside
    preconditioned CG, then one blocked cross-Gram matvec."""
    from .matvec import kernel_matvec

    axes = _as_axes(axes)
    k = kernel_fn(params)
    _check_stationary(k)
    x = grid_coords(axes)
    spectrum = circulant_spectrum(k, axes)
    y = jnp.asarray(y)
    if precond_rank and precond_rank > 0 and jnp.ndim(noise) == 0:
        mv_raw = lambda v: grid_matvec(k, axes, v, spectrum=spectrum)
        solver = make_whitened_solver(
            mv_raw, x.shape[0], noise, precond_rank, dtype=y.dtype
        )
        alpha, info = solver(y, tol=cg_tol, max_iters=max_cg_iters)
    else:
        mv = lambda v: grid_matvec(k, axes, v, noise=noise, spectrum=spectrum)
        alpha, info = batched_cg(
            mv, y, tol=cg_tol, max_iters=max_cg_iters
        )
    xn = jnp.asarray(x_new)
    if xn.ndim == 1:
        xn = xn[:, None]
    mean = kernel_matvec(k, xn, alpha, x_cols=x, block=block)
    return mean, info


@config.pin_matmul_precision
def grid_posterior_var(
    kernel_fn,
    params,
    axes,
    y,
    noise,
    x_new,
    *,
    cg_tol=1e-6,
    max_cg_iters=1000,
    precond_rank=64,
    block=4096,
    chunk=512,
):
    """Posterior variance diagonal at arbitrary ``x_new`` from gridded
    observations: the chunked batched-CG reduction of
    ``iterative_posterior_var`` with every solve's matvec replaced by the
    O(N log N) circulant embedding."""
    from .matvec import kernel_matvec
    from ..kernels import pairwise as k_pairwise
    from ..matrix import dense as mat_dense

    axes = _as_axes(axes)
    k = kernel_fn(params)
    _check_stationary(k)
    x = grid_coords(axes)
    spectrum = circulant_spectrum(k, axes)
    if precond_rank and precond_rank > 0 and jnp.ndim(noise) == 0:
        mv_raw = lambda v: grid_matvec(k, axes, v, spectrum=spectrum)
        solver = make_whitened_solver(
            mv_raw, x.shape[0], noise, precond_rank,
            dtype=jnp.asarray(y).dtype,
        )
    else:
        mv = lambda v: grid_matvec(k, axes, v, noise=noise, spectrum=spectrum)
        solver = lambda rhs, tol, max_iters: batched_cg(
            mv, rhs, tol=tol, max_iters=max_iters
        )

    xn = jnp.asarray(x_new)
    if xn.ndim == 1:
        xn = xn[:, None]
    m = xn.shape[0]
    chunk = min(chunk, m)
    nchunks = -(-m // chunk)
    m_pad = nchunks * chunk
    xn_pad = jnp.zeros((m_pad, xn.shape[1]), xn.dtype).at[:m].set(xn)

    def one_chunk(xc):
        K_xc = jnp.asarray(mat_dense(k_pairwise(k, x, xc)))  # (N, chunk)
        sol, _ = solver(K_xc, tol=cg_tol, max_iters=max_cg_iters)
        return jnp.sum(K_xc * sol, axis=0)

    reductions = jax.lax.map(
        one_chunk, xn_pad.reshape(nchunks, chunk, xn.shape[1])
    ).reshape(m_pad)[:m]
    prior = jnp.asarray(mat_dense(elwise(k, xn)))[:, 0]
    return jnp.maximum(prior - reductions, 0.0)
