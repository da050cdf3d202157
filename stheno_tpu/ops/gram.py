"""Fused pairwise-distance + Gram-matrix Pallas kernels.

The Gram build is the second-hottest op of the engine after the Cholesky
(SURVEY.md §2.11 item 1). The naive XLA lowering materialises the N x M
squared-distance matrix in HBM and re-reads it for the elementwise kernel
function; this Pallas kernel keeps each (TM, TN) tile in VMEM: one MXU
``x @ y^T`` contraction plus VPU epilogue (norms, clamp, exp/...) per tile,
one HBM write of the result.

Supported kernel functions: ``eq``, ``matern12``, ``matern32``, ``matern52``,
``rq`` (alpha via scalar operand), ``linear``. Inputs are ``(n, d)``/
``(m, d)`` float32/bfloat16; arbitrary ``d`` (zero-padded to the lane width —
zero padding does not change inner products or distances).

Autodiff: a custom VJP with an XLA backward (two matmuls via the W-trick:
``xbar = 2 (rowsum(W) * x - W @ y)`` with ``W = gbar * g'(d2)``). Gradients
of GP hyperparameters flow through the stretch/scale ops outside the kernel.

Falls back to pure-jnp off-TPU; ``interpret=True`` under tests exercises the
same kernel logic on CPU.
"""

import functools
import math

import jax
import jax.numpy as jnp
from .. import config

try:  # Pallas is TPU-only at runtime but importable everywhere.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["gram", "gram_available", "set_gram_mode"]

_TILE_M = 256
_TILE_N = 256

#: "auto" | "pallas" | "xla" — test hook.
_MODE = "auto"


def set_gram_mode(mode):
    global _MODE
    assert mode in ("auto", "pallas", "xla", "interpret")
    _MODE = mode


def gram_available(x):
    if not _HAS_PALLAS or _MODE == "xla":
        return False
    if _MODE in ("pallas", "interpret"):
        return True
    # Measured on TPU v5e (2026-08): Pallas VMEM->HBM stores cap at
    # ~255 GB/s on this toolchain while XLA's fused matmul+epilogue writes at
    # ~820 GB/s, so for the *output-bound* full-Gram build the XLA lowering
    # wins (0.46 ms vs 1.02 ms at N=8192). "auto" therefore uses XLA; the
    # Pallas kernel remains for explicit use and for fused gram-matvec
    # contractions where the N x N output is never materialised.
    return False


def _round_up(v, m):
    return (v + m - 1) // m * m


def _apply_kind(kind, d2, inner, alpha):
    """Elementwise kernel function of the squared distance (VPU epilogue)."""
    if kind == "linear":
        return inner
    d2 = jnp.maximum(d2, 0.0)
    if kind == "eq":
        return jnp.exp(-0.5 * d2)
    if kind == "rq":
        return (1.0 + d2 / (2.0 * alpha)) ** (-alpha)
    d = jnp.sqrt(d2 + 1e-36)
    if kind == "matern12":
        return jnp.exp(-d)
    if kind == "matern32":
        r = math.sqrt(3.0) * d
        return (1.0 + r) * jnp.exp(-r)
    if kind == "matern52":
        r = math.sqrt(5.0) * d
        return (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    raise ValueError(f"Unknown gram kind {kind!r}.")


def _gram_kernel(alpha_ref, xt_ref, yt_ref, o_ref, *, kind):
    # Inputs come in transposed (d_pad, TILE) layout: the tiny feature
    # dimension sits on sublanes, so per-tile input traffic is d_pad*TILE
    # words instead of the 128-lane-padded TILE*128 a row-major layout would
    # force. The kernel is one MXU contraction + VPU epilogue per tile.
    xt = xt_ref[:]  # (d_pad, TILE_M)
    yt = yt_ref[:]  # (d_pad, TILE_N)
    # Explicit HIGHEST: Mosaic rejects the ambient Precision.HIGH the library
    # pins outside Pallas, and the default single bf16 pass would round the
    # inputs (see config.matmul_precision). The contraction is tiny (d_pad
    # inner dim), so the extra passes are free.
    inner = jax.lax.dot_general(
        xt,
        yt,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_M, TILE_N)
    if kind == "linear":
        o_ref[:] = inner.astype(o_ref.dtype)
        return
    xf = xt.astype(jnp.float32)
    yf = yt.astype(jnp.float32)
    xn = jnp.sum(xf * xf, axis=0)[:, None]
    yn = jnp.sum(yf * yf, axis=0)[None, :]
    d2 = xn + yn - 2.0 * inner
    alpha = alpha_ref[0, 0]
    o_ref[:] = _apply_kind(kind, d2, inner, alpha).astype(o_ref.dtype)


def _pallas_gram(kind, x, y, alpha, interpret):
    n, d = x.shape
    m = y.shape[0]
    dtype = x.dtype
    n_pad = _round_up(max(n, 8), _TILE_M)
    m_pad = _round_up(max(m, 8), _TILE_N)
    d_pad = _round_up(d, 8)
    # Zero padding preserves inner products; padded rows produce garbage
    # rows/cols that are sliced away.
    xt = jnp.zeros((d_pad, n_pad), dtype).at[:d, :n].set(x.T)
    yt = jnp.zeros((d_pad, m_pad), dtype).at[:d, :m].set(y.T)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    grid = (n_pad // _TILE_M, m_pad // _TILE_N)
    out = pl.pallas_call(
        functools.partial(_gram_kernel, kind=kind),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d_pad, _TILE_M), lambda i, j: (0, i)),
            pl.BlockSpec((d_pad, _TILE_N), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((_TILE_M, _TILE_N), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d_pad + 8 * n_pad * m_pad,
            bytes_accessed=(n_pad * d_pad + m_pad * d_pad + n_pad * m_pad)
            * xt.dtype.itemsize,
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(alpha_arr, xt, yt)
    return out[:n, :m]


def _xla_gram(kind, x, y, alpha):
    inner = jnp.matmul(x, y.T)
    if kind == "linear":
        return inner
    xn = jnp.sum(x * x, axis=-1, keepdims=True)
    yn = jnp.sum(y * y, axis=-1, keepdims=True)
    d2 = xn + yn.T - 2 * inner
    return _apply_kind(kind, d2, inner, alpha)


def _g_prime(kind, d2, K, alpha):
    """dK/d(d2) as a function of d2 (and the saved forward K)."""
    if kind == "eq":
        return -0.5 * K
    if kind == "rq":
        base = 1.0 + d2 / (2.0 * alpha)
        return -0.5 * base ** (-alpha - 1.0)
    d = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-36)
    if kind == "matern12":
        return -0.5 * K / d
    if kind == "matern32":
        r3 = math.sqrt(3.0)
        return -0.5 * 3.0 * jnp.exp(-r3 * d)
    if kind == "matern52":
        r5 = math.sqrt(5.0)
        return -(5.0 / 6.0) * (1.0 + r5 * d) * jnp.exp(-r5 * d)
    raise ValueError(kind)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4))
def _gram(kind, x, y, alpha, interpret):
    return _pallas_gram(kind, x, y, alpha, interpret)


@config.pin_matmul_precision
def _gram_fwd(kind, x, y, alpha, interpret):
    K = _pallas_gram(kind, x, y, alpha, interpret)
    return K, (x, y, alpha, K)


@config.pin_matmul_precision
def _gram_bwd(kind, interpret, res, gbar):
    x, y, alpha, K = res
    if kind == "linear":
        return gbar @ y, gbar.T @ x, jnp.zeros_like(alpha)
    if kind == "eq":
        # g' = -0.5 K needs no d2: skip the x @ y.T GEMM + norms entirely
        # (~1/3 of the backward's flops for the most common kernel).
        W = gbar * (-0.5 * K)
    else:
        xn = jnp.sum(x * x, axis=-1, keepdims=True)
        yn = jnp.sum(y * y, axis=-1, keepdims=True)
        d2 = xn + yn.T - 2.0 * jnp.matmul(x, y.T)
        W = gbar * _g_prime(kind, d2, K, alpha)
    row = jnp.sum(W, axis=1, keepdims=True)
    col = jnp.sum(W, axis=0, keepdims=True).T
    xbar = 2.0 * (row * x - W @ y)
    ybar = 2.0 * (col * y - W.T @ x)
    if kind == "rq":
        base = 1.0 + d2 / (2.0 * alpha)
        dalpha = jnp.sum(
            gbar
            * K
            * (-jnp.log(base) + d2 / (2.0 * alpha * base))
        )
        return xbar, ybar, dalpha
    return xbar, ybar, jnp.zeros_like(alpha)


_gram.defvjp(_gram_fwd, _gram_bwd)


@config.pin_matmul_precision
def gram(kind, x, y, alpha=1.0):
    """Gram matrix ``g(||x_i - y_j||^2)`` (or ``x_i . y_j`` for linear),
    via the fused Pallas kernel on TPU and XLA elsewhere."""
    if gram_available(x):
        interpret = _MODE == "interpret"
        alpha_in = jnp.asarray(alpha, jnp.float32)
        return _gram(kind, x, y, alpha_in, interpret)
    return _xla_gram(kind, x, y, alpha)
