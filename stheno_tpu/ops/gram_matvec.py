"""Fused Gram x vector Pallas kernel: ``out = g(d2(x, y)) @ v`` without ever
materialising the Gram.

The matrix-free matvec (``iterative/matvec.py``) is the hot loop of the
large-N exact-GP path (SURVEY.md §2.11 item 1 applied to the N=262,144
north star): each CG iteration sweeps every Gram tile. XLA's lowering of
the blocked ``lax.scan`` already fuses the distance epilogue into the tile
GEMM (verified: its HBM bytes-accessed is O(N p), and a full tile
round-trip would need ~2x the measured HBM bandwidth — see
docs/scaling.md). This kernel is the head-to-head Pallas candidate for the
same contraction: one (TM, TN) tile in VMEM per grid step — MXU distance
contraction, VPU kernel-function epilogue, MXU tile-product — accumulated
into an O(N p) output, so the Pallas VMEM->HBM store bottleneck that
retires the full-Gram kernel (~255 GB/s vs XLA's ~820 GB/s) does not
apply.

Measured head-to-head (TPU v5e, 2026-08, d=1, p=9, f32): 97.2 ms vs
37.2 ms for the XLA scan sweep at n=65536, and 1184 ms vs 239 ms at
N=262,144 — the XLA path wins and stays the default. Two causes, both
structural on this toolchain: Mosaic rejects three-pass
``Precision.HIGH``, forcing six-pass HIGHEST on the in-kernel tile
products, and XLA's fusion already eliminates all O(N^2) HBM traffic
(the compiled scan's cost analysis reports 42.8 MB accessed for the
n=65536 matvec where a tile round-trip would be ~17 GB), so there is
nothing left to fuse. Kept for explicit use and as the measured
retirement evidence (docs/scaling.md "Pallas kernels").

Forward-only by design: the iterative NLML differentiates a *surrogate*
sweep (``nlml.py:make_surrogate_grad``), never the CG matvec itself.
"""

import functools

import jax
import jax.numpy as jnp

from .gram import _HAS_PALLAS, _apply_kind, _round_up

if _HAS_PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["gram_matvec", "gram_matvec_available"]

_TILE_M = 512
_TILE_N = 512


def gram_matvec_available():
    return _HAS_PALLAS


def _gmv_kernel(alpha_ref, xt_ref, yt_ref, v_ref, o_ref, *, kind):
    # Transposed (d_pad, TILE) input layout as in gram.py: the tiny feature
    # dimension rides the sublanes. One grid step = one (TM, TN) Gram tile
    # built in VMEM, applied to the v block, accumulated into the (TM, P)
    # output block (grid iterates j innermost; the output block index only
    # depends on i, so it stays resident across the j sweep).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    xt = xt_ref[:]  # (d_pad, TILE_M)
    yt = yt_ref[:]  # (d_pad, TILE_N)
    inner = jax.lax.dot_general(
        xt,
        yt,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Mosaic rejects HIGH; HIGHEST avoids the bf16 input rounding that
        # corrupts GP linalg (config.matmul_precision). Contraction dim is
        # d_pad, so the extra passes are cheap here...
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_M, TILE_N)
    if kind == "linear":
        g = inner
    else:
        xn = jnp.sum(xt * xt, axis=0)[:, None]
        yn = jnp.sum(yt * yt, axis=0)[None, :]
        alpha = alpha_ref[0, 0]
        g = _apply_kind(kind, xn + yn - 2.0 * inner, inner, alpha)
    # ... but HIGHEST on this (TM, TN) @ (TN, P) product is the measured
    # cost vs XLA's three-pass scan sweep (module docstring).
    o_ref[:] += jax.lax.dot_general(
        g,
        v_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def gram_matvec(kind, x, y, v, alpha=1.0, *, interpret=False):
    """``g(d2(x, y)) @ v`` fused in one Pallas pass.

    Args:
        kind: ``"eq" | "rq" | "matern12" | "matern32" | "matern52" |
            "linear"`` (the `gram.py` epilogue family).
        x: row inputs ``(n, d)``.
        y: column inputs ``(m, d)``.
        v: right-hand sides ``(m, p)``.
        alpha: RQ shape parameter (scalar operand).

    Returns:
        ``(n, p)`` float32.
    """
    if not _HAS_PALLAS:
        raise RuntimeError(
            "Pallas is unavailable in this jax install; use the XLA scan "
            "sweep (iterative.kernel_matvec) instead."
        )
    n, d = x.shape
    m = y.shape[0]
    p = v.shape[1]
    n_pad = _round_up(max(n, 8), _TILE_M)
    m_pad = _round_up(max(m, 8), _TILE_N)
    d_pad = _round_up(d, 8)
    p_pad = _round_up(p, 128)

    xt = jnp.zeros((d_pad, n_pad), jnp.float32).at[:d, :n].set(x.T)
    yt = jnp.zeros((d_pad, m_pad), jnp.float32).at[:d, :m].set(y.T)
    # Zero-padded v rows null the padded columns' contributions (their Gram
    # entries are garbage, e.g. eq(0) = 1, but multiply v = 0).
    v_pad = jnp.zeros((m_pad, p_pad), jnp.float32).at[:m, :p].set(v)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    ni, nj = n_pad // _TILE_M, m_pad // _TILE_N
    out = pl.pallas_call(
        functools.partial(_gmv_kernel, kind=kind),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d_pad, _TILE_M), lambda i, j: (0, i)),
            pl.BlockSpec((d_pad, _TILE_N), lambda i, j: (0, j)),
            pl.BlockSpec((_TILE_N, p_pad), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((_TILE_M, p_pad), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, p_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d_pad + p_pad) + 8 * n_pad * m_pad,
            bytes_accessed=(
                (n_pad + m_pad) * d_pad + (n_pad + m_pad) * p_pad
            )
            * 4,
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(alpha_arr, xt, yt, v_pad)
    return out[:n, :p]
