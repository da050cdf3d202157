"""Matrix-free kernel matvecs.

``K @ V`` without ever materialising the full N x N Gram: a ``lax.scan`` over
row blocks evaluates ``k(x_block, x)`` (any kernel expression) into an
(block, N) tile, multiplies on the MXU, and discards the tile. Peak memory is
O(block * N); HBM traffic per matvec is ~2 N * block * ceil(N/block) words
amortised over all right-hand sides, so batching RHS (CG + probe vectors) is
nearly free. Fully differentiable (the Gram tiles are plain jnp), which the
Hutchinson-gradient NLML relies on."""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import pairwise
from ..matrix import dense

__all__ = ["kernel_matvec"]


def kernel_matvec(k, x, v, noise=None, block=4096, tile_dtype=None, x_cols=None):
    """Compute ``(k(x, x_cols) [+ noise I]) @ v`` matrix-free.

    Args:
        k: kernel expression.
        x: row inputs ``(n, d)`` (or ``(n,)``).
        v: right-hand sides ``(m, p)`` (or ``(m,)``) with ``m = len(x_cols)``.
        noise: optional scalar (or ``(n,)``) diagonal noise (square case only).
        block: row-block size.
        tile_dtype: optional storage dtype for the Gram tiles (e.g.
            ``jnp.bfloat16``): the matvec is HBM-traffic-bound, so bf16 tiles
            with f32 MXU accumulation run ~2x faster at ~1e-3 relative
            accuracy. Safe for plain matvecs; do NOT feed into CG (rounding
            breaks operator symmetry).
        x_cols: optional column inputs (default: ``x`` — the square Gram);
            used by the row-sharded distributed matvec.

    Returns:
        ``(n, p)`` (or ``(n,)`` matching ``v``).
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    xc = x if x_cols is None else jnp.asarray(x_cols)
    if xc.ndim == 1:
        xc = xc[:, None]
    v_in = jnp.asarray(v)
    v2 = v_in[:, None] if v_in.ndim == 1 else v_in
    n = x.shape[0]
    block = min(block, n)
    nb = -(-n // block)
    n_pad = nb * block

    x_pad = jnp.zeros((n_pad, x.shape[1]), x.dtype).at[:n].set(x)
    x_blocks = x_pad.reshape(nb, block, x.shape[1])
    acc_dtype = v2.dtype
    v_mm = v2 if tile_dtype is None else v2.astype(tile_dtype)

    @jax.checkpoint
    def body(carry, x_b):
        # Rematerialised: reverse-mode recomputes each Gram tile instead of
        # saving all of them (saving would be O(N^2) memory — the very thing
        # this path exists to avoid).
        K_b = jnp.asarray(dense(pairwise(k, x_b, xc)))
        if tile_dtype is not None:
            K_b = K_b.astype(tile_dtype)
        out_b = jnp.matmul(K_b, v_mm, preferred_element_type=acc_dtype)
        return carry, out_b.astype(acc_dtype)

    _, out_blocks = lax.scan(body, None, x_blocks)
    out = out_blocks.reshape(n_pad, v2.shape[1])[:n]
    if noise is not None:
        if x_cols is not None:
            raise ValueError("noise only applies to the square (x_cols=None) case.")
        noise = jnp.asarray(noise)
        noise_col = noise[:, None] if noise.ndim == 1 else noise
        out = out + noise_col * v2
    return out[:, 0] if v_in.ndim == 1 else out
