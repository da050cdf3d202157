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
from .. import config

__all__ = ["kernel_matvec"]


_PRECISION_MAP = {
    "default": lax.Precision.DEFAULT,
    "bfloat16": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "tensorfloat32": lax.Precision.HIGH,
    "float32": lax.Precision.HIGHEST,
    "highest": lax.Precision.HIGHEST,
}


def _tile_precision(precision):
    """Resolve the tile-product precision: explicit string, or ``None`` to
    inherit the library default (``config.matmul_precision``)."""
    if precision is None:
        precision = config.matmul_precision or "default"
    return _PRECISION_MAP[precision]


@config.pin_matmul_precision
def kernel_matvec(
    k,
    x,
    v,
    noise=None,
    block=4096,
    tile_dtype=None,
    x_cols=None,
    symmetric=None,
    precision="high",
    compensated=False,
    comp_col_chunk=32768,
):
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
        precision: MXU precision for the *tile products* ``K_b @ v`` (the
            O(N^2 p) GEMM work). Default ``"high"`` (three bf16 passes,
            ~4e-6 relative rounding): inside CG/SLQ the solves are governed
            by ``cg_tol`` (1e-2..1e-6) and the estimators are stochastic,
            so six-pass exactness buys nothing (measured end-to-end on the
            N=262,144 NLML+grad step: "highest" costs ~1.7x the "high"
            step for a value difference of 1.3e-6 relative — inside probe
            noise). Do NOT drop to "default"/bf16-pass: the input rounding
            puts the NLML 18% off with gradients ~9x wrong — CG converges
            to the rounded operator's solution, not K's. The Gram *tile
            build* (distance matmuls) stays at the pinned library default
            regardless. Pass ``None`` to inherit
            ``config.matmul_precision``.
        compensated: two-float compensated application (r5; see
            ``iterative/compensated.py``): the Gram tiles are built with
            cancellation-free distances and applied through the
            Ozaki-split double-float GEMM, dropping the application
            error from ``~eps*sqrt(N)*||K||`` to ``~1e-10`` relative.
            This is what makes CG converge below the plain-f32 noise
            wall (the practical boundary is ~lam_max*eps*sqrt(N)/40 —
            ~0.1 at N=262,144) — measured ~56x the plain matvec cost
            (VPU-bound double-float tile arithmetic vs an HBM/MXU-bound
            plain sweep; the price of the only converging path in this
            regime). Incompatible with
            ``tile_dtype``/``symmetric``; the ``precision`` argument is
            ignored on the compensated tile product (its slice GEMMs
            carry their own exactness guarantees).
        symmetric: exploit ``K = K^T`` in the square case — each
            off-diagonal (block, block) tile is built once and applied both
            ways, and the operator becomes *exactly* symmetric. Measured
            OFF by default: on v5e the tile saving does not pay (16.6 vs
            15.6 ms/matvec at n=65536, block=8192 — the row sweep is
            GEMM/HBM-bound, not epilogue-bound) and reverse mode through
            the pair sweep's scatter-adds is ~2x slower end-to-end on the
            N=262,144 NLML+grad step. Use only for forward-only workloads
            that need exact operator symmetry.

    Returns:
        ``(n, p)`` (or ``(n,)`` matching ``v``).
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    square = x_cols is None
    if symmetric is None:
        symmetric = False
    xc = x if square else jnp.asarray(x_cols)
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

    if compensated:
        if tile_dtype is not None or (symmetric and square and nb > 1):
            raise ValueError(
                "compensated matvec is incompatible with tile_dtype / "
                "symmetric."
            )
        from .compensated import (
            compensated_matmul,
            df32_pairwise,
            two_prod,
            two_sum,
        )

        # Column-chunk the contraction: the compensated tile pipeline
        # holds several tile-sized intermediates (f32 tile, two bf16
        # slices, the f32 tail, the df32 low word), so a full-width
        # (block, N) tile at N=262,144 would need ~5x 8 GB of HBM temp
        # (measured OOM on a 16 GB v5e). Per (block, comp_col_chunk)
        # chunk the working set is ~5 GB at the defaults, and the df32
        # carry across chunks is exact (TwoSum).
        m_cols = xc.shape[0]
        cc = min(comp_col_chunk, m_cols)
        ncc = -(-m_cols // cc)
        cc_pad = ncc * cc
        # Pad columns by REPEATING the first input (keeps kernel values
        # finite for any expression); the matching v rows are zero, so
        # padded columns contribute exactly nothing.
        xc_pad = jnp.broadcast_to(xc[:1], (cc_pad, xc.shape[1]))
        xc_pad = xc_pad.at[:m_cols].set(xc)
        v_pad = jnp.zeros((cc_pad, v2.shape[1]), v2.dtype).at[:m_cols].set(v2)
        xc_chunks = xc_pad.reshape(ncc, cc, xc.shape[1])
        v_chunks = v_pad.reshape(ncc, cc, v2.shape[1])

        def comp_body(carry, x_b):
            def col_body(acc, inp):
                xc_c, v_c = inp
                # Prefer the double-float tile (entry error ~eps * K —
                # needed for extreme-kappa solves); fall back to a plain
                # cancellation-free build for kernels without a df32
                # rule.
                tile = df32_pairwise(k, x_b, xc_c)
                if tile is None:
                    with config.accurate_dists():
                        K_b = jnp.asarray(dense(pairwise(k, x_b, xc_c)))
                    K_lo = None
                else:
                    K_b, K_lo = tile
                h, l = compensated_matmul(K_b, v_c, fold=False, A_lo=K_lo)
                hi, lo = acc
                hi, e = two_sum(hi, h)
                return (hi, lo + e + l), None

            zero = jnp.zeros((x_b.shape[0], v2.shape[1]), v2.dtype)
            (hi, lo), _ = lax.scan(
                col_body, (zero, zero), (xc_chunks, v_chunks)
            )
            return carry, (hi, lo)

        _, (hi_b, lo_b) = lax.scan(comp_body, None, x_blocks)
        hi = hi_b.reshape(n_pad, v2.shape[1])[:n]
        lo = lo_b.reshape(n_pad, v2.shape[1])[:n]
        if noise is not None:
            if x_cols is not None:
                raise ValueError(
                    "noise only applies to the square (x_cols=None) case."
                )
            noise_arr = jnp.asarray(noise)
            noise_col = noise_arr[:, None] if noise_arr.ndim == 1 else noise_arr
            nv_hi, nv_lo = two_prod(noise_col, v2)
            hi, err = two_sum(hi, nv_hi)
            lo = lo + err + nv_lo
        out = hi + lo
        return out[:, 0] if v_in.ndim == 1 else out

    prec = _tile_precision(precision)
    if symmetric and square and nb > 1:
        out = _matvec_sym(
            k, x_blocks, v2, nb, block, n, n_pad, tile_dtype, acc_dtype, prec
        )
    else:
        v_mm = v2 if tile_dtype is None else v2.astype(tile_dtype)

        @jax.checkpoint
        def body(carry, x_b):
            # Rematerialised: reverse-mode recomputes each Gram tile instead
            # of saving all of them (saving would be O(N^2) memory — the very
            # thing this path exists to avoid).
            K_b = jnp.asarray(dense(pairwise(k, x_b, xc)))
            if tile_dtype is not None:
                K_b = K_b.astype(tile_dtype)
            out_b = jnp.matmul(
                K_b, v_mm, preferred_element_type=acc_dtype, precision=prec
            )
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


def _matvec_sym(k, x_blocks, v2, nb, block, n, n_pad, tile_dtype, acc_dtype, prec):
    """Upper-triangle tile sweep: for each i <= j build ``K_ij`` once, add
    ``K_ij v_j`` into row-block i and ``K_ij^T v_i`` into row-block j.
    Padded tail rows contribute nothing because ``v`` is zero-padded."""
    import numpy as np

    p = v2.shape[1]
    v_pad = jnp.zeros((n_pad, p), v2.dtype).at[:n].set(v2)
    v_blocks = v_pad.reshape(nb, block, p)
    pairs = jnp.asarray(
        np.array([(i, j) for i in range(nb) for j in range(i, nb)], np.int32)
    )

    @jax.checkpoint
    def body(out, ij):
        # Rematerialised like the plain path: tiles are rebuilt in reverse
        # mode rather than saved.
        i, j = ij[0], ij[1]
        x_i = lax.dynamic_index_in_dim(x_blocks, i, keepdims=False)
        x_j = lax.dynamic_index_in_dim(x_blocks, j, keepdims=False)
        K_b = jnp.asarray(dense(pairwise(k, x_i, x_j)))
        if tile_dtype is not None:
            K_b = K_b.astype(tile_dtype)
        v_j = lax.dynamic_index_in_dim(v_blocks, j, keepdims=False)
        v_i = lax.dynamic_index_in_dim(v_blocks, i, keepdims=False)
        if tile_dtype is not None:
            v_j = v_j.astype(tile_dtype)
            v_i = v_i.astype(tile_dtype)
        out = out.at[i].add(
            jnp.matmul(
                K_b, v_j, preferred_element_type=acc_dtype, precision=prec
            ).astype(acc_dtype)
        )
        mirror = jnp.matmul(
            K_b.T, v_i, preferred_element_type=acc_dtype, precision=prec
        )
        out = out.at[j].add(
            jnp.where(i != j, mirror, 0.0).astype(acc_dtype)
        )
        return out, None

    out0 = jnp.zeros((nb, block, p), acc_dtype)
    out, _ = lax.scan(body, out0, pairs)
    return out.reshape(n_pad, p)[:n]
