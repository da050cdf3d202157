"""Single-invocation Pallas Cholesky tile kernel for TPU.

The Cholesky is the hottest op of the engine (SURVEY.md §2.11 item 2; every
``logpdf``/posterior/sample call funnels into one). XLA's native ``cholesky``
lowers to a sequential HLO While loop that leaves the MXU mostly idle and
round-trips HBM between panels. This kernel factors a whole tile of up to
1024x1024 **inside VMEM in one invocation**:

- the 128x128 diagonal blocks are factored by a vectorised right-looking
  rank-1 loop on the VPU (the only intrinsically sequential part of the
  algorithm), which *simultaneously* builds the inverse of each diagonal
  block by forward substitution;
- the panel update ``L21 = A21 @ L11^{-T}`` and the trailing Schur update
  ``A22 -= L21 @ L21^T`` are MXU GEMMs on VMEM-resident data;
- the returned per-block diagonal inverses let every downstream triangular
  "solve" become a GEMM (no sequential substitution anywhere above).

``chol_tile(A)`` returns ``(L, Linv)`` for SPD ``A`` (n <= 1024, float32; n
is padded to a multiple of 128 with an identity block, which factors
block-diagonally and is sliced away). A custom VJP implements the blocked
Cholesky adjoint (Murray 2016) plus the ``d inv(L) = -Linv dL Linv``
correction so the pair is differentiable as a unit.

Off-TPU the same kernel logic runs under ``interpret=True`` in tests.
"""

import functools

import jax
import jax.numpy as jnp
from .. import config

try:  # Pallas is TPU-only at runtime but importable everywhere.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["chol_tile", "chol_tile_available", "set_chol_mode", "MAX_TILE"]

_T = 128  # MXU-aligned micro-tile; also the rank-1 loop length per block.
MAX_TILE = 1024  # 3 * 1024^2 * 4 B of VMEM buffers; above this, recurse.

#: "auto" | "pallas" | "xla" | "interpret" — test hook.
_MODE = "auto"


def set_chol_mode(mode):
    global _MODE
    assert mode in ("auto", "pallas", "xla", "interpret")
    _MODE = mode


def chol_tile_available():
    if not _HAS_PALLAS or _MODE == "xla":
        return False
    if _MODE in ("pallas", "interpret"):
        return True
    # Measured on TPU v5e (2026-08, dispatch-corrected slope timing): the
    # per-step cost of the Mosaic fori_loop in `_factor_block` is ~1-3 us,
    # putting the tile factor at ~0.17/0.30/0.68 ms for n=256/512/1024 where
    # XLA's native cholesky runs 0.07/0.08/0.32 ms — the sequential VPU
    # chain, not the MXU, is the bottleneck at tile scale, so "auto" keeps
    # XLA as the base case. The divide-and-conquer layer above
    # (`chol.cholesky_with_inv`) is where the large-n win lives:
    # 27 TF/s at n=8192 and 38 TF/s at n=16384 vs 15/21 TF/s for XLA's
    # cholesky. The kernel remains available via set_chol_mode("pallas").
    return False


def _round_up(v, m):
    return (v + m - 1) // m * m


def _factor_block(Akk):
    """Factor one 128x128 SPD block and its inverse on the VPU.

    Right-looking rank-1 Cholesky; the inverse rows are built by the forward
    substitution ``Inv[j,:] = (e_j - L[j,:j] @ Inv[:j,:]) / L[j,j]`` inside
    the same loop, so the sequential chain is paid exactly once."""
    T = Akk.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    rows1 = rows[:, :1]  # (T, 1)
    cols1 = cols[:1, :]  # (1, T)

    def body(j, carry):
        M, L, Inv = carry
        d2 = jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0))
        dinv = jax.lax.rsqrt(d2)
        # Column j of the trailing matrix, scaled and masked to rows >= j.
        colv = jnp.sum(jnp.where(cols == j, M, 0.0), axis=1, keepdims=True)
        colv = jnp.where(rows1 >= j, colv, 0.0) * dinv  # (T, 1)
        L = L + colv * (cols == j)
        # Rank-1 Schur update (stale entries above/left of j are never read).
        M = M - colv * jnp.swapaxes(colv, 0, 1)
        # Inverse row j by forward substitution against previous rows.
        lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0, keepdims=True)
        lrow = jnp.where(cols1 < j, lrow, 0.0)  # strictly-left entries
        r = -jnp.sum(jnp.swapaxes(lrow, 0, 1) * Inv, axis=0, keepdims=True)
        r = (r + jnp.where(cols1 == j, 1.0, 0.0)) * dinv
        Inv = Inv + r * (rows == j)
        return M, L, Inv

    zero = jnp.zeros_like(Akk)
    _, L, Inv = jax.lax.fori_loop(0, T, body, (Akk, zero, zero))
    return L, Inv


def _chol_kernel(a_ref, l_ref, dinv_ref, *, n):
    """Blocked right-looking Cholesky of ``a_ref`` (n x n, n % 128 == 0),
    factored entirely in VMEM. Writes L to ``l_ref`` and the inverses of the
    nb diagonal 128-blocks, stacked, to ``dinv_ref`` (n x 128)."""
    nb = n // _T
    l_ref[:] = a_ref[:]
    for kb in range(nb):
        k0, k1 = kb * _T, (kb + 1) * _T
        Lkk, Ikk = _factor_block(l_ref[k0:k1, k0:k1])
        l_ref[k0:k1, k0:k1] = Lkk
        dinv_ref[k0:k1, :] = Ikk
        if kb + 1 < nb:
            # Panel: one MXU GEMM against the just-built diagonal inverse.
            P = l_ref[k1:n, k0:k1]
            # Explicit HIGHEST: Mosaic rejects Precision.HIGH, and a bf16
            # single pass would corrupt the factorisation (config.py).
            Lp = jnp.dot(
                P,
                jnp.swapaxes(Ikk, 0, 1),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            l_ref[k1:n, k0:k1] = Lp
            # Trailing update, one block-column GEMM at a time to bound the
            # VMEM temporary at (n - j0) x 128.
            for jb in range(kb + 1, nb):
                j0, j1 = jb * _T, (jb + 1) * _T
                Lpj = l_ref[j0:j1, k0:k1]
                rows_blk = l_ref[j0:n, k0:k1]
                upd = jnp.dot(
                    rows_blk,
                    jnp.swapaxes(Lpj, 0, 1),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                l_ref[j0:n, j0:j1] = l_ref[j0:n, j0:j1] - upd
    # Zero the strict upper triangle (panel slots above the diagonal still
    # hold original A entries).
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(rows >= cols, l_ref[:], 0.0)


def _assemble_inv(L, dinv, n):
    """Full ``inv(L)`` from the per-block diagonal inverses by log-depth
    block forward substitution (all GEMMs, outside the kernel)."""
    nb = n // _T
    diag_invs = [dinv[kb * _T : (kb + 1) * _T, :] for kb in range(nb)]

    def rec(lo, hi):
        if hi - lo == 1:
            return diag_invs[lo]
        mid = (lo + hi + 1) // 2
        I11 = rec(lo, mid)
        I22 = rec(mid, hi)
        L21 = L[mid * _T : hi * _T, lo * _T : mid * _T]
        I21 = -jnp.dot(
            I22,
            jnp.dot(L21, I11, preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m, k = I11.shape[0], I22.shape[0]
        top = jnp.concatenate([I11, jnp.zeros((m, k), L.dtype)], axis=1)
        bot = jnp.concatenate([I21, I22], axis=1)
        return jnp.concatenate([top, bot], axis=0)

    return rec(0, nb)


def _chol_tile_impl(A, interpret):
    n0 = A.shape[-1]
    n = _round_up(n0, _T)
    dtype = jnp.float32
    Ap = A.astype(dtype)
    if n != n0:
        # Identity padding factors block-diagonally and is sliced away.
        Ap = jnp.zeros((n, n), dtype).at[:n0, :n0].set(Ap)
        Ap = Ap.at[
            jnp.arange(n0, n), jnp.arange(n0, n)
        ].set(1.0)
    L, dinv = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dtype),
            jax.ShapeDtypeStruct((n, _T), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n**3,
            bytes_accessed=2 * n * n * 4,
            transcendentals=n,
        ),
        interpret=interpret,
    )(Ap)
    Linv = _assemble_inv(L, dinv, n)
    if n != n0:
        L = L[:n0, :n0]
        Linv = Linv[:n0, :n0]
    return L.astype(A.dtype), Linv.astype(A.dtype)


def _phi(X):
    """Lower triangle with the diagonal halved (Cholesky-adjoint projector)."""
    return jnp.tril(X) - 0.5 * jnp.diagflat(jnp.diagonal(X))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _chol_tile(A, interpret):
    return _chol_tile_impl(A, interpret)


def _chol_tile_fwd(A, interpret):
    L, Linv = _chol_tile_impl(A, interpret)
    return (L, Linv), (L, Linv)


@config.pin_matmul_precision
def _chol_tile_bwd(interpret, res, cots):
    L, Linv = res
    Lbar, Linvbar = cots
    # d inv(L) = -Linv dL Linv  =>  extra L-cotangent -Linv^T Linvbar Linv^T.
    Lbar = Lbar - jnp.swapaxes(Linv, -1, -2) @ Linvbar @ jnp.swapaxes(
        Linv, -1, -2
    )
    # Cholesky adjoint (Murray 2016): Abar = Linv^T Phi(L^T Lbar) Linv,
    # symmetrised to match XLA's convention for symmetric inputs.
    P = _phi(jnp.swapaxes(L, -1, -2) @ Lbar)
    Abar = jnp.swapaxes(Linv, -1, -2) @ P @ Linv
    Abar = 0.5 * (Abar + jnp.swapaxes(Abar, -1, -2))
    return (Abar,)


_chol_tile.defvjp(_chol_tile_fwd, _chol_tile_bwd)


@config.pin_matmul_precision
def chol_tile(A):
    """``(L, inv(L))`` of SPD ``A`` (n <= MAX_TILE) via the VMEM-resident
    Pallas kernel. Caller is responsible for jitter. Differentiable.

    float32 only: the kernel computes in f32 internally, so accepting wider
    dtypes would silently return f32-accurate results in f64 clothing —
    callers (``chol.cholesky_with_inv``) route non-f32 to the XLA base."""
    if A.ndim != 2 or A.shape[-1] > MAX_TILE:
        raise ValueError(f"chol_tile: unsupported shape {A.shape}")
    if A.dtype != jnp.float32:
        raise TypeError(
            f"chol_tile computes in float32; got {A.dtype}. Use the XLA "
            f"base case for wider dtypes."
        )
    return _chol_tile(A, _MODE == "interpret")
