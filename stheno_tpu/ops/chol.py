"""GEMM-rich recursive Cholesky for TPU.

XLA's native `cholesky` lowers to a sequential panel algorithm. The value of
the divide-and-conquer formulation below is the *carried triangular
inverse*: `cholesky_with_inv` produces `(L, inv(L))` with all O(n^3) work as
matrix multiplication, so every downstream triangular solve — including the
triangular-solve VJPs inside gradients, which otherwise serialise — becomes
a GEMM. Measured on a v5e at the library's pinned HIGHEST matmul precision
(dispatch-corrected slope timing): factor-only, XLA is faster (n=8192:
16.5 vs 31.2 ms inside an NLML), but NLML *gradients* run 1.1-1.5x faster
through this path (fast/xla ms: 2.28/2.52 at n=2000, 13.1/19.4 at 4096,
90/135 at 8192), so value+grad — the training step — wins at every measured
size; see `matrix/ops.py:_chol_dense` for the auto policy (fast from
n>=1024 on accelerators). The formulation is the classic divide-and-conquer
factorisation in which *all* O(n^3) work is matrix multiplication:

    chol([[A11, .], [A21, A22]]):
        L11 = chol(A11)                      (recurse)
        L21 = A21 @ L11^{-T}                 (GEMM; L11^{-1} built below)
        L22 = chol(A22 - L21 @ L21^T)        (GEMM + recurse)

with the triangular inverse itself computed by the same recursion
(`inv([[L11, 0], [L21, L22]]) = [[L11^{-1}, 0],
[-L22^{-1} @ L21 @ L11^{-1}, L22^{-1}]]` — two GEMMs per level). Base cases
fall back to XLA's `cholesky`/`solve_triangular`, which are fine at small n.

Policy note (r3): with the analytic reduction VJPs in ``matrix/ops.py``
the forward no longer needs the inverse for gradients, so "XLA cholesky
forward + tri_inv recursion only in the backward" was measured as an
alternative policy — and rejected: 76.6 vs 58.2 ms at n=8192 and 473 vs
403 ms at n=16384 end-to-end (the sequential one-column triangular
solves the iqf forward then needs cost more than the carried inverse
saves). The carried-inverse fast path remains the differentiated-call
policy.

Numerics: applying an explicit triangular inverse amplifies error by
~cond(L11) relative to a backward-stable triangular solve, which for
jittered GP Gram matrices in f32 costs a small constant factor in residual
(validated against XLA in `tests/test_fast_cholesky.py`); the speed-of-light
trade is standard practice in TPU/accelerator linear algebra. Everything is
plain jnp, so the function is jit/vmap/grad-compatible (reverse mode falls
back to the usual Cholesky-VJP formula through the base cases).
"""

import jax
import jax.numpy as jnp

from .. import config
from . import pallas_chol
from .pallas_chol import chol_tile, chol_tile_available
from .trimul import mul_at, mul_att, mul_ta, syrk_nt

__all__ = ["fast_cholesky", "cholesky_with_inv", "tri_inv_lower"]

# Base-case size: below this, XLA's kernels are competitive and recursion
# overhead is not worth it. r4 re-measured on v5e inside the n=8192
# NLML+grad step: 1024 beats 512/256 (55.1 vs 58.2/59.1 ms).
_BASE = 1024

# Use the structure-aware products (ops/trimul.py) for the recursion's
# panel/Schur/inverse GEMMs: one triangular operand each, so the dense
# forms pay ~2x the necessary flops. Module flag so the perf scripts can
# A/B the dense forms.
_TRI_AWARE = True

# Which (L, inv(L)) engine backs ``cholesky_with_inv``:
#   "recursion"  — the divide-and-conquer factorisation below (L and the
#                  inverse built jointly, all GEMMs).
#   "xla+trinv"  — XLA's sequential-panel ``cholesky`` for L, then the
#                  GEMM-recursed triangular inverse. Candidate policy for
#                  VERDICT r3 #2: XLA's factor is fast (16.5 ms at n=8192)
#                  and the recursion's residual cost sits in its base-case
#                  eye-solves; measured A/B in scripts/r4_tpu_experiments4.py.
_WITH_INV_IMPL = "recursion"

# Optional separate base size for the triangular-inverse recursion (falls
# back to _BASE). The inverse's base case is a sequential eye-solve, a
# different cost profile from the factorisation base.
_INV_BASE = None


def _split(n):
    """Split point: half, rounded up to a multiple of _BASE for aligned
    GEMM shapes (plain half when rounding would swallow the whole matrix)."""
    half = (n + 1) // 2
    m = ((half + _BASE - 1) // _BASE) * _BASE
    return half if m >= n else m


@config.pin_matmul_precision
def tri_inv_lower(L):
    """Inverse of a lower-triangular matrix by blocked recursion (GEMMs)."""
    n = L.shape[-1]
    if n <= (_INV_BASE or _BASE):
        eye = jnp.eye(n, dtype=L.dtype)
        if L.ndim > 2:
            eye = jnp.broadcast_to(eye, L.shape)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    m = _split(n)
    L11 = L[..., :m, :m]
    L21 = L[..., m:, :m]
    L22 = L[..., m:, m:]
    I11 = tri_inv_lower(L11)
    I22 = tri_inv_lower(L22)
    if _TRI_AWARE:
        I21 = -mul_ta(I22, mul_at(L21, I11))
    else:
        I21 = -I22 @ (L21 @ I11)
    top = jnp.concatenate(
        [I11, jnp.zeros(L.shape[:-2] + (m, n - m), L.dtype)], axis=-1
    )
    bot = jnp.concatenate([I21, I22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@config.pin_matmul_precision
def cholesky_with_inv(A):
    """``(L, inv(L))`` of SPD ``A`` with all O(n^3) work on the MXU.

    Base case: the Pallas VMEM-resident tile kernel (``pallas_chol.py``)
    when available (2-D f32 inputs), which emits the inverse as a
    byproduct of its rank-1 loop; XLA's ``cholesky`` + triangular solve
    otherwise (both batch natively, so leading batch dims ride the same
    recursion — r4, VERDICT r3 #3: batched differentiated factorisations
    previously fell back to ``Linv=None`` and sequential solve VJPs).
    Above the base, one divide-and-conquer level adds three GEMMs (panel,
    Schur, inverse off-diagonal) — no sequential triangular substitution
    anywhere."""
    n = A.shape[-1]
    if _WITH_INV_IMPL == "xla+trinv" and n > _BASE:
        L = jnp.linalg.cholesky(A)
        return L, tri_inv_lower(L)
    if (
        A.ndim == 2
        and chol_tile_available()
        and n <= pallas_chol.MAX_TILE
        and A.dtype == jnp.float32  # the tile kernel computes in f32 only
    ):
        return chol_tile(A)
    if n <= _BASE:
        L = jnp.linalg.cholesky(A)
        eye = jnp.eye(n, dtype=L.dtype)
        if L.ndim > 2:
            eye = jnp.broadcast_to(eye, L.shape)
        return L, jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    m = _split(n)
    A11 = A[..., :m, :m]
    A21 = A[..., m:, :m]
    A22 = A[..., m:, m:]
    L11, I11 = cholesky_with_inv(A11)
    # Panel via the explicit triangular inverse: one big GEMM instead of a
    # sequential triangular solve with n-m right-hand sides. The
    # structure-aware forms skip the known-zero halves of the triangular
    # operands (ops/trimul.py) — the recursion's total GEMM MACs drop from
    # ~2n^3/3 to ~n^3/3.
    if _TRI_AWARE:
        L21 = mul_att(A21, I11)
        S = A22 - syrk_nt(L21)
        L22, I22 = cholesky_with_inv(S)
        I21 = -mul_ta(I22, mul_at(L21, I11))
    else:
        L21 = A21 @ jnp.swapaxes(I11, -1, -2)
        S = A22 - L21 @ jnp.swapaxes(L21, -1, -2)
        L22, I22 = cholesky_with_inv(S)
        I21 = -I22 @ (L21 @ I11)
    zeros = jnp.zeros(A.shape[:-2] + (m, n - m), A.dtype)
    L = jnp.concatenate(
        [
            jnp.concatenate([L11, zeros], axis=-1),
            jnp.concatenate([L21, L22], axis=-1),
        ],
        axis=-2,
    )
    Linv = jnp.concatenate(
        [
            jnp.concatenate([I11, zeros], axis=-1),
            jnp.concatenate([I21, I22], axis=-1),
        ],
        axis=-2,
    )
    return L, Linv


@config.pin_matmul_precision
def fast_cholesky(A):
    """Lower Cholesky factor of SPD ``A`` with all O(n^3) work on the MXU.

    Drop-in for ``jnp.linalg.cholesky`` (no NaN-on-failure semantics for
    indefinite inputs is guaranteed beyond what the base case provides).
    Supports leading batch dimensions. The carried inverse of the shared
    recursion is load-bearing for the panel GEMMs (it is how the
    sequential triangular solves are avoided), so factor-only callers use
    the same code path; XLA prunes the final inverse assembly when the
    second output is unused."""
    return cholesky_with_inv(A)[0]
