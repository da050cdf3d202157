"""Distributed blocked Cholesky and triangular solve over a device mesh.

The reference is single-device; scaling exact GPs to N >= 10^5 is this
build's north star (BASELINE.json; SURVEY.md §2.10-§2.11). The layout is
row-block: device ``d`` of ``D`` owns rows ``[d*N/D, (d+1)*N/D)`` of the
N x N matrix. The factorisation is right-looking: for each column block, the
column panel is assembled with ``all_gather`` (ICI ring), every device
triangular-solves its panel rows locally, and applies a rank-``block``
trailing update with one large MXU matmul. Collectives are XLA's
(``all_gather``/``psum``) inside ``shard_map`` — no hand-rolled NCCL.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import config

__all__ = [
    "dist_cholesky",
    "dist_cholesky_with_inv",
    "dist_solve_lower",
    "make_data_mesh",
]


def make_data_mesh(n_devices=None, axis="data"):
    """A 1D mesh over all (or the first ``n_devices``) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return jax.sharding.Mesh(np.array(devices), (axis,))



def _i32(v):
    return jnp.asarray(v, dtype=jnp.int32)


def _dslice(arr, r, c, nr, nc):
    return lax.dynamic_slice(arr, (_i32(r), _i32(c)), (nr, nc))


def _dupdate(arr, val, r, c):
    return lax.dynamic_update_slice(arr, val, (_i32(r), _i32(c)))

def _chol_local(block_mat):
    """Panel-diagonal Cholesky, honoring the same jitter policy as the dense
    path (``matrix/ops.py:_chol_dense``): fixed ``config.jitter`` by default,
    escalating probe when ``config.set_adaptive_jitter(True)``."""
    eps = config.jitter(block_mat.dtype)
    if config.adaptive_jitter:
        from ..matrix.ops import adaptive_jitter_eps

        eps = adaptive_jitter_eps(block_mat, eps)
    b = block_mat.shape[-1]
    return jnp.linalg.cholesky(block_mat + eps * jnp.eye(b, dtype=block_mat.dtype))


def _dist_cholesky_shard(K_local, *, axis, block):
    """shard_map body: K_local is (n_local, N); returns the local rows of the
    lower Cholesky factor."""
    d = lax.axis_index(axis)
    n_local, N = K_local.shape
    nb = N // block
    row0 = (d * n_local).astype(jnp.int32)
    grows = row0 + lax.broadcasted_iota(jnp.int32, (n_local, 1), 0)[:, 0]

    def body(jb, A):
        col0 = (jb * block).astype(jnp.int32)
        # Assemble the full column panel (N, block) over the ring.
        my_col = _dslice(A, 0, col0, n_local, block)
        panel = lax.all_gather(my_col, axis, tiled=True)  # (N, block)
        diag = _dslice(panel, col0, 0, block, block)
        L_jj = _chol_local(diag)
        # P = panel @ L_jj^{-T}: triangular solve against every row.
        P = lax.linalg.triangular_solve(
            L_jj, panel, left_side=False, lower=True, transpose_a=True
        )
        rows_all = lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
        below = rows_all >= col0 + block
        in_diag = (rows_all >= col0) & (rows_all < col0 + block)
        # The finished column block of L: L_jj on the diagonal rows, P below,
        # zero above.
        L_jj_padded = jnp.zeros((N, block), A.dtype)
        L_jj_padded = _dupdate(L_jj_padded, L_jj, col0, 0)
        Lcol = jnp.where(below[:, None], P, 0.0) + L_jj_padded
        # Write my rows back.
        my_Lcol = _dslice(Lcol, row0, 0, n_local, block)
        A = _dupdate(A, my_Lcol, 0, col0)
        # Trailing update with masked factors: U = P_below_my @ P_below^T
        # only touches rows/cols >= col0 + block.
        # (Columns in or before the current block are untouched: the
        # corresponding rows of P_below are zeroed.)
        P_below = jnp.where(below[:, None], P, 0.0)
        P_my = _dslice(P_below, row0, 0, n_local, block)
        A = A - jnp.matmul(P_my, P_below.T, preferred_element_type=A.dtype)
        return A

    A = lax.fori_loop(0, nb, body, K_local)
    # Zero the strict upper triangle.
    cols_all = lax.broadcasted_iota(jnp.int32, (n_local, N), 1)
    return jnp.where(cols_all <= grows[:, None], A, 0.0)


def _dist_cholesky_loop(K, mesh, axis, block):
    """The right-looking panel loop (base case of the recursion)."""
    N = K.shape[-1]
    D = mesh.shape[axis]
    block = min(block, N // D)
    while block > 0 and (N % (D * block) != 0 or (N // block) * block != N):
        block //= 2
    if block == 0:
        raise ValueError(f"Cannot tile N={N} over {D} devices.")
    fn = shard_map(
        partial(_dist_cholesky_shard, axis=axis, block=block),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
    )
    return fn(K)


#: Below this size the recursion hands over to the panel loop: one level of
#: halving only pays once the halves' GEMMs dominate the resharding.
_REC_BASE = 2048


@config.pin_matmul_precision
def dist_cholesky(K, mesh, axis="data", block=256):
    """Lower Cholesky factor of a row-block-sharded PSD matrix ``K``.

    GEMM-rich divide-and-conquer (the distributed form of
    ``ops/chol.py:cholesky_with_inv``'s recursion): factor the leading half,
    panel-solve the lower-left half against it, Schur-update, recurse —
    every O(N^3) term is a GSPMD-partitioned GEMM balanced over all devices
    regardless of which global rows it touches (the resharding between
    halves is XLA's all_to_all). This cuts the MAC count to ~2x the
    sequential minimum, vs ~6x for the flat panel loop whose trailing
    updates are full-width to keep static shapes; the loop remains the base
    case below ``_REC_BASE``. An ``N`` that cannot be tiled over
    ``mesh.shape[axis] * block`` (r5: non-divisible problem sizes) is
    padded with an identity block — ``chol([[K, 0], [0, I]]) =
    [[L, 0], [0, I]]`` exactly, so the result is sliced back with no
    numerical interaction; padding is at most one ``D * block`` tile of
    extra rows."""
    N = K.shape[-1]
    D = mesh.shape[axis]
    b = min(block, max(N // D, 1))
    while b > 0 and (N % (D * b) != 0 or (N // b) * b != N):
        b //= 2
    if b == 0:
        tile = D * block
        N_pad = -(-N // tile) * tile
        K_pad = jnp.zeros((N_pad, N_pad), K.dtype)
        K_pad = K_pad.at[:N, :N].set(K)
        K_pad = K_pad.at[
            jnp.arange(N, N_pad), jnp.arange(N, N_pad)
        ].set(1.0)
        L_pad = dist_cholesky(K_pad, mesh, axis=axis, block=block)
        return L_pad[:N, :N]
    h = N // 2
    if N < _REC_BASE or h % D != 0 or h % 2 != 0:
        return _dist_cholesky_loop(K, mesh, axis, block)

    shard = NamedSharding(mesh, P(axis, None))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard)

    A11 = reshard(K[:h, :h])
    A12 = reshard(K[:h, h:])
    A22 = reshard(K[h:, h:])

    L11 = dist_cholesky(A11, mesh, axis=axis, block=block)
    # L21 = A21 L11^{-T}: solve L11 Y = A12 (= A21^T), then L21 = Y^T.
    Y = dist_solve_lower(L11, A12, mesh, axis=axis, block=block)
    L21 = reshard(Y.T)
    S = A22 - jnp.matmul(L21, Y, preferred_element_type=K.dtype)
    L22 = dist_cholesky(reshard(S), mesh, axis=axis, block=block)

    zeros = jnp.zeros((h, N - h), K.dtype)
    top = jnp.concatenate([L11, zeros], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return reshard(jnp.concatenate([top, bot], axis=0))


@config.pin_matmul_precision
def dist_cholesky_with_inv(K, mesh, axis="data", block=256):
    """Lower Cholesky factor of a row-block-sharded PSD ``K`` together with
    its explicit inverse ``L^{-1}`` (also row-sharded).

    The inverse rides the same divide-and-conquer recursion:
    ``inv([[L11, 0], [L21, L22]]) = [[I11, 0], [-I22 (L21 I11), I22]]`` —
    two GSPMD-balanced GEMMs per level, the distributed form of
    ``ops/chol.py:cholesky_with_inv``. The ``L`` computation never consumes
    the inverse parts, so a jitted caller that drops ``Linv`` (a value-only
    NLML) pays nothing for it: XLA dead-code-eliminates the inverse GEMMs.
    The carried inverse turns every downstream triangular solve — and
    crucially the NLML backward's ``K^{-1}`` and ``alpha`` — into GEMMs
    with no extra N-column substitution (see ``parallel/exact.py``)."""
    N = K.shape[-1]
    D = mesh.shape[axis]
    h = N // 2
    shard = NamedSharding(mesh, P(axis, None))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard)

    if N < _REC_BASE or h % D != 0 or h % 2 != 0:
        L = _dist_cholesky_loop(K, mesh, axis, block)
        eye = reshard(jnp.eye(N, dtype=K.dtype))
        Linv = dist_solve_lower(L, eye, mesh, axis=axis, block=block)
        return L, reshard(Linv)

    A11 = reshard(K[:h, :h])
    A12 = reshard(K[:h, h:])
    A22 = reshard(K[h:, h:])

    L11, I11 = dist_cholesky_with_inv(A11, mesh, axis=axis, block=block)
    Y = dist_solve_lower(L11, A12, mesh, axis=axis, block=block)
    L21 = reshard(Y.T)
    S = A22 - jnp.matmul(L21, Y, preferred_element_type=K.dtype)
    L22, I22 = dist_cholesky_with_inv(reshard(S), mesh, axis=axis, block=block)
    M21 = -jnp.matmul(
        I22,
        reshard(jnp.matmul(L21, I11, preferred_element_type=K.dtype)),
        preferred_element_type=K.dtype,
    )

    zeros = jnp.zeros((h, N - h), K.dtype)
    L = reshard(
        jnp.concatenate(
            [
                jnp.concatenate([L11, zeros], axis=1),
                jnp.concatenate([L21, L22], axis=1),
            ],
            axis=0,
        )
    )
    Linv = reshard(
        jnp.concatenate(
            [
                jnp.concatenate([I11, zeros], axis=1),
                jnp.concatenate([M21, I22], axis=1),
            ],
            axis=0,
        )
    )
    return L, Linv


def _dist_solve_lower_shard(L_local, B_local, *, axis, block):
    """shard_map body: solve ``L X = B`` by blocked forward substitution.
    ``L_local``: (n_local, N) rows of lower-triangular L; ``B_local``:
    (n_local, M)."""
    d = lax.axis_index(axis)
    n_local, N = L_local.shape
    M = B_local.shape[1]
    nb = N // block
    row0 = (d * n_local).astype(jnp.int32)

    X_local = jnp.zeros_like(B_local)

    def body(jb, carry):
        X_local, R_local = carry  # R is the running residual of B.
        col0 = (jb * block).astype(jnp.int32)
        owner = col0 // n_local
        local_off = col0 - owner * n_local
        is_owner = d == owner
        # Owner contributes the diagonal block of L and the block rows of R.
        L_jj_cand = _dslice(L_local, jnp.where(is_owner, local_off, 0), col0, block, block)
        R_j_cand = _dslice(R_local, jnp.where(is_owner, local_off, 0), 0, block, M)
        zero = jnp.zeros_like(L_jj_cand)
        L_jj = lax.psum(jnp.where(is_owner, L_jj_cand, zero), axis)
        R_j = lax.psum(
            jnp.where(is_owner, R_j_cand, jnp.zeros_like(R_j_cand)), axis
        )
        X_j = lax.linalg.triangular_solve(
            L_jj, R_j, left_side=True, lower=True
        )
        # Everyone stores their rows of X_j.
        upd = _dupdate(jnp.zeros_like(X_local), X_j, local_off, 0)
        X_local = jnp.where(is_owner, X_local + upd, X_local)
        # Update residual: R -= L[:, col] X_j for rows strictly below the block.
        L_col = _dslice(L_local, 0, col0, n_local, block)
        grows = row0 + lax.broadcasted_iota(jnp.int32, (n_local, 1), 0)[:, 0]
        mask = (grows >= col0 + block)[:, None]
        R_local = R_local - jnp.where(
            mask, jnp.matmul(L_col, X_j, preferred_element_type=R_local.dtype), 0.0
        )
        return X_local, R_local

    X_local, _ = lax.fori_loop(0, nb, body, (X_local, B_local))
    return X_local


def _dist_solve_lower_loop(L, B, mesh, axis, block):
    """The blocked forward-substitution loop (base case of the recursion)."""
    N = L.shape[-1]
    D = mesh.shape[axis]
    block = min(block, N // D)
    while block > 0 and N % (D * block) != 0:
        block //= 2
    if block == 0:
        raise ValueError(f"Cannot tile N={N} over {D} devices.")
    fn = shard_map(
        partial(_dist_solve_lower_shard, axis=axis, block=block),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    return fn(L, B)


@config.pin_matmul_precision
def dist_solve_lower(L, B, mesh, axis="data", block=256):
    """Solve ``L X = B`` with ``L`` lower-triangular, both row-block sharded.

    Divide-and-conquer like :func:`dist_cholesky`: ``X1 = L11^{-1} B1``,
    ``X2 = L22^{-1} (B2 - L21 X1)`` — the off-diagonal application is one
    GSPMD-balanced GEMM, so the MAC count approaches the sequential minimum
    instead of the flat loop's ~4x (whose per-panel residual updates span
    all local rows to keep static shapes). The loop remains the base case
    below the threshold."""
    N = L.shape[-1]
    D = mesh.shape[axis]
    h = N // 2
    if N < _REC_BASE or h % D != 0 or h % 2 != 0:
        return _dist_solve_lower_loop(L, B, mesh, axis, block)

    shard = NamedSharding(mesh, P(axis, None))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard)

    L11 = reshard(L[:h, :h])
    L21 = reshard(L[h:, :h])
    L22 = reshard(L[h:, h:])
    B1 = reshard(B[:h])
    B2 = reshard(B[h:])

    X1 = dist_solve_lower(L11, B1, mesh, axis=axis, block=block)
    R2 = B2 - jnp.matmul(L21, X1, preferred_element_type=B.dtype)
    X2 = dist_solve_lower(L22, reshard(R2), mesh, axis=axis, block=block)
    return reshard(jnp.concatenate([X1, X2], axis=0))
