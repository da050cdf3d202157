"""2-D block-cyclic distributed Cholesky over a (rows, cols) device mesh.

The 1-D row-block layout (``cholesky.py``) all-gathers full ``(N, block)``
column panels over every device and leaves per-panel tail imbalance — fine
to ~8 chips, but at pod scale (D >> 8) panel broadcast is O(N block) per
device per panel. This module is the ScaLAPACK-style answer (SURVEY §2.10
TP row / §7 hard part 1): tiles are dealt *cyclically* over an ``r x c``
mesh, so

- every device owns tiles spread across the whole matrix — no tail
  imbalance as the factorisation shrinks the active trailing block;
- the per-panel communication is two masked ``psum`` broadcasts of
  ``(N/r, b)`` / ``(N/c, b)`` panel pieces along single mesh axes — riding
  separate ICI rings concurrently — instead of one O(N b) ``all_gather``
  over all D devices: O(N b / sqrt(D)) per device on a square mesh.

Layout: with ``nb = N / b`` tiles per side, global tile row ``I`` lives on
mesh row ``I mod r`` at local index ``I // r`` (same for columns with
``c``). The relayout global<->cyclic is two reshape/transposes (no
gathers). ``c`` must be a multiple of ``r`` (square meshes and wide
rectangles; ``r=1`` degenerates to a column-cyclic layout): with
``r | c``, every panel-column tile a device needs lives on a single mesh
row, making the second broadcast one masked psum.

As in the 1-D path, the flat cyclic loop (static full-width trailing
updates, ~2x the MACs of the shrinking ideal... amortised by cyclic
balance) is the *base case* of a divide-and-conquer recursion whose
half-size GEMMs are GSPMD-sharded over the full 2-D mesh.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import config

__all__ = [
    "dist_cholesky_2d",
    "dist_cholesky_2d_with_inv",
    "dist_nlml_2d",
    "make_grid_mesh",
]


def make_grid_mesh(r, c, axis_r="rows", axis_c="cols"):
    """An ``r x c`` mesh over the first ``r*c`` devices."""
    import numpy as np

    devices = np.array(jax.devices()[: r * c]).reshape(r, c)
    return jax.sharding.Mesh(devices, (axis_r, axis_c))


def _i32(v):
    return jnp.asarray(v, dtype=jnp.int32)


def _to_cyclic(K, nb, r, axis):
    """Permute tile-blocks along ``axis`` from global order to cyclic order
    (tile ``J = m*r + q`` moves to position ``q*(nb//r) + m``) — pure
    reshape/transpose, no gather."""
    if r == 1:
        return K
    b = K.shape[axis] // nb
    shape = K.shape
    lead = shape[:axis]
    trail = shape[axis + 1 :]
    Kr = K.reshape(lead + (nb // r, r, b) + trail)
    Kr = jnp.swapaxes(Kr, axis, axis + 1)
    return Kr.reshape(shape)


def _from_cyclic(K, nb, r, axis):
    """Inverse of :func:`_to_cyclic`."""
    if r == 1:
        return K
    b = K.shape[axis] // nb
    shape = K.shape
    lead = shape[:axis]
    trail = shape[axis + 1 :]
    Kr = K.reshape(lead + (r, nb // r, b) + trail)
    Kr = jnp.swapaxes(Kr, axis, axis + 1)
    return Kr.reshape(shape)


def _chol_local(block_mat):
    eps = config.jitter(block_mat.dtype)
    if config.adaptive_jitter:
        from ..matrix.ops import adaptive_jitter_eps

        eps = adaptive_jitter_eps(block_mat, eps)
    bsz = block_mat.shape[-1]
    return jnp.linalg.cholesky(
        block_mat + eps * jnp.eye(bsz, dtype=block_mat.dtype)
    )


def _cyclic_shard_body(A, *, axis_r, axis_c, r, c, b, nb):
    """shard_map body: ``A`` is this device's cyclic tile set as a dense
    ``(nb/r * b, nb/c * b)`` local matrix. Returns the local tiles of L."""
    pr = lax.axis_index(axis_r)
    pc = lax.axis_index(axis_c)
    nlr, nlc = A.shape  # (N/r, N/c) local.
    s = c // r

    # Global row/column index of every local row/column (cyclic map).
    li = lax.broadcasted_iota(jnp.int32, (nlr, 1), 0)[:, 0]
    g_row = (li // b * r + pr) * b + li % b
    lj = lax.broadcasted_iota(jnp.int32, (nlc, 1), 0)[:, 0]
    g_col = (lj // b * c + pc) * b + lj % b

    def body(k, A):
        k = _i32(k)
        owner_r = k % r
        owner_c = k % c
        kr = (k - owner_r) // r  # Local tile row on the owning mesh row.
        kc = (k - owner_c) // c
        col0 = kc * b

        # --- Diagonal tile: factor on the owner, broadcast to everyone.
        diag_cand = lax.dynamic_slice(
            A, (jnp.where(pr == owner_r, kr * b, 0),
                jnp.where(pc == owner_c, col0, 0)), (b, b)
        )
        mine = (pr == owner_r) & (pc == owner_c)
        diag = lax.psum(
            lax.psum(jnp.where(mine, diag_cand, 0.0), axis_r), axis_c
        )
        L_kk = _chol_local(diag)

        # --- Column panel: the owning mesh column solves all of its local
        # rows against L_kk; rows at or above the pivot are masked after.
        my_colpanel = lax.dynamic_slice(
            A, (_i32(0), jnp.where(pc == owner_c, col0, 0)), (nlr, b)
        )
        P_solved = lax.linalg.triangular_solve(
            L_kk, my_colpanel, left_side=False, lower=True, transpose_a=True
        )
        below = (g_row >= (k + 1) * b)[:, None]
        in_diag_row = ((g_row >= k * b) & (g_row < (k + 1) * b))[:, None]
        L_kk_rows = jnp.zeros((nlr, b), A.dtype)
        L_kk_rows = jnp.where(
            in_diag_row & (pr == owner_r),
            lax.dynamic_update_slice(
                jnp.zeros((nlr, b), A.dtype), L_kk,
                (jnp.where(pr == owner_r, kr * b, 0), _i32(0)),
            ),
            L_kk_rows,
        )
        Lcol_local = jnp.where(below, P_solved, 0.0) + L_kk_rows

        # Write the finished column back (owning column only).
        upd = lax.dynamic_update_slice(A, Lcol_local, (_i32(0), col0))
        A = jnp.where(pc == owner_c, upd, A)

        # --- Broadcast the panel pieces.
        # Every device gets the pieces for ITS OWN global rows from its
        # mesh-row sibling in the owning column: one psum over the c axis.
        P_rows = lax.psum(
            jnp.where(pc == owner_c, jnp.where(below, P_solved, 0.0), 0.0),
            axis_c,
        )  # (N/r, b): piece for global row-tiles ≡ pr (mod r).

        # Pieces for this device's COLUMNS (J ≡ pc mod c, all of which live
        # on mesh row pc % r because r | c): one psum over the r axis, then
        # an affine re-index from the source's row-cyclic layout to this
        # device's column order (a reshape + dynamic index, no gather).
        src_r = pc % r
        Q_full = lax.psum(
            jnp.where(pr == src_r, P_rows, 0.0), axis_r
        )  # (N/r, b) in the source's local layout: tile m <-> J = m*r+src_r.
        # My local column tile j_loc is global J = j_loc*c + pc, i.e. source
        # local tile m = j_loc*s + d0 with d0 = (pc - src_r) // r.
        d0 = (pc - src_r) // r
        Qt = Q_full.reshape(nlr // (s * b), s, b, b)
        Q_cols = jnp.take(Qt, d0, axis=1).reshape(nlc, b)
        right = (g_col >= (k + 1) * b)[:, None]
        Q_cols = jnp.where(right, Q_cols, 0.0)

        # --- Trailing update: one balanced (N/r, b) x (b, N/c) GEMM.
        A = A - jnp.matmul(
            P_rows, Q_cols.T, preferred_element_type=A.dtype
        )
        return A

    A = lax.fori_loop(0, nb, body, A)
    # Zero the strict upper triangle (in global coordinates).
    return jnp.where(g_col[None, :] <= g_row[:, None], A, 0.0)


def _dist_cholesky_2d_loop(K, mesh, axis_r, axis_c, block):
    N = K.shape[-1]
    r = mesh.shape[axis_r]
    c = mesh.shape[axis_c]
    block = min(block, N // c)
    while block > 0 and N % (c * block) != 0:
        block //= 2
    if block == 0 or N % (r * block) != 0:
        raise ValueError(f"Cannot tile N={N} over a {r}x{c} mesh.")
    nb = N // block
    Kc = _to_cyclic(_to_cyclic(K, nb, r, 0), nb, c, 1)
    fn = shard_map(
        partial(
            _cyclic_shard_body,
            axis_r=axis_r, axis_c=axis_c, r=r, c=c, b=block, nb=nb,
        ),
        mesh=mesh,
        in_specs=P(axis_r, axis_c),
        out_specs=P(axis_r, axis_c),
    )
    Lc = fn(Kc)
    return _from_cyclic(_from_cyclic(Lc, nb, c, 1), nb, r, 0)


#: Recursion threshold, as in the 1-D path.
_REC_BASE = 2048


@config.pin_matmul_precision
def dist_cholesky_2d(K, mesh, axis_r="rows", axis_c="cols", block=256):
    """Lower Cholesky factor of PSD ``K`` over a 2-D ``r x c`` mesh
    (``r | c`` required; see module docstring).

    Divide-and-conquer on top of the block-cyclic loop: the half-size
    panel solve and Schur complement are GSPMD GEMMs sharded over BOTH mesh
    axes (XLA partitions them SUMMA-style), with the cyclic loop as base
    case."""
    N = K.shape[-1]
    r = mesh.shape[axis_r]
    c = mesh.shape[axis_c]
    if c % r != 0:
        raise ValueError(
            f"dist_cholesky_2d needs the column axis to be a multiple of "
            f"the row axis; got {r}x{c}."
        )
    h = N // 2
    if N < _REC_BASE or h % (r * block) != 0 or h % (c * block) != 0:
        return _dist_cholesky_2d_loop(K, mesh, axis_r, axis_c, block)

    shard2 = NamedSharding(mesh, P(axis_r, axis_c))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard2)

    A11 = reshard(K[:h, :h])
    A12 = reshard(K[:h, h:])
    A22 = reshard(K[h:, h:])

    L11 = dist_cholesky_2d(A11, mesh, axis_r=axis_r, axis_c=axis_c, block=block)
    Y = _solve_lower_2d(L11, A12, mesh, axis_r, axis_c, block)
    L21 = reshard(Y.T)
    S = A22 - jnp.matmul(L21, Y, preferred_element_type=K.dtype)
    L22 = dist_cholesky_2d(
        reshard(S), mesh, axis_r=axis_r, axis_c=axis_c, block=block
    )

    zeros = jnp.zeros((h, N - h), K.dtype)
    top = jnp.concatenate([L11, zeros], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return reshard(jnp.concatenate([top, bot], axis=0))


@config.pin_matmul_precision
def dist_cholesky_2d_with_inv(K, mesh, axis_r="rows", axis_c="cols", block=256):
    """``(L, L^{-1})`` over the 2-D mesh: the inverse rides the recursion as
    two GSPMD GEMMs per level (``inv([[L11,0],[L21,L22]]) = [[I11,0],
    [-I22 (L21 I11), I22]]``); the ``L`` path never consumes the inverse,
    so value-only callers prune it (as in the 1-D
    ``dist_cholesky_with_inv``)."""
    N = K.shape[-1]
    r = mesh.shape[axis_r]
    c = mesh.shape[axis_c]
    if c % r != 0:
        raise ValueError(
            f"dist_cholesky_2d needs the column axis to be a multiple of "
            f"the row axis; got {r}x{c}."
        )
    shard2 = NamedSharding(mesh, P(axis_r, axis_c))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard2)

    h = N // 2
    if N < _REC_BASE or h % (r * block) != 0 or h % (c * block) != 0:
        L = _dist_cholesky_2d_loop(K, mesh, axis_r, axis_c, block)
        eye = reshard(jnp.eye(N, dtype=K.dtype))
        Linv = _solve_lower_2d(L, eye, mesh, axis_r, axis_c, block)
        return L, reshard(Linv)

    A11 = reshard(K[:h, :h])
    A12 = reshard(K[:h, h:])
    A22 = reshard(K[h:, h:])

    L11, I11 = dist_cholesky_2d_with_inv(
        A11, mesh, axis_r=axis_r, axis_c=axis_c, block=block
    )
    Y = _solve_lower_2d(L11, A12, mesh, axis_r, axis_c, block)
    L21 = reshard(Y.T)
    S = A22 - jnp.matmul(L21, Y, preferred_element_type=K.dtype)
    L22, I22 = dist_cholesky_2d_with_inv(
        reshard(S), mesh, axis_r=axis_r, axis_c=axis_c, block=block
    )
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


import math as _math

_LOG_2_PI = _math.log(2 * _math.pi)


def dist_nlml_2d(K, y, mesh, axis_r="rows", axis_c="cols", block=256):
    """Negative log marginal likelihood with ``K`` sharded over a 2-D mesh;
    differentiable w.r.t. ``K`` and ``y`` via the analytic gradient
    ``dK = 0.5 (K^{-1} - alpha alpha^T)`` (per output column), exactly as
    the 1-D ``dist_nlml`` but with every GEMM partitioned over both mesh
    axes."""
    return _dist_nlml_2d(K, y, mesh, axis_r, axis_c, block)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dist_nlml_2d(K, y, mesh, axis_r, axis_c, block):
    nlml, _ = _dist_nlml_2d_fwd(K, y, mesh, axis_r, axis_c, block)
    return nlml


@config.pin_matmul_precision
def _dist_nlml_2d_fwd(K, y, mesh, axis_r, axis_c, block):
    N = K.shape[-1]
    L, Linv = dist_cholesky_2d_with_inv(
        K, mesh, axis_r=axis_r, axis_c=axis_c, block=block
    )
    y2 = y if y.ndim == 2 else y[:, None]
    m = y2.shape[-1]
    half = _solve_lower_2d(L, y2, mesh, axis_r, axis_c, block)
    quad = jnp.sum(half * half)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    nlml = 0.5 * (m * logdet + quad + m * N * _LOG_2_PI)
    return nlml, (Linv, half, y)


@config.pin_matmul_precision
def _dist_nlml_2d_bwd(mesh, axis_r, axis_c, block, residuals, g):
    Linv, half, y = residuals
    m = y.shape[-1] if y.ndim == 2 else 1
    shard2 = NamedSharding(mesh, P(axis_r, axis_c))
    alpha = jnp.matmul(Linv.T, half, preferred_element_type=Linv.dtype)
    Kinv = jax.lax.with_sharding_constraint(
        jnp.matmul(Linv.T, Linv, preferred_element_type=Linv.dtype), shard2
    )
    Kbar = 0.5 * g * (m * Kinv - jnp.matmul(alpha, alpha.T))
    ybar = g * alpha
    return Kbar, ybar if y.ndim == 2 else ybar[:, 0]


_dist_nlml_2d.defvjp(_dist_nlml_2d_fwd, _dist_nlml_2d_bwd)


def _solve_lower_2d(L, B, mesh, axis_r, axis_c, block):
    """Solve ``L X = B`` over the 2-D mesh: divide-and-conquer with
    GSPMD-sharded off-diagonal GEMMs; the base case is the 1-D blocked
    forward substitution run along ``axis_r`` (rows of ``L`` sharded over
    the mesh rows) and vectorised over ``axis_c`` (columns of ``B``
    sharded over the mesh columns — independent right-hand sides, zero
    communication along that axis). Thin RHS blocks are zero-padded to a
    multiple of the column axis so they always shard: no device ever holds
    a replicated O(N*M) RHS buffer, and the per-device ``L`` rows are
    O(N^2/r) instead of the full replicated O(N^2)."""
    N = L.shape[-1]
    h = N // 2
    shard2 = NamedSharding(mesh, P(axis_r, axis_c))

    def reshard(a):
        return jax.lax.with_sharding_constraint(a, shard2)

    if N <= _REC_BASE:
        from .cholesky import _dist_solve_lower_shard

        r = mesh.shape[axis_r]
        c = mesh.shape[axis_c]
        blk = min(block, N // r) if r <= N else 0
        while blk > 0 and N % (r * blk) != 0:
            blk //= 2
        if blk == 0:
            # Un-tileable base (N not divisible by the row axis): replicate
            # L, shard what divides — the pre-round-3 fallback.
            col_spec = axis_c if B.shape[-1] % c == 0 else None
            B_sh = jax.lax.with_sharding_constraint(
                B, NamedSharding(mesh, P(None, col_spec))
            )
            L_rep = jax.lax.with_sharding_constraint(
                L, NamedSharding(mesh, P(None, None))
            )
            return lax.linalg.triangular_solve(
                L_rep, B_sh, left_side=True, lower=True
            )
        M = B.shape[-1]
        Mc = -(-M // c) * c
        B_pad = (
            B
            if Mc == M
            else jnp.concatenate(
                [B, jnp.zeros((N, Mc - M), B.dtype)], axis=-1
            )
        )
        fn = shard_map(
            partial(_dist_solve_lower_shard, axis=axis_r, block=blk),
            mesh=mesh,
            in_specs=(P(axis_r, None), P(axis_r, axis_c)),
            out_specs=P(axis_r, axis_c),
        )
        X = fn(L, B_pad)
        return X if Mc == M else X[:, :M]

    L11 = reshard(L[:h, :h])
    L21 = reshard(L[h:, :h])
    L22 = reshard(L[h:, h:])
    B1 = reshard(B[:h])
    B2 = reshard(B[h:])
    X1 = _solve_lower_2d(L11, B1, mesh, axis_r, axis_c, block)
    R2 = B2 - jnp.matmul(L21, X1, preferred_element_type=B.dtype)
    X2 = _solve_lower_2d(L22, reshard(R2), mesh, axis_r, axis_c, block)
    return reshard(jnp.concatenate([X1, X2], axis=0))
