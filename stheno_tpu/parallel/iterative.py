"""Multi-chip matrix-free exact GPs: the iterative path over a device mesh.

Combines the two scaling axes of this framework: the O(N)-memory blocked-Gram
matvec (``stheno_tpu.iterative``) sharded row-wise over the mesh, so each
chip computes the Gram-tile products for its rows only. Inputs ``x`` are
small and replicated; right-hand sides are replicated (CG vectors); outputs
are row-sharded and all-gathered. A D-chip mesh gives a ~D-fold speedup of
every CG/Lanczos iteration with one ``all_gather`` of an (n, p) block per
matvec."""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..iterative.cg import batched_cg
from ..iterative.matvec import kernel_matvec
from ..iterative.pchol import pivoted_cholesky, woodbury_preconditioner
from ..iterative.slq import slq_logdet

__all__ = ["sharded_kernel_matvec", "sharded_iterative_nlml"]


def sharded_kernel_matvec(k, x, v, mesh, axis="data", noise=None, block=4096):
    """``(k(x,x) + noise I) @ v`` with row blocks distributed over ``axis``.

    ``x``: (n, d) or (n,), replicated; ``v``: (n, p) or (n,), replicated.
    ``n`` is zero-padded to a multiple of the axis size (padded rows produce
    garbage that is sliced away). Returns a replicated (n, p)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    v_in = jnp.asarray(v)
    v2 = v_in[:, None] if v_in.ndim == 1 else v_in
    n, d = x.shape
    D = mesh.shape[axis]
    n_pad = -(-n // D) * D
    x_pad = jnp.zeros((n_pad, d), x.dtype).at[:n].set(x)

    local_block = min(block, n_pad // D)

    def body(x_local):
        # Each shard computes its row panel of the matvec against the full
        # (replicated) x and v.
        out_local = kernel_matvec(k, x_local, v2, block=local_block, x_cols=x)
        return out_local

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )(x_pad)
    out = out[:n]
    if noise is not None:
        noise_arr = jnp.asarray(noise)
        noise_col = noise_arr[:, None] if noise_arr.ndim == 1 else noise_arr
        out = out + noise_col * v2
    return out[:, 0] if v_in.ndim == 1 else out


def sharded_iterative_nlml(
    kernel_fn,
    params,
    x,
    y,
    noise,
    key,
    mesh,
    *,
    axis="data",
    num_probes=8,
    cg_tol=1e-3,
    max_cg_iters=200,
    slq_steps=16,
    precond_rank=64,
    block=4096,
):
    """Exact-GP NLML estimate with every matvec distributed over the mesh.

    Forward-only (use :func:`stheno_tpu.iterative.iterative_nlml` on one
    chip for gradients, or wrap this in a custom VJP the same way)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    k = kernel_fn(params)
    import math

    mv = lambda v: sharded_kernel_matvec(
        k, x, v, mesh, axis=axis, noise=noise, block=block
    )
    precond = None
    half_inv, logdet_p = None, 0.0
    if precond_rank and precond_rank > 0:
        from ..iterative.pchol import preconditioner_sqrt_ops

        L = pivoted_cholesky(k, x, precond_rank)
        precond = woodbury_preconditioner(L, noise)
        half_inv, logdet_p = preconditioner_sqrt_ops(L, noise)

    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (n, num_probes), y.dtype)
    rhs = jnp.concatenate([y[:, None], z], axis=1)
    sol, info = batched_cg(mv, rhs, precond=precond, tol=cg_tol,
                           max_iters=max_cg_iters)
    alpha = sol[:, 0]
    z_slq = jax.random.normal(k2, (n, num_probes), y.dtype)
    if half_inv is not None:
        mv_white = lambda v: half_inv(mv(half_inv(v)))
        logdet = logdet_p + slq_logdet(mv_white, z_slq, num_steps=slq_steps)
    else:
        logdet = slq_logdet(mv, z_slq, num_steps=slq_steps)
    return 0.5 * (logdet + jnp.sum(y * alpha) + n * math.log(2 * math.pi))
