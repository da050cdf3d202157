"""Multi-chip matrix-free exact GPs: the iterative path over a device mesh.

Combines the two scaling axes of this framework: the O(N)-memory blocked-Gram
matvec (``stheno_tpu.iterative``) sharded row-wise over the mesh, so each
chip computes the Gram-tile products for its rows only. Inputs ``x`` are
small and replicated; right-hand sides are replicated (CG vectors); outputs
are row-sharded and all-gathered. A D-chip mesh gives a ~D-fold speedup of
every CG/Lanczos iteration with one ``all_gather`` of an (n, p) block per
matvec.

Training gradients use the grad-inside-shard_map idiom: the Hutchinson
surrogate's gradient is computed per row shard with ``jax.grad`` *inside*
the shard_map body and ``psum``'d, rather than transposing the shard_map
itself (which on current JAX builds cotangent zeros from Auto-mesh-sharded
avals inside the Manual context and fails once inputs arrive committed to
the mesh — training step 2+)."""

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import PartitionSpec as P

from ..iterative.matvec import kernel_matvec
from .. import config

__all__ = ["sharded_kernel_matvec", "sharded_iterative_nlml"]


def _pad_rows(a, n_pad):
    """Zero-pad the leading axis of ``a`` to ``n_pad`` rows (padded rows are
    masked or sliced away by every caller)."""
    return jnp.zeros((n_pad,) + a.shape[1:], a.dtype).at[: a.shape[0]].set(a)


def _padded_rows(n, mesh, axis):
    """Leading-axis length rounded up to a multiple of the mesh axis size."""
    D = mesh.shape[axis]
    return -(-n // D) * D, D


@config.pin_matmul_precision
def sharded_kernel_matvec(k, x, v, mesh, axis="data", noise=None, block=4096):
    """``(k(x,x) + noise I) @ v`` with row blocks distributed over ``axis``.

    ``x``: (n, d) or (n,), replicated; ``v``: (n, p) or (n,), replicated.
    ``n`` is zero-padded to a multiple of the axis size (padded rows produce
    garbage that is sliced away). Returns a replicated (n, p).

    Forward-only with respect to shard_map transposition: the iterative-NLML
    backward pass goes through :func:`make_sharded_surrogate_grad` instead of
    differentiating through this function."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    v_in = jnp.asarray(v)
    v2 = v_in[:, None] if v_in.ndim == 1 else v_in
    n, d = x.shape
    n_pad, D = _padded_rows(n, mesh, axis)
    x_pad = _pad_rows(x, n_pad)

    local_block = min(block, n_pad // D)

    def body(x_local, x_full, v_full):
        # Each shard computes its row panel of the matvec against the full
        # (replicated) x and v.
        return kernel_matvec(k, x_local, v_full, block=local_block, x_cols=x_full)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )(x_pad, x, v2)
    out = out[:n]
    if noise is not None:
        noise_arr = jnp.asarray(noise)
        noise_col = noise_arr[:, None] if noise_arr.ndim == 1 else noise_arr
        out = out + noise_col * v2
    return out[:, 0] if v_in.ndim == 1 else out


@config.pin_matmul_precision
def _cross_matvec_sharded(k, x_rows, x_cols, v, mesh, axis="data", block=4096):
    """``k(x_rows, x_cols) @ v`` with the rows sharded over ``axis``
    (used by pathwise sample evaluation at large test batches)."""
    x_rows = jnp.asarray(x_rows)
    n, d = x_rows.shape
    n_pad, D = _padded_rows(n, mesh, axis)
    rows_pad = _pad_rows(x_rows, n_pad)
    local_block = min(block, n_pad // D)

    def body(r_loc, c_full, v_full):
        return kernel_matvec(k, r_loc, v_full, block=local_block, x_cols=c_full)

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )(rows_pad, jnp.asarray(x_cols), jnp.asarray(v))
    return out[:n]


@config.pin_matmul_precision
def make_sharded_surrogate_grad(kernel_fn, mesh, axis="data", block=4096):
    """Distributed Hutchinson-surrogate gradient for the iterative NLML.

    Computes the gradient of ``S = 0.5 (mean_i u_i^T (K + noise I) z_i -
    alpha^T (K + noise I) alpha)`` w.r.t. ``(params, noise, x)`` by giving
    each shard its row block of the sum, taking ``jax.grad`` of the *local*
    scalar inside the shard_map body, and psum-ing the replicated-input
    gradients. Padded rows carry zero ``u``/``alpha`` weights, so they
    contribute neither value nor gradient."""

    def surrogate_grad(params, noise, x, U, w, alpha):
        x_in = jnp.asarray(x)
        x2 = x_in[:, None] if x_in.ndim == 1 else x_in
        n, d = x2.shape
        n_pad, D = _padded_rows(n, mesh, axis)
        x_padded, U_pad, w_pad, a_pad = (
            _pad_rows(a, n_pad) for a in (x2, U, w, alpha)
        )
        local_block = min(block, n_pad // D)
        p = U.shape[1]

        def body(x_loc, u_loc, w_loc, a_loc, x_full, w_full, a_full, params, noise):
            def local_S(params, noise, x_loc, x_full):
                k = kernel_fn(params)
                # One fused tile sweep for [w, alpha]: each extra RHS is
                # nearly free, a second sweep would rebuild (and
                # re-differentiate) every Gram tile.
                KV = kernel_matvec(
                    k,
                    x_loc,
                    jnp.concatenate([w_full, a_full[:, None]], axis=1),
                    block=local_block,
                    x_cols=x_full,
                )
                trace_est = (
                    jnp.sum(u_loc * KV[:, :p]) + noise * jnp.sum(u_loc * w_loc)
                ) / p
                quad = jnp.sum(a_loc * KV[:, p]) + noise * jnp.sum(a_loc**2)
                return 0.5 * (trace_est - quad)

            g = jax.grad(local_S, argnums=(0, 1, 2, 3))(
                params, noise, x_loc, x_full
            )
            p_bar = lax.psum(g[0], axis)
            noise_bar = lax.psum(g[1], axis)
            x_full_bar = lax.psum(g[3], axis)
            return p_bar, noise_bar, g[2], x_full_bar

        p_bar, noise_bar, x_loc_bar, x_full_bar = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis, None), P(axis, None), P(axis),
                P(None, None), P(None, None), P(None), P(), P(),
            ),
            out_specs=(P(), P(), P(axis, None), P(None, None)),
            check_vma=False,
        )(x_padded, U_pad, w_pad, a_pad, x2, w, alpha, params, noise)
        x_bar = x_full_bar + x_loc_bar[:n]
        if x_in.ndim == 1:
            x_bar = x_bar[:, 0]
        return p_bar, noise_bar, x_bar

    return surrogate_grad


@config.pin_matmul_precision
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
    precond_method="eig",
    precond_power_iters=1,
    precond_state=None,
    block=4096,
    return_info=False,
):
    """Exact-GP NLML estimate with every matvec distributed over the mesh.

    Differentiable w.r.t. ``params``, ``noise``, ``y``, and ``x``: this is
    the multi-chip training objective. It reuses the single-chip stochastic
    custom VJP (`iterative/nlml.py`) with the forward Gram matvec swapped
    for the row-sharded one and the backward surrogate gradient computed
    grad-inside-shard_map (see :func:`make_sharded_surrogate_grad`).
    ``precond_state``/``return_info`` behave as in ``iterative_nlml``
    (amortised preconditioner reuse; CG solver-health surfacing)."""
    from ..iterative.nlml import _nlml

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    k1, k2 = jax.random.split(jax.lax.stop_gradient(key))
    u = jax.random.normal(k1, (n, num_probes), y.dtype)
    om = None
    if (
        precond_state is None
        and precond_method == "eig"
        and precond_rank
        and precond_rank > 0
    ):
        # The eig factory only touches the operator through matvec_fn, so
        # the preconditioner build distributes over the mesh for free.
        om = jax.random.normal(k2, (n, min(precond_rank, n)), y.dtype)
    matvec_fn = lambda k, xx, v, nz: sharded_kernel_matvec(
        k, xx, v, mesh, axis=axis, noise=nz, block=block
    )
    surrogate_grad_fn = make_sharded_surrogate_grad(
        kernel_fn, mesh, axis=axis, block=block
    )
    val, info = _nlml(
        params, y, jnp.asarray(noise), x, u, om, precond_state, kernel_fn,
        matvec_fn, surrogate_grad_fn, cg_tol, max_cg_iters, slq_steps,
        precond_rank, precond_method, precond_power_iters,
    )
    return (val, info) if return_info else val
