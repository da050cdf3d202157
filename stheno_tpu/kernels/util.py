"""Input-handling helpers shared by kernels and means."""

import jax.numpy as jnp

__all__ = ["uprank", "num_elements_arr", "as_fn_output"]


def uprank(x, rank=2):
    """Promote an input/output array to at least ``rank`` dims, mirroring the
    reference's ``B.uprank``: scalars -> (1, 1), vectors (n,) -> (n, 1)."""
    x = jnp.asarray(x)
    while x.ndim < rank:
        if x.ndim == 0:
            x = x[None]
        else:
            x = x[..., None]
    return x


def num_elements_arr(x):
    """Number of input points in an array input (the size of the -2 axis after
    upranking)."""
    x = jnp.asarray(x)
    if x.ndim == 0:
        return 1
    if x.ndim == 1:
        return x.shape[0]
    return x.shape[-2]


def as_fn_output(y, n):
    """Normalise a user function's output to a column ``(..., n, 1)``.

    Accepted shapes: scalar (broadcast over the n points), ``(..., n)``, or
    ``(..., n, 1)``."""
    y = jnp.asarray(y)
    if y.ndim == 0:
        return jnp.broadcast_to(y, (n, 1))
    if y.ndim >= 2 and y.shape[-1] == 1 and y.shape[-2] == n:
        return y
    if y.shape[-1] == n:
        return y[..., None]
    raise ValueError(f"Cannot interpret function output of shape {y.shape}.")
