"""Finite-dimensional distributions.

``FDD(p, x, noise)``: process ``p`` evaluated at inputs ``x`` plus additive
noise — a :class:`Normal` whose mean/variance thunks are all lazy, with fused
``var_diag``/``mean_var``/``mean_var_diag`` fast paths (reference:
``/root/reference/stheno/model/fdd.py:44-87``). A degenerate
``FDD(pid: int, x)`` acts as an input *tag* for multi-output block selection
(``fdd.py:89-93`` in the reference)."""

import numpy as np

import jax.numpy as jnp

from ..dist import Normal
from ..kernels import elwise, mean_eval, mean_var, mean_var_diag, pairwise
from ..matrix import (
    Dense,
    Diagonal,
    Zero,
    add,
    diag_of,
    fill_diag,
    is_structured,
    submatrix,
)
from ..mo import infer_size, num_elements

__all__ = ["FDD", "noise_as_matrix", "take"]


def noise_as_matrix(noise, dtype, n):
    """Promote noise to a structured matrix: ``None`` -> Zero, scalar ->
    scaled identity, vector -> Diagonal, matrix -> Dense (reference
    ``_noise_as_matrix``, ``fdd.py:14-41``)."""
    if noise is None:
        return Zero(dtype, n, n)
    if is_structured(noise):
        return noise
    noise = jnp.asarray(noise)
    if noise.ndim == 0:
        return fill_diag(noise, n)
    if noise.ndim == 1:
        return Diagonal(noise)
    return Dense(noise)


class FDD(Normal):
    """Finite-dimensional distribution of a process at inputs ``x``."""

    def __init__(self, p, x, noise=None):
        self.p = p
        self.x = x
        from .gp import GP

        if not isinstance(p, GP):
            # Input-tagging wrapper: `p` is a process id used in lazy rules.
            self.noise = None
            return

        kernel = p.kernel
        mean = p.mean
        dtype = _input_dtype(x)
        self.noise = noise_as_matrix(noise, dtype, infer_size(kernel, x))

        def construct_mean():
            return mean_eval(mean, x)

        def construct_var():
            return add(pairwise(kernel, x), self.noise)

        def construct_var_diag():
            return elwise(kernel, x) + diag_of(self.noise)[..., :, None]

        def construct_mean_var():
            m, v = mean_var(mean, kernel, x)
            return m, add(v, self.noise)

        def construct_mean_var_diag():
            m, vd = mean_var_diag(mean, kernel, x)
            return m, vd + diag_of(self.noise)[..., :, None]

        Normal.__init__(
            self,
            construct_mean,
            construct_var,
            var_diag=construct_var_diag,
            mean_var=construct_mean_var,
            mean_var_diag=construct_mean_var_diag,
        )

    def __str__(self):
        # Reference rendering shape (``fdd.py:95-101``): indented
        # key-value block over process/input/noise.
        from ..utils.display import indented_kv

        return (
            "<FDD:\n"
            + indented_kv("process", self.p, suffix=",\n")
            + indented_kv("input", self.x, suffix=",\n")
            + indented_kv("noise", self.noise, suffix=">")
        )

    def __repr__(self):
        from ..utils.display import indented_kv

        return (
            "<FDD:\n"
            + indented_kv("process", repr(self.p), suffix=",\n")
            + indented_kv("input", repr(self.x), suffix=",\n")
            + indented_kv("noise", repr(self.noise), suffix=">")
        )


def _input_dtype(x):
    if isinstance(x, tuple):
        return _input_dtype(x[0])
    if isinstance(x, FDD):
        return _input_dtype(x.x)
    return jnp.asarray(x).dtype


def _take_x(kernel, x, mask):
    """Subset inputs by a boolean mask, recursing through tuples (reference
    ``_take_x``, ``fdd.py:135-148``)."""
    from ..mo import MultiOutputKernel

    if isinstance(x, tuple):
        i = 0
        taken = ()
        for xi in x:
            n = infer_size(kernel, xi)
            taken += (_take_x(kernel, xi, mask[i : i + n]),)
            i += n
        return taken
    if isinstance(x, FDD):
        if isinstance(kernel, MultiOutputKernel) and x.p not in kernel.ps:
            raise ValueError(
                f"Process {x.p} is not part of the multi-output kernel."
            )
        return FDD(x.p, _take_x(kernel, x.x, mask), submatrix(x.noise, mask))
    idx = np.flatnonzero(np.asarray(mask))
    return jnp.asarray(x)[..., idx] if jnp.asarray(x).ndim == 1 else jnp.asarray(x)[..., idx, :]


def take(fdd: FDD, mask):
    """Subset an FDD (inputs *and* noise) by a concrete boolean mask — the
    missing-data path (reference ``B.take(fdd, mask)``, ``fdd.py:125-132``)."""
    mask = np.asarray(mask)
    if mask.dtype != np.bool_:
        raise AssertionError(
            "Can only take from finite-dimensional distributions according to a mask."
        )
    return FDD(fdd.p, _take_x(fdd.p.kernel, fdd.x, mask), submatrix(fdd.noise, mask))
