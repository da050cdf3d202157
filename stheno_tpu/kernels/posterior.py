"""Closed-form posterior kernel/mean objects.

These are the lazy posterior formulas that conditioning produces
(cf. the reference's use of mlkernels ``PosteriorKernel``, ``PosteriorMean``,
``SubspaceKernel`` at ``/root/reference/stheno/model/observations.py:143-277``):

- ``PosteriorKernel(k_ij, k_zi, k_zj, z, K_z)``:
      ``k(x, y) = k_ij(x, y) - k_zi(z, x)^T K_z^{-1} k_zj(z, y)``
- ``SubspaceKernel(k_zi, k_zj, z, A)``:
      ``k(x, y) = k_zi(z, x)^T A^{-1} k_zj(z, y)``
- ``PosteriorMean(m_i, m_z, k_zi, z, K_z, y)``:
      ``m(x) = m_i(x) + k_zi(z, x)^T K_z^{-1} (y - m_z(z))``

The ``K_z^{-1} (y - m_z(z))`` weight vector and the ``K_z`` Cholesky are
cached (tracer-safely) so repeated predictions and the fused
``mean_var_diag`` path do the expensive work once."""

import jax
import jax.numpy as jnp

from ..matrix import (
    Dense,
    add,
    as_matrix,
    cholesky,
    dense,
    iqf,
    iqf_diag,
    scale,
    solve,
)
from .kernel import Kernel
from .mean import Mean

__all__ = ["PosteriorKernel", "SubspaceKernel", "PosteriorMean", "FusedPosterior"]


def _tracer_safe_cache(obj, key, compute):
    cache = obj.__dict__.setdefault("_cache", {})
    if key in cache:
        return cache[key]
    value = compute()
    value_traced = any(
        isinstance(l, jax.core.Tracer) for l in jax.tree_util.tree_leaves(value)
    )
    source_traced = any(
        isinstance(l, jax.core.Tracer)
        for l in jax.tree_util.tree_leaves(
            [getattr(obj, "K_z", None), getattr(obj, "y", None)]
        )
    )
    if not value_traced or source_traced:
        cache[key] = value
    return value


class PosteriorKernel(Kernel):
    def __init__(self, k_ij, k_zi, k_zj, z, K_z):
        self.k_ij = k_ij
        self.k_zi = k_zi
        self.k_zj = k_zj
        self.z = z
        self.K_z = as_matrix(K_z)

    def _pairwise(self, x, y):
        from .eval import pairwise

        K_zx = pairwise(self.k_zi, self.z, x)
        K_zy = K_zx if (y is x and self.k_zj is self.k_zi) else pairwise(
            self.k_zj, self.z, y
        )
        prior = pairwise(self.k_ij, x, y)
        correction = iqf(self.K_z, dense(K_zx), dense(K_zy))
        return add(prior, scale(correction, -1))

    def _elwise(self, x, y):
        from .eval import elwise, pairwise

        K_zx = pairwise(self.k_zi, self.z, x)
        K_zy = K_zx if (y is x and self.k_zj is self.k_zi) else pairwise(
            self.k_zj, self.z, y
        )
        prior = elwise(self.k_ij, x, y)
        correction = iqf_diag(self.K_z, dense(K_zx), dense(K_zy))
        return prior - correction[..., :, None]

    def _scalar(self, x, y):
        from .eval import pairwise

        K_zx = dense(pairwise(self.k_zi, self.z, x[None, :]))
        K_zy = dense(pairwise(self.k_zj, self.z, y[None, :]))
        corr = jnp.sum(K_zx * solve(self.K_z, K_zy))
        return self.k_ij._scalar(x, y) - corr

    @property
    def stationary(self):
        return False

    def _render(self, formatter):
        return f"PosteriorKernel({self.k_ij.display(formatter)})"


class SubspaceKernel(Kernel):
    def __init__(self, k_zi, k_zj, z, A):
        self.k_zi = k_zi
        self.k_zj = k_zj
        self.z = z
        self.A = as_matrix(A)

    def _pairwise(self, x, y):
        from .eval import pairwise

        K_zx = pairwise(self.k_zi, self.z, x)
        K_zy = K_zx if (y is x and self.k_zj is self.k_zi) else pairwise(
            self.k_zj, self.z, y
        )
        return iqf(self.A, dense(K_zx), dense(K_zy))

    def _elwise(self, x, y):
        from .eval import pairwise

        K_zx = pairwise(self.k_zi, self.z, x)
        K_zy = K_zx if (y is x and self.k_zj is self.k_zi) else pairwise(
            self.k_zj, self.z, y
        )
        return iqf_diag(self.A, dense(K_zx), dense(K_zy))[..., :, None]

    def _scalar(self, x, y):
        from .eval import pairwise

        K_zx = dense(pairwise(self.k_zi, self.z, x[None, :]))
        K_zy = dense(pairwise(self.k_zj, self.z, y[None, :]))
        return jnp.sum(K_zx * solve(self.A, K_zy))

    @property
    def stationary(self):
        return False

    def _render(self, formatter):
        return f"SubspaceKernel({self.k_zi.display(formatter)})"


class PosteriorMean(Mean):
    def __init__(self, m_i, m_z, k_zi, z, K_z, y):
        self.m_i = m_i
        self.m_z = m_z
        self.k_zi = k_zi
        self.z = z
        self.K_z = as_matrix(K_z)
        self.y = y

    def _weights(self):
        """``K_z^{-1} (y - m_z(z))`` — cached."""
        from .eval import mean_eval

        def compute():
            resid = jnp.asarray(self.y) - mean_eval(self.m_z, self.z)
            return solve(self.K_z, resid)

        return _tracer_safe_cache(self, "weights", compute)

    def _eval(self, x):
        from .eval import mean_eval, pairwise

        K_zx = pairwise(self.k_zi, self.z, x)
        prior = mean_eval(self.m_i, x)
        return prior + jnp.matmul(
            jnp.swapaxes(dense(K_zx), -1, -2), self._weights()
        )

    def _scalar(self, x):
        from .eval import pairwise

        K_zx = dense(pairwise(self.k_zi, self.z, x[None, :]))
        return self.m_i._scalar(x) + jnp.sum(K_zx[..., 0] * self._weights()[..., 0])

    def _render(self, formatter):
        return f"PosteriorMean({self.m_i.display(formatter)})"


class FusedPosterior:
    """Shares the ``K_zx`` Gram between the posterior mean and (co)variance in
    the fused ``mean_var``/``mean_var_diag`` paths."""

    def __init__(self, mean: PosteriorMean, post_k: PosteriorKernel, sub_k):
        self.mean = mean
        self.post_k = post_k
        self.sub_k = sub_k

    def _pieces(self, x):
        from .eval import pairwise

        K_zx = dense(pairwise(self.post_k.k_zi, self.post_k.z, x))
        mean = jnp.asarray(self.mean.m_i(x)) + jnp.matmul(
            jnp.swapaxes(K_zx, -1, -2), self.mean._weights()
        )
        return K_zx, mean

    def mean_var(self, x):
        from .eval import pairwise

        K_zx, mean = self._pieces(x)
        var = add(
            pairwise(self.post_k.k_ij, x, x),
            scale(iqf(self.post_k.K_z, K_zx), -1),
        )
        if self.sub_k is not None:
            var = add(var, iqf(self.sub_k.A, K_zx))
        return mean, var

    def mean_var_diag(self, x):
        from .eval import elwise

        K_zx, mean = self._pieces(x)
        var_diag = elwise(self.post_k.k_ij, x, x) - iqf_diag(
            self.post_k.K_z, K_zx
        )[..., :, None]
        if self.sub_k is not None:
            var_diag = var_diag + iqf_diag(self.sub_k.A, K_zx)[..., :, None]
        return mean, var_diag
