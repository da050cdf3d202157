"""Random-feature expansions of kernel expressions.

Builds a finite feature map ``phi`` with ``phi(x) @ phi(y).T ~= k(x, y)`` for
a useful subalgebra of kernel expressions:

- spectral (random Fourier) features for the stationary family — EQ
  (Gaussian spectrum), Matern-1/2·3/2·5/2 (multivariate-t spectra with
  2·nu degrees of freedom), RQ (Gamma scale-mixture of EQ) — closed under
  ``+``, ``*`` (spectra add under products), scaling, symmetric stretch and
  shift;
- exact finite features for ``Linear`` (the input itself) and ``OneKernel``;
- symmetric input warps (``periodic``, ``transform``, ``select``,
  ``stretch``, ``shift``) by recursing on the warped space.

This powers pathwise posterior sampling (`stheno_tpu/model/pathwise.py`):
sampling a prior *function* is ``phi(.) @ w`` with ``w ~ N(0, I)``, which is
what the reference cannot express at all (its sampling is pointwise
multivariate-normal only). The paired cos/sin construction is used (lower
variance than random phases): ``m`` frequency rows give ``2 m`` features.
"""

import math

import jax
import jax.numpy as jnp

from .. import config
from .kernel import (
    EQ,
    Kernel,
    Linear,
    Matern12,
    Matern32,
    Matern52,
    OneKernel,
    PeriodicKernel,
    ProductKernel,
    RQ,
    ScaledKernel,
    ShiftedKernel,
    StretchedKernel,
    SumKernel,
    ZeroKernel,
    _InputWrappedKernel,
)

__all__ = ["feature_map"]


def _matern_sampler(dof):
    def sample(key, m, d, dtype):
        kz, ku = jax.random.split(key)
        z = jax.random.normal(kz, (m, d), dtype)
        u = jax.random.chisquare(ku, dof, (m, 1), dtype)
        return z * jnp.sqrt(dof / jnp.maximum(u, 1e-30))

    return sample


def _freq_sampler(k):
    """Spectral-measure sampler for stationary kernels, or ``None``.

    Returns ``(sampler(key, m, d, dtype) -> (m, d) frequencies, amplitude)``
    such that ``k(x, y) = amplitude * E[cos(w^T (x - y))]``."""
    if isinstance(k, EQ):
        return (
            lambda key, m, d, dtype: jax.random.normal(key, (m, d), dtype),
            1.0,
        )
    if isinstance(k, Matern12):
        return _matern_sampler(1.0), 1.0
    if isinstance(k, Matern32):
        return _matern_sampler(3.0), 1.0
    if isinstance(k, Matern52):
        return _matern_sampler(5.0), 1.0
    if isinstance(k, RQ):
        alpha = k.alpha

        def sample_rq(key, m, d, dtype):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (m, d), dtype)
            # RQ(r) = E_{g ~ Gamma(alpha, rate=alpha)} [exp(-g r^2 / 2)]:
            # conditional on g the kernel is EQ with inverse length sqrt(g).
            g = jax.random.gamma(kg, jnp.asarray(alpha, dtype), (m, 1), dtype)
            g = g / alpha
            return z * jnp.sqrt(g)

        return sample_rq, 1.0
    if isinstance(k, ScaledKernel):
        inner = _freq_sampler(k.k)
        if inner is None:
            return None
        sampler, amp = inner
        return sampler, amp * k.scale
    if isinstance(k, StretchedKernel) and k._sym:
        inner = _freq_sampler(k.k)
        if inner is None:
            return None
        sampler, amp = inner
        s = k.s1
        return (
            lambda key, m, d, dtype: sampler(key, m, d, dtype)
            / jnp.asarray(s, dtype),
            amp,
        )
    if isinstance(k, ShiftedKernel) and k._sym:
        # A shared shift cancels in x - y.
        return _freq_sampler(k.k)
    if isinstance(k, ProductKernel):
        left = _freq_sampler(k.k1)
        right = _freq_sampler(k.k2)
        if left is None or right is None:
            return None
        s1, a1 = left
        s2, a2 = right
        # Spectra convolve under kernel products: add the frequencies.
        def sample_prod(key, m, d, dtype):
            k1, k2 = jax.random.split(key)
            return s1(k1, m, d, dtype) + s2(k2, m, d, dtype)

        return sample_prod, a1 * a2
    return None


def _warped_dim(k, d, dtype):
    out = jax.eval_shape(
        lambda x: k._warp(x, 1), jax.ShapeDtypeStruct((1, d), dtype)
    )
    return out.shape[-1]


def _plan(k, d, budget, dtype):
    """Returns ``(n_features, build(key) -> phi)`` for kernel expression
    ``k`` on ``d``-dimensional inputs, spending ~``budget`` features."""
    if isinstance(k, ZeroKernel):
        return 0, lambda key: (lambda x: jnp.zeros(x.shape[:-1] + (0,), dtype))
    if isinstance(k, OneKernel):
        return 1, lambda key: (
            lambda x: jnp.ones(x.shape[:-1] + (1,), dtype)
        )
    if isinstance(k, Linear):
        return d, lambda key: (lambda x: x.astype(dtype))
    if isinstance(k, SumKernel):
        n1, b1 = _plan(k.k1, d, max(2, budget // 2), dtype)
        n2, b2 = _plan(k.k2, d, max(2, budget // 2), dtype)

        def build_sum(key):
            key1, key2 = jax.random.split(key)
            p1, p2 = b1(key1), b2(key2)
            return lambda x: jnp.concatenate([p1(x), p2(x)], axis=-1)

        return n1 + n2, build_sum
    spectral = _freq_sampler(k)
    if spectral is None and isinstance(k, ScaledKernel):
        # Non-spectral inner kernel (e.g. scaled Linear): scale the features.
        n, b = _plan(k.k, d, budget, dtype)
        scale = k.scale

        def build_scaled(key):
            p = b(key)
            return lambda x: p(x) * jnp.sqrt(jnp.asarray(scale, dtype))

        return n, build_scaled
    if spectral is not None:
        sampler, amp = spectral
        m = max(1, budget // 2)

        def build_rff(key):
            freqs = sampler(key, m, d, dtype)  # (m, d)
            coeff = jnp.sqrt(jnp.asarray(amp, dtype) / m)

            def phi(x):
                proj = x.astype(dtype) @ freqs.T  # (n, m)
                return coeff * jnp.concatenate(
                    [jnp.cos(proj), jnp.sin(proj)], axis=-1
                )

            return phi

        return 2 * m, build_rff
    if isinstance(k, _InputWrappedKernel) and k._sym:
        # Symmetric warp: k(x, y) = k_base(warp(x), warp(y)) — recurse on
        # the warped space (periodic -> torus embedding, select -> subset,
        # transform -> f(x), asym-unsupported combinations excluded above).
        d_w = _warped_dim(k, d, dtype)
        n, b = _plan(k.k, d_w, budget, dtype)

        def build_warp(key):
            p = b(key)
            return lambda x: p(k._warp(x, 1))

        return n, build_warp
    raise ValueError(
        f"No random-feature expansion for kernel expression {k!r}. "
        "Supported: EQ/Matern/RQ (+ scale/stretch/shift/product), sums, "
        "Linear, constants, and symmetric input warps thereof."
    )


@config.pin_matmul_precision
def feature_map(k, key, num_features, d, dtype=None):
    """Build a random feature map for kernel expression ``k``.

    Args:
        k: kernel expression.
        key: PRNG key for frequency sampling.
        num_features: approximate feature budget (spectral blocks use
            ``2 * (budget // 2)``; exact blocks use what they need).
        d: input dimensionality.
        dtype: feature dtype (default float64 under x64, else float32).

    Returns:
        ``(phi, n_features)`` with ``phi`` mapping ``(..., n, d)`` arrays to
        ``(..., n, n_features)`` and ``phi(x) @ phi(y).T ~= k(x, y)``.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    if not isinstance(k, Kernel):
        raise TypeError(f"Expected a kernel expression, got {type(k)}.")
    n_feat, build = _plan(k, int(d), int(num_features), dtype)
    # The decorator on feature_map only pins matmuls traced *now*; the phi
    # closure's GEMMs trace when the caller invokes it, possibly outside any
    # pinned context — pin the closure itself.
    return config.pin_matmul_precision(build(key)), n_feat
