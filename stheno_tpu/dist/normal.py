"""Multivariate normal over structured matrices with lazy mean/variance.

Mirrors the semantics of the reference's ``Normal``
(``/root/reference/stheno/random.py:48-393``): lazy thunks with optional
``var_diag``/``mean_var``/``mean_var_diag`` fast paths (so ``marginals`` of a
posterior never forms the N x N covariance), logpdf with batching and
NaN-masked missing data, entropy/KL/2-Wasserstein, affine arithmetic, and
sampling. RNG is functional (`jax.random` keys) with an eager global-key
convenience."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..matrix import (
    AbstractMatrix,
    Diagonal,
    LowRank,
    Woodbury,
    Zero,
    as_matrix,
    add,
    dense,
    diag_of,
    fill_diag,
    iqf_diag,
    is_structured,
    logdet,
    matmul,
    matmul3,
    ratio,
    root,
    sample as mat_sample,
    scale,
    submatrix,
    trace,
)
from .rng import next_global_key

__all__ = ["Random", "RandomProcess", "RandomVector", "Normal"]

_LOG_2_PI = math.log(2 * math.pi)


class Random:
    """A random object, with arithmetic sugar."""

    def __radd__(self, other):
        return self + other

    def __rmul__(self, other):
        return self * other

    def __neg__(self):
        return -1 * self

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __truediv__(self, other):
        return self * (1 / other)


class RandomProcess(Random):
    """A random process."""


class RandomVector(Random):
    """A random vector."""


def _is_key(x):
    """Detect a jax PRNG key (new-style typed key or legacy uint32 pair)."""
    if isinstance(x, jax.Array):
        if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            return True
        return x.dtype == jnp.uint32 and x.ndim == 1 and x.shape[0] == 2
    return False


class Normal(RandomVector):
    """Normal random variable.

    Construct eagerly as ``Normal(mean, var)`` / ``Normal(var)``, or lazily
    from thunks: ``Normal(mean_fn, var_fn, var_diag=..., mean_var=...,
    mean_var_diag=...)``."""

    def __init__(
        self,
        mean=None,
        var=None,
        *,
        var_diag=None,
        mean_var=None,
        mean_var_diag=None,
    ):
        if var is None:
            mean, var = None, mean
        if callable(var) or callable(mean):
            # Lazy if *either* part is a thunk (a callable mean with an
            # eager variance must not store the function as the mean).
            self._mean = None
            self._construct_mean = mean if callable(mean) else (lambda: 0 if mean is None else mean)
            self._var = None
            self._construct_var = var if callable(var) else (lambda: var)
            self._var_diag = None
            self._construct_var_diag = var_diag
            self._construct_mean_var = mean_var
            self._construct_mean_var_diag = mean_var_diag
        else:
            self._mean = 0 if mean is None else mean
            self._construct_mean = None
            self._var = var
            self._construct_var = None
            self._var_diag = None
            self._construct_var_diag = None
            self._construct_mean_var = None
            self._construct_mean_var_diag = None
        self._mean_is_zero = None

    # -- resolution -------------------------------------------------------

    def _resolve_mean(self, construct_zeros):
        if self._mean is None:
            self._mean = self._construct_mean()
        if self._mean_is_zero is None:
            self._mean_is_zero = _is_zero(self._mean)
        if self._mean_is_zero and _is_symbolic_zero(self._mean) and construct_zeros:
            if self._var is None and (
                self._var_diag is not None
                or self._construct_var_diag is not None
            ):
                # Take shape/dtype from the cheap diagonal thunk so a
                # marginals-only query never materialises the full variance.
                vd = self.var_diag
                self._mean = jnp.zeros(vd.shape, dtype=vd.dtype)
            else:
                self._mean = jnp.zeros(
                    self._var_batch_shape() + (self.dim, 1), dtype=self.dtype
                )

    def _var_batch_shape(self):
        return as_matrix(self.var).batch_shape

    def _resolve_var(self):
        if self._var is None:
            self._var = self._construct_var()
        self._var = as_matrix(self._var)

    def _resolve_var_diag(self):
        if self._var_diag is None:
            if self._construct_var_diag is not None:
                self._var_diag = self._construct_var_diag()
            else:
                self._var_diag = diag_of(self.var)[..., :, None]

    # -- properties -------------------------------------------------------

    @property
    def mean(self):
        """Mean as a column vector."""
        self._resolve_mean(construct_zeros=True)
        return self._mean

    @property
    def mean_is_zero(self):
        self._resolve_mean(construct_zeros=False)
        return self._mean_is_zero

    @property
    def var(self):
        """Variance as a structured matrix."""
        self._resolve_var()
        return self._var

    @property
    def var_diag(self):
        """Diagonal of the variance as a column ``(..., n, 1)``."""
        self._resolve_var_diag()
        return self._var_diag

    @property
    def mean_var(self):
        if self._mean is not None or self._var is not None:
            return self.mean, self.var
        if self._construct_mean_var is not None:
            self._mean, self._var = self._construct_mean_var()
            self._resolve_mean(construct_zeros=True)
            self._resolve_var()
        return self.mean, self.var

    @property
    def dtype(self):
        return self.var.dtype

    @property
    def dim(self):
        return as_matrix(self.var).rows

    @property
    def m2(self):
        """Second moment."""
        mean = jnp.asarray(dense(self.mean))
        return add(self.var, matmul(mean, mean, tr_b=True))

    # -- marginals --------------------------------------------------------

    def marginals(self):
        """Marginal means and variances, never forming the full covariance
        when a diagonal fast path is available."""
        if self._mean is None and self._var_diag is None and (
            self._construct_mean_var_diag is not None
        ):
            self._mean, self._var_diag = self._construct_mean_var_diag()
            self._resolve_mean(construct_zeros=True)
        mean, var_diag = self.mean, self.var_diag
        mean = jnp.asarray(dense(mean)) if is_structured(mean) else jnp.asarray(mean)
        var_diag = (
            jnp.asarray(dense(var_diag))
            if is_structured(var_diag)
            else jnp.asarray(var_diag)
        )
        return (
            mean[..., 0] if mean.ndim >= 2 else mean,
            jnp.maximum(var_diag[..., 0] if var_diag.ndim >= 2 else var_diag, 0),
        )

    def marginal_credible_bounds(self):
        """Marginal means and central 95% credible bounds."""
        mean, var = self.marginals()
        error = 1.96 * jnp.sqrt(var)
        return mean, mean - error, mean + error

    def diagonalise(self):
        """Drop correlations: keep only the marginal variances."""
        return Normal(self.mean, Diagonal(jnp.asarray(dense(self.var_diag))[..., 0]))

    # -- densities --------------------------------------------------------

    def logpdf(self, x, mask=None):
        """Log-density of ``x`` (a column; extra trailing columns are treated
        as a batch of inputs, like the reference).

        ``mask`` (optional, boolean ``(n,)``): jit-safe missing-data
        handling — rows where ``mask`` is False are marginalised out, with
        static shapes throughout, so this works on traced inputs and on TPU.
        (The reference can only drop NaN rows host-side on concrete arrays,
        ``random.py:261-270``, and refuses batched missing data; the masked
        form here supports both.) Equivalent to ``logpdf`` of the
        sub-distribution over the observed rows."""
        x = jnp.asarray(x)
        if x.ndim == 0:
            x = x[None, None]
        elif x.ndim == 1:
            x = x[:, None]

        if mask is not None:
            return self._masked_logpdf(x, mask)

        # NaN-masked missing data: eager (concrete) inputs only, single
        # column, like the reference (`random.py:261-270`).
        if x.ndim == 2 and x.shape[1] == 1 and not isinstance(x, jax.core.Tracer):
            x_np = np.asarray(jax.device_get(x))
            available = ~np.isnan(x_np[:, 0])
            if not available.all():
                mean = jnp.asarray(dense(self.mean))[available]
                var = submatrix(self.var, available)
                return Normal(mean, var).logpdf(x[np.flatnonzero(available)])

        mean = self.mean
        mean = jnp.asarray(dense(mean)) if is_structured(mean) else jnp.asarray(mean)
        resid = x - mean
        logpdfs = -0.5 * (
            logdet(self.var)[..., None]
            + self.dim * _LOG_2_PI
            + iqf_diag(self.var, resid)
        )
        return logpdfs[..., 0] if logpdfs.shape[-1] == 1 else logpdfs

    def _masked_logpdf(self, x, mask):
        """Marginalise out rows where ``mask`` is False without changing any
        shape: zero the masked rows/columns of the covariance, put ones on
        their diagonal (so they contribute ``log 1 = 0`` to the logdet and
        nothing to the quadratic form), and zero the masked residuals.

        Structure is preserved wherever a closed form exists, so masking
        never forces an O(N^2) densification for the structured variances:
        Diagonal stays O(N); Woodbury (e.g. Bayesian linear regression
        with noise) and degenerate LowRank stay O(N r^2); a Kronecker
        variance with a *factorised* mask — ``mask=(mask_left,
        mask_right)``, i.e. grid missingness by rows/columns — stays at
        Kronecker cost. A Kronecker variance under an arbitrary
        (non-factorised) mask has no structured closed form (the observed
        submatrix of a Kronecker product is unstructured) and falls to the
        dense path below."""
        var = self.var
        dtype = x.dtype
        if isinstance(mask, tuple):
            from ..matrix import Kronecker

            if isinstance(var, Kronecker) and len(mask) == 2:
                return self._masked_logpdf_kron(x, mask[0], mask[1])
            m_full = jnp.asarray(mask[0])
            for part in mask[1:]:
                m_full = jnp.kron(m_full, jnp.asarray(part))
            mask = m_full
        m = jnp.asarray(mask).astype(dtype)
        mean = self.mean
        mean = jnp.asarray(dense(mean)) if is_structured(mean) else jnp.asarray(mean)
        resid = m[:, None] * jnp.nan_to_num(x - mean)
        if isinstance(var, Diagonal):
            masked = Diagonal(m * var.diag + (1.0 - m))
        elif isinstance(var, Woodbury):
            # Mask rows/columns of the low-rank factors and the diagonal —
            # the result is again a Woodbury, so logdet/iqf keep their
            # O(N r^2) closed forms (matrix-determinant lemma / Woodbury
            # identity) instead of densifying. The masked diagonal gets
            # ones at the marginalised rows, exactly like the dense path.
            lr = var.lr
            left = m[..., :, None] * lr.left
            right = None if lr.right is None else m[..., :, None] * lr.right
            masked = Woodbury(
                Diagonal(m * var.diag.diag + (1.0 - m)),
                LowRank(left, right, middle=lr.middle),
            )
        elif isinstance(var, LowRank):
            # Degenerate (rank-r) variance, e.g. a noiseless Bayesian-
            # linear-regression FDD. The dense path below would factorise
            # ``masked + eps I`` (the jitter makes the singular matrix
            # factorable); fold the same eps into a Woodbury diagonal
            # instead, so logdet/iqf keep the O(N r^2) closed forms on the
            # *identical* regularised matrix. Accuracy caveat: the
            # Woodbury-lemma quadratic form differences O(1/eps) terms, so
            # when the residual lies IN the low-rank range the absolute
            # error is ~(1/eps)*round-off — ~1e-4 in f64 (tested), but
            # O(10) in f32 at eps=1e-8. Degenerate-variance masked logpdf
            # is an f64 path; in f32, add explicit observation noise
            # (-> Woodbury with a real diagonal) as the reference's own
            # workflow does.
            from .. import config

            eps = jnp.asarray(config.jitter(dtype), dtype)
            left = m[..., :, None] * var.left
            right = None if var.right is None else m[..., :, None] * var.right
            masked = Woodbury(
                Diagonal(eps * m + (1.0 - m)),
                LowRank(left, right, middle=var.middle),
            )
        else:
            K = jnp.asarray(dense(var))
            masked = as_matrix(
                m[:, None] * m[None, :] * K + jnp.diag(1.0 - m)
            )
        n_obs = jnp.sum(m)
        logpdfs = -0.5 * (
            logdet(masked)[..., None]
            + n_obs * _LOG_2_PI
            + iqf_diag(masked, resid)
        )
        return logpdfs[..., 0] if logpdfs.shape[-1] == 1 else logpdfs

    def _masked_logpdf_kron(self, x, mask_a, mask_b):
        """Masked logpdf for a Kronecker variance ``A (x) B`` under a
        factorised mask ``kron(mask_a, mask_b)`` (grid missingness: whole
        rows/columns of the grid observed or missing).

        The observed submatrix is then itself a Kronecker product
        ``A_obs (x) B_obs``, so everything stays at Kronecker cost: mask
        each *factor* with the ones-on-diagonal trick (the masked factor is
        block-diagonal ``[A_obs, I]``, so its Kronecker inverse restricted
        to observed rows is exactly ``(A_obs (x) B_obs)^{-1}``), take the
        logdet per factor weighted by the *observed* counts
        (``logdet(A_obs (x) B_obs) = n_b_obs logdet(A_obs) +
        n_a_obs logdet(B_obs)`` — NOT the full-size Kronecker logdet), and
        run the quadratic form through the structured Kronecker solve."""
        from ..matrix import Kronecker

        var = self.var
        dtype = x.dtype
        ma = jnp.asarray(mask_a).astype(dtype)
        mb = jnp.asarray(mask_b).astype(dtype)
        m = jnp.kron(ma, mb)
        mean = self.mean
        mean = jnp.asarray(dense(mean)) if is_structured(mean) else jnp.asarray(mean)
        resid = m[:, None] * jnp.nan_to_num(x - mean)

        A = jnp.asarray(dense(var.left))
        B = jnp.asarray(dense(var.right))
        mA = as_matrix(ma[:, None] * ma[None, :] * A + jnp.diag(1.0 - ma))
        mB = as_matrix(mb[:, None] * mb[None, :] * B + jnp.diag(1.0 - mb))
        na_obs = jnp.sum(ma)
        nb_obs = jnp.sum(mb)
        ld = nb_obs * logdet(mA) + na_obs * logdet(mB)
        n_obs = na_obs * nb_obs
        logpdfs = -0.5 * (
            ld[..., None]
            + n_obs * _LOG_2_PI
            + iqf_diag(Kronecker(mA, mB), resid)
        )
        return logpdfs[..., 0] if logpdfs.shape[-1] == 1 else logpdfs

    def entropy(self):
        return 0.5 * (logdet(self.var) + self.dim * (_LOG_2_PI + 1))

    def kl(self, other):
        """KL divergence ``KL(self || other)``."""
        mean_diff = jnp.asarray(dense(other.mean)) - jnp.asarray(dense(self.mean))
        return 0.5 * (
            iqf_diag(other.var, mean_diff)[..., 0]
            + ratio(self.var, other.var)
            + logdet(other.var)
            - logdet(self.var)
            - self.dim
        )

    def w2(self, other):
        """2-Wasserstein distance."""
        var_root = root(self.var)
        inner = root(matmul3(var_root, other.var, var_root))
        var_part = trace(self.var) + trace(other.var) - 2 * trace(inner)
        mean_part = jnp.sum(
            (jnp.asarray(dense(self.mean)) - jnp.asarray(dense(other.mean))) ** 2
        )
        return jnp.sqrt(jnp.maximum(mean_part + var_part, 0))

    # -- sampling ---------------------------------------------------------

    def sample(self, *args, noise=None):
        """Sample from the distribution.

        Functional form: ``state, s = dist.sample(key[, num])`` with a
        ``jax.random`` key — returns a new key and the samples (the
        reference's functional-state variant, ``random.py:331-355``). Eager
        form: ``s = dist.sample([num])`` using the global RNG."""
        key = None
        if args and _is_key(args[0]):
            key, args = args[0], args[1:]
        num = int(args[0]) if args else 1
        if len(args) > 1:
            raise TypeError("sample() takes at most (key, num).")
        if key is not None:
            key, sub = jax.random.split(key)
            return key, self._sample(sub, num, noise)
        return self._sample(next_global_key(), num, noise)

    def _sample(self, key, num, noise):
        var = self.var
        if noise is not None:
            var = add(var, fill_diag(jnp.asarray(noise, dtype=self.dtype), self.dim))
        s = mat_sample(key, var, num=num)
        if not self.mean_is_zero:
            s = s + jnp.asarray(dense(self.mean))
        return s

    # -- affine arithmetic -------------------------------------------------

    def __add__(self, other):
        if isinstance(other, Normal):
            return Normal(
                jnp.asarray(dense(self.mean)) + jnp.asarray(dense(other.mean)),
                add(self.var, other.var),
            )
        if isinstance(other, Random):
            raise NotImplementedError(
                f"Cannot add a Normal and a {type(other).__name__}."
            )
        other = jnp.asarray(other)
        if other.ndim == 1:
            # The mean is a column (n, 1); a 1-D shift would broadcast to
            # (n, n) and silently corrupt the distribution.
            other = other[:, None]
        return Normal(jnp.asarray(dense(self.mean)) + other, self.var)

    def __mul__(self, other):
        if isinstance(other, (Normal, Random)):
            raise NotImplementedError("Cannot multiply two random variables.")
        if is_structured(other) or (
            hasattr(other, "ndim") and jnp.ndim(other) > 0
        ):
            raise NotImplementedError(
                "Can only multiply a Normal by a scalar; use lmatmul/rmatmul "
                "for matrix transforms."
            )
        return Normal(
            jnp.asarray(dense(self.mean)) * other,
            scale(self.var, other * other),
        )

    def lmatmul(self, a):
        """Distribution of ``a @ self``."""
        return Normal(
            matmul(a, jnp.asarray(dense(self.mean))),
            matmul3(a, self.var, a, tr_c=True),
        )

    def rmatmul(self, a):
        """Distribution of ``a^T @ self``."""
        return Normal(
            matmul(a, jnp.asarray(dense(self.mean)), tr_a=True),
            matmul3(a, self.var, a, tr_a=True),
        )

    def cast(self, dtype):
        """Cast mean and variance to ``dtype`` (the reference's
        ``B.cast(dtype, dist)`` hook, ``random.py:401-403``)."""
        import jax

        mean = jnp.asarray(dense(self.mean)).astype(dtype)
        var = jax.tree.map(lambda l: l.astype(dtype), self.var)
        return Normal(mean, var)

    # -- display ----------------------------------------------------------

    def __str__(self):
        # Indented key-value block, the reference's rendering shape
        # (``random.py:119-132`` via ``wbml.util.indented_kv``). Lazy
        # thunks show as "unresolved" — printing must not force them.
        from ..utils.display import indented_kv

        mean = "unresolved" if self._mean is None else str(self._mean)
        var = "unresolved" if self._var is None else str(self._var)
        return (
            "<Normal:\n"
            + indented_kv("mean", mean, suffix=",\n")
            + indented_kv("var", var, suffix=">")
        )

    def __repr__(self):
        from ..utils.display import indented_kv

        mean = "unresolved" if self._mean is None else repr(self._mean)
        var = "unresolved" if self._var is None else repr(self._var)
        return (
            "<Normal:\n"
            + indented_kv("mean", mean, suffix=",\n")
            + indented_kv("var", var, suffix=">")
        )


def _is_zero(mean):
    if isinstance(mean, (int, float)) and mean == 0:
        return True
    if isinstance(mean, Zero):
        return True
    if isinstance(mean, (np.ndarray, jax.Array)) and not isinstance(
        mean, jax.core.Tracer
    ):
        return bool((np.asarray(mean) == 0).all())
    return False


def _is_symbolic_zero(mean):
    return (isinstance(mean, (int, float)) and mean == 0) or isinstance(mean, Zero)
