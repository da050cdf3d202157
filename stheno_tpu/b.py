"""LAB-compatible ``B`` namespace.

The reference re-exports its backend-generic op namespace as ``B``
(``/root/reference/stheno/__init__.py:4``: ``import lab as B``), and its
README, examples, and tests drive the library through ``B.*`` calls and the
``B.epsilon`` jitter knob. This module recreates the exact ``B.*`` surface
stheno exercises (the grep'd op list in SURVEY.md §2.9) on top of the
structured-matrix layer and ``jax.numpy``, so reference user code like

    from stheno_tpu import B
    B.epsilon = 1e-10
    chol = B.cholesky(B.dense(k(x)))

ports unchanged. It is a compatibility shim for *that* surface, not a full
LAB re-implementation; new code should call ``stheno_tpu.matrix`` /
``jax.numpy`` directly.
"""

import math
import sys
import types

import numpy as _np

import jax
import jax.numpy as jnp

from . import config
from .dist.rng import next_global_key, set_global_key
from .kernels.util import uprank as _uprank
from .matrix import ops as _ops
from .matrix.types import (
    AbstractMatrix,
    Diagonal,
    Zero,
    is_structured,
)

__all__ = ["B"]


def _arr(a):
    return _ops.dense(a) if is_structured(a) else jnp.asarray(a)


class _BNamespace(types.ModuleType):
    """Module-typed so ``from stheno_tpu import B; B.epsilon = 1e-10``
    works exactly like the reference's mutable module global."""

    # -- config ------------------------------------------------------------
    @property
    def epsilon(self):
        eps = config.epsilon
        return config.jitter(jnp.float64) if eps is None else eps

    @epsilon.setter
    def epsilon(self, value):
        config.set_epsilon(value)

    # -- types -------------------------------------------------------------
    Numeric = (int, float, complex, _np.ndarray, jax.Array)
    Int = (int, _np.integer)
    DType = (type, _np.dtype)
    RandomState = jax.Array

    # -- constants ---------------------------------------------------------
    pi = math.pi
    log_2_pi = math.log(2.0 * math.pi)
    nan = float("nan")

    # -- structure ---------------------------------------------------------
    dense = staticmethod(_ops.dense)
    diag = staticmethod(_ops.diag)
    block = staticmethod(_ops.block)
    block_diag = staticmethod(_ops.block_diag)
    submatrix = staticmethod(_ops.submatrix)
    fill_diag = staticmethod(_ops.fill_diag)

    # -- linalg ------------------------------------------------------------
    cholesky = staticmethod(_ops.cholesky)
    chol = staticmethod(_ops.cholesky)
    solve = staticmethod(_ops.solve)
    iqf = staticmethod(_ops.iqf)
    iqf_diag = staticmethod(_ops.iqf_diag)
    logdet = staticmethod(_ops.logdet)
    ratio = staticmethod(_ops.ratio)
    root = staticmethod(_ops.root)
    matmul_diag = staticmethod(_ops.matmul_diag)

    @staticmethod
    def matmul(a, b, c=None, tr_a=False, tr_b=False, tr_c=False):
        """Two- or three-matrix product with transpose flags — LAB's
        ``B.matmul(a, var, a, tr_c=True)`` pattern
        (``/root/reference/stheno/random.py:386``) included."""
        if c is not None:
            if tr_b:
                b = _BNamespace.transpose(b)
            return _ops.matmul3(a, b, c, tr_a=tr_a, tr_c=tr_c)
        return _ops.matmul(a, b, tr_a=tr_a, tr_b=tr_b)

    mm = matmul
    matmul3 = staticmethod(_ops.matmul3)

    @staticmethod
    def trace(a):
        return (
            _ops.trace(a)
            if is_structured(a)
            else jnp.trace(jnp.asarray(a), axis1=-2, axis2=-1)
        )

    @staticmethod
    def transpose(a):
        return (
            _ops.transpose(a)
            if is_structured(a)
            else jnp.swapaxes(jnp.asarray(a), -1, -2)
        )

    t = transpose

    # -- arithmetic / elementwise -------------------------------------------
    @staticmethod
    def add(a, b):
        if is_structured(a) or is_structured(b):
            return _ops.add(a, b)
        return jnp.add(a, b)

    @staticmethod
    def subtract(a, b):
        if is_structured(a) or is_structured(b):
            return _ops.add(a, _ops.scale(b, -1.0))
        return jnp.subtract(a, b)

    @staticmethod
    def multiply(a, b):
        if is_structured(a) or is_structured(b):
            return _ops.multiply(a, b)
        return jnp.multiply(jnp.asarray(a), jnp.asarray(b))

    @staticmethod
    def outer(a, b=None):
        b = a if b is None else b
        a, b = _uprank(jnp.asarray(a)), _uprank(jnp.asarray(b))
        return a @ jnp.swapaxes(b, -1, -2)

    # -- distances (LAB's pairwise/elementwise ops, the building blocks of
    # mlkernels-style user kernels) ------------------------------------------
    @staticmethod
    def pw_dists2(x, y=None):
        from .kernels.kernel import pw_dists2

        x = _uprank(jnp.asarray(x))
        y = x if y is None else _uprank(jnp.asarray(y))
        return pw_dists2(x, y)

    @staticmethod
    def pw_dists(x, y=None):
        return jnp.sqrt(jnp.maximum(_BNamespace.pw_dists2(x, y), 1e-30))

    @staticmethod
    def ew_dists2(x, y):
        from .kernels.kernel import ew_dists2

        return ew_dists2(_uprank(jnp.asarray(x)), _uprank(jnp.asarray(y)))

    @staticmethod
    def ew_dists(x, y):
        return jnp.sqrt(jnp.maximum(_BNamespace.ew_dists2(x, y), 1e-30))

    @staticmethod
    def pw_sums2(x, y=None):
        from .kernels.kernel import pw_sums2

        x = _uprank(jnp.asarray(x))
        y = x if y is None else _uprank(jnp.asarray(y))
        return pw_sums2(x, y)

    @staticmethod
    def pw_sums(x, y=None):
        return jnp.sqrt(jnp.maximum(_BNamespace.pw_sums2(x, y), 1e-30))

    @staticmethod
    def ew_sums2(x, y):
        from .kernels.kernel import ew_sums2

        return ew_sums2(_uprank(jnp.asarray(x)), _uprank(jnp.asarray(y)))

    @staticmethod
    def ew_sums(x, y):
        return jnp.sqrt(jnp.maximum(_BNamespace.ew_sums2(x, y), 1e-30))

    maximum = staticmethod(jnp.maximum)
    sqrt = staticmethod(jnp.sqrt)
    exp = staticmethod(jnp.exp)
    log = staticmethod(jnp.log)
    sum = staticmethod(jnp.sum)
    all = staticmethod(jnp.all)
    isnan = staticmethod(jnp.isnan)
    concat = staticmethod(lambda *xs, axis=0: jnp.concatenate(xs, axis=axis))
    stack = staticmethod(lambda *xs, axis=0: jnp.stack(xs, axis=axis))
    squeeze = staticmethod(jnp.squeeze)

    @staticmethod
    def take(a, indices_or_mask, axis=0):
        a = jnp.asarray(a)
        idx = jnp.asarray(indices_or_mask)
        if idx.dtype == jnp.bool_:
            # Boolean masks need concrete shapes: mirror the reference's
            # host-side NaN-row dropping (B.jit_to_numpy + B.take).
            idx = _np.flatnonzero(_np.asarray(idx))
        return jnp.take(a, idx, axis=axis)

    # -- shaping / dtype -----------------------------------------------------
    uprank = staticmethod(_uprank)

    @staticmethod
    def shape(a, *dims):
        s = a.shape if hasattr(a, "shape") else jnp.shape(a)
        if not dims:
            return s
        if len(dims) == 1:
            return s[dims[0]]
        return tuple(s[d] for d in dims)

    shape_matrix = staticmethod(_ops.shape_matrix)

    @staticmethod
    def rank(a):
        if isinstance(a, AbstractMatrix):
            return len(a.shape)
        return jnp.ndim(a)

    @staticmethod
    def is_scalar(a):
        if isinstance(a, AbstractMatrix):
            return False
        return jnp.ndim(a) == 0

    @staticmethod
    def dtype(*args):
        """dtype of one value, or the promoted dtype of several (LAB's
        multi-arg form, e.g. ``B.dtype(dist.mean, dist.var)``)."""
        def one(a):
            if isinstance(a, AbstractMatrix) or hasattr(a, "dtype"):
                return a.dtype
            return jnp.result_type(a)

        if len(args) == 1:
            return one(args[0])
        return jnp.result_type(*(one(a) for a in args))

    @staticmethod
    def dtype_float(a):
        dt = _BNamespace.dtype(a)
        return dt if jnp.issubdtype(dt, jnp.floating) else jnp.float64

    issubdtype = staticmethod(jnp.issubdtype)

    @staticmethod
    def cast(dtype, a):
        if hasattr(a, "cast"):  # Normal and friends
            return a.cast(dtype)
        if isinstance(a, Zero):
            # Zero's dtype is static aux-data (no leaves for tree.map).
            return Zero(dtype, a.rows, a.cols)
        if is_structured(a):
            return jax.tree.map(lambda leaf: leaf.astype(dtype), a)
        return jnp.asarray(a).astype(dtype)

    @staticmethod
    def to_numpy(a):
        return _np.asarray(_arr(a))

    jit_to_numpy = to_numpy

    # -- constructors --------------------------------------------------------
    @staticmethod
    def zeros(dtype, *shape):
        return jnp.zeros(shape, dtype)

    @staticmethod
    def ones(dtype, *shape):
        return jnp.ones(shape, dtype)

    @staticmethod
    def zero(dtype_or_ref):
        # LAB accepts a dtype or a reference tensor (e.g. B.zero(var_diag),
        # reference random.py:226).
        dt = getattr(dtype_or_ref, "dtype", dtype_or_ref)
        return jnp.asarray(0, dt)

    @staticmethod
    def one(dtype_or_ref):
        dt = getattr(dtype_or_ref, "dtype", dtype_or_ref)
        return jnp.asarray(1, dt)

    @staticmethod
    def eye(a):
        """Identity matching the reference tensor's trailing (possibly
        rectangular) shape and batch dims, like LAB's ``B.eye``."""
        if not hasattr(a, "shape"):
            return jnp.eye(int(a))
        rows, cols = a.shape[-2], a.shape[-1]
        out = jnp.eye(rows, cols, dtype=a.dtype)
        if len(a.shape) > 2:
            out = jnp.broadcast_to(out, tuple(a.shape[:-2]) + (rows, cols))
        return out

    @staticmethod
    def linspace(dtype, start, stop, num):
        return jnp.linspace(start, stop, num, dtype=dtype)

    # -- RNG -----------------------------------------------------------------
    @staticmethod
    def create_random_state(_dtype=None, seed=0):
        return jax.random.PRNGKey(seed)

    @staticmethod
    def global_random_state(_dtype=None):
        return next_global_key()

    @staticmethod
    def set_global_random_state(state):
        set_global_key(state)

    @staticmethod
    def randn(state, dtype, *shape):
        state, sub = jax.random.split(state)
        return state, jax.random.normal(sub, shape, dtype)

    @staticmethod
    def sample(state, var, num=1):
        """Draw ``num`` joint samples from ``N(0, var)``; mirrors the matrix
        package's ``B.sample`` (Cholesky times standard normals)."""
        state, sub = jax.random.split(state)
        return state, _ops.sample(sub, var, num)

    # -- fallback -------------------------------------------------------------
    def __getattr__(self, name):
        # LAB proxies the full numpy namespace; anything not explicitly
        # shimmed above falls back to ``jax.numpy`` (B.sin, B.abs, B.mean,
        # B.where, ...) so generic reference user code ports unchanged.
        if not name.startswith("_"):
            try:
                return getattr(jnp, name)
            except AttributeError:
                pass
        raise AttributeError(f"B namespace has no op {name!r}.")


def _install():
    mod = _BNamespace("stheno_tpu.B")
    mod.__doc__ = __doc__
    mod.Diagonal = Diagonal
    sys.modules["stheno_tpu.B"] = mod
    return mod


B = _install()
