"""Structured-matrix pytree types.

TPU-native replacement for the ``matrix`` package the reference delegates all
numerics to (imported at ``/root/reference/stheno/model/fdd.py:3``,
``/root/reference/stheno/random.py:6``). Structure lives in *static* pytree
aux-data so that ``jax.jit`` specialises on it without retrace storms; numeric
payloads are pytree leaves, so every structured matrix can flow through
``jit``/``grad``/``vmap``/``shard_map``.

All types support leading batch dimensions on their leaves.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "AbstractMatrix",
    "Dense",
    "Diagonal",
    "Zero",
    "Constant",
    "LowRank",
    "Woodbury",
    "Kronecker",
    "LowerTriangular",
    "UpperTriangular",
    "is_structured",
]


class AbstractMatrix:
    """Base class for structured matrices."""

    # Subclasses must define: shape (full, incl. batch), dtype.

    @property
    def rows(self):
        return self.shape[-2]

    @property
    def cols(self):
        return self.shape[-1]

    @property
    def batch_shape(self):
        return self.shape[:-2]

    # Operator sugar delegates to ops (imported lazily to avoid cycles).

    def __add__(self, other):
        from .ops import add

        return add(self, other)

    def __radd__(self, other):
        from .ops import add

        return add(other, self)

    def __sub__(self, other):
        from .ops import add, scale

        return add(self, scale(other, -1))

    def __rsub__(self, other):
        from .ops import add, scale

        return add(other, scale(self, -1))

    def __mul__(self, other):
        from .ops import multiply

        return multiply(self, other)

    def __rmul__(self, other):
        from .ops import multiply

        return multiply(other, self)

    def __neg__(self):
        from .ops import scale

        return scale(self, -1)

    def __matmul__(self, other):
        from .ops import matmul

        return matmul(self, other)

    def __rmatmul__(self, other):
        from .ops import matmul

        return matmul(other, self)

    @property
    def T(self):
        from .ops import transpose

        return transpose(self)

    def dense(self):
        from .ops import dense

        return dense(self)

    def __repr__(self):
        return f"<{type(self).__name__} {'x'.join(map(str, self.shape))} {self.dtype}>"


def is_structured(a):
    return isinstance(a, AbstractMatrix)


def _register(cls, leaf_names, aux_names=()):
    """Register ``cls`` as a pytree with ``leaf_names`` attributes as leaves."""

    def flatten(obj):
        return (
            tuple(getattr(obj, n) for n in leaf_names),
            tuple(getattr(obj, n) for n in aux_names),
        )

    def unflatten(aux, leaves):
        obj = object.__new__(cls)
        for n, v in zip(leaf_names, leaves):
            object.__setattr__(obj, n, v)
        for n, v in zip(aux_names, aux):
            object.__setattr__(obj, n, v)
        object.__setattr__(obj, "_cache", {})
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


class Dense(AbstractMatrix):
    """A dense matrix ``(..., m, n)``."""

    def __init__(self, mat):
        self.mat = jnp.asarray(mat)
        if self.mat.ndim < 2:
            raise ValueError(f"Dense requires rank >= 2, got {self.mat.ndim}.")
        self._cache = {}

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype


_register(Dense, ("mat",))


class Diagonal(AbstractMatrix):
    """A diagonal matrix represented by its diagonal ``(..., n)``."""

    def __init__(self, diag):
        self.diag = jnp.asarray(diag)
        if self.diag.ndim < 1:
            raise ValueError("Diagonal requires rank >= 1 diagonal.")
        self._cache = {}

    @property
    def shape(self):
        n = self.diag.shape[-1]
        return self.diag.shape[:-1] + (n, n)

    @property
    def dtype(self):
        return self.diag.dtype


_register(Diagonal, ("diag",))


class Zero(AbstractMatrix):
    """An all-zeros matrix. Shape and dtype are static aux-data; no leaves."""

    def __init__(self, dtype, rows, cols=None):
        self._dtype = jnp.dtype(dtype)
        self._rows = int(rows)
        self._cols = int(rows if cols is None else cols)
        self._cache = {}

    @property
    def shape(self):
        return (self._rows, self._cols)

    @property
    def dtype(self):
        return self._dtype


_register(Zero, (), ("_dtype", "_rows", "_cols"))


class Constant(AbstractMatrix):
    """A constant matrix: every entry equals ``const`` (a scalar, possibly
    batched ``(...,)``)."""

    def __init__(self, const, rows, cols=None):
        self.const = jnp.asarray(const)
        self._rows = int(rows)
        self._cols = int(rows if cols is None else cols)
        self._cache = {}

    @property
    def shape(self):
        return self.const.shape + (self._rows, self._cols)

    @property
    def dtype(self):
        return self.const.dtype


_register(Constant, ("const",), ("_rows", "_cols"))


class LowRank(AbstractMatrix):
    """``left @ middle @ right.T`` with ``left (..., m, r)``,
    ``middle (..., r, r)`` (default: identity), ``right (..., n, r)``
    (default: ``left``, i.e. symmetric)."""

    def __init__(self, left, right=None, middle=None):
        self.left = jnp.asarray(left)
        self.right = None if right is None else jnp.asarray(right)
        self.middle = None if middle is None else jnp.asarray(middle)
        self._cache = {}

    @property
    def rank(self):
        return self.left.shape[-1]

    @property
    def sym(self):
        return self.right is None

    @property
    def _right(self):
        return self.left if self.right is None else self.right

    @property
    def shape(self):
        batch = jnp.broadcast_shapes(
            self.left.shape[:-2], self._right.shape[:-2]
        )
        return batch + (self.left.shape[-2], self._right.shape[-2])

    @property
    def dtype(self):
        return self.left.dtype


def _lr_flatten(obj):
    return (obj.left, obj.right, obj.middle), ()


def _lr_unflatten(aux, leaves):
    obj = object.__new__(LowRank)
    obj.left, obj.right, obj.middle = leaves
    obj._cache = {}
    return obj


jax.tree_util.register_pytree_node(LowRank, _lr_flatten, _lr_unflatten)


class Woodbury(AbstractMatrix):
    """``diag + lr``: a diagonal plus a low-rank matrix. The closed-form
    inverse/logdet fast paths (Woodbury identity, matrix-determinant lemma)
    are what make e.g. Bayesian linear regression with a ``Linear`` kernel
    scale linearly in N (cf. ``readme_example6_blr.py``)."""

    def __init__(self, diag: "Diagonal", lr: "LowRank"):
        if not isinstance(diag, Diagonal) or not isinstance(lr, LowRank):
            raise TypeError("Woodbury requires (Diagonal, LowRank).")
        if diag.shape[-2:] != lr.shape[-2:]:
            raise ValueError(
                f"Woodbury shape mismatch: Diagonal is {diag.shape[-2:]}, "
                f"LowRank is {lr.shape[-2:]}. (Note LowRank's signature is "
                f"LowRank(left, right=None, middle=None); a square `middle` "
                f"must be passed by keyword.)"
            )
        self.diag = diag
        self.lr = lr
        self._cache = {}

    @property
    def shape(self):
        batch = jnp.broadcast_shapes(self.diag.batch_shape, self.lr.batch_shape)
        return batch + self.diag.shape[-2:]

    @property
    def dtype(self):
        return self.diag.dtype


_register(Woodbury, ("diag", "lr"))


class Kronecker(AbstractMatrix):
    """``kron(left, right)`` of two structured matrices."""

    def __init__(self, left, right):
        self.left = left
        self.right = right
        self._cache = {}

    @property
    def shape(self):
        batch = jnp.broadcast_shapes(self.left.batch_shape, self.right.batch_shape)
        return batch + (
            self.left.rows * self.right.rows,
            self.left.cols * self.right.cols,
        )

    @property
    def dtype(self):
        return self.left.dtype


_register(Kronecker, ("left", "right"))


class LowerTriangular(AbstractMatrix):
    """A lower-triangular dense matrix (e.g. a Cholesky factor)."""

    def __init__(self, mat):
        self.mat = jnp.asarray(mat)
        self._cache = {}

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype


_register(LowerTriangular, ("mat",))


class UpperTriangular(AbstractMatrix):
    """An upper-triangular dense matrix."""

    def __init__(self, mat):
        self.mat = jnp.asarray(mat)
        self._cache = {}

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype


_register(UpperTriangular, ("mat",))
