"""The ``Measure``: a joint Gaussian measure over a growing set of processes.

This is the DSL compiler frontend: a registry of processes with lazily-built
mean/cross-kernel tables and the twelve algebra rules (sum, product by
constant/function/GP via moment matching, shift, stretch, select, transform,
derivative, cross), conditioning, joint sampling, and joint logpdf — the
semantics of ``/root/reference/stheno/model/measure.py``. All graph building
is host-side Python executed at trace time; the numerics it emits are pure
jnp and jit/grad-safe."""

import numpy as np

import jax
import jax.numpy as jnp

from ..dist import Random
from ..dist.normal import _is_key
from ..kernels import TensorProductKernel, ZeroKernel
from ..kernels.kernel import Kernel
from ..kernels.mean import Mean
from ..lazy import LazyMatrix, LazyVector
from ..mo import (
    AmbiguousDimensionalityKernel as ADK,
    MultiOutputKernel as MOK,
    MultiOutputMean as MOM,
    num_elements,
)
from .fdd import FDD
from .gp import GP, assert_same_measure
from .observations import (
    AbstractObservations,
    AbstractPseudoObservations,
    Observations,
    combine,
)

__all__ = ["Measure"]


def _transpose_kernel(k):
    """Swap the arguments of a kernel: the default right rule
    (reference ``measure.py:110-112`` uses `reversed`)."""
    from ..kernels.kernel import _SwappedKernel

    return _SwappedKernel(k)


class Measure:
    """A GP model: processes plus lazy mean vector and kernel matrix."""

    default = None

    def __init__(self):
        self.ps = []
        self._pids = set()
        self.means = LazyVector()
        self.kernels = LazyMatrix()
        self._gps_by_name = {}
        self._names_by_gp = {}
        self._prev_default = None

    # -- context-managed default measure (reference measure.py:49-55) -----

    def __enter__(self):
        self._prev_default = Measure.default
        Measure.default = self
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        Measure.default = self._prev_default

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- naming -----------------------------------------------------------

    def __getitem__(self, key):
        if isinstance(key, str):
            return self._gps_by_name[key]
        return self._names_by_gp[id(key)]

    def name(self, p, name):
        """Assign a unique name to a process."""
        if id(p) in self._names_by_gp:
            del self._gps_by_name[self._names_by_gp[id(p)]]
            del self._names_by_gp[id(p)]
        if name in self._gps_by_name:
            raise RuntimeError(
                f'Name "{name}" for "{p}" already taken by "{self[name]}".'
            )
        self._gps_by_name[name] = p
        self._names_by_gp[id(p)] = name

    # -- graph update -----------------------------------------------------

    def _add_p(self, p):
        self.ps.append(p)
        self._pids.add(id(p))
        p._measures.append(self)

    def _update(self, p, mean, kernel, left_rule, right_rule=None):
        self.means[p] = mean
        self.kernels[p] = kernel
        self.kernels.add_left_rule(id(p), self._pids, left_rule)
        if right_rule:
            self.kernels.add_right_rule(id(p), self._pids, right_rule)
        else:
            self.kernels.add_right_rule(
                id(p), self._pids, lambda i: _transpose_kernel(self.kernels[p, i])
            )
        # Add `p` only now: the rules above must capture the pid set
        # *without* `p`.
        self._add_p(p)
        return p

    def add_gp(self, mean, kernel, left_rule, right_rule=None):
        """Escape hatch: add a hand-rolled process with explicit cross-kernel
        rules (reference ``measure.py:119-137``).

        Deliberate divergence: the reference accepts ``right_rule`` but drops
        it (``measure.py:136`` hardcodes ``right_rule=None``); we honor it.
        ``None`` still gives the default transpose rule."""
        p = GP()
        self._update(p, mean, kernel, left_rule, right_rule)
        return p

    def add_independent_gp(self, p, mean, kernel):
        """Register ``p`` as independent of everything already in the measure."""
        self.means[p] = mean
        self.kernels[p] = kernel
        self.kernels.add_left_rule(id(p), self._pids, lambda j: ZeroKernel())
        self.kernels.add_right_rule(id(p), self._pids, lambda i: ZeroKernel())
        self._add_p(p)
        return p

    # -- re-projection ----------------------------------------------------

    def __call__(self, obj):
        """Project a GP or FDD into this measure."""
        if isinstance(obj, FDD):
            return self(obj.p)(obj.x, obj.noise)
        p = obj
        p_copy = GP()
        return self._update(
            p_copy,
            self.means[p],
            self.kernels[p],
            lambda j: self.kernels[p, j],
            lambda i: self.kernels[i, p],
        )

    # -- algebra ----------------------------------------------------------

    def sum(self, p_sum, obj1, obj2):
        """``p_sum = obj1 + obj2`` where at least one is a GP of this measure."""
        if isinstance(obj1, GP) and isinstance(obj2, GP):
            assert_same_measure(obj1, obj2)
            p1, p2 = obj1, obj2
            return self._update(
                p_sum,
                self.means[p1] + self.means[p2],
                (
                    self.kernels[p1]
                    + self.kernels[p2]
                    + self.kernels[p1, p2]
                    + self.kernels[p2, p1]
                ),
                lambda j: self.kernels[p1, j] + self.kernels[p2, j],
            )
        if not isinstance(obj1, GP):
            obj1, obj2 = obj2, obj1
        p, other = obj1, obj2
        if isinstance(other, Random):
            # Mirrors the reference's dispatch miss: a GP can only be summed
            # with numbers, functions, or GPs of the same measure
            # (reference ``tests/model/test_gp.py:119-123``).
            raise TypeError(
                f"Cannot add a GP and a {type(other).__name__}."
            )
        return self._update(
            p_sum,
            self.means[p] + other,
            self.kernels[p],
            lambda j: self.kernels[p, j],
        )

    def mul(self, p_mul, obj1, obj2):
        """``p_mul = obj1 * obj2``. GP x GP uses the moment-matching
        approximation of the reference (``measure.py:253-269``)."""
        if isinstance(obj1, GP) and isinstance(obj2, GP):
            assert_same_measure(obj1, obj2)
            p1, p2 = obj1, obj2
            term1 = self.sum(
                GP(),
                self.mul(GP(), _mean_fn(self, p1), p2),
                self.mul(GP(), p1, _mean_fn(self, p2)),
            )
            term2 = self.add_independent_gp(
                GP(),
                -self.means[p1] * self.means[p2],
                (
                    self.kernels[p1] * self.kernels[p2]
                    + self.kernels[p1, p2] * self.kernels[p2, p1]
                ),
            )
            return self.sum(p_mul, term1, term2)
        if not isinstance(obj1, GP):
            obj1, obj2 = obj2, obj1
        p, other = obj1, obj2
        if isinstance(other, Random):
            raise TypeError(
                f"Cannot multiply a GP and a {type(other).__name__}."
            )
        if callable(other) and not isinstance(other, (Kernel, Mean)):
            f = other
            return self._update(
                p_mul,
                f * self.means[p],
                f * self.kernels[p],
                lambda j: TensorProductKernel(f, _one_fn) * self.kernels[p, j],
            )
        return self._update(
            p_mul,
            self.means[p] * other,
            self.kernels[p] * other**2,
            lambda j: self.kernels[p, j] * other,
        )

    def shift(self, p_shifted, p, shift):
        return self._update(
            p_shifted,
            self.means[p].shift(shift),
            self.kernels[p].shift(shift),
            lambda j: self.kernels[p, j].shift(shift, 0),
        )

    def stretch(self, p_stretched, p, stretch):
        return self._update(
            p_stretched,
            self.means[p].stretch(stretch),
            self.kernels[p].stretch(stretch),
            lambda j: self.kernels[p, j].stretch(stretch, 1),
        )

    def select(self, p_selected, p, *dims):
        return self._update(
            p_selected,
            self.means[p].select(dims),
            self.kernels[p].select(dims),
            lambda j: self.kernels[p, j].select(dims, None),
        )

    def transform(self, p_transformed, p, f):
        return self._update(
            p_transformed,
            self.means[p].transform(f),
            self.kernels[p].transform(f),
            lambda j: self.kernels[p, j].transform(f, None),
        )

    def diff(self, p_diff, p, dim=0):
        return self._update(
            p_diff,
            self.means[p].diff(dim),
            self.kernels[p].diff(dim),
            lambda j: self.kernels[p, j].diff(dim, None),
        )

    def cross(self, p_cross, *ps):
        """Cartesian product process (reference ``measure.py:403-423``)."""
        mok = MOK(self, *ps)
        return self._update(
            p_cross,
            MOM(self, *ps),
            mok,
            # The cross rule transforms inputs into FDD tags, which hides the
            # dimensionality — wrap in ADK.
            lambda j: ADK(mok.transform(None, lambda y: FDD(j, y))),
        )

    # -- conditioning -----------------------------------------------------

    def condition(self, *args):
        """Condition on observations, returning the posterior measure."""
        if len(args) == 1 and isinstance(args[0], AbstractObservations):
            obs = args[0]
        else:
            obs = Observations(*args)

        posterior = Measure()
        posterior.ps = list(self.ps)
        posterior._pids = set(self._pids)
        posterior.means.add_rule(
            posterior._pids, lambda i: obs.posterior_mean(self, i)
        )
        posterior.kernels.add_rule(
            posterior._pids, lambda i, j: obs.posterior_kernel(self, i, j)
        )
        for p in posterior.ps:
            p._measures.append(posterior)
        return posterior

    def __or__(self, args):
        if isinstance(args, tuple):
            return self.condition(*args)
        return self.condition(args)

    # -- sampling ---------------------------------------------------------

    def sample(self, *args):
        """Sample processes jointly.

        Functional form ``state, *samples = m.sample(key[, n], *fdds)``;
        eager form ``samples = m.sample([n,] *fdds)`` with the global RNG
        (squeezed, like the reference ``measure.py:425-461``)."""
        key = None
        if args and _is_key(args[0]):
            key, args = args[0], args[1:]
        n = 1
        if args and isinstance(args[0], (int, np.integer)):
            n, args = int(args[0]), args[1:]
        fdds = args
        if not fdds or not all(isinstance(f, FDD) for f in fdds):
            raise ValueError("Give FDDs to sample.")

        functional = key is not None
        if not functional:
            from ..dist.rng import next_global_key

            key = next_global_key()

        # Sample under *this* measure.
        key, sample = self(combine(*fdds)).sample(key, n)

        lengths = [num_elements(fdd) for fdd in fdds]
        i, samples = 0, []
        for length in lengths:
            samples.append(sample[..., i : i + length, :])
            i += length

        if functional:
            return (key,) + tuple(samples)
        if len(samples) == 1:
            return samples[0]
        return tuple(samples)

    # -- densities --------------------------------------------------------

    def logpdf(self, *args):
        """Joint log-density of observation pairs; for pseudo-observations
        this is the ELBO (reference ``measure.py:463-489``)."""
        if len(args) == 1 and isinstance(args[0], AbstractPseudoObservations):
            return args[0].elbo(self)
        if len(args) == 1 and isinstance(args[0], Observations):
            return self.logpdf(args[0].fdd, args[0].y)
        if len(args) == 2 and isinstance(args[0], FDD):
            fdd, y = args
        elif all(isinstance(a, (tuple, list)) for a in args):
            fdd, y = combine(*[tuple(a) for a in args])
        else:
            raise ValueError("Give (fdd, y) or pairs of observations.")
        return self(fdd).logpdf(y)


def _mean_fn(measure, p):
    """The mean of ``p`` as a plain function (for the moment-matching
    product)."""
    mean = measure.means[p]

    def f(x):
        from ..kernels import mean_eval

        return mean_eval(mean, x)

    return f


def _one_fn(x):
    x = jnp.asarray(x)
    shape = x.shape[:-1] if x.ndim >= 2 else x.shape
    return jnp.ones(shape + (1,), dtype=x.dtype)
