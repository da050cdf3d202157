"""Constrained-parameter containers.

The reference's examples use the external ``varz`` package (``Vars`` with
``positive``/``bounded`` transforms — ``readme_example12_optimisation_varz.py``,
``readme_example3_parametric.py``). This is the JAX-native equivalent: latent
parameters live in a flat dict pytree; constraints are static bijections
(exp for positivity, scaled logistic for bounds), so the latent vector can be
optimised with any gradient method and the container stays jit/vmap-friendly."""

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["Vars"]


class _Bijection:
    def forward(self, z):  # latent -> constrained
        raise NotImplementedError

    def inverse(self, x):  # constrained -> latent
        raise NotImplementedError


class _Identity(_Bijection):
    def forward(self, z):
        return z

    def inverse(self, x):
        return x


class _Exp(_Bijection):
    def forward(self, z):
        return jnp.exp(z)

    def inverse(self, x):
        return jnp.log(x)


class _Logistic(_Bijection):
    def __init__(self, lower, upper):
        self.lower, self.upper = lower, upper

    def forward(self, z):
        return self.lower + (self.upper - self.lower) / (1 + jnp.exp(-z))

    def inverse(self, x):
        p = (x - self.lower) / (self.upper - self.lower)
        return jnp.log(p) - jnp.log1p(-p)


class Vars:
    """A container of named, optionally-constrained parameters.

    ``vs.positive(init, name=...)`` / ``vs.bounded(...)`` / ``vs.unbounded(...)``
    register a parameter on first call and return its current (constrained)
    value on every call — the same get-or-create semantics as varz, so model
    functions can both build and re-read parameters."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype
        self._latent = {}
        self._bijections = {}
        self._counter = 0

    # -- registration / access -------------------------------------------

    def _get(self, name, init, bijection, shape):
        if name is None:
            # Positional identity for unnamed parameters (varz semantics):
            # the i-th unnamed call in an evaluation is always `var{i}`, so
            # re-running the objective re-reads instead of re-registering.
            # ``with_latent`` views reset the counter per evaluation.
            name = f"var{self._counter}"
            self._counter += 1
        if name not in self._latent:
            init_arr = jnp.broadcast_to(
                jnp.asarray(init, dtype=self.dtype), shape
            )
            self._latent[name] = bijection.inverse(init_arr)
            self._bijections[name] = bijection
        return self._bijections[name].forward(self._latent[name])

    def unbounded(self, init=0.0, *, name=None, shape=()):
        """An unconstrained parameter."""
        return self._get(name, init, _Identity(), shape)

    def positive(self, init=1.0, *, name=None, shape=()):
        """A positive parameter (exp transform)."""
        return self._get(name, init, _Exp(), shape)

    def bounded(self, init, lower, upper, *, name=None, shape=()):
        """A parameter constrained to ``(lower, upper)``."""
        return self._get(name, init, _Logistic(lower, upper), shape)

    def __getitem__(self, name):
        return self._bijections[name].forward(self._latent[name])

    def names(self):
        return list(self._latent.keys())

    # -- functional views for optimisation -------------------------------

    def latent_dict(self):
        """The latent pytree (a dict of arrays)."""
        return dict(self._latent)

    def with_latent(self, latent):
        """A view sharing bijections but with different latent values —
        used inside jitted objectives."""
        view = Vars.__new__(Vars)
        view.dtype = self.dtype
        view._latent = dict(latent)
        view._bijections = dict(self._bijections)
        # Each view is one objective evaluation: unnamed parameters replay
        # positionally from var0.
        view._counter = 0
        return view

    def assign_latent(self, latent):
        """Write back optimised latent values."""
        self._latent.update(latent)

    def __str__(self):
        rows = [
            f"  {name} = {np.asarray(self[name])}" for name in self._latent
        ]
        return "Vars(\n" + "\n".join(rows) + "\n)"

    __repr__ = __str__
