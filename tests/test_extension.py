"""The extension story (VERDICT r3 missing #1 / next #8): user-defined
kernels and user-defined structured matrix types plug into the library
without editing it — the open-dispatch role of the reference's shared
``plum`` ``Dispatcher`` (``/root/reference/stheno/__init__.py:12-18``,
``B.dispatch`` hooks ``/root/reference/stheno/random.py:396-403``).

Worked examples mirrored in ``docs/manual.md`` ("Extending the library").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from stheno_tpu.matrix import (
    AbstractMatrix,
    Dense,
    Diagonal,
    clear_rules,
    register_matrix_type,
    register_rule,
)


# --- A user-defined structured type: c * I ---------------------------------


class ScaledIdentity(AbstractMatrix):
    """``c * I_n`` — the extension-demo type: one traced scalar leaf and a
    static size."""

    def __init__(self, c, n):
        self.c = jnp.asarray(c)
        self.n = int(n)
        self._cache = {}

    @property
    def shape(self):
        return self.c.shape + (self.n, self.n)

    @property
    def dtype(self):
        return self.c.dtype


@pytest.fixture
def scaled_identity_rules():
    register_matrix_type(ScaledIdentity, leaf_names=("c",), aux_names=("n",))

    def is_si(a, *rest):
        return isinstance(a, ScaledIdentity)

    register_rule(
        "dense",
        is_si,
        lambda a: a.c[..., None, None] * jnp.eye(a.n, dtype=a.dtype),
    )
    register_rule(
        "diag_of",
        is_si,
        lambda a: jnp.broadcast_to(a.c[..., None], a.c.shape + (a.n,)),
    )
    register_rule("transpose", is_si, lambda a: a)
    register_rule(
        "scale", is_si, lambda a, s: ScaledIdentity(a.c * s, a.n)
    )
    register_rule(
        "cholesky", is_si, lambda a: ScaledIdentity(jnp.sqrt(a.c), a.n)
    )
    register_rule("logdet", is_si, lambda a: a.n * jnp.log(a.c))
    register_rule(
        "solve",
        is_si,
        lambda a, b: (M.dense(b) if M.is_structured(b) else jnp.asarray(b))
        / a.c[..., None, None],
    )
    # Fast paths for existing-type combinations — the "teach add/matmul
    # new rules" half of the story.
    register_rule(
        "add",
        lambda a, b: isinstance(a, ScaledIdentity)
        and isinstance(b, ScaledIdentity)
        and a.n == b.n,
        lambda a, b: ScaledIdentity(a.c + b.c, a.n),
    )
    register_rule(
        "add",
        lambda a, b: isinstance(a, ScaledIdentity) and isinstance(b, Diagonal),
        lambda a, b: Diagonal(b.diag + a.c[..., None]),
    )
    register_rule(
        "matmul",
        lambda a, b: isinstance(a, ScaledIdentity),
        lambda a, b, tr_a=False, tr_b=False: M.scale(
            M.transpose(b) if tr_b else b, a.c
        ),
    )
    yield
    clear_rules()


def test_custom_type_flows_through_ops(scaled_identity_rules):
    a = ScaledIdentity(2.0, 4)
    np.testing.assert_allclose(np.asarray(M.dense(a)), 2.0 * np.eye(4))
    np.testing.assert_allclose(np.asarray(M.diag_of(a)), 2.0 * np.ones(4))
    assert float(M.logdet(a)) == pytest.approx(4 * np.log(2.0))
    L = M.cholesky(a)
    assert isinstance(L, ScaledIdentity)
    assert float(L.c) == pytest.approx(np.sqrt(2.0))
    b = jnp.arange(8.0).reshape(4, 2)
    np.testing.assert_allclose(np.asarray(M.solve(a, b)), np.asarray(b) / 2.0)
    # Structure-preserving fast paths.
    s = M.add(a, ScaledIdentity(0.5, 4))
    assert isinstance(s, ScaledIdentity) and float(s.c) == pytest.approx(2.5)
    d = M.add(a, Diagonal(jnp.asarray([1.0, 2.0, 3.0, 4.0])))
    assert isinstance(d, Diagonal)
    np.testing.assert_allclose(np.asarray(d.diag), [3.0, 4.0, 5.0, 6.0])
    out = M.matmul(a, Dense(b))
    np.testing.assert_allclose(np.asarray(M.dense(out)), 2.0 * np.asarray(b))
    # Unregistered combinations still work through the dense fallback
    # (which consults the custom ``dense`` rule).
    mix = M.add(Dense(jnp.ones((4, 4))), a)
    np.testing.assert_allclose(
        np.asarray(M.dense(mix)), np.ones((4, 4)) + 2.0 * np.eye(4)
    )


def test_custom_type_is_jit_grad_vmap_safe(scaled_identity_rules):
    # The registered pytree + trace-time rules compose with the JAX
    # transforms exactly like the built-in types.
    def f(c):
        a = ScaledIdentity(c, 5)
        return M.logdet(M.add(a, ScaledIdentity(1.0, 5)))

    val = jax.jit(f)(jnp.asarray(2.0))
    assert float(val) == pytest.approx(5 * np.log(3.0))
    g = jax.grad(f)(jnp.asarray(2.0))
    assert float(g) == pytest.approx(5.0 / 3.0)
    vals = jax.vmap(f)(jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(
        np.asarray(vals), [5 * np.log(2.0), 5 * np.log(3.0)], rtol=1e-6
    )


def test_custom_type_feeds_normal_logpdf(scaled_identity_rules):
    # End-to-end: a Normal over the user type — logpdf goes through the
    # registered logdet/solve/cholesky rules.
    from stheno_tpu import Normal

    n = 6
    y = jnp.asarray(np.random.RandomState(0).randn(n, 1))
    dist = Normal(ScaledIdentity(2.0, n))
    ref = Normal(Dense(2.0 * jnp.eye(n)))
    np.testing.assert_allclose(
        float(dist.logpdf(y)), float(ref.logpdf(y)), rtol=1e-8
    )


def test_rule_registry_validation_and_clearing(scaled_identity_rules):
    with pytest.raises(ValueError, match="not extendable"):
        register_rule("iqf_diag", lambda a: True, lambda a: a)
    clear_rules("add")
    # With the add rules gone the custom type still works via densify.
    out = M.add(ScaledIdentity(1.0, 3), ScaledIdentity(2.0, 3))
    np.testing.assert_allclose(np.asarray(M.dense(out)), 3.0 * np.eye(3))


# --- A user-defined kernel --------------------------------------------------


def test_custom_kernel_with_scalar_supports_derivatives():
    """The documented kernel-extension route: subclass ``Kernel``,
    implement ``_pairwise``/``_elwise``/``_scalar`` — the ``_scalar`` path
    powers ``.diff`` derivative kernels through autodiff (CLAUDE.md
    invariant), and the kernel composes with the algebra and the GP DSL."""
    from stheno_tpu import GP
    from stheno_tpu.kernels import Kernel, pairwise
    from stheno_tpu.kernels.kernel import ew_dists2, pw_dists2

    class Cosine(Kernel):
        """k(x, y) = cos(w * |x - y|) (a valid PSD kernel in 1-D)."""

        def __init__(self, w=1.0):
            self.w = w

        def _pairwise(self, x, y):
            return Dense(jnp.cos(self.w * jnp.sqrt(pw_dists2(x, y) + 1e-30)))

        def _elwise(self, x, y):
            return jnp.cos(self.w * jnp.sqrt(ew_dists2(x, y) + 1e-30))

        def _scalar(self, x, y):
            return jnp.cos(self.w * jnp.sqrt(jnp.sum((x - y) ** 2) + 1e-30))

        @property
        def stationary(self):
            return True

    k = Cosine(1.3)
    x = jnp.linspace(0, 3, 7)[:, None]
    K = np.asarray(M.dense(pairwise(k, x)))
    ref = np.cos(1.3 * np.abs(np.asarray(x) - np.asarray(x).T))
    np.testing.assert_allclose(K, ref, rtol=1e-6, atol=1e-8)
    # Algebra composition + the derivative kernel via _scalar.
    k2 = 2.0 * k + Cosine(0.5)
    K2 = np.asarray(M.dense(pairwise(k2, x)))
    np.testing.assert_allclose(
        K2,
        2.0 * ref + np.cos(0.5 * np.abs(np.asarray(x) - np.asarray(x).T)),
        rtol=1e-6,
    )
    dk = k.diff(0, 0)
    Kd = np.asarray(M.dense(pairwise(dk, x + 5.0)))
    # d2/dx dy cos(w (x - y)) = w^2 cos(w (x - y)) away from coincidence.
    w = 1.3
    off = ~np.eye(7, dtype=bool)
    np.testing.assert_allclose(
        Kd[off], (w**2 * ref)[off], rtol=1e-4, atol=1e-6
    )
    # And through the model DSL.
    f = GP(k)
    y = jnp.sin(x[:, 0])
    post = f | (f(x, 0.1), y)
    mean, var = post(x).marginals()
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= -1e-9)
