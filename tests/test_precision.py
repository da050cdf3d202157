"""Matmul-precision pinning (``config.matmul_precision``).

On TPU, XLA's *default* matmul precision lowers float32 ``dot`` to a single
bfloat16 MXU pass. Measured on a v5e (n=2,000 EQ-periodic NLML, f32): the
default makes the Gram indefinite beyond any reasonable jitter (NLML = NaN),
a bfloat16-pass Cholesky NaNs even on a true-f32 Gram, and a bfloat16-pass
Gram alone corrupts the NLML gradient by ~64%; even three-pass HIGH leaves
the Cholesky GEMMs 3-6e-2 wrong in value and ~500% wrong in gradient. The
library therefore pins ``Precision.HIGHEST`` ("float32", six passes) on its
own matmuls at trace time. These
tests verify the pinning is applied at the chokepoints and that the knob
round-trips; they run on CPU where precision does not change values, so they
inspect the emitted jaxprs.
"""

import jax
import jax.numpy as jnp
import pytest

import stheno_tpu as st
from stheno_tpu import B, EQ, GP, config


def _jaxpr_str(fn, *args):
    return str(jax.make_jaxpr(fn)(*args))


@pytest.fixture(autouse=True)
def _restore_precision():
    old = config.matmul_precision
    yield
    config.set_matmul_precision(old)


def test_default_is_float32():
    assert config.matmul_precision == "float32"


def test_set_matmul_precision_validates():
    with pytest.raises(ValueError):
        config.set_matmul_precision("fp8")
    config.set_matmul_precision("highest")
    assert config.matmul_precision == "highest"
    config.set_matmul_precision("high")
    assert config.matmul_precision == "high"
    config.set_matmul_precision(None)
    assert config.matmul_precision is None


def test_pairwise_dots_are_pinned():
    x = jnp.linspace(0.0, 1.0, 8)[:, None]
    jx = _jaxpr_str(lambda x: st.dense(st.pairwise(EQ(), x)), x)
    assert "Precision.HIGHEST" in jx
    config.set_matmul_precision(None)
    jx = _jaxpr_str(lambda x: st.dense(st.pairwise(EQ(), x)), x)
    assert "Precision" not in jx


def test_cholesky_and_solve_dots_are_pinned():
    # Force the GEMM-rich recursive path (used on accelerators) so the
    # factorisation emits dots, then check they carry the pinned precision.
    config.set_cholesky_impl("fast")
    try:
        K = jnp.eye(1600) * 2.0  # Above the recursion base so dots are emitted.
        jx = _jaxpr_str(lambda K: st.dense(st.cholesky(st.Dense(K))), K)
        assert "Precision.HIGHEST" in jx
    finally:
        config.set_cholesky_impl("auto")


def test_logpdf_end_to_end_pinned():
    x = jnp.linspace(0.0, 10.0, 16)
    y = jnp.sin(x)

    def nlml(y):
        f = GP(EQ())
        return -f.measure.logpdf(f(x, 0.1), y)

    assert "Precision.HIGHEST" in _jaxpr_str(nlml, y)
    # And the gradient keeps the pinned precision through the transpose.
    assert "Precision.HIGHEST" in _jaxpr_str(jax.grad(lambda y: nlml(y)), y)


def test_b_namespace_matmul_pinned():
    a = jnp.ones((4, 4))
    assert "Precision.HIGHEST" in _jaxpr_str(lambda a: B.matmul(a, a), a)


def test_values_unchanged_on_cpu():
    # On CPU the precision flag is a no-op numerically; pinning must not
    # change results (guards against accidental dtype casts in the wrapper).
    x = jnp.linspace(0.0, 10.0, 32)
    y = jnp.sin(x)

    def nlml(y):
        f = GP(EQ())
        return -f.measure.logpdf(f(x, 0.1), y)

    v_pinned = float(nlml(y))
    config.set_matmul_precision(None)
    v_plain = float(nlml(y))
    assert v_pinned == pytest.approx(v_plain, rel=1e-12)
