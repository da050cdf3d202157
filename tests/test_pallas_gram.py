"""Pallas fused-Gram kernel tests (interpret mode on CPU): parity with the
XLA path and custom-VJP gradient correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.ops.gram import _xla_gram, gram, set_gram_mode


@pytest.fixture(autouse=True)
def _interpret_mode():
    set_gram_mode("interpret")
    yield
    set_gram_mode("auto")


KINDS = ["eq", "matern12", "matern32", "matern52", "rq", "linear"]


@pytest.mark.parametrize("kind", KINDS)
def test_pallas_parity(kind):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(30, 3), jnp.float32)
    y = jnp.asarray(r.randn(17, 3), jnp.float32)
    out = gram(kind, x, y, alpha=1.3)
    ref = _xla_gram(kind, x, y, alpha=1.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["eq", "matern32", "rq"])
def test_pallas_grad(kind):
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(12, 2), jnp.float32)
    y = jnp.asarray(r.randn(9, 2), jnp.float32)
    w = jnp.asarray(r.randn(12, 9), jnp.float32)

    def loss_pallas(x, y, alpha):
        return jnp.sum(w * gram(kind, x, y, alpha))

    def loss_ref(x, y, alpha):
        return jnp.sum(w * _xla_gram(kind, x, y, alpha))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, y, jnp.float32(1.3))
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, y, jnp.float32(1.3))
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_kernel_class_uses_fused_path():
    from stheno_tpu import EQ, pairwise
    import stheno_tpu.matrix as M

    x = jnp.asarray(np.random.RandomState(0).randn(10, 2), jnp.float32)
    K_fused = pairwise(EQ(), x)
    set_gram_mode("xla")
    K_plain = pairwise(EQ(), x)
    np.testing.assert_allclose(
        np.asarray(M.dense(K_fused)), np.asarray(M.dense(K_plain)), rtol=2e-5,
        atol=1e-6,
    )
