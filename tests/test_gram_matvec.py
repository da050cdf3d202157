"""Fused Pallas gram-matvec tests (interpret mode on CPU): parity with the
dense ``gram @ v`` and padded-tail correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.ops.gram import _xla_gram
from stheno_tpu.ops.gram_matvec import gram_matvec

KINDS = ["eq", "matern32", "rq", "linear"]


@pytest.mark.parametrize("kind", KINDS)
def test_gram_matvec_parity(kind):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(37, 2), jnp.float32)
    y = jnp.asarray(r.randn(23, 2), jnp.float32)
    v = jnp.asarray(r.randn(23, 5), jnp.float32)
    out = gram_matvec(kind, x, y, v, alpha=1.3, interpret=True)
    ref = _xla_gram(kind, x, y, alpha=1.3) @ v
    assert out.shape == (37, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_gram_matvec_square_accumulation():
    # n=1100 > 2 tiles of 512: exercises the j-accumulation path.
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1100, 1), jnp.float32)
    v = jnp.asarray(r.randn(1100, 3), jnp.float32)
    out = gram_matvec("eq", x, x, v, interpret=True)
    ref = _xla_gram("eq", x, x, alpha=1.0) @ v
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4
    )
