"""VMEM-resident Pallas Cholesky tile kernel (``ops/pallas_chol.py``):
forward/inverse parity with XLA, identity padding, differentiation of the
(L, inv(L)) pair, and the ``cholesky_with_inv`` recursion above it.

Runs the actual kernel logic on CPU via ``interpret=True``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.ops import pallas_chol as pc
from stheno_tpu.ops.chol import cholesky_with_inv


@pytest.fixture(autouse=True)
def _interpret_mode():
    pc.set_chol_mode("interpret")
    yield
    pc.set_chol_mode("auto")


def _spd(n, seed=0):
    r = np.random.RandomState(seed)
    B = r.randn(n, n)
    return jnp.asarray(B @ B.T / n + np.eye(n), jnp.float32)


@pytest.mark.parametrize("n", [128, 200, 384])
def test_chol_tile_forward_and_inverse(n):
    # 200 exercises the identity-padding path; 384 the multi-block panels.
    A = _spd(n, seed=n)
    L, Linv = pc.chol_tile(A)
    L_ref = np.linalg.cholesky(np.asarray(A, np.float64))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(L @ Linv), np.eye(n), atol=5e-5
    )
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    assert np.allclose(np.triu(np.asarray(Linv), 1), 0.0)


def test_chol_tile_grad_matches_xla():
    """The custom VJP (Cholesky adjoint + inverse correction) must match
    differentiating through XLA's cholesky + triangular solve."""
    n = 136  # pads to 256: gradient must ignore the padding block
    A = _spd(n, seed=1)
    W = jnp.asarray(np.random.RandomState(2).randn(n, n), jnp.float32)
    y = jnp.asarray(np.random.RandomState(3).randn(n), jnp.float32)

    def f_ours(A):
        L, Linv = pc.chol_tile(A)
        return (
            jnp.sum(jnp.log(jnp.diagonal(L)))
            + jnp.sum((Linv @ y) ** 2)
            + jnp.sum(L * W)
        )

    def f_ref(A):
        L = jnp.linalg.cholesky(A)
        lb = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        return (
            jnp.sum(jnp.log(jnp.diagonal(L)))
            + jnp.sum(lb**2)
            + jnp.sum(L * W)
        )

    g_ours = np.asarray(jax.grad(f_ours)(A))
    g_ref = np.asarray(jax.grad(f_ref)(A))
    scale = np.max(np.abs(g_ref))
    np.testing.assert_allclose(g_ours, g_ref, atol=5e-5 * scale)


def test_cholesky_with_inv_recursion_uses_tile_base(monkeypatch):
    """Above MAX_TILE the divide-and-conquer layer stitches tile results;
    both L and inv(L) must stay consistent. MAX_TILE is shrunk so the
    interpreter-mode run stays fast while still exercising the recursion."""
    monkeypatch.setattr(pc, "MAX_TILE", 256)
    n = 416
    A = _spd(n, seed=4)
    L, Linv = cholesky_with_inv(A)
    resid = np.asarray(L @ jnp.swapaxes(L, -1, -2)) - np.asarray(A)
    assert np.max(np.abs(resid)) < 5e-4
    np.testing.assert_allclose(np.asarray(L @ Linv), np.eye(n), atol=5e-4)


def test_chol_tile_shape_validation():
    with pytest.raises(ValueError):
        pc.chol_tile(jnp.zeros((pc.MAX_TILE + 1, pc.MAX_TILE + 1)))
    with pytest.raises(ValueError):
        pc.chol_tile(jnp.zeros((2, 64, 64)))
