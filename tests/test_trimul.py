"""Structure-aware multiplies (ops/trimul.py) against the dense products,
including the odd-size recursion splits, batching, and the wiring into the
carried-inverse Cholesky and the dense-reduction backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.ops.trimul import (
    auto_nb,
    mul_at,
    mul_att,
    mul_ta,
    syrk_nt,
    syrk_tn_lower,
)


def _tril(n, seed, batch=()):
    r = np.random.RandomState(seed)
    return jnp.asarray(np.tril(r.randn(*batch, n, n)) + 2 * np.eye(n))


@pytest.mark.parametrize("m", [64, 300, 1536, 2048])
def test_triangular_products_match_dense(m):
    r = np.random.RandomState(0)
    T = _tril(m, 1)
    A = jnp.asarray(r.randn(97, m))
    leaf = 512  # Force recursion for the larger cases.
    # rtol 1e-8: the recursion sums leaf products in a different order
    # than one dense GEMM (~4e-9 relative on f64 at these sizes).
    np.testing.assert_allclose(
        np.asarray(mul_att(A, T, leaf=leaf)),
        np.asarray(A) @ np.asarray(T).T,
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(mul_at(A, T, leaf=leaf)),
        np.asarray(A) @ np.asarray(T),
        rtol=1e-8, atol=1e-10,
    )
    B = jnp.asarray(r.randn(m, 53))
    np.testing.assert_allclose(
        np.asarray(mul_ta(T, B, leaf=leaf)),
        np.asarray(T) @ np.asarray(B),
        rtol=1e-8, atol=1e-10,
    )


def test_syrk_variants_match_dense():
    r = np.random.RandomState(2)
    A = jnp.asarray(r.randn(1536, 700))
    got = np.asarray(syrk_nt(A, leaf=512))
    ref = np.asarray(A) @ np.asarray(A).T
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(got, got.T)  # Exactly symmetric by mirror.
    T = _tril(2048, 3)
    got2 = np.asarray(syrk_tn_lower(T, nb=8))
    ref2 = np.asarray(T).T @ np.asarray(T)
    np.testing.assert_allclose(got2, ref2, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(got2, got2.T)
    # Non-divisible size falls back to the dense GEMM.
    T3 = _tril(300, 4)
    np.testing.assert_allclose(
        np.asarray(syrk_tn_lower(T3, nb=8)),
        np.asarray(T3).T @ np.asarray(T3),
        rtol=1e-10,
    )


def test_batched_and_jit_grad():
    T = _tril(512, 5, batch=(3,))
    A = jnp.asarray(np.random.RandomState(6).randn(3, 40, 512))
    got = np.asarray(mul_att(A, T, leaf=128))
    for i in range(3):
        np.testing.assert_allclose(
            got[i], np.asarray(A)[i] @ np.asarray(T)[i].T, rtol=1e-10
        )
    f = jax.jit(lambda t: jnp.sum(syrk_tn_lower(t, nb=2)))
    g = jax.grad(f)(T[0])
    num = (f(T[0] + 1e-6) - f(T[0] - 1e-6)) / 2e-6
    np.testing.assert_allclose(float(jnp.sum(g)), float(num), rtol=1e-4)


def test_auto_nb():
    assert auto_nb(16384) == 16
    assert auto_nb(8192) == 8
    assert auto_nb(2048) == 2
    assert auto_nb(1500) == 1
    assert auto_nb(1024) == 1


def test_tri_aware_recursion_matches_dense_forms():
    """cholesky_with_inv with the structure-aware products agrees with the
    dense-product recursion and with XLA."""
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu.ops.chol import cholesky_with_inv

    r = np.random.RandomState(7)
    n = 1600  # Above _BASE (1024) so one recursion level runs.
    A = r.randn(n, n)
    A = jnp.asarray(A @ A.T + n * np.eye(n))
    L1, I1 = cholesky_with_inv(A)
    assert chol_mod._TRI_AWARE
    try:
        chol_mod._TRI_AWARE = False
        L0, I0 = cholesky_with_inv(A)
    finally:
        chol_mod._TRI_AWARE = True
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(I1), np.asarray(I0), rtol=1e-8, atol=1e-8)
    Lx = np.linalg.cholesky(np.asarray(A))
    np.testing.assert_allclose(np.asarray(L1), Lx, rtol=1e-7, atol=1e-7)
    resid = np.max(np.abs(np.asarray(L1) @ np.asarray(I1) - np.eye(n)))
    assert resid < 1e-8, resid


def test_kinv_syrk_wiring_grad_parity():
    """The dense logdet backward (K^{-1} cotangent) through syrk_tn_lower
    matches the oblivious-GEMM result."""
    import stheno_tpu.matrix as M
    from stheno_tpu import config

    r = np.random.RandomState(8)
    n = 2048  # auto_nb -> 2: the blocked path actually runs.
    A0 = r.randn(n, n)
    A0 = jnp.asarray(A0 @ A0.T + n * np.eye(n))

    def f(s, impl):
        try:
            config.set_cholesky_impl(impl)
            return M.logdet(M.Dense(s * A0))
        finally:
            config.set_cholesky_impl("auto")

    for impl in ("fast", "xla"):
        g = jax.grad(lambda s: f(s, impl))(jnp.asarray(1.0))
        # d/ds logdet(sA) = n / s.
        np.testing.assert_allclose(float(g), n, rtol=1e-8, err_msg=impl)
