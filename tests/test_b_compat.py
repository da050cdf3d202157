"""LAB-compatible ``B`` namespace (``stheno_tpu/b.py``): the op surface the
reference exercises through ``lab as B`` (SURVEY.md §2.9), including the
mutable ``B.epsilon`` jitter knob of
``/root/reference/README_without_examples.md:811-822``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import B, Dense, Diagonal, EQ, GP, Zero, config


def test_epsilon_is_the_global_jitter():
    try:
        B.epsilon = 1e-6
        assert config.epsilon == 1e-6
        assert B.epsilon == 1e-6
        # The knob must actually reach the factorisation: a matrix whose
        # unjittered Cholesky is fine still gets the (now large) jitter.
        L = B.cholesky(Dense(jnp.eye(3)))
        np.testing.assert_allclose(
            np.diag(np.asarray(B.dense(L))), np.sqrt(1 + 1e-6), rtol=1e-9
        )
    finally:
        B.epsilon = None
    assert config.epsilon is None


def test_linalg_surface():
    r = np.random.RandomState(0)
    A_ = r.randn(5, 5)
    A = Dense(jnp.asarray(A_ @ A_.T + 5 * np.eye(5)))
    b = jnp.asarray(r.randn(5, 2))
    dense = np.asarray(B.dense(A))
    np.testing.assert_allclose(
        np.asarray(B.solve(B.cholesky(A), b)),
        np.linalg.solve(np.linalg.cholesky(dense + B.epsilon * np.eye(5)), b),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(B.logdet(A)), np.linalg.slogdet(dense)[1], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(B.dense(B.iqf(A, b))),
        b.T @ np.linalg.solve(dense, b),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(B.iqf_diag(A, b)),
        np.diag(b.T @ np.linalg.solve(dense, b)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(B.ratio(A, A)), 5.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(B.dense(B.matmul(A, b, tr_a=True))), dense.T @ b, rtol=1e-6
    )


def test_structure_surface():
    d = Diagonal(jnp.asarray([1.0, 2.0]))
    assert isinstance(B.diag(jnp.asarray([3.0, 4.0])), Diagonal)
    np.testing.assert_allclose(np.asarray(B.diag(d)), [1.0, 2.0])
    bd = B.block_diag(d, d)
    assert B.shape_matrix(bd) == (4, 4)
    fd = B.fill_diag(jnp.asarray(2.5), 3)
    np.testing.assert_allclose(np.asarray(B.dense(fd)), 2.5 * np.eye(3))
    M = B.block([[B.dense(d), jnp.zeros((2, 2))], [jnp.zeros((2, 2)), B.dense(d)]])
    np.testing.assert_allclose(np.asarray(B.dense(M)), np.asarray(B.dense(bd)))


def test_shaping_dtype_rng():
    x = jnp.ones((3,))
    assert B.uprank(x).shape == (3, 1)
    assert B.rank(x) == 1 and B.is_scalar(1.0 * 0)
    assert B.shape(jnp.zeros((2, 3)), 1) == 3
    assert B.dtype(x) == x.dtype
    assert B.cast(jnp.float32, x).dtype == jnp.float32
    state = B.create_random_state(seed=7)
    state2, draws = B.sample(state, Diagonal(jnp.ones(4)), 3)
    assert draws.shape == (4, 3)
    assert not np.array_equal(np.asarray(state2), np.asarray(state))
    state3, z = B.randn(state2, jnp.float64, 2, 2)
    assert z.shape == (2, 2)


def test_epsilon_change_invalidates_cached_factor():
    """The reference's documented recovery workflow: bump B.epsilon after a
    factorisation and retry *on the same matrix object* — the cached factor
    must not be reused."""
    A = Dense(jnp.eye(3))
    try:
        B.epsilon = None
        B.cholesky(A)
        B.epsilon = 1e-2
        L2 = B.cholesky(A)
        np.testing.assert_allclose(
            np.diag(np.asarray(B.dense(L2))), np.sqrt(1.01), rtol=1e-9
        )
    finally:
        B.epsilon = None


def test_matmul_three_arg_form():
    r = np.random.RandomState(0)
    a = jnp.asarray(r.randn(3, 4))
    v = jnp.asarray(r.randn(4, 4))
    np.testing.assert_allclose(
        np.asarray(B.dense(B.matmul(a, v, a, tr_c=True))),
        np.asarray(a) @ np.asarray(v) @ np.asarray(a).T,
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(B.dense(B.mm(a, v, a, tr_c=True))),
        np.asarray(a) @ np.asarray(v) @ np.asarray(a).T,
        rtol=1e-10,
    )


def test_scalar_and_rank_semantics_for_structured():
    d = Diagonal(jnp.ones(3))
    assert not B.is_scalar(d)
    assert B.rank(d) == 2
    # The reference's noise-promotion dispatch pattern (fdd.py:31-33).
    assert B.is_scalar(jnp.asarray(0.1))
    assert B.rank(jnp.ones(3)) == 1


def test_zero_one_accept_tensor_references():
    assert B.zero(jnp.ones(3, jnp.float32)).dtype == jnp.float32
    assert float(B.one(jnp.ones(2))) == 1.0
    assert B.zero(jnp.float64).dtype == jnp.float64


def test_dtype_promotes_across_args():
    a32 = jnp.ones(2, jnp.float32)
    a64 = jnp.ones(2, jnp.float64)
    assert B.dtype(a32, a64) == jnp.float64
    assert B.dtype(a32) == jnp.float32


def test_cast_zero_matrix():
    z = Zero(jnp.float64, 2, 2)
    assert B.cast(jnp.float32, z).dtype == jnp.float32


def test_eye_matches_reference_tensor():
    assert B.eye(jnp.ones((2, 3))).shape == (2, 3)
    assert B.eye(jnp.ones((4, 2, 2))).shape == (4, 2, 2)
    np.testing.assert_allclose(np.asarray(B.eye(jnp.ones((3, 3)))), np.eye(3))


def test_multiply_keeps_structure():
    d = Diagonal(jnp.asarray([1.0, 2.0]))
    out = B.multiply(d, 3.0)
    assert isinstance(out, Diagonal)
    np.testing.assert_allclose(np.asarray(out.diag), [3.0, 6.0])


def test_drives_the_model_dsl_like_the_reference_readme():
    # The reference README's pattern: build a GP, sample with a functional
    # random state, condition, inspect marginals — all through B.*.
    f = GP(EQ())
    x = B.linspace(jnp.float64, 0, 5, 30)
    state = B.create_random_state(jnp.float64, seed=0)
    state, y = f.measure.sample(state, f(x, 0.1))
    post = f | (f(x, 0.1), y[:, 0])
    mean, var = post(x).marginals()
    assert B.shape(mean, 0) == 30
    assert bool(B.all(var > 0))


def test_distance_ops():
    rs = np.random.RandomState(0)
    x, y = rs.randn(5, 2), rs.randn(4, 2)
    d2 = np.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(B.pw_dists2(x, y)), d2, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(B.pw_dists(x, y)), np.sqrt(d2), atol=1e-10
    )
    s2 = np.sum((x[:, None, :] + y[None, :, :]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(B.pw_sums2(x, y)), s2, atol=1e-10)
    xe, ye = rs.randn(5, 2), rs.randn(5, 2)
    np.testing.assert_allclose(
        np.asarray(B.ew_dists2(xe, ye)),
        np.sum((xe - ye) ** 2, axis=-1, keepdims=True),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(B.ew_sums(xe, ye)),
        np.linalg.norm(xe + ye, axis=-1, keepdims=True),
        atol=1e-10,
    )
    # Rank-1 inputs uprank like LAB.
    assert B.pw_dists2(np.arange(3.0)).shape == (3, 3)


def test_jnp_fallback():
    # Any op not explicitly shimmed falls back to jax.numpy.
    np.testing.assert_allclose(float(B.sin(0.0)), 0.0)
    np.testing.assert_allclose(np.asarray(B.abs(jnp.asarray([-1.0, 2.0]))), [1.0, 2.0])
    assert B.where is jnp.where
    with pytest.raises(AttributeError):
        B.definitely_not_an_op
