"""End-to-end stories, porting ``/root/reference/tests/model/test_cases.py``:
additive-model decomposition in all conditioning orders, derivative
conditioning recovering cos from sin, Bayesian linear regression recovery,
batched computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from stheno_tpu import EQ, GP, Linear, Measure, Obs
from tests.util import approx


def test_additive_decomposition_all_orders():
    # Observe a sum of two GPs, predict the components in every conditioning
    # order (reference ``test_cases.py:22-53``).
    m = Measure()
    f1 = GP(EQ(), measure=m)
    f2 = GP(EQ().stretch(3.0), measure=m)
    f = f1 + f2
    r = np.random.RandomState(0)
    x = jnp.linspace(0, 10, 20)
    y1 = jnp.asarray(np.sin(np.asarray(x)))
    y2 = jnp.asarray(0.3 * np.asarray(x))
    y = y1 + y2

    # Condition on the sum, then both components; all orders must agree.
    post = m.condition(f(x, 1e-4), y)
    mean_sum, _ = post(f)(x).marginals()
    np.testing.assert_allclose(np.asarray(mean_sum), np.asarray(y), atol=1e-2)
    m1, _ = post(f1)(x).marginals()
    m2, _ = post(f2)(x).marginals()
    np.testing.assert_allclose(
        np.asarray(m1) + np.asarray(m2), np.asarray(mean_sum), atol=1e-6
    )

    # Conditioning on components pins the sum exactly.
    post2 = m.condition((f1(x, 1e-6), y1), (f2(x, 1e-6), y2))
    ms, _ = post2(f)(x).marginals()
    np.testing.assert_allclose(np.asarray(ms), np.asarray(y), atol=1e-3)

    # Order invariance: condition sequentially in both orders.
    post_a = m.condition(f1(x, 1e-6), y1).condition(f2(x, 1e-6), y2)
    post_b = m.condition(f2(x, 1e-6), y2).condition(f1(x, 1e-6), y1)
    ma, _ = post_a(f)(x).marginals()
    mb, _ = post_b(f)(x).marginals()
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=1e-6)


def test_derivative_conditioning_recovers_cos():
    # Condition the GP on sin values; its derivative should predict cos
    # (reference ``test_cases.py:56-64``).
    f = GP(EQ())
    x = jnp.linspace(0, 6, 50)
    y = jnp.sin(x)
    post = f.measure.condition(f(x, 1e-8), y)
    df = f.diff(0)
    x_check = jnp.linspace(1, 5, 10)
    mean_df, _ = post(df)(x_check).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_df), np.cos(np.asarray(x_check)), atol=1e-3
    )


def test_diff_approx():
    f = GP(EQ())
    x = jnp.linspace(0, 6, 50)
    y = jnp.sin(x)
    post = f.measure.condition(f(x, 1e-8), y)
    df = f.diff_approx(1, order=6)
    x_check = jnp.linspace(1, 5, 10)
    mean_df, _ = post(df)(x_check).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_df), np.cos(np.asarray(x_check)), atol=1e-3
    )


def test_blr_recovery():
    # Bayesian linear regression via GPs recovers slope and intercept
    # (reference ``test_cases.py:116-131``).
    m = Measure()
    slope = GP(1.0, measure=m)
    intercept = GP(5.0, measure=m)
    f = slope * (lambda x: jnp.asarray(x)) + intercept

    true_slope, true_intercept = 1.2, 4.8
    x = jnp.linspace(0, 10, 50)
    y = true_slope * x + true_intercept

    post = m.condition(f(x, 1e-6), y)
    mean_slope, var_slope = post(slope(jnp.zeros(1))).marginals()
    mean_icept, var_icept = post(intercept(jnp.zeros(1))).marginals()
    np.testing.assert_allclose(float(mean_slope[0]), true_slope, atol=1e-3)
    np.testing.assert_allclose(float(mean_icept[0]), true_intercept, atol=1e-3)
    assert float(var_slope[0]) < 1e-4
    assert float(var_icept[0]) < 1e-4


def test_blr_uses_lowrank_structure():
    # The Linear-kernel Gram is LowRank, so the observation matrix with
    # diagonal noise is Woodbury: BLR logpdf must be O(N).
    f = GP(Linear())
    n = 50_000
    x = jnp.linspace(0, 1, n)
    fdd = f(x, 0.1)
    var = fdd.var
    assert isinstance(var, M.Woodbury)
    y = 0.7 * x
    lp = f.measure.logpdf(fdd, y)
    assert np.isfinite(float(lp))


def test_batched_logpdf_and_posterior():
    # Batched leading dims flow through kernels and Normals
    # (reference ``test_cases.py:134-176``).
    f = GP(EQ())
    r = np.random.RandomState(0)
    xb = jnp.asarray(r.randn(3, 10, 1))
    yb = jnp.asarray(r.randn(3, 10, 1))
    fdd = f(xb, 0.1)
    lp = fdd.logpdf(yb)
    assert lp.shape == (3,)
    for i in range(3):
        lp_i = f(xb[i], 0.1).logpdf(yb[i])
        np.testing.assert_allclose(np.asarray(lp[i]), np.asarray(lp_i), rtol=1e-8)


def test_batched_sampling():
    f = GP(EQ())
    xb = jnp.asarray(np.random.RandomState(0).randn(3, 10, 1))
    key = jax.random.PRNGKey(0)
    key, s = f(xb, 0.1).sample(key, 2)
    assert s.shape == (3, 10, 2)


def test_jit_end_to_end():
    # The whole DSL stages out under jit: model building happens at trace
    # time, numerics compile once.
    x = jnp.linspace(0, 10, 20)
    x_new = jnp.linspace(0, 10, 7)

    @jax.jit
    def predict(y):
        f = GP(EQ())
        post = f | (f(x, 0.1), y)
        mean, var = post(x_new).marginals()
        return mean, var

    y = jnp.sin(x)
    mean, var = predict(y)
    f = GP(EQ())
    mean_ref, var_ref = (f | (f(x, 0.1), y))(x_new).marginals()
    approx(mean, mean_ref, rtol=1e-8)
    approx(var, var_ref, rtol=1e-8)


def test_grad_nlml_end_to_end():
    x = jnp.linspace(0, 10, 20)
    y = jnp.sin(x)

    def nlml(params):
        ell, s2 = jnp.exp(params[0]), jnp.exp(params[1])
        f = GP(s2 * EQ().stretch(ell))
        return -f.measure.logpdf(f(x, 0.1), y)

    g = jax.grad(nlml)(jnp.zeros(2))
    assert g.shape == (2,)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (nlml(e) - nlml(-e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[i]), np.asarray(fd), rtol=1e-4)
