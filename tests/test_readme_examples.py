"""The reference's 13 README examples as integration tests — the parity gate
of SURVEY.md §7 stage 8. Each test reproduces the corresponding
``/root/reference/readme_example*.py`` workflow with this framework's API and
asserts the statistical outcome (no plotting)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from stheno_tpu import (
    EQ,
    RQ,
    Delta,
    GP,
    Linear,
    Measure,
    Obs,
    PseudoObs,
    cross,
)
from stheno_tpu.opt import Vars, minimise_adam, minimise_lbfgs


def _key(i=0):
    return jax.random.PRNGKey(i)


def test_example1_simple_regression():
    x = jnp.linspace(0, 10, 100)
    x_obs = jnp.linspace(0, 7, 20)

    f = GP(EQ())
    key, f_true, y_obs = f.measure.sample(_key(0), f(x), f(x_obs, 0.1))

    post = f.measure.condition(f(x_obs, 0.1), y_obs[:, 0])
    mean, lower, upper = post(f)(x).marginal_credible_bounds()

    # Predictions track the truth inside the observed range.
    inside = np.asarray(x) <= 7
    err = np.abs(np.asarray(mean) - np.asarray(f_true)[:, 0])[inside]
    assert np.mean(err) < 0.4
    # Credible intervals mostly cover the truth.
    cover = (
        (np.asarray(lower) <= np.asarray(f_true)[:, 0])
        & (np.asarray(f_true)[:, 0] <= np.asarray(upper))
    )
    assert np.mean(cover) > 0.8


def test_example2_decomposition():
    # Predict a sum of a smooth and a wiggly component and decompose.
    m = Measure()
    f_smooth = GP(EQ().stretch(2.0), measure=m)
    f_wiggly = GP(RQ(1e-1).stretch(0.5), measure=m)
    f = f_smooth + f_wiggly

    x = jnp.linspace(0, 10, 100)
    key, y_smooth, y_wiggly = m.sample(_key(1), f_smooth(x), f_wiggly(x))
    y = y_smooth + y_wiggly

    post = m.condition(f(x, 1e-6), y[:, 0])
    mean_s, _ = post(f_smooth)(x).marginals()
    mean_w, _ = post(f_wiggly)(x).marginals()
    mean_f, _ = post(f)(x).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_s) + np.asarray(mean_w), np.asarray(mean_f), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(y)[:, 0], atol=1e-2)


def test_example3_parametric():
    # Fit a parametric model NLML and predict.
    x = jnp.linspace(0, 10, 80)
    key, y = GP(2.0 * EQ().stretch(1.5)).measure.sample(_key(2), None) if False else (None, None)
    f_gen = GP(2.0 * EQ().stretch(1.5))
    key, y = f_gen.measure.sample(_key(2), f_gen(x, 0.1))
    y = y[:, 0]

    def model(vs):
        return GP(vs.positive(1.0, name="var") * EQ().stretch(vs.positive(1.0, name="scale")))

    def objective(vs):
        f = model(vs)
        return -f.measure.logpdf(f(x, vs.positive(0.1, name="noise")), y)

    vs = Vars()
    objective(vs)
    final = minimise_lbfgs(objective, vs, iters=40)
    f = model(vs)
    post = f | (f(x, vs.positive(0.1, name="noise")), y)
    mean, _ = post(x).marginals()
    rmse = np.sqrt(np.mean((np.asarray(mean) - np.asarray(y)) ** 2))
    assert rmse < 0.4


def test_example4_multi_output():
    # Vector-valued GP via a mixing matrix over latent processes.
    class VGP:
        def __init__(self, ps):
            self.ps = ps

        def __add__(self, other):
            return VGP([f + g for f, g in zip(self.ps, other.ps)])

        def lmatmul(self, A):
            m, n = A.shape
            ps = [0 for _ in range(m)]
            for i in range(m):
                for j in range(n):
                    ps[i] = A[i, j] * self.ps[j] + ps[i]
            return VGP(ps)

    m_latent, p_out = 2, 4
    r = np.random.RandomState(0)
    H = jnp.asarray(r.randn(p_out, m_latent))

    x = jnp.linspace(0, 10, 50)
    x_obs = jnp.linspace(0, 10, 10)

    with Measure() as prior:
        us = VGP([GP(EQ()) for _ in range(m_latent)])
        fs = us.lmatmul(np.asarray(H))

    # Sample observations for all outputs, condition jointly.
    fdds = [f(x_obs, 0.01) for f in fs.ps]
    out = prior.sample(_key(3), *fdds)
    key, samples = out[0], out[1:]
    obs = tuple((fdd, s[:, 0]) for fdd, s in zip(fdds, samples))
    post = prior.condition(*obs)
    # Posterior mean at the observations tracks them (noise std = 0.1).
    for f, s in zip(fs.ps, samples):
        mean, _ = post(f)(x_obs).marginals()
        rmse = np.sqrt(np.mean((np.asarray(mean) - np.asarray(s)[:, 0]) ** 2))
        assert rmse < 0.3, rmse


def test_example5_integration():
    # Derivative chain: condition the third derivative on data; integration
    # constants fix the antiderivatives.
    with Measure() as prior:
        f = 0.7 * GP(EQ()).stretch(1.5)
        df = f.diff()
        ddf = df.diff()

    zero = jnp.zeros(1)
    prior2 = prior.condition((f(zero), jnp.ones(1)), (df(zero), jnp.zeros(1)))
    # f(0)=1, f'(0)=0 pinned.
    mean_f0, var_f0 = prior2(f)(zero).marginals()
    np.testing.assert_allclose(float(mean_f0[0]), 1.0, atol=1e-4)
    assert float(var_f0[0]) < 1e-6
    mean_df0, _ = prior2(df)(zero).marginals()
    np.testing.assert_allclose(float(mean_df0[0]), 0.0, atol=1e-4)
    # Conditioning ddf on cos recovers -sin-ish slope relations... check
    # f'' at 0 of the posterior given ddf observations.
    x_obs = jnp.linspace(0, 5, 30)
    y_obs = -jnp.sin(x_obs)  # pretend ddf = -sin
    post = prior2.condition(ddf(x_obs, 1e-6), y_obs)
    mean_ddf, _ = post(ddf)(x_obs).marginals()
    np.testing.assert_allclose(np.asarray(mean_ddf), np.asarray(y_obs), atol=1e-2)


def test_example6_blr():
    x = jnp.linspace(0, 10, 100)
    x_obs = jnp.linspace(0, 10, 30)
    with Measure() as prior:
        slope = GP(1.0)
        intercept = GP(5.0)
        f = slope * (lambda z: jnp.asarray(z)) + intercept
        e = 0.2 * GP(Delta())
        y = f + e
    key, y_obs = prior.sample(_key(4), y(x_obs))
    post = prior.condition(y(x_obs), y_obs[:, 0])
    mean, _ = post(f)(x).marginals()
    # The posterior over f is a straight line close to the noisy samples.
    coef = np.polyfit(np.asarray(x), np.asarray(mean), 1)
    resid = np.asarray(mean) - np.polyval(coef, np.asarray(x))
    assert np.max(np.abs(resid)) < 1e-6


def test_example7_gpar():
    # Two-layer GPAR: second GP takes (x, y1) as input.
    x_obs1 = jnp.linspace(0, 10, 30)
    r = np.random.RandomState(1)
    inds2 = r.permutation(30)[:10]
    x_obs2 = x_obs1[jnp.asarray(np.sort(inds2))]

    y1_obs = jnp.sin(x_obs1) + 0.05 * jnp.asarray(r.randn(30))
    y2_obs = jnp.sin(x_obs2) ** 2 + 0.05 * jnp.asarray(r.randn(10))

    def objective(vs):
        f1 = GP(vs.positive(1.0, name="var1") * EQ().stretch(vs.positive(1.0, name="scale1")))
        f2 = GP(vs.positive(1.0, name="var2") * EQ().stretch(vs.positive(1.0, name="scale2")))
        x2 = jnp.stack(
            [x_obs2, y1_obs[jnp.asarray(np.sort(inds2))]], axis=1
        )
        lp = f1(x_obs1, vs.positive(0.1, name="noise1")).logpdf(y1_obs)
        lp = lp + f2(x2, vs.positive(0.1, name="noise2")).logpdf(y2_obs)
        return -lp

    vs = Vars()
    objective(vs)
    final = minimise_lbfgs(objective, vs, iters=30)
    assert np.isfinite(final)
    # The fitted first layer predicts sin well.
    f1 = GP(vs["var1"] * EQ().stretch(vs["scale1"]))
    post = f1 | (f1(x_obs1, vs["noise1"]), y1_obs)
    mean, _ = post(x_obs1).marginals()
    assert np.sqrt(np.mean((np.asarray(mean) - np.sin(np.asarray(x_obs1))) ** 2)) < 0.15


def test_example8_gp_rnn():
    # GP-modulated parametric model: f = (1 + a) * g(x) + b with GPs a, b
    # and a small tanh network g, jointly fit by Adam.
    x = jnp.linspace(0, 1, 60)[:, None]
    r = np.random.RandomState(2)
    a_true = 0.3 * jnp.asarray(np.sin(2 * np.pi * np.asarray(x)[:, 0]))
    f_true = (1 + a_true) * jnp.sin(2 * jnp.pi * 3 * x[:, 0])
    y = f_true + 0.05 * jnp.asarray(r.randn(60))

    def net(params, x):
        h = jnp.tanh(x @ params["w1"] + params["b1"])
        return (h @ params["w2"] + params["b2"])[:, 0]

    def objective(vs):
        params = {
            "w1": vs.unbounded(0.1 * jnp.asarray(r.randn(1, 8)), name="w1", shape=(1, 8)),
            "b1": vs.unbounded(jnp.zeros(8), name="b1", shape=(8,)),
            "w2": vs.unbounded(0.1 * jnp.asarray(r.randn(8, 1)), name="w2", shape=(8, 1)),
            "b2": vs.unbounded(jnp.zeros(1), name="b2", shape=(1,)),
        }
        g = net(params, x)
        m = Measure()
        a = GP(1e-1 * EQ().stretch(vs.positive(0.2, name="a_scale")), measure=m)
        # y - g = a * g + noise: condition the modulation GP.
        f_mod = a * (lambda z: jnp.interp(jnp.asarray(z)[..., 0], x[:, 0], g))
        resid = y - g
        return -m.logpdf(f_mod(x, vs.positive(0.05, name="noise")), resid)

    vs = Vars()
    objective(vs)
    final = minimise_adam(objective, vs, iters=100, rate=2e-2)
    assert np.isfinite(final)


def test_example9_product():
    with Measure() as prior:
        f1 = GP(3.0, EQ())
        f2 = GP(3.0, EQ())
        f_prod = f1 * f2
    x = jnp.linspace(0, 10, 50)
    key, s1, s2 = prior.sample(_key(5), f1(x), f2(x))
    post = prior.condition((f1(x), s1[:, 0]), (f2(x), s2[:, 0]))
    mean, lower, upper = post(f_prod)(x).marginal_credible_bounds()
    true_prod = np.asarray(s1)[:, 0] * np.asarray(s2)[:, 0]
    # Moment-matched product approximates the true product well (the
    # reference's own tolerance for the product is 5e-2 relative,
    # test_model.py:585).
    rel = np.sqrt(np.mean((np.asarray(mean) - true_prod) ** 2)) / np.sqrt(
        np.mean(true_prod**2)
    )
    assert rel < 0.15, rel


def test_example10_sparse():
    x = jnp.linspace(0, 10, 2000)
    x_ind = jnp.linspace(0, 10, 20)
    f = GP(EQ().periodic(2.0))
    key, y = f.measure.sample(_key(6), f(x, 0.5))
    y = y[:, 0]
    obs = PseudoObs(f(x_ind), (f(x, 0.5), y))
    elbo = float(f.measure.logpdf(obs))
    lp = float(f.measure.logpdf(f(x, 0.5), y))
    assert elbo <= lp
    # The sparse posterior still predicts well.
    post = f.measure.condition(obs)
    mean, _ = post(f)(x).marginals()
    dense_post = f | (f(x, 0.5), y)
    mean_ref, _ = dense_post(x).marginals()
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), atol=0.1)


def test_example11_nonparametric_basis():
    x = jnp.linspace(0, 10, 50)
    x_obs = jnp.linspace(0, 10, 10)
    with Measure() as prior:
        w = lambda z: jnp.exp(-(jnp.asarray(z) ** 2) / 0.5)
        b = [(w * GP(EQ())).shift(float(xi)) for xi in np.asarray(x_obs)]
        f = sum(b)
    key, f_true, y_obs = prior.sample(_key(7), f(x), f(x_obs, 0.2))
    post = prior.condition(f(x_obs, 0.2), y_obs[:, 0])
    mean_f, _ = post(f)(x).marginals()
    # Basis decomposition sums to the full prediction.
    total = np.zeros(50)
    for bi in b:
        mean_b, _ = post(bi)(x).marginals()
        total += np.asarray(mean_b)
    np.testing.assert_allclose(total, np.asarray(mean_f), atol=1e-5)


def test_example12_optimisation_lbfgs():
    x = jnp.linspace(0, 10, 100)
    f_gen = GP(EQ().periodic(1.3))
    key, y = f_gen.measure.sample(_key(8), f_gen(x, 0.2))
    y = y[:, 0]

    def objective(vs):
        f = GP(vs.positive(1.0, name="var") * EQ().stretch(
            vs.positive(1.0, name="scale")
        ).periodic(vs.positive(1.0, name="period")))
        return -f.measure.logpdf(f(x, vs.positive(0.1, name="noise")), y)

    vs = Vars()
    init = float(objective(vs))
    final = minimise_lbfgs(objective, vs, iters=40)
    assert final < init
    # The NLML over periods is multimodal, so assert predictive quality
    # rather than exact period identification.
    f = GP(vs["var"] * EQ().stretch(vs["scale"]).periodic(vs["period"]))
    post = f | (f(x, vs["noise"]), y)
    mean, _ = post(x).marginals()
    rmse = np.sqrt(np.mean((np.asarray(mean) - np.asarray(y)) ** 2))
    assert rmse < 3 * np.sqrt(float(vs["noise"])) + 0.2, rmse


def test_example13_optimisation_adam():
    x = jnp.linspace(0, 10, 100)
    f_gen = GP(2.0 * EQ().stretch(1.0))
    key, y = f_gen.measure.sample(_key(9), f_gen(x, 0.1))
    y = y[:, 0]

    def objective(vs):
        f = GP(vs.positive(1.0, name="var") * EQ().stretch(vs.positive(1.0, name="scale")))
        return -f.measure.logpdf(f(x, vs.positive(0.2, name="noise")), y)

    vs = Vars()
    init = float(objective(vs))
    final = minimise_adam(objective, vs, iters=200, rate=5e-2)
    assert final < init
    assert 0.02 < float(vs["noise"]) < 0.5
