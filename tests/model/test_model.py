"""Model-DSL semantics tests, porting the strategy of
``/root/reference/tests/model/test_model.py``: conditioning sugar
equivalence across noise shapes, posterior chaining, pseudo-point
approximations vs exact conditioning, input transforms verified by
conditioning both ways, moment-matched products, measure bookkeeping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from stheno_tpu import (
    EQ,
    FDD,
    GP,
    Linear,
    Measure,
    Obs,
    Observations,
    PseudoObs,
    PseudoObsDTC,
    PseudoObsFITC,
    ZeroKernel,
    cross,
)
from tests.util import approx


def _setup(n=10, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(np.sort(r.rand(n) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.2 * r.randn(n))
    return x, y


def assert_equal_normals(d1, d2, atol=1e-7):
    approx(d1.mean, d2.mean, atol=atol, rtol=1e-6)
    approx(M.dense(d1.var), M.dense(d2.var), atol=atol, rtol=1e-6)


def assert_equal_measures(fdds, post_ref, *posts, atol=1e-7):
    for post in posts:
        for fdd in fdds:
            assert_equal_normals(post_ref(fdd), post(fdd), atol=atol)


# -- measure bookkeeping ---------------------------------------------------


def test_measure_groups_and_backrefs():
    prior = Measure()
    f1 = GP(EQ(), measure=prior)
    f2 = GP(EQ().stretch(2.0), measure=prior)
    assert f1._measures == [prior]
    fsum = f1 + f2
    assert fsum.measure is prior
    x, y = _setup()
    post = prior.condition(fsum(x, 0.1), y)
    # Posterior is appended to the back-references of the prior processes.
    assert post in f1._measures
    assert post in fsum._measures
    # Operations on prior GPs after conditioning also extend the posterior.
    fdiff = f1 - f2
    assert post in fdiff._measures
    post(fdiff)(x).marginals()


def test_default_measure_context():
    m = Measure()
    with m:
        f = GP(EQ())
        assert f.measure is m
        m2 = Measure()
        with m2:
            g = GP(EQ())
            assert g.measure is m2
        h = GP(EQ())
        assert h.measure is m
    out = GP(EQ())
    assert out.measure is not m


def test_naming():
    m = Measure()
    f = GP(EQ(), measure=m, name="f")
    assert m["f"] is f
    assert m[f] == "f"
    assert f.name == "f"
    g = GP(EQ(), measure=m)
    with pytest.raises(RuntimeError):
        m.name(g, "f")
    g.name = "g"
    assert m["g"] is g


def test_mixed_measures_raise():
    f1 = GP(EQ())
    f2 = GP(EQ())
    with pytest.raises(AssertionError):
        f1 + f2


# -- conditioning sugar ----------------------------------------------------


NOISE_SHAPES = [
    lambda n: None,
    lambda n: 0.1,
    lambda n: jnp.full((n,), 0.1),
    lambda n: M.Diagonal(jnp.full((n,), 0.1)),
    lambda n: M.Dense(0.1 * jnp.eye(n)),
]


@pytest.mark.parametrize("noise_fn", NOISE_SHAPES)
def test_conditioning_sugar_equivalence(noise_fn):
    f = GP(EQ())
    x, y = _setup()
    noise = noise_fn(10)
    fdd = f(x, noise)
    x_new = jnp.linspace(0, 10, 7)

    post1 = (f | (fdd, y))(x_new)
    post2 = f.condition(fdd, y)(x_new)
    post3 = f.measure.condition(fdd, y)(f)(x_new)
    post4 = (f | Obs(fdd, y))(x_new)
    post5 = f.measure.condition(Observations((fdd, y)))(f)(x_new)
    assert_equal_normals(post1, post2)
    assert_equal_normals(post1, post3)
    assert_equal_normals(post1, post4)
    assert_equal_normals(post1, post5)


def test_posterior_closed_form():
    # Direct check against the textbook GP posterior.
    f = GP(EQ())
    x, y = _setup()
    x_new = jnp.linspace(0, 10, 7)
    sigma2 = 0.1
    post = (f | (f(x, sigma2), y))(x_new)

    K = np.asarray(M.dense(EQ()(x)))
    Ks = np.asarray(M.dense(EQ()(x, x_new)))
    Kss = np.asarray(M.dense(EQ()(x_new)))
    A = K + sigma2 * np.eye(10)
    ref_mean = Ks.T @ np.linalg.solve(A, np.asarray(y))[:, None] if np.asarray(y).ndim == 1 else None
    ref_mean = Ks.T @ np.linalg.solve(A, np.asarray(y)[:, None])
    ref_var = Kss - Ks.T @ np.linalg.solve(A, Ks)
    approx(post.mean, ref_mean, atol=1e-7, rtol=1e-6)
    approx(M.dense(post.var), ref_var, atol=1e-7, rtol=1e-6)
    # Prediction at observed points reproduces the data (noise-free target).
    post_obs = (f | (f(x, None), y))(x)
    approx(post_obs.mean[:, 0], y, atol=1e-5, rtol=1e-5)


def test_posterior_of_posterior():
    f = GP(EQ())
    x, y = _setup(10, 0)
    x2, y2 = _setup(8, 1)
    x_new = jnp.linspace(0, 10, 5)
    post1 = f | (f(x, 0.1), y)
    post2 = post1 | (post1(x2, 0.1), y2)
    # Equivalent to conditioning on everything at once.
    joint = f | ((f(x, 0.1), y), (f(x2, 0.1), y2))
    assert_equal_normals(post2(x_new), joint(x_new), atol=1e-6)


def test_empty_observations():
    f = GP(EQ())
    x_new = jnp.linspace(0, 10, 5)
    post = f | (f(jnp.zeros((0,)), None), jnp.zeros((0,)))
    assert_equal_normals(post(x_new), f(x_new))


def test_nan_missing_data():
    f = GP(EQ())
    x, y = _setup()
    y_missing = np.asarray(y).copy()
    y_missing[3] = np.nan
    y_missing[7] = np.nan
    keep = np.array([i for i in range(10) if i not in (3, 7)])
    x_new = jnp.linspace(0, 10, 5)
    post_missing = (f | (f(x, 0.1), jnp.asarray(y_missing)))(x_new)
    post_ref = (f | (f(x[keep], 0.1), y[keep]))(x_new)
    assert_equal_normals(post_missing, post_ref)


# -- pseudo-point approximations ------------------------------------------


@pytest.mark.parametrize("cls", [PseudoObs, PseudoObsFITC, PseudoObsDTC])
@pytest.mark.parametrize(
    "noise_fn",
    [lambda n: 0.1, lambda n: jnp.full((n,), 0.1)],
)
def test_pseudo_equals_exact_when_inducing_at_data(cls, noise_fn):
    f = GP(EQ())
    x, y = _setup()
    noise = noise_fn(10)
    fdd = f(x, noise)
    obs = cls(f(x), (fdd, y))
    x_new = jnp.linspace(0, 10, 6)
    post_pseudo = f.measure.condition(obs)(f)(x_new)
    post_exact = (f | (fdd, y))(x_new)
    assert_equal_normals(post_pseudo, post_exact, atol=1e-5)
    # ELBO == exact logpdf when the inducing points are the data points.
    elbo = obs.elbo(f.measure)
    lp = f.measure.logpdf(fdd, y)
    approx(elbo, lp, atol=1e-6, rtol=1e-6)


def test_pseudo_dense_noise_rejected():
    f = GP(EQ())
    x, y = _setup()
    obs = PseudoObs(f(x), (f(x, M.Dense(0.1 * jnp.eye(10))), y))
    with pytest.raises(RuntimeError, match="diagonal"):
        obs.elbo(f.measure)


def test_pseudo_caching_identity():
    f = GP(EQ())
    x, y = _setup()
    obs = PseudoObs(f(jnp.linspace(0, 10, 5)), (f(x, 0.1), y))
    assert obs.elbo(f.measure) is obs.elbo(f.measure)
    assert obs.K_z(f.measure) is obs.K_z(f.measure)
    assert obs.mu(f.measure) is obs.mu(f.measure)
    assert obs.A(f.measure) is obs.A(f.measure)


def test_elbo_lower_bounds_logpdf():
    f = GP(EQ())
    x, y = _setup(20)
    fdd = f(x, 0.1)
    lp = float(f.measure.logpdf(fdd, y))
    for m_ind in [3, 8, 15]:
        z = jnp.linspace(0, 10, m_ind)
        elbo = float(f.measure.logpdf(PseudoObs(f(z), (fdd, y))))
        assert elbo <= lp + 1e-6


# -- algebraic transforms verified by conditioning both ways ----------------


def _both_ways(make_transformed, make_manual, n=10, atol=1e-6):
    """Condition the transformed GP and the manually-transformed GP on the
    same data and check they agree (reference strategy,
    ``test_model.py:429-530``)."""
    x, y = _setup(n)
    x_new = jnp.linspace(0, 10, 5)
    f = GP(EQ())
    g1 = make_transformed(f)
    g2 = make_manual()
    post1 = (g1 | (g1(x, 0.1), y))(x_new)
    post2 = (g2 | (g2(x, 0.1), y))(x_new)
    assert_equal_normals(post1, post2, atol=atol)


def test_shift():
    _both_ways(lambda f: f.shift(2.0), lambda: GP(EQ().shift(2.0)))
    # Conditioning a shifted GP equals conditioning on shifted inputs.
    f = GP(EQ())
    g = f.shift(2.0)
    x, y = _setup()
    x_new = jnp.linspace(0, 10, 5)
    post_g = (g | (g(x, 0.1), y))(x_new)
    post_f = (f | (f(x - 2.0, 0.1), y))(x_new - 2.0)
    assert_equal_normals(post_g, post_f, atol=1e-6)


def test_stretch():
    _both_ways(lambda f: f.stretch(2.0), lambda: GP(EQ().stretch(2.0)))
    f = GP(EQ())
    g = f.stretch(2.0)
    x, y = _setup()
    x_new = jnp.linspace(0, 10, 5)
    post_g = (g | (g(x, 0.1), y))(x_new)
    post_f = (f | (f(x / 2.0, 0.1), y))(x_new / 2.0)
    assert_equal_normals(post_g, post_f, atol=1e-6)


def test_transform():
    warp = lambda z: 2 * z
    _both_ways(lambda f: f.transform(warp), lambda: GP(EQ().transform(warp)))


def test_select():
    r = np.random.RandomState(0)
    x2d = jnp.asarray(r.randn(10, 2))
    y = jnp.asarray(np.sin(np.asarray(x2d)[:, 0]))
    f = GP(EQ())
    g = f.select(0)
    post = (g | (g(x2d, 0.1), y))(x2d)
    # Equivalent: condition f on the selected column.
    post_ref = (f | (f(x2d[:, 0], 0.1), y))(x2d[:, 0])
    assert_equal_normals(post, post_ref, atol=1e-6)


def test_sum_with_function_and_constant():
    f = GP(EQ())
    x, y = _setup()
    x_new = jnp.linspace(0, 10, 5)
    g = f + 5.0
    post = (g | (g(x, 0.1), y))(x_new)
    post_f = (f | (f(x, 0.1), y - 5.0))(x_new)
    approx(post.mean, jnp.asarray(post_f.mean) + 5.0, atol=1e-6, rtol=1e-6)
    approx(M.dense(post.var), M.dense(post_f.var), atol=1e-7)
    # Function sum.
    fn = lambda z: jnp.sin(jnp.asarray(z))[..., 0:1] if jnp.asarray(z).ndim > 1 else jnp.sin(z)
    h = f + fn
    mean_h = h(x).mean
    approx(mean_h[:, 0], jnp.sin(x), atol=1e-8)


def test_mul_constant():
    f = GP(EQ())
    x, y = _setup()
    x_new = jnp.linspace(0, 10, 5)
    g = f * 2.0
    post_g = (g | (g(x, 0.1), y))(x_new)
    post_f = (f | (f(x, 0.1 / 4), y / 2.0))(x_new)
    approx(post_g.mean, 2 * jnp.asarray(post_f.mean), atol=1e-6, rtol=1e-5)
    approx(
        M.dense(post_g.var), 4 * jnp.asarray(M.dense(post_f.var)), atol=1e-6
    )


def test_mul_function():
    f = GP(EQ())
    fn = lambda z: (jnp.asarray(z) ** 2 + 1.0)
    g = f * fn
    x, _ = _setup()
    # Variance scales by f(x) f(x)^T elementwise on the diagonal.
    vf = jnp.asarray(M.dense(f(x).var))
    vg = jnp.asarray(M.dense(g(x).var))
    scalefac = np.asarray(x) ** 2 + 1
    approx(vg, vf * scalefac[:, None] * scalefac[None, :], rtol=1e-7)


def test_moment_matched_product():
    # GP * GP via moment matching: mean of product = product of means +
    # cross-covariance terms; verified by Monte Carlo (reference tolerance
    # 5e-2, ``test_model.py:573-592``).
    m = Measure()
    f1 = GP(lambda z: jnp.asarray(z) ** 2 / 20.0, EQ(), measure=m)
    f2 = GP(lambda z: jnp.sin(jnp.asarray(z)), EQ().stretch(2.0), measure=m)
    g = f1 * f2
    x = jnp.linspace(0, 5, 6)
    mean_g = jnp.asarray(g(x).mean)[:, 0]
    m1 = (np.asarray(x) ** 2 / 20) * np.sin(np.asarray(x))
    # Independent priors: E[f1 f2] = E f1 E f2.
    np.testing.assert_allclose(mean_g, m1, atol=1e-6)
    # Variance: var = m1^2 var2 + m2^2 var1 + var1 var2 (for independents).
    vg = np.diag(np.asarray(M.dense(g(x).var)))
    mu1 = np.asarray(x) ** 2 / 20
    mu2 = np.sin(np.asarray(x))
    ref = mu1**2 * 1.0 + mu2**2 * 1.0 + 1.0
    np.testing.assert_allclose(vg, ref, rtol=5e-2)


def test_manual_add_gp():
    # add_gp with explicit cross-rules equals the sum of two GPs
    # (reference ``test_model.py:407-426``).
    m = Measure()
    p1 = GP(1.0, EQ(), measure=m)
    p2 = GP(2.0, EQ().stretch(2.0), measure=m)
    p_sum = p1 + p2
    p_manual = m.add_gp(
        m.means[p1] + m.means[p2],
        m.kernels[p1] + m.kernels[p2] + m.kernels[p1, p2] + m.kernels[p2, p1],
        lambda j: m.kernels[p1, j] + m.kernels[p2, j],
    )
    x = jnp.linspace(0, 10, 8)
    assert_equal_normals(p_sum(x), p_manual(x))
    # Cross-kernels agree too.
    approx(
        M.dense(m.kernels[p_sum, p1](x, x)),
        M.dense(m.kernels[p_manual, p1](x, x)),
        rtol=1e-8,
    )


def test_joint_logpdf_chain_rule():
    # logpdf(y1, y2) = logpdf(y1) + logpdf(y2 | y1)
    # (reference ``test_model.py:375-398``).
    prior = Measure()
    f = GP(EQ(), measure=prior)
    x1, y1 = _setup(6, 0)
    x2, y2 = _setup(5, 1)
    joint = prior.logpdf((f(x1, 0.1), y1), (f(x2, 0.1), y2))
    lp1 = prior.logpdf(f(x1, 0.1), y1)
    post = prior.condition(f(x1, 0.1), y1)
    lp2 = post.logpdf(post(f)(x2, 0.1), y2)
    approx(joint, jnp.asarray(lp1) + jnp.asarray(lp2), rtol=1e-6)


def test_sample_under_correct_measure():
    prior = Measure()
    f = GP(EQ(), measure=prior)
    x, y = _setup()
    post = prior.condition(f(x, 0.001), y)
    key = jax.random.PRNGKey(0)
    key, s = post.sample(key, f(x))
    # Posterior samples at observed points track the data closely.
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(y), atol=0.3)
    # Multi-FDD sampling returns consistent shapes.
    x2 = jnp.linspace(0, 10, 4)
    key, s1, s2 = post.sample(key, 3, f(x), f(x2))
    assert s1.shape == (10, 3) and s2.shape == (4, 3)


def test_cross_sampling_consistency():
    m = Measure()
    f1 = GP(EQ(), measure=m)
    f2 = GP(EQ(), measure=m)
    fsum = f1 + f2
    x = jnp.linspace(0, 3, 5)
    key = jax.random.PRNGKey(42)
    key, s1, s2, ssum = m.sample(key, f1(x), f2(x), fsum(x))
    # The joint covariance of (f1, f2, f1+f2) is singular; the Cholesky
    # jitter makes the consistency hold only to ~sqrt(epsilon).
    np.testing.assert_allclose(
        np.asarray(s1) + np.asarray(s2), np.asarray(ssum), atol=1e-4
    )


def test_fdd_take():
    from stheno_tpu.model import take

    f = GP(EQ())
    x, _ = _setup()
    fdd = f(x, 0.1)
    mask = np.array([True] * 5 + [False] * 5)
    sub = take(fdd, mask)
    assert sub.noise.shape == (5, 5)
    approx(jnp.asarray(sub.x), jnp.asarray(x)[:5])


# -- kernel-evaluation-count contract --------------------------------------


def test_pseudo_posterior_kernel_evaluation_contract():
    """Pins the evaluation contract of
    ``/root/reference/tests/model/test_model.py:335-365``: computing
    posterior marginals after pseudo-point conditioning may evaluate
    pairwise Grams only at (x_obs, x_ind), (x_ind, x_ind), (x_ind, x_new)
    and elwise columns at (x_obs,), (x_new,) — never an O(n_obs^2) or
    O(n_new^2) Gram."""
    from stheno_tpu.kernels.kernel import EQ, Kernel

    calls = {"pairwise": [], "elwise": []}

    class CountingEQ(Kernel):
        def __init__(self):
            self._inner = EQ()

        def _pairwise(self, x, y):
            calls["pairwise"].append((x.shape[-2], y.shape[-2]))
            return self._inner._pairwise(x, y)

        def _elwise(self, x, y):
            calls["elwise"].append(x.shape[-2])
            return self._inner._elwise(x, y)

        def _scalar(self, x, y):
            return self._inner._scalar(x, y)

        @property
        def stationary(self):
            return True

    n_obs, n_ind, n_new = 40, 7, 11  # Distinct sizes identify each eval.
    r = np.random.RandomState(4)
    x_obs = jnp.asarray(np.sort(r.rand(n_obs) * 10))
    x_ind = jnp.asarray(np.linspace(0, 10, n_ind))
    x_new = jnp.asarray(np.linspace(0, 10, n_new))
    y = jnp.asarray(np.sin(np.asarray(x_obs)))

    f = GP(CountingEQ())
    post = f | PseudoObs(f(x_ind), (f(x_obs, 0.1), y))
    mean, var = post(x_new).marginals()
    assert np.all(np.isfinite(np.asarray(mean)))

    allowed_pairwise = {
        (n_obs, n_ind), (n_ind, n_obs), (n_ind, n_ind),
        (n_ind, n_new), (n_new, n_ind),
    }
    assert set(calls["pairwise"]) <= allowed_pairwise, calls["pairwise"]
    assert set(calls["elwise"]) <= {n_obs, n_new}, calls["elwise"]
    # In particular: no dense Gram over the observations or test points.
    assert (n_obs, n_obs) not in calls["pairwise"]
    assert (n_new, n_new) not in calls["pairwise"]
