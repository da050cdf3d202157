"""NUTS sampler tests: correctness of the stationary distribution on
Gaussians (moments + correlation), GP-hyperparameter posteriors, and
chain-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP
from stheno_tpu.opt import sample_nuts


def test_nuts_standard_gaussian():
    logpdf = lambda p: -0.5 * jnp.sum(p["w"] ** 2)
    samples, accept = sample_nuts(
        logpdf,
        {"w": jnp.zeros(3)},
        jax.random.PRNGKey(0),
        num_samples=400,
        num_warmup=200,
        max_depth=6,
        num_chains=2,
    )
    w = np.asarray(samples["w"]).reshape(-1, 3)
    assert 0.5 < accept <= 1.0, accept
    np.testing.assert_allclose(np.mean(w, axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.std(w, axis=0), 1.0, atol=0.15)


def test_nuts_correlated_gaussian():
    # Strongly correlated target: NUTS's adaptive trajectories must mix where
    # naive short-trajectory HMC struggles.
    rho = 0.95
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    logpdf = lambda p: -0.5 * p["w"] @ prec @ p["w"]
    samples, accept = sample_nuts(
        logpdf,
        {"w": jnp.zeros(2)},
        jax.random.PRNGKey(1),
        num_samples=600,
        num_warmup=300,
        max_depth=8,
        num_chains=2,
    )
    w = np.asarray(samples["w"]).reshape(-1, 2)
    emp_cov = np.cov(w.T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.25)
    emp_rho = emp_cov[0, 1] / np.sqrt(emp_cov[0, 0] * emp_cov[1, 1])
    assert emp_rho > 0.85, emp_rho


def test_nuts_gp_hyperparameters():
    r = np.random.RandomState(0)
    x = jnp.linspace(0, 10, 50)
    f_gen = GP(EQ().stretch(1.5))
    key, y = f_gen.measure.sample(jax.random.PRNGKey(2), f_gen(x, 0.05))
    y = y[:, 0]

    def logpdf(params):
        ell = jnp.exp(params["log_ell"])
        noise = jnp.exp(params["log_noise"])
        f = GP(EQ().stretch(ell))
        prior = -0.5 * (params["log_ell"] ** 2 + (params["log_noise"] + 2) ** 2)
        return f.measure.logpdf(f(x, noise), y) + prior

    samples, accept = sample_nuts(
        logpdf,
        {"log_ell": jnp.asarray(0.0), "log_noise": jnp.asarray(-2.0)},
        jax.random.PRNGKey(3),
        num_samples=150,
        num_warmup=150,
        max_depth=6,
        num_chains=2,
    )
    assert accept > 0.4, accept
    ells = np.exp(np.asarray(samples["log_ell"]).ravel())
    assert 0.8 < np.median(ells) < 3.0, np.median(ells)


def test_nuts_sharded_chains():
    mesh = jax.make_mesh((8,), ("chains",))
    logpdf = lambda p: -0.5 * jnp.sum(p["w"] ** 2)
    samples, accept = sample_nuts(
        logpdf,
        {"w": jnp.zeros(2)},
        jax.random.PRNGKey(4),
        num_samples=100,
        num_warmup=100,
        max_depth=5,
        num_chains=8,
        mesh=mesh,
    )
    assert samples["w"].shape == (8, 100, 2)
    w = np.asarray(samples["w"]).reshape(-1, 2)
    np.testing.assert_allclose(np.std(w, axis=0), 1.0, atol=0.2)
