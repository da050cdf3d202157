"""Random-feature expansions and pathwise posterior sampling: feature maps
must reproduce their kernels, and Matheron function draws must have the
closed-form posterior's moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import (
    EQ,
    GP,
    Linear,
    Matern12,
    Matern32,
    RQ,
    feature_map,
    pathwise_sampler,
)
from stheno_tpu.kernels import pairwise
from stheno_tpu.matrix import dense


KERNELS = [
    ("eq", EQ()),
    ("eq_scaled_stretched", 2.0 * EQ().stretch(1.5)),
    ("matern32", Matern32()),
    ("matern12_stretch", Matern12().stretch(2.0)),
    ("rq", RQ(1.5)),
    ("sum_mixed", 0.5 * EQ() + 0.1 * Linear() + 0.2),
    ("product", EQ() * Matern32()),
    ("periodic", EQ().stretch(1.4).periodic(2.0)),
    ("shifted", EQ().shift(3.0)),
]


@pytest.mark.parametrize("name,k", KERNELS, ids=[n for n, _ in KERNELS])
def test_feature_map_approximates_kernel(name, k):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(25, 2))
    phi, n_feat = feature_map(k, jax.random.PRNGKey(0), 16384, d=2)
    F = phi(x)
    assert F.shape == (25, n_feat)
    K_approx = np.asarray(F @ F.T)
    K_true = np.asarray(dense(pairwise(k, x)))
    err = np.max(np.abs(K_approx - K_true))
    assert err < 0.08, (name, err)


def test_feature_map_exact_for_finite_bases():
    # Linear + constant have exact finite features: error at machine level.
    k = Linear() + 2.0
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(10, 3))
    phi, n_feat = feature_map(k, jax.random.PRNGKey(0), 64, d=3)
    assert n_feat == 4  # 3 linear + 1 constant.
    K_approx = np.asarray(phi(x) @ phi(x).T)
    K_true = np.asarray(dense(pairwise(k, x)))
    np.testing.assert_allclose(K_approx, K_true, rtol=1e-10, atol=1e-10)


def test_feature_map_rejects_unsupported():
    from stheno_tpu import Delta

    with pytest.raises(ValueError, match="random-feature"):
        feature_map(Delta(), jax.random.PRNGKey(0), 128, d=1)


@pytest.mark.parametrize("solver", ["chol", "cg"])
def test_pathwise_posterior_moments(solver):
    """Empirical mean/cov of many pathwise draws match the closed-form
    posterior (feature + Monte-Carlo tolerance)."""
    r = np.random.RandomState(2)
    x = jnp.asarray(np.sort(r.rand(40) * 10))
    noise = 0.1
    k = 1.5 * EQ().stretch(1.2)
    f = GP(k)
    key = jax.random.PRNGKey(0)
    key, y = f.measure.sample(key, f(x, noise))
    y = y[:, 0]

    x_new = jnp.linspace(0, 10, 15)
    sample_fn, key = pathwise_sampler(
        k, x, y, noise, key, num_samples=4000, num_features=4096,
        solver=solver, block=64,
    )
    draws = np.asarray(sample_fn(x_new))  # (15, 4000)
    assert draws.shape == (15, 4000)

    post = f | (f(x, noise), y)
    mean_ref, var_ref = post(x_new).marginals()
    mean_emp = draws.mean(axis=1)
    var_emp = draws.var(axis=1)
    np.testing.assert_allclose(
        mean_emp, np.asarray(mean_ref), atol=0.08
    )
    np.testing.assert_allclose(
        var_emp, np.asarray(var_ref), atol=0.08
    )
    # Off-diagonal posterior covariance too (function draws, not marginals).
    cov_emp = np.cov(draws)
    cov_ref = np.asarray(dense(post(x_new).var))
    assert np.max(np.abs(cov_emp - cov_ref)) < 0.1


def test_pathwise_draws_are_functions():
    """Repeated evaluation gives the same functions; evaluation at the
    observation inputs interpolates the data at low noise."""
    r = np.random.RandomState(3)
    x = jnp.asarray(np.sort(r.rand(30) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)))
    sample_fn, _ = pathwise_sampler(
        EQ(), x, y, 1e-4, jax.random.PRNGKey(1), num_samples=3,
        num_features=2048,
    )
    a = np.asarray(sample_fn(jnp.linspace(0, 10, 7)))
    b = np.asarray(sample_fn(jnp.linspace(0, 10, 7)))
    np.testing.assert_allclose(a, b, rtol=1e-12)  # Same fixed functions.
    at_obs = np.asarray(sample_fn(x))
    np.testing.assert_allclose(
        at_obs, np.asarray(y)[:, None] * np.ones((1, 3)), atol=0.05
    )


def test_pathwise_jits():
    x = jnp.linspace(0, 10, 20)
    y = jnp.sin(x)

    @jax.jit
    def draw(key, x_new):
        fn, _ = pathwise_sampler(
            EQ(), x, y, 0.01, key, num_samples=2, num_features=256
        )
        return fn(x_new)

    out = draw(jax.random.PRNGKey(0), jnp.linspace(0, 10, 9))
    assert out.shape == (9, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_pathwise_on_mesh():
    """CG solve + sample evaluation distribute over a device mesh and match
    the single-device path."""
    from stheno_tpu.parallel import make_data_mesh

    mesh = make_data_mesh(8)
    r = np.random.RandomState(5)
    x = jnp.asarray(np.sort(r.rand(48) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)))
    common = dict(num_samples=3, num_features=512, solver="cg", block=8,
                  cg_tol=1e-10, precond_rank=20)
    fn_mesh, _ = pathwise_sampler(
        EQ(), x, y, 0.01, jax.random.PRNGKey(4), mesh=mesh, **common
    )
    fn_one, _ = pathwise_sampler(
        EQ(), x, y, 0.01, jax.random.PRNGKey(4), **common
    )
    x_new = jnp.linspace(0, 10, 21)
    np.testing.assert_allclose(
        np.asarray(fn_mesh(x_new)), np.asarray(fn_one(x_new)),
        rtol=1e-8, atol=1e-10,
    )


def test_pathwise_cg_stall_warns_and_returns_info():
    """r4: a stalled update solve must not silently feed junk weights to
    every draw — the eager build warns loudly, and ``return_info=True``
    surfaces the health dict for jitted builds."""
    import warnings

    import numpy as np

    from stheno_tpu import EQ, pathwise_sampler

    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(120)) * 10)
    y = jnp.sin(x)
    # Starve CG (1 iteration, impossible tol, no preconditioner) to force
    # a stall deterministically.
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fn, _, info = pathwise_sampler(
            EQ(), x, y, 0.1, jax.random.PRNGKey(0), num_samples=2,
            solver="cg", cg_tol=1e-14, max_cg_iters=1, precond_rank=0,
            return_info=True,
        )
    assert any("STALLED" in str(w.message) for w in rec)
    assert float(info["rel_residual"]) > 1e-14

    # Healthy solve: no warning, info surfaced.
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fn, _, info = pathwise_sampler(
            EQ(), x, y, 0.1, jax.random.PRNGKey(0), num_samples=2,
            solver="cg", cg_tol=1e-8, max_cg_iters=500, precond_rank=40,
            return_info=True,
        )
    assert not any("STALLED" in str(w.message) for w in rec)
    assert float(info["rel_residual"]) <= 1e-8
    assert fn(jnp.linspace(0, 10, 7)).shape == (7, 2)
