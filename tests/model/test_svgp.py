"""Uncollapsed SVGP (Hensman et al. 2013) — minibatchable ELBO.

Beyond-reference capability (the reference only has the *collapsed* VFE
bound, ``/root/reference/stheno/model/observations.py:279-336``). The
ground-truth anchor is exactly that collapsed bound: at full batch with the
optimal q(u) — reached in one ``rho = 1`` natural-gradient step — the
uncollapsed ELBO must equal ``PseudoObs.elbo`` and the predictive marginals
must equal the ``PseudoObs`` posterior's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import (
    EQ,
    GP,
    PseudoObs,
    svgp_elbo,
    svgp_init,
    svgp_natgrad_step,
    svgp_predict,
)

from ..util import approx


@pytest.fixture()
def problem():
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(60) * 8.0))
    y = jnp.sin(x) + 0.2 * jnp.asarray(r.randn(60))
    z = jnp.linspace(0.0, 8.0, 12)
    noise = 0.05
    k = 1.3 * EQ().stretch(0.9)
    return k, x, y, z, noise


def _collapsed(k, x, y, z, noise):
    f = GP(k)
    return f, PseudoObs(f(z), (f(x, noise), y))


def test_full_batch_natgrad_recovers_collapsed_elbo(problem):
    k, x, y, z, noise = problem
    params = svgp_init(k, z)
    # One rho=1 full-batch natural-gradient step = optimal q(u).
    params = svgp_natgrad_step(k, params, x[:, None], y, noise, 60, rho=1.0)
    elbo = svgp_elbo(k, params, x[:, None], y, noise, 60)
    f, obs = _collapsed(k, x, y, z, noise)
    approx(elbo, obs.elbo(f.measure), rtol=1e-6)


def test_predictions_match_collapsed_posterior(problem):
    k, x, y, z, noise = problem
    params = svgp_natgrad_step(
        k, svgp_init(k, z), x[:, None], y, noise, 60, rho=1.0
    )
    x_new = jnp.linspace(-1.0, 9.0, 40)
    f, obs = _collapsed(k, x, y, z, noise)
    post = f.measure | obs
    mean_ref, var_ref = post(f(x_new)).marginals()
    mean, var = svgp_predict(k, params, x_new[:, None])
    approx(mean, mean_ref, rtol=1e-5, atol=1e-8)
    approx(var, var_ref, rtol=1e-4, atol=1e-8)
    # And with observation noise folded in.
    _, var_n = svgp_predict(k, params, x_new[:, None], noise=noise)
    approx(var_n, var + noise, rtol=1e-6)


def test_minibatch_elbo_is_unbiased_over_partition(problem):
    k, x, y, z, noise = problem
    params = svgp_natgrad_step(
        k, svgp_init(k, z), x[:, None], y, noise, 60, rho=1.0
    )
    full = svgp_elbo(k, params, x[:, None], y, noise, 60)
    batches = [
        svgp_elbo(k, params, x[i : i + 20, None], y[i : i + 20], noise, 60)
        for i in (0, 20, 40)
    ]
    # The likelihood term is scaled by N/B, the KL appears once per batch:
    # mean(batch ELBOs) == full ELBO for a disjoint partition.
    approx(jnp.mean(jnp.stack(batches)), full, rtol=1e-8)


def test_minibatch_natgrad_training_converges_toward_optimum(problem):
    k, x, y, z, noise = problem
    params = svgp_init(k, z)
    r = np.random.RandomState(1)
    for step in range(60):
        idx = jnp.asarray(r.choice(60, size=20, replace=False))
        # Robbins-Monro step-size decay, the standard SVI schedule.
        rho = 0.5 / (1.0 + 0.2 * step)
        params = svgp_natgrad_step(
            k, params, x[idx][:, None], y[idx], noise, 60, rho=rho
        )
    elbo = svgp_elbo(k, params, x[:, None], y, noise, 60)
    f, obs = _collapsed(k, x, y, z, noise)
    opt = obs.elbo(f.measure)
    assert float(elbo) > float(opt) - 1.0  # within a nat of the optimum
    assert float(elbo) <= float(opt) + 1e-6  # never above the optimal bound


def test_elbo_differentiable_in_hyperparameters_and_z(problem):
    k, x, y, z, noise = problem

    def objective(theta, params):
        kern = jnp.exp(theta["log_s2"]) * EQ().stretch(jnp.exp(theta["log_ell"]))
        return -svgp_elbo(kern, params, x[:, None], y, noise, 60)

    # At the whitened init q(eps) = N(0, I) the predictive equals the prior
    # for *any* kernel/inducing locations, so their gradients are exactly
    # zero there — take the gradient at a non-trivial q(u) instead.
    params = svgp_natgrad_step(
        k, svgp_init(k, z), x[:, None], y, noise, 60, rho=1.0
    )
    theta = {"log_s2": jnp.asarray(0.0), "log_ell": jnp.asarray(0.0)}
    g_theta, g_params = jax.jit(jax.grad(objective, argnums=(0, 1)))(
        theta, params
    )
    for leaf in jax.tree.leaves((g_theta, g_params)):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # z gradients flow (inducing-point optimisation).
    assert float(jnp.max(jnp.abs(g_params["z"]))) > 0


def test_adam_training_improves_elbo(problem):
    import optax

    k, x, y, z, noise = problem
    params = svgp_init(k, z)

    @jax.jit
    def loss(p):
        return -svgp_elbo(k, p, x[:, None], y, noise, 60)

    opt = optax.adam(5e-2)
    state = opt.init(params)
    g = jax.jit(jax.grad(loss))
    before = -float(loss(params))
    for _ in range(100):
        updates, state = opt.update(g(params), state)
        params = optax.apply_updates(params, updates)
    after = -float(loss(params))
    assert after > before + 100.0  # large improvement from the prior init


def test_mean_function_matches_collapsed(problem):
    """`mean=` path: SVGP with a prior mean must equal the collapsed bound
    and posterior of a GP with that mean."""
    k, x, y, z, noise = problem
    mean = lambda t: 0.7 * t + 1.2

    params = svgp_init(k, z)
    params = svgp_natgrad_step(
        k, params, x[:, None], y, noise, 60, rho=1.0, mean=mean
    )
    elbo = svgp_elbo(k, params, x[:, None], y, noise, 60, mean=mean)

    f = GP(mean, k)
    obs = PseudoObs(f(z), (f(x, noise), y))
    approx(elbo, obs.elbo(f.measure), rtol=1e-6)

    x_new = jnp.linspace(-1.0, 9.0, 40)
    post = f.measure | obs
    mean_ref, var_ref = post(f(x_new)).marginals()
    m, v = svgp_predict(k, params, x_new[:, None], mean=mean)
    approx(m, mean_ref, rtol=1e-5, atol=1e-8)
    approx(v, var_ref, rtol=1e-4, atol=1e-8)


def test_sharded_batch_matches_replicated(problem):
    k, x, y, z, noise = problem
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    params = svgp_natgrad_step(
        k, svgp_init(k, z), x[:, None], y, noise, 60, rho=1.0
    )
    xb, yb = x[:40, None], y[:40]
    ref = svgp_elbo(k, params, xb, yb, noise, 60)
    x_sh = jax.device_put(xb, NamedSharding(mesh, P("data", None)))
    y_sh = jax.device_put(yb, NamedSharding(mesh, P("data")))
    val = jax.jit(lambda xs, ys: svgp_elbo(k, params, xs, ys, noise, 60))(
        x_sh, y_sh
    )
    approx(val, ref, rtol=1e-10)
