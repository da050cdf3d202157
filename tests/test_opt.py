"""Hyperparameter learning tests: NLML optimisation recovers known
hyperparameters (the reference's examples 3/12/13 workflows) and HMC samples
concentrate around them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP, Measure
from stheno_tpu.opt import Vars, minimise_adam, minimise_lbfgs, sample_hmc


def _data(ell=1.5, s2=2.0, noise=0.05, n=150, seed=0):
    f = GP(s2 * EQ().stretch(ell))
    x = jnp.linspace(0, 15, n)
    key = jax.random.PRNGKey(seed)
    key, y = f.measure.sample(key, f(x, noise))
    return x, y[:, 0]


def _nlml(vs, x, y):
    ell = vs.positive(1.0, name="ell")
    s2 = vs.positive(1.0, name="s2")
    noise = vs.positive(0.1, name="noise")
    f = GP(s2 * EQ().stretch(ell))
    return -f.measure.logpdf(f(x, noise), y)


def test_vars():
    vs = Vars()
    p = vs.positive(2.0, name="p")
    np.testing.assert_allclose(float(p), 2.0, rtol=1e-10)
    b = vs.bounded(0.5, 0.1, 0.9, name="b")
    np.testing.assert_allclose(float(b), 0.5, rtol=1e-8)
    u = vs.unbounded(-3.0, name="u")
    np.testing.assert_allclose(float(u), -3.0)
    # Get-or-create: second call returns the stored value, ignoring init.
    np.testing.assert_allclose(float(vs.positive(99.0, name="p")), 2.0)
    # Functional view.
    latent = vs.latent_dict()
    view = vs.with_latent({k: v + 0.0 for k, v in latent.items()})
    np.testing.assert_allclose(float(view["p"]), 2.0, rtol=1e-10)


def test_lbfgs_recovers_hypers():
    x, y = _data()
    vs = Vars()
    _nlml(vs, x, y)  # Register parameters.
    final = minimise_lbfgs(lambda v: _nlml(v, x, y), vs, iters=60)
    assert np.isfinite(final)
    ell = float(vs["ell"])
    noise = float(vs["noise"])
    assert 0.8 < ell < 2.8, ell
    assert 0.01 < noise < 0.2, noise
    # Optimised NLML beats the initial one.
    vs0 = Vars()
    init = float(_nlml(vs0, x, y))
    assert final < init


def test_adam_improves():
    x, y = _data()
    vs = Vars()
    init = float(_nlml(vs, x, y))
    final = minimise_adam(lambda v: _nlml(v, x, y), vs, iters=150, rate=5e-2)
    assert final < init


def test_hmc_samples():
    x, y = _data(n=60)

    def logpdf(params):
        ell = jnp.exp(params["log_ell"])
        noise = jnp.exp(params["log_noise"])
        f = GP(EQ().stretch(ell))
        # Log-normal priors keep things proper.
        prior = -0.5 * (params["log_ell"] ** 2 + params["log_noise"] ** 2)
        return f.measure.logpdf(f(x, noise), y) + prior

    init = {"log_ell": jnp.asarray(0.0), "log_noise": jnp.asarray(-2.0)}
    samples, logps, accept = sample_hmc(
        logpdf,
        init,
        jax.random.PRNGKey(0),
        num_samples=100,
        num_warmup=100,
        n_leapfrog=8,
        num_chains=2,
    )
    assert samples["log_ell"].shape == (2, 100)
    assert 0.2 < accept <= 1.0, accept
    ells = np.exp(np.asarray(samples["log_ell"]).ravel())
    assert 0.5 < np.median(ells) < 4.0


def test_hmc_sharded_chains():
    # Chains sharded over the virtual 8-device CPU mesh.
    mesh = jax.make_mesh((8,), ("chains",))
    logpdf = lambda p: -0.5 * jnp.sum(p["w"] ** 2)
    init = {"w": jnp.zeros(3)}
    samples, _, accept = sample_hmc(
        logpdf,
        init,
        jax.random.PRNGKey(1),
        num_samples=200,
        num_warmup=100,
        n_leapfrog=8,
        num_chains=8,
        mesh=mesh,
    )
    assert samples["w"].shape == (8, 200, 3)
    w = np.asarray(samples["w"]).reshape(-1, 3)
    np.testing.assert_allclose(np.std(w, axis=0), 1.0, atol=0.25)


def test_unnamed_vars_replay_positionally():
    """Unnamed parameters are positional: every objective evaluation reads
    var0, var1, ... instead of registering fresh latents (regression: the
    counter only ever incremented, making optimisation a silent no-op)."""
    from stheno_tpu.opt import Vars, minimise_adam

    vs = Vars()
    f = lambda v: (v.unbounded(0.0) - 3.0) ** 2 + (v.positive(1.0) - 2.0) ** 2
    final = minimise_adam(f, vs, iters=400, rate=0.1)
    assert final < 1e-3
    assert abs(float(vs["var0"]) - 3.0) < 0.05
    assert abs(float(vs["var1"]) - 2.0) < 0.05


def test_minimise_registers_params_on_fresh_vars():
    """minimise_* must discover parameters by evaluating the objective once —
    a fresh Vars is not silently optimised as an empty pytree."""
    from stheno_tpu.opt import Vars, minimise_lbfgs

    vs = Vars()
    final = minimise_lbfgs(
        lambda v: (v.unbounded(10.0, name="w") - 4.0) ** 2, vs, iters=50
    )
    assert final < 1e-6
    assert abs(float(vs["w"]) - 4.0) < 1e-3

    with pytest.raises(ValueError, match="no parameters"):
        minimise_lbfgs(lambda v: jnp.asarray(1.0), Vars(), iters=2)


def test_minimise_adam_chained_dispatch_parity():
    """steps_per_dispatch chains Adam steps in one lax.scan dispatch with
    an identical update sequence (VERDICT r3 #5)."""
    from stheno_tpu.opt import Vars, minimise_adam

    def run(spd):
        vs = Vars()
        f = lambda v: jnp.sum(
            (
                v.unbounded(jnp.zeros(3), name="w", shape=(3,))
                - jnp.asarray([1.0, -2.0, 0.5])
            )
            ** 2
        )
        final = minimise_adam(f, vs, iters=25, rate=0.1,
                              steps_per_dispatch=spd)
        return final, np.asarray(vs["w"])

    f1, w1 = run(1)
    f2, w2 = run(5)
    f3, w3 = run(7)  # Non-divisor: tail runs per-step.
    np.testing.assert_allclose(w1, w2, rtol=1e-12)
    np.testing.assert_allclose(w1, w3, rtol=1e-12)
    np.testing.assert_allclose(f1, f2, rtol=1e-12)
    np.testing.assert_allclose(f1, f3, rtol=1e-12)
