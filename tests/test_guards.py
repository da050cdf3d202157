"""Transfer-guard tests (SURVEY.md §5: the build's stand-in for the
reference's absent sanitizer layer). The DSL builds models host-side at
trace time; the staged computation must execute without any implicit
host<->device transfers — silent transfers through the remote-TPU tunnel
cost ~25 ms each, so a single one erases the kernel-level wins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP, PseudoObs


def test_nlml_step_no_implicit_transfers():
    x = jnp.linspace(0, 10, 64)
    y = jnp.sin(x)

    @jax.jit
    def step(params, y):
        def nlml(p):
            f = GP(EQ().stretch(jnp.exp(p["log_ell"])))
            return -f.measure.logpdf(f(x, 0.1), y)

        return jax.value_and_grad(nlml)(params)

    params = {"log_ell": jnp.asarray(0.2)}
    step(params, y)  # Compile outside the guard.
    with jax.transfer_guard("disallow"):
        val, grads = step(params, y)
    assert np.isfinite(jax.device_get(val))


def test_posterior_marginals_no_implicit_transfers():
    x = jnp.linspace(0, 10, 64)
    y = jnp.sin(x)
    x_new = jnp.linspace(0, 10, 33)

    @jax.jit
    def predict(y):
        f = GP(EQ())
        post = f | (f(x, 0.1), y)
        return post(x_new).marginals()

    predict(y)
    with jax.transfer_guard("disallow"):
        mean, var = predict(y)
    assert np.all(np.isfinite(jax.device_get(mean)))


def test_pseudo_obs_elbo_no_implicit_transfers():
    x = jnp.linspace(0, 10, 128)
    y = jnp.sin(x)
    z = jnp.linspace(0, 10, 9)

    @jax.jit
    def elbo(y):
        f = GP(EQ())
        return f.measure.logpdf(PseudoObs(f(z), (f(x, 0.1), y)))

    elbo(y)
    with jax.transfer_guard("disallow"):
        out = elbo(y)
    assert np.isfinite(jax.device_get(out))
