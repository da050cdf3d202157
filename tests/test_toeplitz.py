"""Circulant-embedding grid path: FFT matvec parity against the dense Gram,
multilevel (2-D) grids, and the grid NLML/posterior against the dense exact
path. New capability beyond the reference (whose only scaling lever is
pseudo-points, /root/reference/stheno/model/observations.py:279-336)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP, Linear, Matern32
from stheno_tpu.iterative import (
    circulant_spectrum,
    grid_coords,
    grid_iterative_nlml,
    grid_matvec,
    grid_posterior_mean,
    iterative_nlml,
)
from stheno_tpu.kernels import pairwise
from stheno_tpu.matrix import dense


def _dense_K(k, x, noise=0.0):
    K = np.asarray(dense(pairwise(k, x)))
    return K + noise * np.eye(K.shape[0])


@pytest.mark.parametrize(
    "k",
    [
        EQ(),
        2.0 * EQ().stretch(0.7),
        Matern32() + 0.5 * EQ(),
        EQ().periodic(2.0),
    ],
)
def test_grid_matvec_1d(k):
    x = jnp.linspace(-3.0, 3.0, 64)
    v = jnp.asarray(np.random.RandomState(0).randn(64, 3))
    out = grid_matvec(k, x, v, noise=0.1)
    K = _dense_K(k, x[:, None], 0.1)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def test_grid_matvec_1d_vector_and_vector_noise():
    x = jnp.linspace(0.0, 5.0, 33)  # Odd length exercises padding.
    v = jnp.asarray(np.random.RandomState(1).randn(33))
    nz = jnp.asarray(np.random.RandomState(2).rand(33) + 0.1)
    out = grid_matvec(EQ(), x, v, noise=nz)
    K = _dense_K(EQ(), x[:, None]) + np.diag(np.asarray(nz))
    assert out.shape == (33,)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def test_grid_matvec_2d():
    ax = (jnp.linspace(0.0, 4.0, 12), jnp.linspace(-1.0, 1.0, 9))
    x = grid_coords(ax)
    assert x.shape == (108, 2)
    k = 1.3 * EQ().stretch(0.8)
    v = jnp.asarray(np.random.RandomState(3).randn(108, 2))
    out = grid_matvec(k, ax, v, noise=0.05)
    K = _dense_K(k, x, 0.05)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def test_grid_matvec_anisotropic_stretch_2d():
    ax = (jnp.linspace(0.0, 3.0, 8), jnp.linspace(0.0, 2.0, 6))
    k = EQ().stretch(jnp.asarray([0.5, 1.5]))
    x = grid_coords(ax)
    v = jnp.asarray(np.random.RandomState(4).randn(48))
    out = grid_matvec(k, ax, v)
    K = _dense_K(k, x)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def test_precomputed_spectrum_matches():
    x = jnp.linspace(0.0, 1.0, 16)
    spec = circulant_spectrum(EQ(), x)
    v = jnp.ones(16)
    np.testing.assert_allclose(
        np.asarray(grid_matvec(EQ(), x, v, spectrum=spec)),
        np.asarray(grid_matvec(EQ(), x, v)),
        rtol=1e-12,
    )


def test_non_stationary_rejected():
    with pytest.raises(ValueError, match="stationary"):
        grid_matvec(Linear(), jnp.linspace(0, 1, 8), jnp.ones(8))


def test_grid_nlml_matches_dense_logpdf():
    n = 256
    x = jnp.linspace(0.0, 10.0, n)
    y = jnp.sin(np.asarray(x)) + 0.1 * np.random.RandomState(5).randn(n)
    y = jnp.asarray(y)
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.2), "log_ell": jnp.asarray(-0.3)}
    noise = 0.1

    val, grads = jax.value_and_grad(
        lambda p: grid_iterative_nlml(
            kf, p, x, y, noise, jax.random.PRNGKey(0),
            num_probes=16, cg_tol=1e-8, slq_steps=30, precond_rank=48,
        )
    )(params)

    f = GP(kf(params))
    dense_val = -f.measure.logpdf(f(x, noise), y)
    g_dense = jax.grad(
        lambda p: -(lambda ff: ff.measure.logpdf(ff(x, noise), y))(GP(kf(p)))
    )(params)
    # SLQ logdet is stochastic; quad term is CG-exact.
    np.testing.assert_allclose(float(val), float(dense_val), rtol=2e-3)
    for key in params:
        np.testing.assert_allclose(
            float(grads[key]), float(g_dense[key]), rtol=0.25, atol=0.5
        )


def test_grid_nlml_agrees_with_dense_iterative():
    """Same estimator, same probes — the FFT matvec must agree with the
    blocked dense sweep to matvec rounding."""
    n = 128
    x = jnp.linspace(0.0, 6.0, n)
    y = jnp.asarray(np.cos(np.asarray(x)))
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ()
    params = {"log_s2": jnp.asarray(0.1)}
    kwargs = dict(num_probes=4, cg_tol=1e-10, slq_steps=20, precond_rank=32)
    key = jax.random.PRNGKey(7)
    v_grid = grid_iterative_nlml(kf, params, x, y, 0.2, key, **kwargs)
    v_dense = iterative_nlml(kf, params, x, y, 0.2, key, **kwargs)
    np.testing.assert_allclose(float(v_grid), float(v_dense), rtol=1e-7)


def test_grid_posterior_mean():
    n = 200
    x = jnp.linspace(0.0, 10.0, n)
    y = jnp.asarray(np.sin(np.asarray(x)))
    x_new = jnp.linspace(0.5, 9.5, 17)
    kf = lambda p: EQ().stretch(p["ell"])
    params = {"ell": jnp.asarray(1.0)}
    mean, info = grid_posterior_mean(
        kf, params, x, y, 0.01, x_new, cg_tol=1e-10
    )
    f = GP(kf(params))
    post = f | (f(x, 0.01), y)
    mean_ref = np.asarray(dense(post(x_new).mean))[:, 0]
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-6, atol=1e-8)


def test_grid_nlml_jits_2d():
    ax = (jnp.linspace(0.0, 3.0, 10), jnp.linspace(0.0, 3.0, 10))
    x = grid_coords(ax)
    y = jnp.asarray(np.random.RandomState(8).randn(100))
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.0), "log_ell": jnp.asarray(0.0)}

    @jax.jit
    def step(p):
        return jax.value_and_grad(
            lambda pp: grid_iterative_nlml(
                kf, pp, ax, y, 0.1, jax.random.PRNGKey(1),
                num_probes=4, cg_tol=1e-6, slq_steps=10, precond_rank=16,
            )
        )(p)

    val, grads = step(params)
    assert np.isfinite(float(val))
    for g in jax.tree.leaves(grads):
        assert np.isfinite(float(g))
    # Parity of the 2-D grid NLML value against the dense exact logpdf.
    f = GP(kf(params))
    dense_val = -f.measure.logpdf(f(x, 0.1), y)
    np.testing.assert_allclose(float(val), float(dense_val), rtol=5e-2)


def test_grid_posterior_var_matches_dsl():
    from stheno_tpu.iterative import grid_posterior_var

    axes = (jnp.linspace(0.0, 6.0, 16), jnp.linspace(0.0, 3.0, 8))
    x = grid_coords(axes)
    r = np.random.RandomState(8)
    y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1)) + 0.05 * r.randn(128))
    kf = lambda p: 1.3 * EQ().stretch(0.9)
    x_new = jnp.asarray(r.rand(41, 2) * [[6.0, 3.0]])
    var_g = grid_posterior_var(
        kf, None, axes, y, 0.1, x_new, cg_tol=1e-10, precond_rank=40, chunk=16
    )
    f = GP(1.3 * EQ().stretch(0.9))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var_g), np.asarray(var_ref), rtol=1e-4, atol=1e-8
    )
