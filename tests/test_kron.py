"""Kronecker tensor-grid exact inference: matvec/NLML/posterior parity
against the dense path. New capability beyond the reference (whose only
scaling lever is pseudo-points,
/root/reference/stheno/model/observations.py:279-336)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP, Matern32, Matern52
from stheno_tpu.iterative import (
    grid_coords,
    kron_gram_factors,
    kron_matvec,
    kron_nlml,
    kron_posterior,
)


def _dense_kron(kernels, axes):
    Ks = kron_gram_factors(kernels, axes)
    K = np.asarray(Ks[0])
    for Ki in Ks[1:]:
        K = np.kron(K, np.asarray(Ki))
    return K


AXES_2D = (jnp.linspace(0.0, 4.0, 11), jnp.sort(jnp.asarray(
    np.random.RandomState(0).rand(7) * 3.0
)))  # Second axis deliberately NON-uniform (circulant path can't do this).


def test_kron_matvec_matches_dense():
    kernels = (EQ().stretch(0.8), 1.7 * Matern32())
    v = jnp.asarray(np.random.RandomState(1).randn(77, 3))
    out = kron_matvec(kernels, AXES_2D, v, noise=0.05)
    K = _dense_kron(kernels, AXES_2D) + 0.05 * np.eye(77)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def test_kron_matvec_3d_vector():
    axes = (jnp.linspace(0, 1, 4), jnp.linspace(0, 2, 5), jnp.linspace(0, 1, 3))
    kernels = (EQ(), Matern52(), EQ().stretch(0.5))
    v = jnp.asarray(np.random.RandomState(2).randn(60))
    out = kron_matvec(kernels, axes, v)
    K = _dense_kron(kernels, axes)
    assert out.shape == (60,)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-9, atol=1e-9)


def _kf(p):
    # Separable anisotropic EQ: s2 * EQ(ell_1) (x) EQ(ell_2) equals the
    # DSL kernel s2 * EQ().stretch([ell_1, ell_2]) on the full inputs.
    return (
        jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"][0])),
        EQ().stretch(jnp.exp(p["log_ell"][1])),
    )


PARAMS = {
    "log_s2": jnp.asarray(0.3),
    "log_ell": jnp.asarray([-0.2, 0.4]),
}


def _dsl_nlml(p, x, y, noise):
    k = jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    f = GP(k)
    return -f.measure.logpdf(f(x, noise), y)


def test_kron_nlml_exact_value_and_grads():
    x = grid_coords(AXES_2D)
    y = jnp.asarray(np.random.RandomState(3).randn(77))
    noise = jnp.asarray(0.1)

    val, grads = jax.value_and_grad(
        lambda p, nz: kron_nlml(_kf, p, AXES_2D, y, nz), argnums=(0, 1)
    )(PARAMS, noise)
    val_ref, grads_ref = jax.value_and_grad(
        _dsl_nlml, argnums=(0, 3)
    )(PARAMS, x, y, noise)

    # Exact algorithm: tight float64 parity, value AND all gradients
    # (hyperparameters and noise) — no Monte Carlo tolerance.
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-10)
    for leaf, leaf_ref in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads_ref[0])):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(leaf_ref), rtol=1e-7)
    np.testing.assert_allclose(float(grads[1]), float(grads_ref[1]), rtol=1e-7)


def test_kron_nlml_y_gradient_and_jit():
    y = jnp.asarray(np.random.RandomState(4).randn(77))

    @jax.jit
    def g(y):
        return jax.grad(lambda yy: kron_nlml(_kf, PARAMS, AXES_2D, yy, 0.1))(y)

    x = grid_coords(AXES_2D)
    g_ref = jax.grad(lambda yy: _dsl_nlml(PARAMS, x, yy, 0.1))(y)
    np.testing.assert_allclose(np.asarray(g(y)), np.asarray(g_ref), rtol=1e-7)


def test_kron_nlml_1d_reduces_to_dense():
    ax = jnp.linspace(0.0, 5.0, 30)
    y = jnp.sin(ax)
    kf = lambda p: (p["s2"] * EQ().stretch(p["ell"]),)
    params = {"s2": jnp.asarray(1.4), "ell": jnp.asarray(0.9)}
    val = kron_nlml(kf, params, ax, y, 0.05)
    f = GP(params["s2"] * EQ().stretch(params["ell"]))
    np.testing.assert_allclose(
        float(val), float(-f.measure.logpdf(f(ax, 0.05), y)), rtol=1e-9
    )


def test_kron_posterior_matches_dsl():
    y = jnp.asarray(np.random.RandomState(5).randn(77))
    x = grid_coords(AXES_2D)
    x_new = jnp.asarray(np.random.RandomState(6).rand(13, 2) * 3.0)

    mean, var = kron_posterior(_kf, PARAMS, AXES_2D, y, 0.1, x_new)

    k = jnp.exp(PARAMS["log_s2"]) * EQ().stretch(jnp.exp(PARAMS["log_ell"]))
    f = GP(k)
    post = f | (f(x, 0.1), y)
    mean_ref, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-6, atol=1e-10)


def test_kron_rejects_vector_noise_and_mismatch():
    y = jnp.zeros(77)
    with pytest.raises(ValueError, match="scalar"):
        kron_nlml(_kf, PARAMS, AXES_2D, y, jnp.ones(77) * 0.1)
    with pytest.raises(ValueError, match="kernels"):
        kron_matvec((EQ(),), AXES_2D, y)
    with pytest.raises(ValueError, match="columns"):
        kron_posterior(_kf, PARAMS, AXES_2D, y, 0.1, jnp.zeros((4, 3)))


def test_kron_nlml_zero_noise_rank_deficient_finite():
    # With noise == 0 and a numerically rank-deficient factor (a smooth EQ
    # Gram on many close points has eigenvalues clamped to exactly 0) the
    # eigenbasis diagonal D would contain zeros; the dtype-aware jitter
    # floor must keep the NLML and all gradients finite.
    axes = (jnp.linspace(0.0, 1.0, 16), jnp.linspace(0.0, 1.0, 8))
    y = jnp.asarray(np.random.RandomState(5).randn(128)) * 1e-3
    val, grads = jax.value_and_grad(
        lambda p: kron_nlml(_kf, p, axes, y, 0.0)
    )(PARAMS)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(grads))


def test_kron_bwd_clamp_consistency_3d():
    # Three axes exercise the prefix/suffix co-factor products in the
    # analytic backward; parity against the dense DSL gradient checks both
    # the O(d) rewrite and the clamped-reconstruction quad term.
    axes = (jnp.linspace(0, 1, 4), jnp.linspace(0, 2, 5), jnp.linspace(0, 1, 3))

    def kf3(p):
        ell = jnp.exp(p["log_ell"])
        return (
            jnp.exp(p["log_s2"]) * EQ().stretch(ell[0]),
            Matern52().stretch(ell[1]),
            EQ().stretch(ell[0]),
        )

    y = jnp.asarray(np.random.RandomState(6).randn(60))

    def dense_nlml(p):
        Ks = kron_gram_factors(kf3(p), axes)
        K = Ks[0]
        for Ki in Ks[1:]:
            K = jnp.kron(K, Ki)
        Kn = K + 0.1 * jnp.eye(60)
        L = jnp.linalg.cholesky(Kn)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return 0.5 * (
            2 * jnp.sum(jnp.log(jnp.diag(L)))
            + y @ a
            + 60 * jnp.log(2 * jnp.pi)
        )

    val, grads = jax.value_and_grad(
        lambda p: kron_nlml(kf3, p, axes, y, 0.1)
    )(PARAMS)
    val_ref, grads_ref = jax.value_and_grad(dense_nlml)(PARAMS)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-9)
    for leaf, ref in zip(jax.tree.leaves(grads), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref), rtol=1e-6)
