"""Iterative (matrix-free) exact-GP tests: CG/Lanczos/pivoted-Cholesky
building blocks and the NLML value/gradient against the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP
from stheno_tpu.iterative import (
    batched_cg,
    iterative_nlml,
    iterative_posterior_mean,
    kernel_matvec,
    lanczos,
    pivoted_cholesky,
    slq_logdet,
    woodbury_preconditioner,
)
from stheno_tpu.kernels import pairwise
from stheno_tpu.matrix import dense


def _setup(n=200, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(np.sort(r.rand(n) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.1 * r.randn(n))
    return x, y


def test_kernel_matvec():
    x, _ = _setup()
    k = EQ()
    v = jnp.asarray(np.random.RandomState(1).randn(200, 3))
    out = kernel_matvec(k, x, v, noise=0.1, block=64)
    K = np.asarray(dense(pairwise(k, x[:, None]))) + 0.1 * np.eye(200)
    np.testing.assert_allclose(np.asarray(out), K @ np.asarray(v), rtol=1e-8)
    # Rank-1 v round-trips shape.
    out1 = kernel_matvec(k, x, v[:, 0], noise=0.1, block=64)
    assert out1.shape == (200,)


def test_batched_cg():
    x, _ = _setup(100)
    k = EQ()
    mv = lambda v: kernel_matvec(k, x, v, noise=0.5, block=64)
    b = jnp.asarray(np.random.RandomState(2).randn(100, 2))
    sol, info = batched_cg(mv, b, tol=1e-10, max_iters=500)
    K = np.asarray(dense(pairwise(k, x[:, None]))) + 0.5 * np.eye(100)
    np.testing.assert_allclose(
        np.asarray(sol), np.linalg.solve(K, np.asarray(b)), rtol=1e-6, atol=1e-8
    )


def test_pivoted_cholesky_preconditioner():
    x, _ = _setup(100)
    k = EQ()
    L = pivoted_cholesky(k, x, 30)
    K = np.asarray(dense(pairwise(k, x[:, None])))
    # Rank-30 pivoted Cholesky captures a smooth 100-point EQ kernel well.
    err = np.linalg.norm(K - np.asarray(L) @ np.asarray(L).T) / np.linalg.norm(K)
    assert err < 1e-3, err
    # Preconditioned CG converges much faster.
    mv = lambda v: kernel_matvec(k, x, v, noise=0.01, block=64)
    b = jnp.asarray(np.random.RandomState(3).randn(100, 1))
    _, info_plain = batched_cg(mv, b, tol=1e-8, max_iters=400)
    pre = woodbury_preconditioner(L, 0.01)
    _, info_pre = batched_cg(mv, b, precond=pre, tol=1e-8, max_iters=400)
    assert int(info_pre["iters"]) < int(info_plain["iters"])
    assert int(info_pre["iters"]) < 25


def test_pivoted_cholesky_rank_exhaustion():
    """Requesting more columns than the kernel's numerical rank must stop
    early with zero columns, not divide round-off noise by ~0 pivots
    (regression: spurious e^60-scale columns made the Woodbury
    preconditioner logdet jump by thousands of nats and NaN'd CG)."""
    x, _ = _setup(120)
    k = 2.0 * EQ().stretch(3.0)  # Very smooth: numerical rank << 60 in f64.
    L = pivoted_cholesky(k, x, 60)
    Ln = np.asarray(L)
    assert np.all(np.isfinite(Ln))
    # No blow-up: column norms stay on the scale of the kernel.
    assert np.max(np.abs(Ln)) < 10.0
    # Dead columns are exactly zero.
    col_norms = np.linalg.norm(Ln, axis=0)
    assert col_norms[-1] == 0.0
    # And the approximation is still accurate.
    K = np.asarray(dense(pairwise(k, x[:, None])))
    err = np.linalg.norm(K - Ln @ Ln.T) / np.linalg.norm(K)
    assert err < 1e-6, err
    # The preconditioned pipeline stays finite end to end.
    from stheno_tpu.iterative.pchol import preconditioner_sqrt_ops

    half_inv, half_fwd, logdet_p = preconditioner_sqrt_ops(L, 0.05)
    assert np.isfinite(float(logdet_p))
    # P^{1/2} and P^{-1/2} invert each other.
    v_probe = jax.random.normal(jax.random.PRNGKey(7), (120,), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(half_inv(half_fwd(v_probe))), np.asarray(v_probe),
        rtol=1e-9, atol=1e-9,
    )
    mv = lambda v: kernel_matvec(k, x, v, noise=0.05, block=64)
    mv_white = lambda v: half_inv(mv(half_inv(v)))
    z = jax.random.normal(jax.random.PRNGKey(1), (120, 8), jnp.float64)
    # Whitened operator ~ identity: Lanczos must survive breakdown
    # (regression: beta -> 0 divided noise by 1e-30 and NaN'd the
    # quadrature).
    est = slq_logdet(mv_white, z, num_steps=16)
    K_noisy = K + 0.05 * np.eye(120)
    ref = np.linalg.slogdet(K_noisy)[1]
    np.testing.assert_allclose(float(est) + float(logdet_p), ref, atol=1.0)


def test_slq_logdet():
    x, _ = _setup(150)
    k = EQ()
    mv = lambda v: kernel_matvec(k, x, v, noise=0.3, block=64)
    z = jax.random.normal(jax.random.PRNGKey(0), (150, 32), jnp.float64)
    est = slq_logdet(mv, z, num_steps=30)
    K = np.asarray(dense(pairwise(k, x[:, None]))) + 0.3 * np.eye(150)
    ref = np.linalg.slogdet(K)[1]
    np.testing.assert_allclose(float(est), ref, rtol=0.05)


def test_iterative_nlml_value_and_grad():
    x, y = _setup(120)

    def kernel_fn(params):
        return jnp.exp(params["log_s2"]) * EQ().stretch(jnp.exp(params["log_ell"]))

    params = {"log_ell": jnp.asarray(0.2), "log_noise_unused": jnp.asarray(0.0), "log_s2": jnp.asarray(0.1)}
    noise = jnp.asarray(0.1)

    def nlml_it(params, noise):
        return iterative_nlml(
            kernel_fn, params, x, y, noise, jax.random.PRNGKey(0),
            num_probes=32, cg_tol=1e-8, slq_steps=30, precond_rank=40, block=64,
        )

    def nlml_dense(params, noise):
        f = GP(kernel_fn(params))
        return -f.measure.logpdf(f(x, noise), y)

    v_it = float(nlml_it(params, noise))
    v_d = float(nlml_dense(params, noise))
    # The SLQ logdet is stochastic; with preconditioner-whitened probes the
    # standard error is a fraction of a nat (vs ~6 unwhitened). Compare
    # absolutely, not relatively to the near-zero NLML.
    assert abs(v_it - v_d) < 1.0, (v_it, v_d)

    g_it = jax.grad(nlml_it, argnums=(0, 1))(params, noise)
    g_d = jax.grad(nlml_dense, argnums=(0, 1))(params, noise)
    # Stochastic trace estimate: compare with generous tolerance.
    for name in ["log_ell", "log_s2"]:
        np.testing.assert_allclose(
            float(g_it[0][name]), float(g_d[0][name]), rtol=0.25, atol=0.5
        )
    np.testing.assert_allclose(float(g_it[1]), float(g_d[1]), rtol=0.25, atol=0.5)


def test_iterative_posterior_mean():
    x, y = _setup(150)
    kernel_fn = lambda p: EQ()
    x_new = jnp.linspace(0, 10, 50)
    mean_it, info = iterative_posterior_mean(
        kernel_fn, None, x, y, 0.1, x_new, cg_tol=1e-10, block=64,
        precond_rank=40,
    )
    f = GP(EQ())
    post = f | (f(x, 0.1), y)
    mean_ref, _ = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_it), np.asarray(mean_ref), rtol=1e-5, atol=1e-7
    )


def test_iterative_nlml_jits():
    x, y = _setup(80)
    kernel_fn = lambda p: jnp.exp(p["log_s2"]) * EQ()

    @jax.jit
    def step(params):
        return iterative_nlml(
            kernel_fn, params, x, y, 0.1, jax.random.PRNGKey(1),
            num_probes=8, cg_tol=1e-6, slq_steps=15, precond_rank=20, block=64,
        )

    val, grad = jax.value_and_grad(step)({"log_s2": jnp.asarray(0.0)})
    assert np.isfinite(float(val))
    assert np.isfinite(float(grad["log_s2"]))


def test_symmetric_matvec_parity_and_grad():
    """The upper-triangle symmetric sweep == the plain row sweep, including
    through jax.grad and with padding (n not a multiple of block)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stheno_tpu import EQ
    from stheno_tpu.iterative import kernel_matvec

    n = 53  # deliberately not a multiple of block
    x = jnp.linspace(0, 10, n)
    v = jnp.asarray(np.random.RandomState(0).randn(n, 3))

    out_sym = kernel_matvec(EQ(), x, v, noise=0.1, block=16, symmetric=True)
    out_row = kernel_matvec(EQ(), x, v, noise=0.1, block=16, symmetric=False)
    np.testing.assert_allclose(
        np.asarray(out_sym), np.asarray(out_row), rtol=1e-12, atol=1e-12
    )

    def f(log_ell, sym):
        k = EQ().stretch(jnp.exp(log_ell))
        return jnp.sum(kernel_matvec(k, x, v, block=16, symmetric=sym) ** 2)

    g_sym = float(jax.grad(lambda p: f(p, True))(jnp.asarray(0.2)))
    g_row = float(jax.grad(lambda p: f(p, False))(jnp.asarray(0.2)))
    np.testing.assert_allclose(g_sym, g_row, rtol=1e-10)

    # Exact operator symmetry (what CG relies on).
    m = 32
    x2 = jnp.linspace(0, 10, m)
    eye = jnp.eye(m)
    K = np.asarray(kernel_matvec(EQ(), x2, eye, block=8, symmetric=True))
    np.testing.assert_array_equal(K, K.T)


def test_cg_quadrature_logdet_plain_and_preconditioned():
    """The mBCG identity: logdet falls out of CG's own coefficients — plain
    CG with N(0,I) probes, and PCG with N(0,P) probes plus logdet(P)."""
    from stheno_tpu.iterative.slq import cg_quadrature_logdet
    from stheno_tpu.iterative.pchol import preconditioner_sqrt_ops

    n = 150
    x, _ = _setup(n, seed=3)
    k = EQ()
    noise = 0.3
    K = np.asarray(dense(pairwise(k, x[:, None]))) + noise * np.eye(n)
    ref = np.linalg.slogdet(K)[1]
    mv = lambda v: kernel_matvec(k, x, v, noise=noise, block=64)
    u = jax.random.normal(jax.random.PRNGKey(2), (n, 32), jnp.float64)
    u_norms = jnp.sum(u * u, axis=0)

    # Plain CG, standard-normal probes.
    _, info = batched_cg(mv, u, tol=1e-10, max_iters=200, track_tridiag=60)
    est = cg_quadrature_logdet(*info["tridiag"], u_norms)
    np.testing.assert_allclose(float(est), ref, rtol=0.05)

    # Preconditioned CG, probes ~ N(0, P): estimates the whitened logdet.
    L = pivoted_cholesky(k, x, 30)
    pre = woodbury_preconditioner(L, noise)
    _, apply_half, logdet_p = preconditioner_sqrt_ops(L, noise)
    z = apply_half(u)
    _, info_p = batched_cg(
        mv, z, precond=pre, tol=1e-10, max_iters=200, track_tridiag=60
    )
    est_p = float(logdet_p) + float(
        cg_quadrature_logdet(*info_p["tridiag"], u_norms)
    )
    # Whitened quadrature: variance collapses, so a tight tolerance holds.
    np.testing.assert_allclose(est_p, ref, rtol=5e-3)


def test_cg_tridiag_buffers_contiguous():
    """Tridiag recording freezes per column once its residual hits the
    rounding floor; steps counts exactly the recorded prefix."""
    n = 80
    x, _ = _setup(n, seed=4)
    k = EQ()
    mv = lambda v: kernel_matvec(k, x, v, noise=0.5, block=64)
    b = jax.random.normal(jax.random.PRNGKey(3), (n, 4), jnp.float64)
    sol, info = batched_cg(mv, b, tol=1e-12, max_iters=100, track_tridiag=50)
    alphas, betas, steps = info["tridiag"]
    assert alphas.shape == (50, 4)
    for j in range(4):
        s = int(steps[j])
        assert 0 < s <= 50
        # Recorded alphas are positive (SPD operator), padding is zero.
        assert np.all(np.asarray(alphas[:s, j]) > 0)
        assert np.all(np.asarray(alphas[s:, j]) == 0)


def test_iterative_posterior_var():
    """Matrix-free posterior variance == the DSL's dense marginals,
    including the chunked path (chunk smaller than the test set)."""
    from stheno_tpu.iterative import iterative_posterior_var

    x, y = _setup(150)
    kernel_fn = lambda p: 1.5 * EQ().stretch(0.8)
    x_new = jnp.linspace(0, 10, 70)
    var_it = iterative_posterior_var(
        kernel_fn, None, x, y, 0.1, x_new,
        cg_tol=1e-10, block=64, precond_rank=40, chunk=32,
    )
    f = GP(1.5 * EQ().stretch(0.8))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var_it), np.asarray(var_ref), rtol=1e-4, atol=1e-8
    )


def test_eig_preconditioner_ops_algebra():
    """P^{-1}, P^{1/2}, logdet of ``P = noise I + U diag(lam) U^T`` agree
    with the dense reference."""
    from stheno_tpu.iterative.pchol import (
        eig_preconditioner_factors,
        eig_preconditioner_ops,
    )
    from stheno_tpu.iterative.matvec import kernel_matvec

    n, rank, noise = 120, 30, 0.3
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n) * 8))
    k = 1.3 * EQ().stretch(0.7)
    mv = lambda v: kernel_matvec(k, x, v, block=64)
    om = jax.random.normal(jax.random.PRNGKey(0), (n, rank), jnp.float64)
    U, lam = eig_preconditioner_factors(mv, om)
    assert U.shape == (n, rank) and bool(jnp.all(lam >= 0))
    p_inv, p_half, p_half_inv, logdet_p = eig_preconditioner_ops(
        U, lam, noise, n
    )

    P = noise * jnp.eye(n) + (U * lam[None, :]) @ U.T
    v = jax.random.normal(jax.random.PRNGKey(1), (n, 3), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(p_inv(P @ v)), np.asarray(v), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(p_half(p_half(v))), np.asarray(P @ v), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(p_half_inv(p_half(v))), np.asarray(v), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        float(logdet_p), float(jnp.linalg.slogdet(P)[1]), rtol=1e-8
    )


def test_eig_precond_cg_converges_f32():
    """The f32 regression pinned by the N=262,144 measurement: CG with the
    eig preconditioner must converge fast in float32 (the pivoted-Cholesky
    Woodbury preconditioner stalls outright at scale — rel residual 3.7
    after 200 iterations on the north-star step)."""
    from stheno_tpu.iterative.cg import batched_cg
    from stheno_tpu.iterative.matvec import kernel_matvec
    from stheno_tpu.iterative.pchol import (
        eig_preconditioner_factors,
        eig_preconditioner_ops,
    )

    n, rank, noise = 4096, 64, 0.1
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))
    k = EQ()
    mv_raw = lambda v: kernel_matvec(k, x, v, block=1024)
    mv = lambda v: kernel_matvec(k, x, v, noise=noise, block=1024)

    om = jax.random.normal(jax.random.PRNGKey(0), (n, rank), jnp.float32)
    U, lam = eig_preconditioner_factors(mv_raw, om)
    _, p_half, p_half_inv, _ = eig_preconditioner_ops(U, lam, noise, n)

    # Production form (nlml.py): split-preconditioned CG on the whitened
    # operator — O(1) condition number, so the f32 residual floor sits far
    # below tol and convergence is fast and stable.
    mv_white = lambda v: p_half_inv(mv(p_half_inv(v)))
    u = jax.random.normal(jax.random.PRNGKey(1), (n, 4), jnp.float32)
    rhs = jnp.concatenate([p_half_inv(y)[:, None], u], axis=1)
    sol, info = batched_cg(mv_white, rhs, tol=1e-2, max_iters=100)
    assert float(info["rel_residual"]) <= 1e-2
    assert int(info["iters"]) <= 30, int(info["iters"])


def test_iterative_nlml_eig_vs_pivoted_parity():
    """Both preconditioner factories give the same NLML estimate (same
    probes, f64, tight CG) and gradients close to the dense path."""
    from stheno_tpu.iterative import iterative_nlml

    x, y = _setup(150)
    kernel_fn = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(
        jnp.exp(p["log_ell"])
    )
    params = {"log_s2": jnp.asarray(0.2), "log_ell": jnp.asarray(-0.1)}
    kw = dict(
        num_probes=8, cg_tol=1e-10, max_cg_iters=300, slq_steps=40, block=64
    )
    key = jax.random.PRNGKey(0)
    v_eig, g_eig = jax.value_and_grad(
        lambda p: iterative_nlml(
            kernel_fn, p, x, y, 0.1, key,
            precond_rank=40, precond_method="eig", **kw,
        )
    )(params)
    v_piv, g_piv = jax.value_and_grad(
        lambda p: iterative_nlml(
            kernel_fn, p, x, y, 0.1, key,
            precond_rank=40, precond_method="pivoted", **kw,
        )
    )(params)
    # Different preconditioners change the probe distribution, so the
    # stochastic estimates differ slightly; both must sit within a fraction
    # of a nat of each other at this probe count.
    np.testing.assert_allclose(float(v_eig), float(v_piv), rtol=2e-2)
    for kk in g_eig:
        np.testing.assert_allclose(
            np.asarray(g_eig[kk]), np.asarray(g_piv[kk]), rtol=0.3, atol=0.05
        )


def test_posterior_mean_vector_noise_falls_back():
    """Per-point (n,) noise is advertised by kernel_matvec; the whitened
    preconditioner requires scalar noise, so the posterior paths must fall
    back to plain CG rather than crash."""
    from stheno_tpu.iterative import iterative_posterior_mean

    x, y = _setup(120)
    noise_vec = jnp.full((120,), 0.1)
    kernel_fn = lambda p: EQ().stretch(0.8)
    mean, info = iterative_posterior_mean(
        kernel_fn, None, x, y, noise_vec, jnp.linspace(0, 10, 15),
        cg_tol=1e-8, block=64, precond_rank=40,
    )
    mean_s, _ = iterative_posterior_mean(
        kernel_fn, None, x, y, 0.1, jnp.linspace(0, 10, 15),
        cg_tol=1e-8, block=64, precond_rank=40,
    )
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_s), rtol=1e-6, atol=1e-8
    )


def test_iterative_nlml_return_info_and_convergence():
    """``return_info=True`` surfaces the forward CG's health (VERDICT r2
    missing #3): a healthy solve reports convergence; a starved one
    (max_cg_iters too small for the tol) reports a stall AND prints the
    loud warning — the round-1 silent-stall failure mode must be
    impossible to miss."""
    x, y = _setup(100)
    kernel_fn = lambda p: EQ()

    val, info = iterative_nlml(
        kernel_fn, None, x, y, 0.1, jax.random.PRNGKey(0),
        num_probes=8, cg_tol=1e-6, precond_rank=40, block=64,
        return_info=True,
    )
    assert np.isfinite(float(val))
    assert bool(info["cg_converged"])
    assert float(info["cg_rel_residual"]) <= 1e-6
    assert int(info["cg_iters"]) >= 1

    # Value-only call still returns a bare scalar (API unchanged).
    val_only = iterative_nlml(
        kernel_fn, None, x, y, 0.1, jax.random.PRNGKey(0),
        num_probes=8, cg_tol=1e-6, precond_rank=40, block=64,
    )
    assert jnp.ndim(val_only) == 0


def test_iterative_nlml_stall_trips_loud_warning(capfd):
    """A CG stall must be loud: ``cg_converged`` False and a debug-print
    warning on stdout, including under jit."""
    x, y = _setup(100)
    kernel_fn = lambda p: EQ()

    @jax.jit
    def run():
        return iterative_nlml(
            kernel_fn, None, x, y, 1e-12, jax.random.PRNGKey(0),
            num_probes=4, cg_tol=1e-14, max_cg_iters=2, precond_rank=0,
            precond_method="none", block=64, return_info=True,
        )

    _, info = run()
    assert not bool(info["cg_converged"])
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "CG STALLED" in out, out


def test_iterative_nlml_amortised_precond_state():
    """A prebuilt (even stale) eig-preconditioner state gives the same NLML
    value/gradients as the per-call build, within estimator tolerance —
    the amortised-training path (VERDICT r2 next #2)."""
    from stheno_tpu.iterative import eig_precond_state

    x, y = _setup(120)

    def kernel_fn(params):
        return jnp.exp(params["log_s2"]) * EQ().stretch(
            jnp.exp(params["log_ell"])
        )

    params = {"log_ell": jnp.asarray(0.2), "log_s2": jnp.asarray(0.1)}
    noise = jnp.asarray(0.1)
    # Deliberately STALE state: built at perturbed hyperparameters.
    stale = {"log_ell": jnp.asarray(0.5), "log_s2": jnp.asarray(-0.2)}
    state = eig_precond_state(
        kernel_fn, stale, x, 40, jax.random.PRNGKey(7), block=64
    )

    def nlml_am(params, noise):
        return iterative_nlml(
            kernel_fn, params, x, y, noise, jax.random.PRNGKey(0),
            num_probes=32, cg_tol=1e-8, slq_steps=30, precond_state=state,
            block=64,
        )

    def nlml_dense(params, noise):
        f = GP(kernel_fn(params))
        return -f.measure.logpdf(f(x, noise), y)

    v_am, info = iterative_nlml(
        kernel_fn, params, x, y, noise, jax.random.PRNGKey(0),
        num_probes=32, cg_tol=1e-8, slq_steps=30, precond_state=state,
        block=64, return_info=True,
    )
    assert bool(info["cg_converged"])  # Stale P still converges.
    assert abs(float(v_am) - float(nlml_dense(params, noise))) < 1.0

    g_am = jax.grad(nlml_am, argnums=(0, 1))(params, noise)
    g_d = jax.grad(nlml_dense, argnums=(0, 1))(params, noise)
    for name in ["log_ell", "log_s2"]:
        np.testing.assert_allclose(
            float(g_am[0][name]), float(g_d[0][name]), rtol=0.25, atol=0.5
        )
    np.testing.assert_allclose(float(g_am[1]), float(g_d[1]), rtol=0.25, atol=0.5)

    # Warm-start refresh from the previous basis round-trips.
    state2 = eig_precond_state(
        kernel_fn, params, x, 40, init=state[0], block=64
    )
    assert state2[0].shape == state[0].shape


def test_iterative_nlml_bf16_surrogate_gradients():
    """bf16 Gram tiles in the BACKWARD surrogate sweep: the plumbing works
    and at SMALL n the gradients stay within the stochastic estimator's
    tolerance of the dense analytic gradient (the forward CG/logdet path
    is untouched — identical value). NOTE: the option is measured and
    REJECTED for production at N=262,144 (the rounding bias is correlated
    with the tiles' theta-structure and grows with N: ~1000x the probe
    noise at 262k for a 4% step saving — see the iterative_nlml docstring
    and docs/scaling.md); this test pins the small-N plumbing only."""
    x, y = _setup(120)

    def kernel_fn(params):
        return jnp.exp(params["log_s2"]) * EQ().stretch(
            jnp.exp(params["log_ell"])
        )

    params = {"log_ell": jnp.asarray(0.2), "log_s2": jnp.asarray(0.1)}
    noise = jnp.asarray(0.1)

    def nlml(params, noise, tile_dtype):
        return iterative_nlml(
            kernel_fn, params, x, y, noise, jax.random.PRNGKey(0),
            num_probes=32, cg_tol=1e-8, slq_steps=30, precond_rank=40,
            block=64, surrogate_tile_dtype=tile_dtype,
        )

    v16, g16 = jax.value_and_grad(
        lambda p, nz: nlml(p, nz, jnp.bfloat16), argnums=(0, 1)
    )(params, noise)
    v32, _ = jax.value_and_grad(
        lambda p, nz: nlml(p, nz, None), argnums=(0, 1)
    )(params, noise)
    # Forward path identical (tile dtype only affects the backward sweep).
    np.testing.assert_allclose(float(v16), float(v32), rtol=1e-10)

    def nlml_dense(params, noise):
        f = GP(kernel_fn(params))
        return -f.measure.logpdf(f(x, noise), y)

    g_d = jax.grad(nlml_dense, argnums=(0, 1))(params, noise)
    for name in ["log_ell", "log_s2"]:
        np.testing.assert_allclose(
            float(g16[0][name]), float(g_d[0][name]), rtol=0.3, atol=0.5
        )
    np.testing.assert_allclose(float(g16[1]), float(g_d[1]), rtol=0.3, atol=0.5)


def test_iterative_posterior_var_host_mode():
    """The host-loop chunk schedule (the extreme-N device-fault workaround)
    matches the fused lax.map schedule and the dense marginals."""
    from stheno_tpu.iterative import iterative_posterior_var

    x, y = _setup(150)
    kernel_fn = lambda p: 1.5 * EQ().stretch(0.8)
    x_new = jnp.linspace(0, 10, 70)
    common = dict(cg_tol=1e-10, block=64, precond_rank=40, chunk=32)
    var_host = iterative_posterior_var(
        kernel_fn, None, x, y, 0.1, x_new, mode="host", **common
    )
    var_scan = iterative_posterior_var(
        kernel_fn, None, x, y, 0.1, x_new, mode="scan", **common
    )
    np.testing.assert_allclose(
        np.asarray(var_host), np.asarray(var_scan), rtol=1e-9, atol=1e-12
    )
    f = GP(1.5 * EQ().stretch(0.8))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var_host), np.asarray(var_ref), rtol=1e-4, atol=1e-8
    )
    with pytest.raises(ValueError, match="mode"):
        iterative_posterior_var(
            kernel_fn, None, x, y, 0.1, x_new, mode="nope", **common
        )


def test_posterior_shared_precond_state_and_true_residual():
    """Posterior mean/var accept a shared prebuilt preconditioner state;
    the whitened solver reports the un-whitened residual on request
    (ADVICE r2: tol is measured in whitened space)."""
    from stheno_tpu.iterative import (
        eig_precond_state,
        iterative_posterior_var,
        make_whitened_solver,
    )

    x, y = _setup(150)
    kernel_fn = lambda p: 1.5 * EQ().stretch(0.8)
    state = eig_precond_state(kernel_fn, None, x, 40, block=64)
    x_new = jnp.linspace(0, 10, 40)

    mean_s, _ = iterative_posterior_mean(
        kernel_fn, None, x, y, 0.1, x_new, cg_tol=1e-10, block=64,
        precond_state=state,
    )
    var_s = iterative_posterior_var(
        kernel_fn, None, x, y, 0.1, x_new, cg_tol=1e-10, block=64,
        precond_state=state, chunk=32,
    )
    f = GP(1.5 * EQ().stretch(0.8))
    post = f | (f(x, 0.1), y)
    mean_ref, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_s), np.asarray(mean_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(var_s), np.asarray(var_ref), rtol=1e-4, atol=1e-8
    )

    k = kernel_fn(None)
    mv_raw = lambda v: kernel_matvec(k, x, v, block=64)
    solver = make_whitened_solver(mv_raw, 150, 0.1, 40, state=state)
    sol, info = solver(y, tol=1e-10, true_residual=True)
    assert "rel_residual_true" in info
    # Whitened tol 1e-10 still lands the true residual far below 1e-6.
    assert float(info["rel_residual_true"]) < 1e-6


def test_cached_posterior_var_full_rank_exact():
    """Amortised (LOVE-style) variance with rank >= n reproduces the dense
    posterior marginals to CG tolerance — the exactness anchor for the
    cache (VERDICT r3 #1)."""
    from stheno_tpu.iterative import cached_posterior_var, variance_cache

    x, y = _setup(150)
    kernel_fn = lambda p: 1.5 * EQ().stretch(0.8)
    x_new = jnp.linspace(0, 10, 70)
    cache = variance_cache(
        kernel_fn, None, x, 0.1, rank=150, key=jax.random.PRNGKey(0),
        power_iters=2, refine=True, cg_tol=1e-10, max_cg_iters=200,
        block=64,
    )
    var = cached_posterior_var(
        kernel_fn, None, x, cache, x_new, chunk=32
    )
    f = GP(1.5 * EQ().stretch(0.8))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-6, atol=1e-10
    )


def test_cached_posterior_var_low_rank_accurate_and_conservative():
    """At rank << n on a smooth kernel the cache stays accurate, and the
    conservative tail policy never makes the variance overconfident
    beyond round-off (estimate >= truth - tiny)."""
    from stheno_tpu.iterative import cached_posterior_var, variance_cache

    x, y = _setup(300, seed=3)
    kernel_fn = lambda p: 1.5 * EQ().stretch(0.8)
    x_new = jnp.linspace(-0.5, 10.5, 101)
    cache = variance_cache(
        kernel_fn, None, x, 0.1, rank=48, key=jax.random.PRNGKey(1),
        power_iters=2, refine=True, block=128,
    )
    var = cached_posterior_var(kernel_fn, None, x, cache, x_new)
    f = GP(1.5 * EQ().stretch(0.8))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    var, var_ref = np.asarray(var), np.asarray(var_ref)
    # Tight on a fast-decaying EQ spectrum even at rank 48/300.
    np.testing.assert_allclose(var, var_ref, rtol=1e-3, atol=1e-6)
    # Conservative: the tail bracket never overstates the reduction.
    assert np.all(var >= var_ref - 1e-6)


def test_cached_posterior_var_jit_composable_and_spectral_mode():
    """The cache build AND the query compose under an outer jit (the very
    thing mode="host" could not do), and the zero-matvec spectral mode
    (refine=False) is close on a smooth kernel."""
    from stheno_tpu.iterative import cached_posterior_var, variance_cache

    x, y = _setup(120, seed=5)
    kernel_fn = lambda p: p["s2"] * EQ().stretch(p["ell"])
    params = {"s2": jnp.asarray(1.2), "ell": jnp.asarray(0.9)}
    x_new = jnp.linspace(0, 10, 37)

    @jax.jit
    def serve(params, x, x_new):
        cache = variance_cache(
            kernel_fn, params, x, 0.1, rank=64,
            key=jax.random.PRNGKey(2), power_iters=2, refine=True,
            block=64,
        )
        return cached_posterior_var(
            kernel_fn, params, x, cache, x_new, chunk=16
        )

    var = serve(params, x, x_new)
    f = GP(1.2 * EQ().stretch(0.9))
    post = f | (f(x, 0.1), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-3, atol=1e-6
    )
    # Spectral (refine=False): no CG at all, still tight on EQ.
    cache_s = variance_cache(
        kernel_fn, params, x, 0.1, rank=64, key=jax.random.PRNGKey(2),
        power_iters=3, refine=False, block=64,
    )
    var_s = cached_posterior_var(kernel_fn, params, x, cache_s, x_new)
    np.testing.assert_allclose(
        np.asarray(var_s), np.asarray(var_ref), rtol=2e-2, atol=1e-4
    )


def test_variance_cache_reuses_precond_state_and_requires_key():
    """The cache accepts the training loop's eig precond state (shared
    basis, no rebuild) and demands a key otherwise."""
    from stheno_tpu.iterative import (
        cached_posterior_var,
        eig_precond_state,
        variance_cache,
    )

    x, y = _setup(100, seed=7)
    kernel_fn = lambda p: EQ()
    state = eig_precond_state(
        kernel_fn, None, x, rank=100, key=jax.random.PRNGKey(3),
        power_iters=2, block=64,
    )
    cache = variance_cache(
        kernel_fn, None, x, 0.05, precond_state=state, refine=True,
        cg_tol=1e-10, max_cg_iters=100, block=64,
    )
    x_new = jnp.linspace(0, 10, 23)
    var = cached_posterior_var(kernel_fn, None, x, cache, x_new)
    f = GP(EQ())
    post = f | (f(x, 0.05), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-6, atol=1e-10
    )
    with pytest.raises(ValueError, match="key"):
        variance_cache(kernel_fn, None, x, 0.05)


def test_variance_cache_widens_narrow_precond_state():
    """A precond_state NARROWER than the requested rank is widened (with
    a key) or used as-is with a loud warning (without) — `rank` must
    never be silently ignored (ADVICE r4 #2)."""
    from stheno_tpu.iterative import (
        cached_posterior_var,
        eig_precond_state,
        variance_cache,
    )

    x, y = _setup(100, seed=11)
    kernel_fn = lambda p: EQ()
    narrow = eig_precond_state(
        kernel_fn, None, x, rank=16, key=jax.random.PRNGKey(3),
        power_iters=2, block=64,
    )
    # With a key: the basis is widened to the requested rank — full rank
    # here, so the cache becomes exact to CG tolerance.
    cache = variance_cache(
        kernel_fn, None, x, 0.05, rank=100, key=jax.random.PRNGKey(4),
        precond_state=narrow, power_iters=2, refine=True, cg_tol=1e-10,
        max_cg_iters=100, block=64,
    )
    assert cache.U.shape[-1] == 100
    x_new = jnp.linspace(0, 10, 23)
    var = cached_posterior_var(kernel_fn, None, x, cache, x_new)
    f = GP(EQ())
    post = f | (f(x, 0.05), y)
    _, var_ref = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-6, atol=1e-10
    )
    # Without a key: warns and builds at the state's width.
    with pytest.warns(UserWarning, match="rank 16"):
        cache16 = variance_cache(
            kernel_fn, None, x, 0.05, rank=100, precond_state=narrow,
            refine=True, block=64,
        )
    assert cache16.U.shape[-1] == 16


def test_variance_cache_bf16_basis_build():
    """r5 (VERDICT r4 #4): bf16 Gram tiles for the SUBSPACE-ITERATION
    sweeps of the cache build. The basis is self-correcting (QR) and the
    refine CG runs full-f32 tiles, so accuracy holds: at full rank any
    orthonormal basis spans R^n and the refined cache is exact to CG
    tolerance; at low rank the bf16 basis stays within the f32 build's
    accuracy class."""
    from stheno_tpu.iterative import cached_posterior_var, variance_cache

    x, y = _setup(120, seed=9)
    kernel_fn = lambda p: EQ()
    x32 = jnp.asarray(np.asarray(x), jnp.float32)
    y32 = jnp.asarray(np.asarray(y), jnp.float32)
    x_new = jnp.linspace(0, 10, 29, dtype=jnp.float32)
    f = GP(EQ())
    post = f | (f(x, 0.05), y)
    _, var_ref = post(x_new).marginals()
    cache = variance_cache(
        kernel_fn, None, x32, 0.05, rank=120, key=jax.random.PRNGKey(2),
        power_iters=2, refine=True, cg_tol=1e-7, max_cg_iters=200,
        block=64, basis_tile_dtype=jnp.bfloat16,
    )
    var = cached_posterior_var(kernel_fn, None, x32, cache, x_new)
    np.testing.assert_allclose(
        np.asarray(var, np.float64), np.asarray(var_ref), rtol=2e-3,
        atol=1e-5,
    )
    # Low rank: bf16 basis within the f32 build's accuracy class.
    c16 = variance_cache(
        kernel_fn, None, x32, 0.05, rank=48, key=jax.random.PRNGKey(2),
        power_iters=2, refine=True, block=64,
        basis_tile_dtype=jnp.bfloat16,
    )
    c32 = variance_cache(
        kernel_fn, None, x32, 0.05, rank=48, key=jax.random.PRNGKey(2),
        power_iters=2, refine=True, block=64,
    )
    v16 = cached_posterior_var(kernel_fn, None, x32, c16, x_new)
    v32 = cached_posterior_var(kernel_fn, None, x32, c32, x_new)
    err16 = np.abs(np.asarray(v16, np.float64) - np.asarray(var_ref)).max()
    err32 = np.abs(np.asarray(v32, np.float64) - np.asarray(var_ref)).max()
    assert err16 < 5 * max(err32, 1e-6), (err16, err32)


def test_amortised_posterior_small_mean_query_bucket():
    """Few-point mean queries must not be padded to the full Gram
    row-block (ADVICE r4 #3): the bucket is min(block, 256)."""
    from stheno_tpu.iterative import AmortisedPosterior

    x, y = _setup(120)
    kernel_fn = lambda p: EQ()
    post = AmortisedPosterior(
        kernel_fn, None, x, y, 0.1, rank=120,
        key=jax.random.PRNGKey(0), cg_tol=1e-10, var_cg_tol=1e-8,
        var_max_cg_iters=200, block=4096, chunk=32,
    )
    xq = jnp.linspace(0, 10, 7)
    mean = post.mean(xq)
    assert mean.shape == (7,)
    f = GP(EQ())
    ref = f | (f(x, 0.1), y)
    mean_ref, _ = ref(xq).marginals()
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_ref), rtol=1e-5, atol=1e-7
    )
    # The padded batch handed to the jitted mean function is the 256
    # bucket, not the 4096 row-block.
    padded, true_m = post._prep(xq, min(post.block, 256))
    assert padded.shape[0] == 256 and true_m == 7
    xq2 = jnp.linspace(0, 10, 250)
    np.testing.assert_allclose(
        np.asarray(post.mean(xq2)),
        np.asarray(ref(xq2).marginals()[0]),
        rtol=1e-5, atol=1e-7,
    )


def test_posterior_weights_cached_mean_amortised():
    """The amortised serving split (r4): ``posterior_weights`` once +
    ``cached_posterior_mean`` per query batch matches the dense posterior
    and the one-shot ``iterative_posterior_mean``, and the query is
    jit-composable."""
    from stheno_tpu.iterative import cached_posterior_mean, posterior_weights

    x, y = _setup(150)
    kernel_fn = lambda p: jnp.exp(p["log_s2"]) * EQ()
    params = {"log_s2": jnp.asarray(0.1, x.dtype)}
    alpha, info = posterior_weights(
        kernel_fn, params, x, y, 0.1, cg_tol=1e-10, block=64,
        precond_rank=40,
    )
    f = GP(jnp.exp(params["log_s2"]) * EQ())
    post = f | (f(x, 0.1), y)
    for x_new in (jnp.linspace(0, 10, 50), jnp.linspace(2, 8, 37)):
        mean_q = jax.jit(
            lambda xn: cached_posterior_mean(
                kernel_fn, params, x, alpha, xn, block=64
            )
        )(x_new)
        mean_ref, _ = post(x_new).marginals()
        np.testing.assert_allclose(
            np.asarray(mean_q), np.asarray(mean_ref), rtol=1e-5, atol=1e-7
        )
        one_shot, _ = iterative_posterior_mean(
            kernel_fn, params, x, y, 0.1, x_new, cg_tol=1e-10, block=64,
            precond_rank=40,
        )
        np.testing.assert_allclose(
            np.asarray(mean_q), np.asarray(one_shot), rtol=1e-6, atol=1e-9
        )


def test_amortised_posterior_serving_bundle():
    """AmortisedPosterior (r4 serving bundle): one build, then mean/var/
    credible-bound queries match the dense posterior at full rank."""
    from stheno_tpu.iterative import AmortisedPosterior

    x, y = _setup(120)
    kernel_fn = lambda p: jnp.exp(p["log_s2"]) * EQ()
    params = {"log_s2": jnp.asarray(0.2, x.dtype)}
    post = AmortisedPosterior(
        kernel_fn, params, x, y, 0.1, rank=120,
        key=jax.random.PRNGKey(0), cg_tol=1e-10, var_cg_tol=1e-8,
        var_max_cg_iters=200, block=64, chunk=32,
    )
    f = GP(jnp.exp(params["log_s2"]) * EQ())
    ref = f | (f(x, 0.1), y)
    x_new = jnp.linspace(0.3, 9.7, 41)
    mean_ref, var_ref = ref(x_new).marginals()
    mean, var = post.mean_var(x_new)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(mean_ref), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-3, atol=1e-7
    )
    m2, lo, hi = post.marginal_credible_bounds(x_new)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean))
    np.testing.assert_allclose(
        np.asarray(hi - lo), 2 * 1.96 * np.sqrt(np.asarray(var)), rtol=1e-6
    )
    # Solver health is surfaced.
    assert float(np.asarray(post.solve_info["rel_residual"])) < 1e-6


def test_cached_posterior_mean_var_fused_and_no_retrace():
    """Fused mean+var query matches the separate paths, and the serving
    bundle quantises query sizes so distinct batch sizes within a bucket
    share one compiled program (r4 self-review findings)."""
    from stheno_tpu.iterative import AmortisedPosterior

    x, y = _setup(120)
    kernel_fn = lambda p: EQ()
    post = AmortisedPosterior(
        kernel_fn, None, x, y, 0.1, rank=120,
        key=jax.random.PRNGKey(0), cg_tol=1e-10, var_cg_tol=1e-8,
        var_max_cg_iters=200, block=64, chunk=32,
    )
    x_new = jnp.linspace(0.3, 9.7, 41)
    mean_f, var_f = post.mean_var(x_new)
    np.testing.assert_allclose(
        np.asarray(mean_f), np.asarray(post.mean(x_new)), rtol=1e-6,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(var_f), np.asarray(post.var(x_new)), rtol=1e-6,
        atol=1e-10,
    )
    # Distinct sizes inside the same chunk bucket -> one trace.
    before = post._mean_var_fn._cache_size()
    post.mean_var(jnp.linspace(0, 10, 40))  # Same bucket as 41 (chunk 32).
    post.mean_var(jnp.linspace(0, 10, 63))
    assert post._mean_var_fn._cache_size() == before, (
        "query sizes within one chunk bucket must not retrace"
    )
    post.mean_var(jnp.linspace(0, 10, 65))  # New bucket: one new trace.
    assert post._mean_var_fn._cache_size() == before + 1
