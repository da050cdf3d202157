"""Distributed-path tests on the virtual 8-device CPU mesh: parity of the
distributed Cholesky / triangular solve / NLML / posterior against the
single-device reference computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu import EQ, GP
from stheno_tpu.parallel import (
    dist_cholesky,
    dist_nlml,
    dist_posterior_predict,
    dist_solve_lower,
    make_data_mesh,
    sharded_gram,
)


@pytest.fixture(scope="module")
def mesh():
    return make_data_mesh(8)


def _psd(n, seed=0):
    r = np.random.RandomState(seed)
    a = r.randn(n, n)
    return jnp.asarray(a @ a.T + n * np.eye(n))


def test_dist_cholesky_parity(mesh):
    K = _psd(128)
    L = dist_cholesky(K, mesh, block=16)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-8, atol=1e-8)


def test_dist_cholesky_odd_block(mesh):
    # Block larger than N/D gets clipped.
    K = _psd(64)
    L = dist_cholesky(K, mesh, block=256)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )


def test_dist_solve_parity(mesh):
    K = _psd(128, 1)
    L = jnp.asarray(np.linalg.cholesky(np.asarray(K)))
    B = jnp.asarray(np.random.RandomState(2).randn(128, 5))
    X = dist_solve_lower(L, B, mesh, block=16)
    X_ref = np.linalg.solve(np.asarray(L), np.asarray(B))
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-7, atol=1e-8)


def test_dist_nlml_parity_and_grad(mesh):
    n = 64
    x = jnp.linspace(0, 10, n)
    f = GP(EQ())
    y = jnp.sin(x)

    def nlml_dist(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        K = sharded_gram(k, x[:, None], mesh, noise=0.1)
        return dist_nlml(K, y, mesh, block=8)

    def nlml_ref(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        f2 = GP(k)
        return -f2.measure.logpdf(f2(x, 0.1), y)

    val_d = float(nlml_dist(jnp.asarray(0.3)))
    val_r = float(nlml_ref(jnp.asarray(0.3)))
    np.testing.assert_allclose(val_d, val_r, rtol=1e-6)

    g_d = float(jax.grad(nlml_dist)(jnp.asarray(0.3)))
    g_r = float(jax.grad(nlml_ref)(jnp.asarray(0.3)))
    np.testing.assert_allclose(g_d, g_r, rtol=1e-5)


def test_dist_posterior_parity(mesh):
    n = 64
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)
    x_new = jnp.linspace(0, 10, 17)
    mean_d, var_d = dist_posterior_predict(
        EQ(), x[:, None], y, x_new[:, None], 0.1, mesh, block=8
    )
    f = GP(EQ())
    post = f | (f(x, 0.1), y)
    mean_r, var_r = post(x_new).marginals()
    np.testing.assert_allclose(np.asarray(mean_d), np.asarray(mean_r), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_d), np.asarray(var_r), rtol=1e-5, atol=1e-8)


def test_dist_training_step_jit(mesh):
    # One jitted NLML+grad step over the mesh — the dryrun_multichip shape.
    n = 64
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)

    @jax.jit
    def step(params):
        ell = jnp.exp(params["log_ell"])
        s2 = jnp.exp(params["log_s2"])
        k = s2 * EQ().stretch(ell)
        K = sharded_gram(k, x[:, None], mesh, noise=0.1)
        return dist_nlml(K, y, mesh, block=8)

    params = {"log_ell": jnp.asarray(0.0), "log_s2": jnp.asarray(0.0)}
    val, grads = jax.value_and_grad(step)(params)
    assert np.isfinite(float(val))
    assert all(np.isfinite(float(g)) for g in jax.tree.leaves(grads))


def test_sharded_kernel_matvec(mesh):
    from stheno_tpu.iterative import kernel_matvec
    from stheno_tpu.parallel import sharded_kernel_matvec

    r = np.random.RandomState(7)
    x = jnp.asarray(np.sort(r.rand(100)))  # Not divisible by 8: tests padding.
    v = jnp.asarray(r.randn(100, 3))
    out_d = sharded_kernel_matvec(EQ(), x, v, mesh, noise=0.1, block=16)
    out_ref = kernel_matvec(EQ(), x, v, noise=0.1, block=16)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_ref), rtol=1e-8)


def test_sharded_iterative_nlml(mesh):
    from stheno_tpu import GP
    from stheno_tpu.parallel import sharded_iterative_nlml

    r = np.random.RandomState(8)
    x = jnp.asarray(np.sort(r.rand(96) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)))
    kernel_fn = lambda p: EQ()
    fn = jax.jit(
        lambda: sharded_iterative_nlml(
            kernel_fn, None, x, y, 0.1, jax.random.PRNGKey(0), mesh,
            num_probes=16, cg_tol=1e-8, slq_steps=20, precond_rank=30, block=12,
        )
    )
    val = float(fn())
    f = GP(EQ())
    ref = float(-f.measure.logpdf(f(x, 0.1), y))
    assert abs(val - ref) < 1.5, (val, ref)


def test_sharded_iterative_nlml_grad_parity(mesh):
    """The multi-chip matrix-free NLML must be differentiable, with gradients
    matching the dense NLML gradients (stochastic estimator tolerance)."""
    from stheno_tpu import GP
    from stheno_tpu.parallel import sharded_iterative_nlml

    r = np.random.RandomState(9)
    x = jnp.asarray(np.sort(r.rand(96) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.1 * r.randn(96))

    def kernel_fn(p):
        return jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))

    params = {"log_ell": jnp.asarray(0.1), "log_s2": jnp.asarray(0.2)}
    noise = jnp.asarray(0.1)

    def nlml_sharded(params, noise):
        return sharded_iterative_nlml(
            kernel_fn, params, x, y, noise, jax.random.PRNGKey(1), mesh,
            num_probes=32, cg_tol=1e-8, slq_steps=25, precond_rank=40,
            block=12,
        )

    def nlml_dense(params, noise):
        f = GP(kernel_fn(params))
        return -f.measure.logpdf(f(x, noise), y)

    g_s = jax.jit(jax.grad(nlml_sharded, argnums=(0, 1)))(params, noise)
    g_d = jax.grad(nlml_dense, argnums=(0, 1))(params, noise)
    for name in ["log_ell", "log_s2"]:
        np.testing.assert_allclose(
            float(g_s[0][name]), float(g_d[0][name]), rtol=0.25, atol=0.5
        )
    np.testing.assert_allclose(float(g_s[1]), float(g_d[1]), rtol=0.25, atol=0.5)


def test_sharded_iterative_training_loop(mesh):
    """Multi-step jitted training: step 2+ feeds the jit mesh-committed
    params back in (regression: shard_map transposition then built zero
    cotangents from Auto-mesh avals inside the Manual context and raised;
    the fix computes surrogate grads inside the shard_map body)."""
    from stheno_tpu.parallel import sharded_iterative_nlml

    r = np.random.RandomState(11)
    x = jnp.asarray(np.sort(r.rand(96) * 10))
    y = jnp.asarray(np.sin(np.asarray(x)) + 0.1 * r.randn(96))

    def kernel_fn(p):
        return jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))

    def obj(p, key):
        return sharded_iterative_nlml(
            kernel_fn, p, x, y, 0.05, key, mesh,
            num_probes=8, cg_tol=1e-8, slq_steps=15, precond_rank=30,
            block=12,
        )

    @jax.jit
    def step(p, key):
        v, g = jax.value_and_grad(obj)(p, key)
        return jax.tree.map(lambda a, b: a - 0.02 * b, p, g), v

    params = {"log_ell": jnp.asarray(0.0), "log_s2": jnp.asarray(0.0)}
    key = jax.random.PRNGKey(2)
    vals = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        params, v = step(params, sub)
        vals.append(float(v))
    assert all(np.isfinite(v) for v in vals), vals
    assert vals[-1] < vals[0], vals


def test_distributed_nlml_deterministic(mesh):
    """Collective schedules must be deterministic: two identical runs of the
    distributed NLML value+gradient are bitwise equal (SURVEY §5's
    deterministic-collective obligation — no atomics/reduction-order
    nondeterminism in the shard_map paths)."""
    from stheno_tpu.parallel import dist_nlml, sharded_gram

    x = jnp.linspace(0.0, 10.0, 64)
    y = jnp.sin(x)

    @jax.jit
    def step(params):
        k = jnp.exp(params["log_s2"]) * EQ().stretch(jnp.exp(params["log_ell"]))
        K = sharded_gram(k, x[:, None], mesh, noise=0.1)
        return dist_nlml(K, y, mesh, block=8)

    params = {"log_ell": jnp.asarray(0.1), "log_s2": jnp.asarray(0.2)}
    v1, g1 = jax.value_and_grad(step)(params)
    v2, g2 = jax.value_and_grad(step)(params)
    assert float(v1) == float(v2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert float(a) == float(b)


@pytest.mark.parametrize("method", ["vfe", "fitc", "dtc"])
def test_dist_elbo_parity(mesh, method):
    """Distributed sparse ELBO == DSL PseudoObs{,FITC,DTC} ELBO."""
    from stheno_tpu import PseudoObs, PseudoObsDTC, PseudoObsFITC
    from stheno_tpu.parallel import dist_elbo

    n, m = 64, 9
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x) + 0.1 * jnp.cos(5 * x)
    z = jnp.linspace(0, 10, m)
    noise = 0.05 + 0.02 * jnp.cos(x) ** 2  # heteroscedastic diagonal

    k = 1.3 * EQ().stretch(0.7)
    elbo_d = float(
        dist_elbo(k, z[:, None], x[:, None], y, noise, mesh, method=method)
    )

    f = GP(k)
    cls = {"vfe": PseudoObs, "fitc": PseudoObsFITC, "dtc": PseudoObsDTC}[method]
    obs = cls(f(z), (f(x, noise), y))
    elbo_r = float(f.measure.logpdf(obs))
    np.testing.assert_allclose(elbo_d, elbo_r, rtol=1e-8)


def test_dist_elbo_grad_parity(mesh):
    """jax.grad through the distributed ELBO matches the DSL path."""
    from stheno_tpu import PseudoObs
    from stheno_tpu.parallel import dist_elbo

    n, m = 48, 7
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)
    z = jnp.linspace(0, 10, m)

    def elbo_dist(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        return dist_elbo(k, z[:, None], x[:, None], y, 0.1, mesh)

    def elbo_ref(log_ell):
        f = GP(EQ().stretch(jnp.exp(log_ell)))
        return f.measure.logpdf(PseudoObs(f(z), (f(x, 0.1), y)))

    p = jnp.asarray(0.2)
    np.testing.assert_allclose(
        float(elbo_dist(p)), float(elbo_ref(p)), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(jax.grad(elbo_dist)(p)), float(jax.grad(elbo_ref)(p)), rtol=1e-6
    )


@pytest.mark.parametrize("method", ["vfe", "fitc", "dtc"])
def test_dist_sparse_posterior_parity(mesh, method):
    """Distributed sparse predictive == DSL pseudo-posterior marginals."""
    from stheno_tpu import PseudoObs, PseudoObsDTC, PseudoObsFITC
    from stheno_tpu.parallel import dist_sparse_posterior

    n, m, s = 64, 9, 17
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)
    z = jnp.linspace(0, 10, m)
    x_new = jnp.linspace(-1, 11, s)

    k = EQ().stretch(0.8)
    mean_d, var_d = dist_sparse_posterior(
        k, z[:, None], x[:, None], y, 0.1, x_new[:, None], mesh, method=method
    )

    f = GP(k)
    cls = {"vfe": PseudoObs, "fitc": PseudoObsFITC, "dtc": PseudoObsDTC}[method]
    post = f | cls(f(z), (f(x, 0.1), y))
    mean_r, var_r = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_d), np.asarray(mean_r), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(var_d), np.asarray(var_r), rtol=1e-5, atol=1e-9
    )


def test_dist_elbo_jit_sharded(mesh):
    """The whole ELBO+grad step compiles and runs jitted over the mesh."""
    from stheno_tpu.parallel import dist_elbo

    n, m = 64, 8
    x = jnp.linspace(0, 10, n)[:, None]
    y = jnp.sin(x[:, 0])
    z = jnp.linspace(0, 10, m)[:, None]

    @jax.jit
    def step(params):
        k = jnp.exp(params["log_s2"]) * EQ().stretch(jnp.exp(params["log_ell"]))
        return -dist_elbo(k, z, x, y, jnp.exp(params["log_noise"]), mesh)

    params = {
        "log_ell": jnp.asarray(0.0),
        "log_s2": jnp.asarray(0.0),
        "log_noise": jnp.asarray(-2.0),
    }
    val, grads = jax.value_and_grad(step)(params)
    assert jnp.isfinite(val)
    assert all(jnp.isfinite(g) for g in jax.tree.leaves(grads))


def test_dist_elbo_n_not_divisible(mesh):
    """N not divisible by the mesh size: masked padding keeps exact parity."""
    from stheno_tpu import PseudoObs
    from stheno_tpu.parallel import dist_elbo

    n, m = 53, 7  # 53 % 8 != 0
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)
    z = jnp.linspace(0, 10, m)
    k = EQ().stretch(0.8)
    e = float(dist_elbo(k, z[:, None], x[:, None], y, 0.1, mesh))
    f = GP(k)
    e_ref = float(f.measure.logpdf(PseudoObs(f(z), (f(x, 0.1), y))))
    np.testing.assert_allclose(e, e_ref, rtol=1e-8)


def test_dist_nlml_multi_output(mesh):
    """Output-block sharding (SURVEY §2.10's EP analogue): the generic
    row-sharded Gram + distributed NLML compose with MultiOutputKernel —
    the (P*N) x (P*N) block Gram's rows shard over the mesh, so each chip
    owns a slice of output blocks."""
    from stheno_tpu import Measure, MultiOutputKernel
    from stheno_tpu.parallel import dist_nlml, sharded_gram

    n = 32  # 2 outputs * 32 = 64 rows over 8 devices.
    x = jnp.linspace(0, 10, n)
    m = Measure()
    f1 = GP(EQ(), measure=m)
    f2 = GP(EQ().stretch(0.5), measure=m) + 0.3 * f1
    mok = MultiOutputKernel(m, f1, f2)

    y1 = jnp.sin(x)
    y2 = jnp.cos(x)
    y = jnp.concatenate([y1, y2])

    K = sharded_gram(mok, x, mesh, noise=0.1)
    assert K.shape == (2 * n, 2 * n)
    val_d = float(dist_nlml(K, y, mesh, block=8))

    val_r = float(-m.logpdf((f1(x, 0.1), y1), (f2(x, 0.1), y2)))
    np.testing.assert_allclose(val_d, val_r, rtol=1e-7)


def test_dist_cholesky_recursive_parity(mesh, monkeypatch):
    """The divide-and-conquer path (halve -> panel-solve -> Schur -> recurse)
    matches the flat loop and numpy; exercised by lowering the recursion
    threshold below N."""
    import stheno_tpu.parallel.cholesky as pc

    # One recursion level (128 -> 64-base) is the full inductive step;
    # deeper nesting only repeats it while doubling the GSPMD compile.
    monkeypatch.setattr(pc, "_REC_BASE", 64)
    K = _psd(128, 7)
    # jit the whole recursion: eagerly it dispatches (and compiles)
    # every level's ops one by one — ~10x the wall time for no coverage.
    L = jax.jit(lambda K: pc.dist_cholesky(K, mesh, block=8))(K)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )

    # The NLML custom VJP (which calls dist_cholesky in its forward) stays
    # correct through the recursive path.
    from stheno_tpu.parallel import dist_nlml, sharded_gram

    x = jnp.linspace(0, 10, 128)
    y = jnp.sin(x)

    def nlml_dist(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        K2 = sharded_gram(k, x[:, None], mesh, noise=0.1)
        return dist_nlml(K2, y, mesh, block=8)

    def nlml_ref(log_ell):
        f2 = GP(EQ().stretch(jnp.exp(log_ell)))
        return -f2.measure.logpdf(f2(x, 0.1), y)

    p = jnp.asarray(0.3)
    np.testing.assert_allclose(
        float(jax.jit(nlml_dist)(p)), float(nlml_ref(p)), rtol=1e-7
    )
    np.testing.assert_allclose(
        float(jax.jit(jax.grad(nlml_dist))(p)),
        float(jax.grad(nlml_ref)(p)), rtol=1e-5,
    )


def test_dist_solve_lower_recursive_parity(mesh, monkeypatch):
    """The divide-and-conquer lower solve matches numpy through recursion."""
    import stheno_tpu.parallel.cholesky as pc

    monkeypatch.setattr(pc, "_REC_BASE", 64)
    K = _psd(128, 11)
    L = jnp.asarray(np.linalg.cholesky(np.asarray(K)))
    B = jnp.asarray(np.random.RandomState(12).randn(128, 7))
    X = jax.jit(lambda L, B: pc.dist_solve_lower(L, B, mesh, block=8))(L, B)
    np.testing.assert_allclose(
        np.asarray(X), np.linalg.solve(np.asarray(L), np.asarray(B)),
        rtol=1e-7, atol=1e-9,
    )


def test_dist_solve_untileable_raises(mesh):
    """An untileable N raises a clear ValueError instead of dividing by
    zero."""
    L = jnp.eye(5)
    B = jnp.ones((5, 1))
    with pytest.raises(ValueError, match="Cannot tile"):
        dist_solve_lower(L, B, mesh, block=8)


def test_hybrid_mesh_chain_by_data():
    """The 2D (chain, data) mesh: chains run HMC in parallel on the chain
    axis while each chain's NLML shards its Gram on the data axis."""
    from stheno_tpu.parallel import dist_nlml, make_hybrid_mesh, sharded_gram

    mesh = make_hybrid_mesh(chains=2)
    assert mesh.shape == {"chain": 2, "data": 4}

    x = jnp.linspace(0, 10, 32)
    y = jnp.sin(x)
    K = sharded_gram(EQ(), x[:, None], mesh, noise=0.1)
    val = float(dist_nlml(K, y, mesh, block=8))
    f = GP(EQ())
    np.testing.assert_allclose(
        val, float(-f.measure.logpdf(f(x, 0.1), y)), rtol=1e-7
    )

    with pytest.raises(ValueError, match="does not divide"):
        make_hybrid_mesh(chains=3)


def test_initialize_hosts_single_process_noop():
    from stheno_tpu.parallel import initialize_hosts

    initialize_hosts()  # Must not raise on a single-process run.


def test_dist_nlml_1d_y_gradient_shape(mesh):
    """The y-cotangent must match the primal's shape: (n,) y -> (n,) grad
    (regression: the fwd rebound y to 2-D before stashing it)."""
    K = _psd(64, 5)
    y1 = jnp.asarray(np.random.RandomState(6).randn(64))
    g1 = jax.grad(lambda y: dist_nlml(K, y, mesh, block=8))(y1)
    assert g1.shape == (64,)
    g2 = jax.grad(lambda y: dist_nlml(K, y, mesh, block=8))(y1[:, None])
    assert g2.shape == (64, 1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2[:, 0]), rtol=1e-10)
    # And both equal the analytic K^{-1} y.
    ref = np.linalg.solve(np.asarray(K), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(g1), ref, rtol=1e-6, atol=1e-8)


def test_dist_nlml_multi_column_semantics(mesh):
    """(n, m) y = sum of m per-column NLMLs of independent outputs sharing
    K — both the value and the K-gradient."""
    K = _psd(64, 7)
    Y = jnp.asarray(np.random.RandomState(8).randn(64, 3))

    def col_sum(K):
        return sum(
            dist_nlml(K, Y[:, j], mesh, block=8) for j in range(3)
        )

    v_joint, g_joint = jax.value_and_grad(
        lambda K: dist_nlml(K, Y, mesh, block=8)
    )(K)
    v_cols, g_cols = jax.value_and_grad(col_sum)(K)
    np.testing.assert_allclose(float(v_joint), float(v_cols), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_joint), np.asarray(g_cols), rtol=1e-7, atol=1e-9
    )


def test_dist_cholesky_untileable_pads(mesh):
    """N < D (or any untileable N) is identity-padded since r5 and still
    produces the exact factor (previously a 'Cannot tile' ValueError)."""
    K = _psd(5)
    L = dist_cholesky(K, mesh)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8,
        atol=1e-8,
    )


def test_dist_cholesky_adaptive_jitter(mesh):
    """config.set_adaptive_jitter(True) must reach the distributed panel
    factorisation: a rank-deficient Gram whose fixed jitter is too small
    still factorises finitely."""
    from stheno_tpu import config

    r = np.random.RandomState(9)
    U = r.randn(64, 4)
    K = jnp.asarray((U @ U.T) * 1e4)  # rank-4, large norm: needs scaled jitter
    try:
        config.set_adaptive_jitter(True)
        L = dist_cholesky(K.astype(jnp.float32), mesh, block=8)
        assert bool(jnp.all(jnp.isfinite(L)))
    finally:
        config.set_adaptive_jitter(False)


def test_initialize_hosts_idempotent():
    """Second call must be a no-op even if the runtime reports it is already
    initialised."""
    from stheno_tpu.parallel import initialize_hosts

    initialize_hosts()
    initialize_hosts()  # must not raise


def _per_device_flops(fn, *args):
    """Per-partition FLOPs of the compiled SPMD module (XLA cost analysis:
    under GSPMD the module is the per-device program)."""
    return jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]


def test_dist_work_balance(mesh):
    """Work-balance guard (SURVEY §5 sanitizer row): the distributed
    Cholesky/solve/NLML must put O(N^3/D) FLOPs on each device. A change
    that silently serialises the math (everything landing on device 0 with
    the rest idle) shows up as per-device FLOPs ~= the D=1 program's;
    measured healthy ratios are ~0.13 (slightly better than 1/D because
    the flat loop's redundant panel solves shrink too)."""
    import stheno_tpu.parallel.cholesky as pc
    import stheno_tpu.parallel.exact as pe

    N = 512
    K = _psd(N, 23)
    y = jnp.asarray(np.random.RandomState(24).randn(N))
    mesh1 = make_data_mesh(1)

    for label, fn in [
        ("cholesky", lambda m: (lambda K: pc.dist_cholesky(K, m, block=64))),
        (
            "nlml value+grad",
            lambda m: jax.value_and_grad(
                lambda K: pe.dist_nlml(K, y, m, block=64)
            ),
        ),
    ]:
        f1 = _per_device_flops(fn(mesh1), K)
        f8 = _per_device_flops(fn(mesh), K)
        assert f8 <= 0.3 * f1, (
            f"{label}: per-device FLOPs {f8:.3e} at D=8 vs {f1:.3e} at D=1 "
            f"(ratio {f8 / f1:.2f}) — distributed path appears serialised"
        )


def test_dist_nlml_value_only_prunes_inverse(mesh):
    """The carried-inverse recursion's GEMMs must be dead-code-eliminated
    for value-only NLML calls: a value-only program may cost at most
    marginally more than the factorisation alone (the inverse roughly
    triples it)."""
    import stheno_tpu.parallel.cholesky as pc
    import stheno_tpu.parallel.exact as pe

    N = 512
    K = _psd(N, 25)
    y = jnp.asarray(np.random.RandomState(26).randn(N))
    f_chol = _per_device_flops(lambda K: pc.dist_cholesky(K, mesh, block=64), K)
    f_val = _per_device_flops(lambda K: pe.dist_nlml(K, y, mesh, block=64), K)
    assert f_val <= 1.25 * f_chol, (
        f"value-only NLML costs {f_val:.3e} vs cholesky {f_chol:.3e}: "
        "the carried inverse is not being pruned"
    )


def test_dist_cholesky_with_inv_parity(mesh, monkeypatch):
    """dist_cholesky_with_inv: L matches dist_cholesky and Linv @ L = I,
    through both the loop base case and the recursion."""
    import stheno_tpu.parallel.cholesky as pc

    K = _psd(192, 27)
    with_inv = jax.jit(lambda K: pc.dist_cholesky_with_inv(K, mesh, block=8))
    L, Linv = with_inv(K)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Linv) @ np.asarray(L), np.eye(192), atol=1e-8
    )

    monkeypatch.setattr(pc, "_REC_BASE", 64)
    K2 = _psd(128, 28)
    L2, Linv2 = jax.jit(
        lambda K: pc.dist_cholesky_with_inv(K, mesh, block=8)
    )(K2)
    np.testing.assert_allclose(
        np.asarray(L2), np.linalg.cholesky(np.asarray(K2)), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Linv2) @ np.asarray(L2), np.eye(128), atol=1e-7
    )


def test_sharded_iterative_nlml_return_info(mesh):
    """Solver-health surfacing works through the mesh-distributed path
    too: info carries the forward CG's iterations/residual/flag."""
    from stheno_tpu.parallel import sharded_iterative_nlml

    n = 96
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ()
    val, info = sharded_iterative_nlml(
        kf, {"log_s2": jnp.asarray(0.1)}, x, y, 0.1,
        jax.random.PRNGKey(0), mesh,
        num_probes=4, cg_tol=1e-6, precond_rank=16, block=32,
        return_info=True,
    )
    assert bool(jnp.isfinite(val))
    assert bool(info["cg_converged"]), info
    assert int(info["cg_iters"]) >= 1


def test_sharded_iterative_nlml_multioutput_icm(mesh):
    """The augmented-input ICM (Coregion) flows through the mesh-sharded
    iterative NLML unchanged — multi-output exact GPs on the distributed
    scaling path, checked against the dense DSL."""
    from stheno_tpu.kernels import Coregion
    from stheno_tpu.parallel import sharded_iterative_nlml

    rng = np.random.RandomState(4)
    nx, t = 24, 2
    x = jnp.asarray(np.sort(rng.rand(nx)) * 5)
    B = jnp.asarray([[1.0, 0.5], [0.5, 0.8]])
    xa = jnp.stack(
        [jnp.repeat(x, t), jnp.tile(jnp.arange(t, dtype=x.dtype), nx)],
        axis=1,
    )
    ya = jnp.asarray(rng.randn(nx * t))
    kf = lambda p: EQ().select([0]) * Coregion(B).select([1])

    val = sharded_iterative_nlml(
        kf, None, xa, ya, 0.1, jax.random.PRNGKey(0), mesh,
        num_probes=24, cg_tol=1e-9, slq_steps=40, precond_rank=24, block=8,
    )
    f = GP(kf(None))
    ref = -f.measure.logpdf(f(xa, 0.1), ya)
    assert abs(float(val) - float(ref)) < 1.0, (float(val), float(ref))


# ---------------------------------------------------------------------------
# r5 (VERDICT r4 #6): realistic shapes — n >= 1024 with >= 4 blocks per
# device, so multi-block panel bookkeeping, block-cyclic wrap-around, and
# accumulation depth are actually exercised (the original suite capped at
# n=96 / ~2 blocks per device). All jitted (CLAUDE.md: eager distributed
# recursion dispatches op-by-op and is ~10x slower).
# ---------------------------------------------------------------------------


def test_dist_cholesky_realistic_shape(mesh):
    n, block = 1024, 32  # 32 panels; 4 row-blocks per device.
    K = _psd(n, seed=11)
    L = jax.jit(lambda K: dist_cholesky(K, mesh, block=block))(K)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-8, atol=1e-8)


def test_dist_nlml_realistic_value_and_grad(mesh):
    n, block = 1024, 32
    x = jnp.linspace(0, 10, n)
    r = np.random.RandomState(3)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n))

    @jax.jit
    def nlml_dist(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        K = sharded_gram(k, x[:, None], mesh, noise=0.1)
        return dist_nlml(K, y, mesh, block=block)

    def nlml_ref(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        f2 = GP(k)
        return -f2.measure.logpdf(f2(x, 0.1), y)

    p = jnp.asarray(0.3)
    val_d, g_d = jax.jit(jax.value_and_grad(nlml_dist))(p)
    val_r, g_r = jax.value_and_grad(nlml_ref)(p)
    np.testing.assert_allclose(float(val_d), float(val_r), rtol=1e-8)
    np.testing.assert_allclose(float(g_d), float(g_r), rtol=1e-8)


def test_dist_nlml_2d_realistic():
    from stheno_tpu.parallel import dist_nlml_2d
    from stheno_tpu.parallel.cholesky2d import make_grid_mesh

    mesh2d = make_grid_mesh(2, 4)
    n, block = 1024, 32  # 32x32 block grid: 16 cyclic blocks per device.
    x = jnp.linspace(0, 10, n)
    r = np.random.RandomState(4)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n))
    k = EQ().stretch(jnp.asarray(1.3))
    from stheno_tpu.kernels import pairwise
    from stheno_tpu.matrix import dense as mat_dense

    K = jnp.asarray(mat_dense(pairwise(k, x[:, None]))) + 0.1 * jnp.eye(n)
    val = jax.jit(
        lambda K, y: dist_nlml_2d(K, y, mesh2d, block=block)
    )(K, y)
    f2 = GP(k)
    val_r = -f2.measure.logpdf(f2(x, 0.1), y)
    np.testing.assert_allclose(float(val), float(val_r), rtol=1e-8)


def test_dist_posterior_predict_realistic(mesh):
    n, m, block = 1024, 256, 32
    x = jnp.linspace(0, 10, n)
    r = np.random.RandomState(5)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n))
    x_new = jnp.linspace(-0.5, 10.5, m)
    mean_d, var_d = jax.jit(
        lambda x, y, xn: dist_posterior_predict(
            EQ(), x, y, xn, 0.1, mesh, block=block
        )
    )(x[:, None], y, x_new[:, None])
    f = GP(EQ())
    post = f | (f(x, 0.1), y)
    mean_r, var_r = post(x_new).marginals()
    np.testing.assert_allclose(
        np.asarray(mean_d), np.asarray(mean_r), rtol=1e-7, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(var_d), np.asarray(var_r), rtol=1e-6, atol=1e-8
    )


def test_dist_cholesky_nondivisible_n(mesh):
    # n = 1100: not divisible by the 8-device mesh (GSPMD pads shards) nor
    # by the block size (the panel loop's tail panel is short).
    n = 1100
    K = _psd(n, seed=12)
    L = jax.jit(lambda K: dist_cholesky(K, mesh, block=32))(K)
    L_ref = np.linalg.cholesky(np.asarray(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-8, atol=1e-8)
