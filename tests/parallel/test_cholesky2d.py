"""2-D block-cyclic distributed Cholesky: parity with numpy across mesh
shapes, through the cyclic base loop and the divide-and-conquer recursion,
plus relayout round-trips and work balance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.parallel.cholesky2d as c2d
from stheno_tpu.parallel import dist_cholesky_2d, make_grid_mesh


def _psd(n, seed=0):
    r = np.random.RandomState(seed)
    a = r.randn(n, n)
    return jnp.asarray(a @ a.T + n * np.eye(n))


def test_cyclic_relayout_roundtrip():
    r = np.random.RandomState(3)
    K = jnp.asarray(r.randn(48, 48))
    for fac in (2, 4):
        Kc = c2d._to_cyclic(K, 12, fac, 0)
        np.testing.assert_array_equal(
            np.asarray(c2d._from_cyclic(Kc, 12, fac, 0)), np.asarray(K)
        )
        # Row tile J of the cyclic layout is global tile m*fac+q.
        b = 4
        got = np.asarray(Kc[:b])
        np.testing.assert_array_equal(got, np.asarray(K[:b]))


@pytest.mark.parametrize("r,c", [(1, 4), (2, 2), (2, 4), (1, 8)])
def test_dist_cholesky_2d_loop_parity(r, c):
    mesh = make_grid_mesh(r, c)
    K = _psd(96, seed=r * 10 + c)
    L = c2d._dist_cholesky_2d_loop(K, mesh, "rows", "cols", 8)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )


def test_dist_cholesky_2d_uneven_block_clips():
    mesh = make_grid_mesh(2, 4)
    K = _psd(64, seed=5)
    L = dist_cholesky_2d(K, mesh, block=256)  # Clipped to fit.
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )


def test_dist_cholesky_2d_recursive_parity(monkeypatch):
    # One recursion level; see the 1-D note in test_distributed.py.
    monkeypatch.setattr(c2d, "_REC_BASE", 64)
    mesh = make_grid_mesh(2, 4)
    K = _psd(128, seed=7)
    L = jax.jit(lambda K: dist_cholesky_2d(K, mesh, block=8))(K)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )


def test_dist_cholesky_2d_rejects_bad_mesh():
    mesh = make_grid_mesh(2, 3)
    with pytest.raises(ValueError, match="multiple"):
        dist_cholesky_2d(_psd(48), mesh, block=8)


def test_dist_cholesky_2d_work_balance():
    """Per-device FLOPs on a 2x4 mesh stay well below the 1x1 program's
    (the cyclic layout has no serialisation point)."""
    K = _psd(512, seed=9)

    def flops(mesh):
        return (
            jax.jit(lambda K: c2d._dist_cholesky_2d_loop(K, mesh, "rows", "cols", 64))
            .lower(K)
            .compile()
            .cost_analysis()["flops"]
        )

    f1 = flops(make_grid_mesh(1, 1))
    f8 = flops(make_grid_mesh(2, 4))
    assert f8 <= 0.35 * f1, (f8, f1, f8 / f1)


def test_dist_cholesky_2d_with_inv_parity(monkeypatch):
    monkeypatch.setattr(c2d, "_REC_BASE", 64)
    mesh = make_grid_mesh(2, 4)
    K = _psd(128, seed=11)
    L, Linv = jax.jit(
        lambda K: c2d.dist_cholesky_2d_with_inv(K, mesh, block=8)
    )(K)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(K)), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Linv) @ np.asarray(L), np.eye(128), atol=1e-8
    )


def test_dist_nlml_2d_parity_and_grad(monkeypatch):
    monkeypatch.setattr(c2d, "_REC_BASE", 64)
    from stheno_tpu import EQ, GP
    from stheno_tpu.parallel import dist_nlml_2d
    from jax.sharding import NamedSharding, PartitionSpec as P
    from stheno_tpu import pairwise, dense as mdense

    mesh = make_grid_mesh(2, 4)
    n = 128
    x = jnp.linspace(0, 10, n)
    y = jnp.sin(x)

    def nlml_dist(log_ell):
        k = EQ().stretch(jnp.exp(log_ell))
        K = jnp.asarray(mdense(pairwise(k, x[:, None]))) + 0.1 * jnp.eye(n)
        K = jax.lax.with_sharding_constraint(
            K, NamedSharding(mesh, P("rows", "cols"))
        )
        return dist_nlml_2d(K, y, mesh, block=8)

    def nlml_ref(log_ell):
        f = GP(EQ().stretch(jnp.exp(log_ell)))
        return -f.measure.logpdf(f(x, 0.1), y)

    p = jnp.asarray(0.3)
    np.testing.assert_allclose(
        float(jax.jit(nlml_dist)(p)), float(nlml_ref(p)), rtol=1e-8
    )
    g_d = float(jax.jit(jax.grad(nlml_dist))(p))
    g_r = float(jax.grad(nlml_ref)(p))
    np.testing.assert_allclose(g_d, g_r, rtol=1e-6)


def test_dist_nlml_2d_value_only_prunes_inverse():
    from stheno_tpu.parallel import dist_nlml_2d

    mesh = make_grid_mesh(2, 4)
    N = 256
    K = _psd(N, seed=13)
    y = jnp.asarray(np.random.RandomState(14).randn(N))

    def flops(fn, *args):
        return jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]

    f_chol = flops(
        lambda K: c2d._dist_cholesky_2d_loop(K, mesh, "rows", "cols", 16), K
    )
    f_val = flops(lambda K: dist_nlml_2d(K, y, mesh, block=16), K)
    f_vg = flops(
        jax.value_and_grad(lambda K: dist_nlml_2d(K, y, mesh, block=16)), K
    )
    assert f_val <= 1.3 * f_chol, (f_val, f_chol)
    assert f_vg > 2.0 * f_val  # The gradient actually pays for the inverse.


def test_solve_lower_2d_base_sharded_parity_and_balance():
    """The base-case 2-D triangular solve shards L rows over the mesh rows
    and RHS columns (zero-padded) over the mesh columns: per-device FLOPs
    and bytes shrink vs the 1x1 program (no replicated O(N*M) RHS buffer),
    and thin RHS (1 column) still works via padding."""
    N = 512
    K = _psd(N, seed=21)
    L = jnp.asarray(np.linalg.cholesky(np.asarray(K)))
    rhs = jnp.asarray(np.random.RandomState(22).randn(N, 8))
    rhs_thin = rhs[:, :1]

    mesh8 = make_grid_mesh(2, 4)
    mesh1 = make_grid_mesh(1, 1)
    for B in (rhs, rhs_thin):
        X = c2d._solve_lower_2d(L, B, mesh8, "rows", "cols", 64)
        np.testing.assert_allclose(
            np.asarray(X),
            np.linalg.solve(np.asarray(L), np.asarray(B)),
            rtol=1e-8, atol=1e-8,
        )

    def cost(mesh):
        return (
            jax.jit(lambda L, B: c2d._solve_lower_2d(L, B, mesh, "rows", "cols", 64))
            .lower(L, rhs)
            .compile()
            .cost_analysis()
        )

    c1, c8 = cost(mesh1), cost(mesh8)
    assert c8["flops"] <= 0.6 * c1["flops"], (c8["flops"], c1["flops"])
    # Per-device traffic also drops: nothing replicates the O(N*M) RHS.
    assert c8["bytes accessed"] <= 0.75 * c1["bytes accessed"], (
        c8["bytes accessed"], c1["bytes accessed"],
    )
