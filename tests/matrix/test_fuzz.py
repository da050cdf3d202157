"""Randomised structure-vs-dense fuzzing of the matrix algebra.

Every structured op must agree with the same op applied to the densified
operands (the reference gets this property from the `matrix` package's
dispatch; here it is the core invariant of `stheno_tpu/matrix`). Random
compositions catch dispatch branches no hand-written case exercises — the
kind of bug found twice in review (non-symmetric Woodbury capacitance,
vector matmul broadcasting)."""

import itertools
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

import stheno_tpu.matrix as M
from tests.util import approx

N = 8


def _np(a):
    return np.asarray(M.dense(a)) if M.is_structured(a) else np.asarray(a)


def _make(kind, r, n=N):
    if kind == "dense":
        return M.Dense(jnp.asarray(r.randn(n, n)))
    if kind == "diag":
        return M.Diagonal(jnp.asarray(r.rand(n) + 0.5))
    if kind == "zero":
        return M.Zero(jnp.float64, n, n)
    if kind == "const":
        return M.Constant(jnp.asarray(r.randn()), n, n)
    if kind == "lowrank":
        return M.LowRank(jnp.asarray(r.randn(n, 2)))
    if kind == "lowrank_asym":
        return M.LowRank(
            jnp.asarray(r.randn(n, 2)),
            jnp.asarray(r.randn(n, 2)),
            jnp.asarray(r.randn(2, 2)),
        )
    if kind == "woodbury":
        return M.Woodbury(
            M.Diagonal(jnp.asarray(r.rand(n) + 0.5)),
            M.LowRank(jnp.asarray(r.randn(n, 2))),
        )
    if kind == "woodbury_asym":
        return M.Woodbury(
            M.Diagonal(jnp.asarray(r.rand(n) + 0.5)),
            M.LowRank(
                jnp.asarray(r.randn(n, 2)),
                jnp.asarray(r.randn(n, 2)),
                jnp.asarray(r.randn(2, 2) + 3 * np.eye(2)),
            ),
        )
    if kind == "lower":
        return M.LowerTriangular(
            jnp.asarray(np.tril(r.randn(n, n)) + 2 * np.eye(n))
        )
    if kind == "upper":
        return M.UpperTriangular(
            jnp.asarray(np.triu(r.randn(n, n)) + 2 * np.eye(n))
        )
    raise ValueError(kind)


KINDS = [
    "dense",
    "diag",
    "zero",
    "const",
    "lowrank",
    "lowrank_asym",
    "woodbury",
    "woodbury_asym",
    "lower",
    "upper",
]


@pytest.mark.parametrize("ka,kb", list(itertools.product(KINDS, KINDS)))
def test_fuzz_binary(ka, kb):
    r = np.random.RandomState(zlib.crc32(f"{ka}|{kb}".encode()) % 2**31)
    a, b = _make(ka, r), _make(kb, r)
    da, db = _np(a), _np(b)
    approx(_np(M.add(a, b)), da + db, rtol=1e-9, atol=1e-12)
    approx(_np(M.matmul(a, b)), da @ db, rtol=1e-9, atol=1e-12)
    approx(
        _np(M.matmul(a, b, tr_a=True, tr_b=True)), da.T @ db.T, rtol=1e-9, atol=1e-12
    )
    approx(_np(M.multiply(a, b)), da * db, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("kind", KINDS)
def test_fuzz_unary(kind):
    r = np.random.RandomState(zlib.crc32(kind.encode()) % 2**31)
    a = _make(kind, r)
    da = _np(a)
    approx(_np(M.transpose(a)), da.T, rtol=1e-12)
    approx(_np(M.scale(a, -1.7)), -1.7 * da, rtol=1e-12)
    approx(_np(M.diag_of(a)), np.diag(da), rtol=1e-12)
    approx(np.asarray(M.trace(a)), np.trace(da), rtol=1e-10)
    v = jnp.asarray(r.randn(N))
    approx(_np(M.matmul(a, v)), da @ np.asarray(v), rtol=1e-9, atol=1e-12)
    approx(_np(M.matmul(v, a)), np.asarray(v) @ da, rtol=1e-9, atol=1e-12)


SPD_KINDS = ["dense", "diag", "const", "lowrank", "woodbury", "woodbury_asym"]


@pytest.mark.parametrize("kind", SPD_KINDS)
def test_fuzz_spd(kind):
    """solve / iqf / logdet / cholesky / root / sample-cov on an SPD-ised
    version of each structure agree with dense linalg."""
    r = np.random.RandomState(zlib.crc32(f"spd|{kind}".encode()) % 2**31)
    a = _make(kind, r)
    if kind == "dense":
        m = np.asarray(a.mat)
        a = M.Dense(jnp.asarray(m @ m.T + N * np.eye(N)))
    elif kind == "const":
        a = M.add(M.Diagonal(jnp.asarray(r.rand(N) + 1.0)), _make("const", r))
        a = M.add(a, M.Diagonal(jnp.zeros(N)))  # keep structured
    elif kind == "lowrank":
        a = M.Woodbury(M.Diagonal(jnp.asarray(r.rand(N) + 1.0)), _make("lowrank", r))
    elif kind == "woodbury_asym":
        lr = _make("lowrank", r)
        # Symmetrise the middle but keep left != right storage paths by
        # building from an explicit (left, right) pair that is equal-valued.
        left = lr.left
        a = M.Woodbury(
            M.Diagonal(jnp.asarray(r.rand(N) + 1.0)),
            M.LowRank(left, jnp.asarray(np.asarray(left)), jnp.eye(2)),
        )
    da = _np(a)
    w = np.linalg.eigvalsh(da)
    assert w.min() > 0, (kind, w.min())

    b = jnp.asarray(r.randn(N, 3))
    approx(_np(M.solve(a, b)), np.linalg.solve(da, np.asarray(b)), rtol=1e-7)
    approx(
        _np(M.iqf(a, b)),
        np.asarray(b).T @ np.linalg.solve(da, np.asarray(b)),
        rtol=1e-7,
    )
    approx(
        np.asarray(M.iqf_diag(a, b)),
        np.diag(np.asarray(b).T @ np.linalg.solve(da, np.asarray(b))),
        rtol=1e-7,
    )
    approx(np.asarray(M.logdet(a)), np.linalg.slogdet(da)[1], rtol=1e-8)
    L = _np(M.cholesky(a))
    approx(L @ L.T, da, rtol=1e-7, atol=1e-9)
