"""Round-3: isolate the in-context K^{-1} GEMM slowdown.

The vg graph is flop-minimal (cost analysis: val + exactly 2n^3) yet the
backward wall time is ~4.7x the standalone GEMM at n=16384. Time the
pieces as separate programs, then the same chain in ONE program, then the
chained program with an optimization_barrier between the factorisation
and the backward GEMM — if the barrier restores standalone speed, the
pathology is XLA fusing/scheduling across the boundary."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

from stheno_tpu import config as st_config
from stheno_tpu.ops.chol import cholesky_with_inv


def log(*a):
    print(*a, flush=True)


def slope_time(make_loop, i1, i2, repeats=3):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


log("backend:", jax.default_backend())
hi = lax.Precision.HIGHEST

for n in (8192, 16384):
    r = np.random.RandomState(0)
    A = r.randn(n, n).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
    g = jnp.asarray(1.7, jnp.float32)
    resid = jnp.asarray(r.randn(n, 1).astype(np.float32))

    def fwd(K):
        with st_config.matmul_precision_ctx():
            L, Linv = cholesky_with_inv(K)
        return L, Linv

    def bwd(L, Linv, resid, g):
        with st_config.matmul_precision_ctx():
            Kinv = jnp.matmul(
                jnp.swapaxes(Linv, -1, -2), Linv,
                preferred_element_type=jnp.float32,
            )
            half = jnp.matmul(Linv, resid, preferred_element_type=jnp.float32)
            ab = jnp.matmul(
                jnp.swapaxes(Linv, -1, -2), half,
                preferred_element_type=jnp.float32,
            )
            Kbar = g * Kinv - jnp.matmul(ab, jnp.swapaxes(ab, -1, -2))
        return Kbar

    def chained(K, resid, g):
        L, Linv = fwd(K)
        return jnp.sum(bwd(L, Linv, resid, g)) + jnp.sum(
            jnp.log(jnp.diagonal(L))
        )

    def chained_barrier(K, resid, g):
        L, Linv = fwd(K)
        L, Linv = lax.optimization_barrier((L, Linv))
        return jnp.sum(bwd(L, Linv, resid, g)) + jnp.sum(
            jnp.log(jnp.diagonal(L))
        )

    def make(fn, iters, *args):
        @jax.jit
        def many(*args):
            def body(i, acc):
                out = fn(*jax.tree.map(lambda a: a + acc * 1e-30, list(args)))
                return acc + jnp.sum(out if jnp.ndim(out) == 0 else out) * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, jnp.float32))
        return lambda: many(*args)

    i1, i2 = (2, 8) if n <= 8192 else (1, 4)
    t_fwd = slope_time(
        lambda i: make(lambda K: jnp.sum(fwd(K)[0]) + jnp.sum(fwd(K)[1]), i, K),
        i1, i2,
    )
    # bwd-only on materialised factor arguments.
    with jax.default_matmul_precision("float32"):
        Lm, Linvm = jax.jit(fwd)(K)
    t_bwd = slope_time(
        lambda i: make(lambda L, Li, rr, gg: jnp.sum(bwd(L, Li, rr, gg)),
                       i, Lm, Linvm, resid, g),
        i1, i2,
    )
    t_chain = slope_time(lambda i: make(chained, i, K, resid, g), i1, i2)
    t_chainb = slope_time(lambda i: make(chained_barrier, i, K, resid, g), i1, i2)
    log(f"D4 n={n}: fwd={t_fwd*1e3:.1f}ms bwd_only={t_bwd*1e3:.1f}ms "
        f"chained={t_chain*1e3:.1f}ms chained+barrier={t_chainb*1e3:.1f}ms")
log("DENSE4 DONE")
