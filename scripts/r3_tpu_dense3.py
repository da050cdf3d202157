"""Round-3: piecewise decomposition of the dense NLML value+grad time.

The compiled vg program's flops are exactly forward + one K^{-1} GEMM
(cost analysis), and that GEMM runs at 32 TF/s standalone — yet vg wall
time is ~2x the sum of the parts. Time the parts as separate programs on
K-as-argument to find the gap: (a) value on a precomputed K, (b) vg on a
precomputed K (factorisation fwd+bwd without the kernel), (c) the kernel
Gram build + its VJP alone, (d) full vg; and (e) full vg with the
backward K^{-1} GEMM at HIGH precision."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

from stheno_tpu import EQ, GP
from stheno_tpu import config as st_config
from stheno_tpu.kernels import pairwise
from stheno_tpu.matrix import Dense, dense as mdense
from stheno_tpu.dist import Normal


def log(*a):
    print(*a, flush=True)


def slope_time(make_loop, i1, i2, repeats=4):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


log("backend:", jax.default_backend())
dtype = jnp.float32

for n in (8192, 16384):
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)
    K0 = jnp.asarray(mdense(pairwise(EQ().stretch(2.0), x[:, None])))
    K0 = K0 + 0.1 * jnp.eye(n, dtype=dtype)
    Kbar0 = jnp.asarray(
        mdense(pairwise(EQ().stretch(1.7), x[:, None]))
    )  # Stand-in cotangent.

    def nlml_of_K(K):
        return -Normal(jnp.zeros((n, 1), dtype), Dense(K)).logpdf(y)

    def gram_dot(ell, Kbar):
        K = jnp.asarray(mdense(pairwise(EQ().stretch(ell), x[:, None])))
        return jnp.sum(K * Kbar)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    def make(fn, iters, *args):
        @jax.jit
        def many(*args):
            def body(i, acc):
                out = fn(*jax.tree.map(lambda a: a + acc * 1e-30, list(args)))
                return acc + out * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return lambda: many(*args)

    i1, i2 = (2, 8) if n <= 8192 else (1, 4)
    st_config.set_cholesky_impl("fast")
    t_valK = slope_time(lambda i: make(nlml_of_K, i, K0), i1, i2)

    def vgK(K):
        v, g = jax.value_and_grad(nlml_of_K)(K)
        # Touch the whole gradient so none of it is dead code.
        return v + jnp.sum(g) * 1e-30

    t_vgK = slope_time(lambda i: make(vgK, i, K0), i1, i2)
    st_config.set_cholesky_impl("auto")
    def gram_vjp(ell, Kb):
        v, g = jax.value_and_grad(gram_dot)(ell, Kb)
        return v + g * 1e-30

    t_gramvjp = slope_time(
        lambda i: make(gram_vjp, i, jnp.asarray(2.0, dtype), Kbar0), i1, i2
    )
    t_vg = slope_time(
        lambda i: make(
            lambda ell: jax.value_and_grad(nlml)(ell)[0]
            + jax.value_and_grad(nlml)(ell)[1],
            i, jnp.asarray(2.0, dtype),
        ),
        i1, i2,
    )
    log(f"D3 n={n}: valK={t_valK*1e3:.1f}ms vgK={t_vgK*1e3:.1f}ms "
        f"gram+vjp={t_gramvjp*1e3:.1f}ms full_vg={t_vg*1e3:.1f}ms "
        f"(bwdK={(t_vgK-t_valK)*1e3:.1f}ms)")

# (e) Backward K^{-1} GEMM at HIGH: patch the custom-vjp bwd in place.
import stheno_tpu.matrix.ops as mops

_orig_kinv = mops._kinv_from_chol

def _kinv_high(L, Linv):
    return jnp.matmul(
        jnp.swapaxes(Linv, -1, -2), Linv,
        preferred_element_type=L.dtype, precision=lax.Precision.HIGH,
    )

mops._kinv_from_chol = _kinv_high
for n in (8192, 16384):
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    def make(iters):
        @jax.jit
        def many():
            def body(i, acc):
                v, g = jax.value_and_grad(nlml)(jnp.asarray(2.0, dtype) + acc * 1e-30)
                return acc + (v + g) * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return many

    i1, i2 = (2, 8) if n <= 8192 else (1, 4)
    t = slope_time(make, i1, i2)
    v, g = jax.jit(jax.value_and_grad(nlml))(jnp.asarray(2.0, dtype))
    log(f"D3 n={n} vg with HIGH backward GEMM: {t*1e3:.1f}ms "
        f"v={float(v):.4f} g={float(g):.6f}")
mops._kinv_from_chol = _orig_kinv
for n in (8192,):
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    v, g = jax.jit(jax.value_and_grad(nlml))(jnp.asarray(2.0, dtype))
    log(f"D3 n={n} reference HIGHEST grad: v={float(v):.4f} g={float(g):.6f}")
log("DENSE3 DONE")
