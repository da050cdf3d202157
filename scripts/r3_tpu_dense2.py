"""Round-3 follow-up: decompose the dense value+grad regression.

Times standalone GEMM shapes that appear in the analytic backward
(K^{-1} = Linv^T Linv) at both library precisions, plus the value+grad
program under cost analysis — to find where the 116 ms (n=8192) /
1081 ms (n=16384) actually goes."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")


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

for n in (8192, 16384):
    r = np.random.RandomState(0)
    A = jnp.asarray(r.randn(n, n).astype(np.float32))
    L = jnp.tril(A) + n * jnp.eye(n, dtype=jnp.float32)

    def timed(tag, f):
        def make(iters):
            @jax.jit
            def many(A, L):
                # Operands are ARGUMENTS, not closure constants — a closed-
                # over 268 MB array is serialized into the remote compile
                # request and trips its HTTP 413 length limit.
                def body(i, acc):
                    out = f(A + acc * 1e-30, L + acc * 1e-30)
                    # FULL reduction: a sliced output lets XLA slice the
                    # GEMM itself down to a dot product.
                    return acc + jnp.sum(out) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, jnp.float32))
            return lambda: many(A, L)
        t = slope_time(make, 1, 4)
        tf = 2 * n**3 / t / 1e12
        log(f"GEMM n={n} {tag}: {t*1e3:.1f}ms {tf:.1f}TF/s")

    hi = lax.Precision.HIGHEST
    hg = lax.Precision.HIGH
    timed("A@A HIGHEST", lambda A, L: jnp.matmul(A, A, precision=hi))
    timed("A.T@A HIGHEST", lambda A, L: jnp.matmul(A.T, A, precision=hi))
    timed("L.T@L HIGHEST (tri)", lambda A, L: jnp.matmul(L.T, L, precision=hi))
    timed("A@A HIGH", lambda A, L: jnp.matmul(A, A, precision=hg))
    timed("A.T@A HIGH", lambda A, L: jnp.matmul(A.T, A, precision=hg))
    timed(
        "A.T@A HIGHEST pet",
        lambda A, L: jnp.matmul(
            A.T, A, precision=hi, preferred_element_type=jnp.float32
        ),
    )

# Cost analysis of the NLML value vs value+grad on the device compile.
from stheno_tpu import EQ, GP
from stheno_tpu import config as st_config

for n in (8192,):
    x = jnp.linspace(0.0, 10.0, n, dtype=jnp.float32)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, jnp.float32)), y)

    p = jnp.asarray(2.0, jnp.float32)
    st_config.set_cholesky_impl("fast")
    try:
        cv = jax.jit(nlml).lower(p).compile().cost_analysis()
        cg = jax.jit(jax.value_and_grad(nlml)).lower(p).compile().cost_analysis()
    finally:
        st_config.set_cholesky_impl("auto")
    log(f"COST n={n} val: flops={cv.get('flops'):.3e} bytes={cv.get('bytes accessed', -1):.3e}")
    log(f"COST n={n} vg:  flops={cg.get('flops'):.3e} bytes={cg.get('bytes accessed', -1):.3e}")

log("DENSE2 DONE")
