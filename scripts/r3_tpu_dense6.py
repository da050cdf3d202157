"""Candidate policy: XLA cholesky forward + tri_inv GEMM recursion only in
the analytic backward (the carried inverse is no longer needed forward
since the reductions have custom VJPs). Measure vg end-to-end vs the
current fast-path policy."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
from stheno_tpu import EQ, GP
from stheno_tpu import config as st_config
import stheno_tpu.matrix.ops as mops
from stheno_tpu.ops.chol import tri_inv_lower
from stheno_tpu.utils import exact_gp_flops

def log(*a): print(*a, flush=True)

def slope_time(make_loop, i1, i2, repeats=4):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0=time.perf_counter(); float(m1()); t1s.append(time.perf_counter()-t0)
        t0=time.perf_counter(); float(m2()); t2s.append(time.perf_counter()-t0)
    return (min(t2s)-min(t1s))/(i2-i1)

# Patch: when no carried inverse exists, build it by GEMM recursion in the
# backward instead of a sequential n-RHS triangular solve.
_orig = mops._kinv_from_chol
def _kinv_gemm(L, Linv):
    if Linv is None and L.ndim == 2:
        with st_config.matmul_precision_ctx():
            Linv = tri_inv_lower(L)
    return _orig(L, Linv)

log("backend:", jax.default_backend())
dtype = jnp.float32
for n in (8192, 16384):
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)
    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)
    vg = jax.value_and_grad(nlml)
    def make(iters):
        @jax.jit
        def many():
            def body(i, acc):
                v, g = vg(jnp.asarray(2.0, dtype) + acc * 1e-30)
                return acc + (v + g) * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return many
    i1, i2 = (2, 12) if n <= 8192 else (1, 5)
    mops._kinv_from_chol = _kinv_gemm
    st_config.set_cholesky_impl("xla")
    try:
        t = slope_time(make, i1, i2)
        v, g = jax.jit(vg)(jnp.asarray(2.0, dtype))
    finally:
        st_config.set_cholesky_impl("auto")
        mops._kinv_from_chol = _orig
    tf = exact_gp_flops(n, grad=True) / t / 1e12
    log(f"D6 n={n} xla-fwd+gemm-inv-bwd: vg={t*1e3:.2f}ms tflops={tf:.2f} "
        f"v={float(v):.4f} g={float(g):.6f}")
log("DENSE6 DONE")
