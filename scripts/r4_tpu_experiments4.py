"""Round-4 TPU experiment batch 4: the dense-path MFU attack (VERDICT r3 #2).

Hypothesis: the residual between the measured n=8192 NLML+grad (55.1 ms,
18.3 TF/s) and the pinned-HIGHEST GEMM ceiling (30 TF/s) sits in the
carried-inverse recursion's base cases — 8 sequential XLA cholesky(1024)
calls plus 8 sequential eye-solves (``solve_triangular(L, I)`` with 1024
right-hand sides). Candidate policy: let XLA's sequential-panel cholesky
produce L (16.5 ms at 8192, measured r3), then build inv(L) by the GEMM
recursion ``tri_inv_lower`` — strictly fewer GEMM MACs (n^3/6 vs n^3/3)
and only tiny eye-solves at the inverse's own base.

Measures, in order (each guarded):
  1. Micro: XLA chol / eye-solve at 1024 and 8192; tri_inv_lower(8192);
     cholesky_with_inv(8192) under both impls.
  2. NLML value+grad at 8192: recursion vs xla+trinv, INV_BASE sweep.
  3. NLML value+grad at 16384: both impls.
  4. Accuracy: factor residual + gradient agreement of both fast impls
     against the XLA value-only policy's gradient at n=4096.
"""

import json
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

RESULTS = {}


def put(key, value):
    RESULTS[key] = value
    print(f"RESULT {key} = {value}", flush=True)


def section(name):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)


def slope_time(make_loop, i1, i2, repeats=3):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


def guard(name, fn):
    section(name)
    try:
        fn()
    except Exception:
        print(f"FAILED {name}:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


dtype = jnp.float32


def _gram(n, ell=2.0):
    """EQ Gram built in-program from a tiny closure (axon 413 guard)."""
    from stheno_tpu import EQ, config
    from stheno_tpu.kernels import pairwise
    from stheno_tpu.matrix import dense as mdense

    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)

    @config.pin_matmul_precision
    def build(e):
        K = jnp.asarray(mdense(pairwise(EQ().stretch(e), x[:, None])))
        return K + 1e-4 * jnp.eye(n, dtype=dtype)

    return build


def micro():
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu import config

    def mk(fn, n):
        build = _gram(n)

        def make(iters):
            @jax.jit
            def many():
                def body(i, acc):
                    K = build(jnp.asarray(2.0, dtype) + acc * 1e-30)
                    return acc + fn(K) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many

        return make

    # Baseline: Gram build alone (subtract from the others).
    put("gram1024_ms", round(slope_time(
        mk(lambda K: jnp.sum(K[::256, ::256]), 1024), 10, 110) * 1e3, 3))
    put("gram8192_ms", round(slope_time(
        mk(lambda K: jnp.sum(K[::1024, ::1024]), 8192), 2, 22) * 1e3, 2))

    def xla_chol(K):
        L = jnp.linalg.cholesky(K)
        return jnp.sum(jnp.diagonal(L))

    def eye_solve(K):
        L = jnp.linalg.cholesky(K)
        n = K.shape[-1]
        I = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=K.dtype), lower=True)
        return jnp.sum(jnp.diagonal(L)) + jnp.sum(I[::128, ::128])

    @config.pin_matmul_precision
    def trinv(K):
        L = jnp.linalg.cholesky(K)
        I = chol_mod.tri_inv_lower(L)
        return jnp.sum(jnp.diagonal(L)) + jnp.sum(I[::128, ::128])

    @config.pin_matmul_precision
    def cholinv(K):
        L, I = chol_mod.cholesky_with_inv(K)
        return jnp.sum(jnp.diagonal(L)) + jnp.sum(I[::128, ::128])

    put("xla_chol1024_ms", round(slope_time(mk(xla_chol, 1024), 10, 110) * 1e3, 3))
    put("eye_solve1024_ms", round(slope_time(mk(eye_solve, 1024), 10, 110) * 1e3, 3))
    put("xla_chol8192_ms", round(slope_time(mk(xla_chol, 8192), 2, 22) * 1e3, 2))
    put("eye_solve8192_ms", round(slope_time(mk(eye_solve, 8192), 2, 12) * 1e3, 2))
    put("xla_trinv8192_ms", round(slope_time(mk(trinv, 8192), 2, 12) * 1e3, 2))

    orig = chol_mod._WITH_INV_IMPL
    try:
        for impl in ("recursion", "xla+trinv"):
            chol_mod._WITH_INV_IMPL = impl
            put(f"cholinv8192_{impl.replace('+', '_')}_ms",
                round(slope_time(mk(cholinv, 8192), 2, 12) * 1e3, 2))
    finally:
        chol_mod._WITH_INV_IMPL = orig


def nlml_ab(n, i1, i2):
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu import EQ, GP

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

    orig_impl, orig_invb = chol_mod._WITH_INV_IMPL, chol_mod._INV_BASE
    try:
        chol_mod._WITH_INV_IMPL = "recursion"
        put(f"nlml{n}_vg_recursion_ms",
            round(slope_time(make, i1, i2) * 1e3, 2))
        chol_mod._WITH_INV_IMPL = "xla+trinv"
        for invb in (None, 512, 256):
            chol_mod._INV_BASE = invb
            put(f"nlml{n}_vg_xla_trinv_invb{invb or 1024}_ms",
                round(slope_time(make, i1, i2) * 1e3, 2))
            if n >= 16384:
                break  # One compile at 16k is minutes; sweep at 8k only.
    finally:
        chol_mod._WITH_INV_IMPL = orig_impl
        chol_mod._INV_BASE = orig_invb


def accuracy():
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu import EQ, GP, config

    n = 4096
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    # Trusted reference: the value-only XLA policy's gradient (sequential
    # triangular-solve VJPs; validated against f64 in tests).
    config.set_cholesky_impl("xla")
    try:
        g_ref = float(jax.jit(jax.grad(nlml))(jnp.asarray(2.0, dtype)))
    finally:
        config.set_cholesky_impl("auto")
    put("grad4096_ref_xla", g_ref)

    build = _gram(n)
    K = jax.jit(build)(jnp.asarray(2.0, dtype))

    orig = chol_mod._WITH_INV_IMPL
    try:
        for impl in ("recursion", "xla+trinv"):
            chol_mod._WITH_INV_IMPL = impl
            tag = impl.replace("+", "_")
            g = float(jax.jit(jax.grad(nlml))(jnp.asarray(2.0, dtype)))
            put(f"grad4096_{tag}", g)
            put(f"grad4096_{tag}_relerr", abs(g - g_ref) / abs(g_ref))

            @config.pin_matmul_precision
            @jax.jit
            def resid(K):
                L, I = chol_mod.cholesky_with_inv(K)
                n_ = K.shape[-1]
                r1 = jnp.max(jnp.abs(
                    L @ I - jnp.eye(n_, dtype=K.dtype)))
                r2 = jnp.max(jnp.abs(L @ L.T - K)) / jnp.max(jnp.abs(K))
                return r1, r2

            r1, r2 = resid(K)
            put(f"resid4096_{tag}_LInv", float(r1))
            put(f"resid4096_{tag}_LLt", float(r2))
    finally:
        chol_mod._WITH_INV_IMPL = orig


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    guard("micro", micro)
    guard("nlml8192_ab", lambda: nlml_ab(8192, 2, 12))
    guard("accuracy", accuracy)
    guard("nlml16384_ab", lambda: nlml_ab(16384, 1, 5))
    print(f"\ntotal wall: {time.time() - t0:.1f} s", flush=True)
    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
