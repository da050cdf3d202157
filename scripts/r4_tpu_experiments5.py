"""Round-4 TPU experiment batch 5: where do the n=8192 NLML+grad ms go?

Batch 4 showed the carried-inverse recursion factorisation at 21.7 ms
(tri-aware, base 1024) vs 55.1 ms for the full value+grad — so ~33 ms sit
OUTSIDE the factorisation. This batch:

  1. Calibrates the real GEMM throughput at the shapes the step uses
     (square 8192/4096/2048/1024 at HIGHEST and HIGH) — the "30 TF/s
     ceiling" was measured on one big square GEMM; recursion leaves may
     sit well below it.
  2. Times each remaining component standalone: K^{-1} syrk variants
     (nb sweep + plain GEMM, HIGH), the Gram VJP contraction, logdet-only
     and iqf-only value+grad.
  3. A/B: _TRI_AWARE off, trimul leaf sweep on the e2e value+grad.
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


def slope_time(make_loop, i1, i2, repeats=3):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


def slope_time_arg(make_loop, arg, i1, i2, repeats=3):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1(arg)), float(m2(arg))
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1(arg)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2(arg)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


def guard(name, fn):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)
    try:
        fn()
    except Exception:
        print(f"FAILED {name}:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


dtype = jnp.float32
HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def mk_arg(fn):
    """Chained loop over a function of one big device operand."""
    def make(iters):
        @jax.jit
        def many(arg):
            def body(i, acc):
                out = fn(arg, acc)
                return acc + out * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return many
    return make


def gemm_calibration():
    """Square GEMM TF/s at HIGHEST/HIGH for the step's shapes."""
    r = np.random.RandomState(0)
    for n in (1024, 2048, 4096, 8192):
        A = jax.device_put(jnp.asarray(r.randn(n, n).astype(np.float32)))
        for prec, tag in ((HI, "highest"), (H3, "high")):
            def f(a, acc, prec=prec):
                C = jnp.matmul(a + acc * 1e-30, a, preferred_element_type=dtype,
                               precision=prec)
                return jnp.sum(C[::256, ::256])
            iters = {1024: (20, 220), 2048: (10, 110), 4096: (4, 44),
                     8192: (2, 12)}[n]
            t = slope_time_arg(mk_arg(f), A, *iters)
            tf = 2 * n**3 / t / 1e12
            put(f"gemm{n}_{tag}_tflops", round(tf, 1))
            put(f"gemm{n}_{tag}_ms", round(t * 1e3, 3))


def kinv_variants():
    """K^{-1} = Linv^T Linv at 8192: plain GEMM vs syrk_tn_lower nb sweep."""
    from stheno_tpu.ops.trimul import syrk_tn_lower

    n = 8192
    r = np.random.RandomState(0)
    Ld = np.tril(r.randn(n, n).astype(np.float32)) + 4 * np.eye(
        n, dtype=np.float32)
    Linv = jax.device_put(jnp.asarray(Ld))

    def plain(a, acc):
        a = a + acc * 1e-30
        C = jnp.matmul(a.T, a, preferred_element_type=dtype, precision=H3)
        return jnp.sum(C[::1024, ::1024])

    put("kinv8192_plain_high_ms",
        round(slope_time_arg(mk_arg(plain), Linv, 2, 12) * 1e3, 2))
    for nb in (2, 4, 8, 16):
        def f(a, acc, nb=nb):
            C = syrk_tn_lower(a + acc * 1e-30, precision=H3, nb=nb)
            return jnp.sum(C[::1024, ::1024])
        put(f"kinv8192_syrktri{nb}_high_ms",
            round(slope_time_arg(mk_arg(f), Linv, 2, 12) * 1e3, 2))


def reduction_pieces():
    """logdet-only and iqf-only value+grad at 8192, plus the Gram-VJP
    contraction alone — the sum should explain the full NLML number."""
    from stheno_tpu import EQ, config
    from stheno_tpu.kernels import pairwise
    from stheno_tpu.matrix import Dense
    from stheno_tpu.matrix import ops as mops
    from stheno_tpu.matrix import dense as mdense

    n = 8192
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = (jnp.sin(x) + 0.3 * jnp.cos(3.2 * x))[:, None]

    def gram(e):
        return Dense(
            jnp.asarray(mdense(pairwise(EQ().stretch(e), x[:, None])))
            + 0.01 * jnp.eye(n, dtype=dtype)
        )

    def mk(fn):
        def make(iters):
            @jax.jit
            def many():
                def body(i, acc):
                    out = fn(jnp.asarray(2.0, dtype) + acc * 1e-30)
                    return acc + out * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many
        return make

    @config.pin_matmul_precision
    def logdet_only(e):
        return mops.logdet(gram(e))

    @config.pin_matmul_precision
    def iqf_only(e):
        return jnp.sum(mops.iqf_diag(gram(e), y))

    @config.pin_matmul_precision
    def gram_vjp_only(e):
        # d/de sum(K(e)) — the Gram build + its VJP with a constant
        # cotangent, no linalg at all.
        return jnp.sum(jnp.asarray(mdense(pairwise(EQ().stretch(e), x[:, None]))))

    for tag, fn in (("logdet", logdet_only), ("iqf", iqf_only),
                    ("gramvjp", gram_vjp_only)):
        vg = jax.value_and_grad(fn)
        put(f"{tag}8192_vg_ms",
            round(slope_time(mk(lambda e, vg=vg: sum(vg(e))), 2, 12) * 1e3, 2))
        if tag != "gramvjp":
            put(f"{tag}8192_val_ms",
                round(slope_time(mk(fn), 2, 12) * 1e3, 2))


def tri_aware_ab():
    """e2e NLML value+grad at 8192: _TRI_AWARE off; trimul leaf sweep."""
    import stheno_tpu.ops.chol as chol_mod
    import stheno_tpu.ops.trimul as trimul_mod
    from stheno_tpu import EQ, GP

    n = 8192
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

    orig_ta, orig_leaf = chol_mod._TRI_AWARE, trimul_mod._LEAF
    try:
        chol_mod._TRI_AWARE = False
        put("nlml8192_vg_noTA_ms", round(slope_time(make, 2, 12) * 1e3, 2))
        chol_mod._TRI_AWARE = True
        for leaf in (512, 2048):
            trimul_mod._LEAF = leaf
            put(f"nlml8192_vg_leaf{leaf}_ms",
                round(slope_time(make, 2, 12) * 1e3, 2))
    finally:
        chol_mod._TRI_AWARE = orig_ta
        trimul_mod._LEAF = orig_leaf


def batched_nlml():
    """Batched (8 x 2048) NLML value+grad: carried-inverse fast policy vs
    XLA policy — the VERDICT r3 #3 'batched microbench shows the fast path
    winning' evidence (batch-1 numbers were lost with the box)."""
    from stheno_tpu import EQ, GP, config

    b, n = 8, 2048
    r = np.random.RandomState(0)
    xb = jnp.asarray(np.sort(r.rand(b, n, 1).astype(np.float32), axis=1) * 10)
    yb = jnp.sin(xb) + 0.1 * jnp.asarray(r.randn(b, n, 1).astype(np.float32))

    def nlml(ell, impl):
        config.set_cholesky_impl(impl)
        try:
            f = GP(EQ().stretch(ell))
            return -jnp.sum(f(xb, 0.1).logpdf(yb))
        finally:
            config.set_cholesky_impl("auto")

    for impl in ("fast", "xla"):
        vg = jax.value_and_grad(lambda e, impl=impl: nlml(e, impl))

        def make(iters):
            @jax.jit
            def many():
                def body(i, acc):
                    v, g = vg(jnp.asarray(2.0, dtype) + acc * 1e-30)
                    return acc + (v + g) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many

        put(f"batched8x2048_vg_{impl}_ms",
            round(slope_time(make, 2, 12) * 1e3, 2))


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    guard("gemm calibration", gemm_calibration)
    guard("kinv variants", kinv_variants)
    guard("reduction pieces", reduction_pieces)
    guard("tri-aware A/B", tri_aware_ab)
    guard("batched nlml", batched_nlml)
    print(f"\ntotal wall: {time.time() - t0:.1f} s", flush=True)
    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
