"""Round-4 TPU experiment batch 2 (after the trimul/base changes).

  1. syrk/trimul microbenches with operands passed as ARGS (batch 1's
     closure version tripped the axon 413 limit).
  2. A/B: tri-aware recursion on/off for NLML value+grad at 8192/16384.
  3. cholesky_with_inv alone with the tri-aware products.
  4. Amortised-variance accuracy metric redo (floored denominator).
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


def slope_time_arg(make_loop, arg, i1, i2, repeats=3):
    """Like slope_time but the big operand is an ARGUMENT of the jitted
    loop (axon serialises jit constants into the compile request; >100 MB
    trips HTTP 413)."""
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1(arg)), float(m2(arg))
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1(arg)); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2(arg)); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


def direct_time(fn, repeats=2):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)


def guard(name, fn):
    section(name)
    try:
        fn()
    except Exception:
        print(f"FAILED {name}:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


dtype = jnp.float32
HI = jax.lax.Precision.HIGHEST
H3 = jax.lax.Precision.HIGH


def syrk_micro():
    from stheno_tpu.ops.trimul import mul_att, syrk_nt, syrk_tn_lower

    n = 8192
    r = np.random.RandomState(0)
    Ld = np.tril(r.randn(n, n).astype(np.float32)) + 4 * np.eye(n, dtype=np.float32)
    Linv = jax.device_put(jnp.asarray(Ld))

    def mk(fn):
        def make(iters):
            @jax.jit
            def many(Li):
                def body(i, acc):
                    C = fn(Li + acc * 1e-30)
                    return acc + jnp.sum(C[::1024, ::1024]) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many
        return make

    full_h = lambda Li: jnp.matmul(
        Li.T, Li, preferred_element_type=dtype, precision=H3)
    put("kinv8192_full_high_ms",
        round(slope_time_arg(mk(full_h), Linv, 2, 12) * 1e3, 2))
    for nb in (4, 8, 16):
        f = lambda Li, nb=nb: syrk_tn_lower(Li, precision=H3, nb=nb)
        put(f"kinv8192_syrktri{nb}_high_ms",
            round(slope_time_arg(mk(f), Linv, 2, 12) * 1e3, 2))
    # trmm microbench: A(4096x4096) @ T^T vs dense.
    A = jax.device_put(jnp.asarray(r.randn(4096, 4096).astype(np.float32)))
    T = jax.device_put(jnp.asarray(Ld[:4096, :4096]))

    def mk2(fn):
        def make(iters):
            @jax.jit
            def many(ops):
                A_, T_ = ops
                def body(i, acc):
                    C = fn(A_ + acc * 1e-30, T_)
                    return acc + jnp.sum(C[::1024, ::1024]) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many
        return make

    dense_att = lambda a, t: jnp.matmul(
        a, t.T, preferred_element_type=dtype, precision=HI)
    put("trmm4096_dense_highest_ms",
        round(slope_time_arg(mk2(dense_att), (A, T), 2, 22) * 1e3, 2))
    for leaf in (512, 1024, 2048):
        f = lambda a, t, leaf=leaf: mul_att(a, t, precision=HI, leaf=leaf)
        put(f"trmm4096_tri_leaf{leaf}_highest_ms",
            round(slope_time_arg(mk2(f), (A, T), 2, 22) * 1e3, 2))
    dense_syrk = lambda a, t: jnp.matmul(
        a, a.T, preferred_element_type=dtype, precision=HI)
    put("syrknt4096_dense_highest_ms",
        round(slope_time_arg(mk2(dense_syrk), (A, T), 2, 22) * 1e3, 2))
    for leaf in (1024, 2048):
        f = lambda a, t, leaf=leaf: syrk_nt(a, precision=HI, leaf=leaf)
        put(f"syrknt4096_tri_leaf{leaf}_highest_ms",
            round(slope_time_arg(mk2(f), (A, T), 2, 22) * 1e3, 2))


def nlml_ab():
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu import EQ, GP

    for n in (8192, 16384):
        x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
        y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

        def nlml(ell):
            f = GP(EQ().stretch(ell))
            return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

        vg = jax.value_and_grad(nlml)
        for tri in (True, False):
            chol_mod._TRI_AWARE = tri

            def make(iters):
                @jax.jit
                def many(e0):
                    def body(i, acc):
                        v, g = vg(e0 + acc * 1e-30)
                        return acc + (v + g) * 1e-30
                    return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
                return many

            i1, i2 = (2, 12) if n <= 8192 else (1, 5)
            t = slope_time_arg(make, jnp.asarray(2.0, dtype), i1, i2)
            put(f"nlml{n}_vg_tri{int(tri)}_ms", round(t * 1e3, 2))
            # Gradient correctness cross-check between the two forms.
            v, g = jax.jit(vg)(jnp.asarray(2.0, dtype))
            put(f"nlml{n}_tri{int(tri)}_val", float(v))
            put(f"nlml{n}_tri{int(tri)}_grad", float(g))
        chol_mod._TRI_AWARE = True


def cholinv_alone():
    from stheno_tpu import EQ, config
    from stheno_tpu.kernels import pairwise
    from stheno_tpu.matrix import dense as mdense
    from stheno_tpu.ops.chol import cholesky_with_inv

    n = 8192
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)

    @config.pin_matmul_precision
    def chol_val(ell):
        K = jnp.asarray(mdense(pairwise(EQ().stretch(ell), x[:, None])))
        K = K + 1e-4 * jnp.eye(n, dtype=dtype)
        L, Linv = cholesky_with_inv(K)
        return jnp.sum(jnp.diagonal(L)) + jnp.sum(jnp.diagonal(Linv))

    def make(iters):
        @jax.jit
        def many(e0):
            def body(i, acc):
                out = chol_val(e0 + acc * 1e-30)
                return acc + out * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return many

    put("cholinv8192_tri_ms", round(
        slope_time_arg(make, jnp.asarray(2.0, dtype), 2, 12) * 1e3, 2))


def var_accuracy():
    from stheno_tpu import EQ
    from stheno_tpu.iterative import (
        cached_posterior_var,
        iterative_posterior_var,
        variance_cache,
    )

    n = 262_144
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.0, dtype), "log_ell": jnp.asarray(0.0, dtype)}
    # Interior test points only (clear of the clamp-at-zero edge effects),
    # plus a couple outside the data for the prior-reversion regime.
    pts = jnp.concatenate([
        jnp.linspace(0.21, 9.79, 48, dtype=dtype),
        jnp.asarray([-1.0, 11.0], dtype=dtype),
    ])
    ref = iterative_posterior_var(
        kf, params, x, y, 0.1, pts, cg_tol=1e-6, max_cg_iters=600,
        precond_rank=128, block=4096, chunk=64, mode="host",
    )
    ref = np.asarray(ref)
    print("ref stats: min", ref.min(), "max", ref.max(), flush=True)
    for rank, refine in ((256, False), (256, True), (512, False), (512, True)):
        tag = f"r{rank}_{'cg' if refine else 'spec'}"
        cache = jax.jit(
            lambda p, key, rank=rank, refine=refine: variance_cache(
                kf, p, x, 0.1, rank=rank, key=key, power_iters=2,
                refine=refine, cg_tol=1e-3, max_cg_iters=20, block=4096,
            )
        )(params, jax.random.PRNGKey(rank + refine))
        got = np.asarray(jax.jit(
            lambda p, c: cached_posterior_var(kf, p, x, c, pts, chunk=64)
        )(params, cache))
        # Floored relative error: the interior variances are O(1e-4) and
        # the CG reference itself is only ~1e-6-accurate absolute.
        denom = np.maximum(np.abs(ref), 1e-5)
        put(f"varacc_{tag}_maxrel", float(np.max(np.abs(got - ref) / denom)))
        put(f"varacc_{tag}_maxabs", float(np.max(np.abs(got - ref))))
        put(f"varacc_{tag}_conservative_ok",
            bool(np.all(got >= ref - 2e-6)))


def opt_steps():
    from stheno_tpu import EQ, GP
    from stheno_tpu.opt import Vars, minimise_adam

    n = 2000
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def run(spd, iters):
        vs = Vars(dtype=dtype)

        def f(v):
            ell = v.positive(1.0, name="ell")
            s2 = v.positive(1.0, name="s2")
            g = GP(s2 * EQ().stretch(ell))
            return -g.measure.logpdf(g(x, 0.1), y)

        minimise_adam(f, vs, iters=2, rate=1e-3, steps_per_dispatch=spd)
        t0 = time.perf_counter()
        minimise_adam(f, vs, iters=iters, rate=1e-3, steps_per_dispatch=spd)
        return iters / (time.perf_counter() - t0)

    put("adam_n2000_steps_per_s_k1", round(run(1, 60), 1))
    put("adam_n2000_steps_per_s_k20", round(run(20, 200), 1))
    put("adam_n2000_steps_per_s_k50", round(run(50, 400), 1))


def batched_nlml():
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
        vg = jax.value_and_grad(lambda e: nlml(e, impl))

        def make(iters):
            @jax.jit
            def many(e0):
                def body(i, acc):
                    v, g = vg(e0 + acc * 1e-30)
                    return acc + (v + g) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many

        put(f"batched8x2048_vg_{impl}_ms",
            round(slope_time_arg(make, jnp.asarray(2.0, dtype), 2, 12) * 1e3, 2))


def nuts_2000():
    # LAST on purpose: batch 1's identical program crashed the TPU worker
    # ("kernel fault"); anything after it would die with the device.
    from stheno_tpu import EQ, GP
    from stheno_tpu.opt import (
        effective_sample_size,
        potential_scale_reduction,
        sample_nuts,
    )

    n = 2000
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    y = jnp.asarray((np.sin(np.asarray(x)) + 0.15 * r.randn(n)).astype(np.float32))

    def logpost(p):
        f = GP(jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"])))
        lp = f.measure.logpdf(f(x, jnp.exp(p["log_noise"])), y)
        return lp - 0.5 * (
            p["log_ell"] ** 2 + p["log_s2"] ** 2 + p["log_noise"] ** 2
        )

    init = {
        "log_ell": jnp.asarray(0.0, dtype),
        "log_s2": jnp.asarray(0.0, dtype),
        "log_noise": jnp.asarray(-1.9, dtype),
    }
    num_samples, num_warmup, chains = 64, 64, 4
    t0 = time.perf_counter()
    samples, accept = sample_nuts(
        logpost, init, jax.random.PRNGKey(0),
        num_samples=num_samples, num_warmup=num_warmup,
        num_chains=chains, max_depth=5,
    )
    wall = time.perf_counter() - t0
    ess = min(
        effective_sample_size(np.asarray(samples[k_])) for k_ in init
    )
    rhat = max(
        potential_scale_reduction(np.asarray(samples[k_])) for k_ in init
    )
    put("nuts_n2000_wall_s", round(wall, 1))
    put("nuts_n2000_accept", round(float(accept), 3))
    put("nuts_n2000_min_ess", round(ess, 1))
    put("nuts_n2000_max_rhat", round(rhat, 3))
    put("nuts_n2000_ess_per_s", round(ess / wall, 2))


def main():
    print("devices:", jax.devices(), flush=True)
    guard("1 syrk/trimul micro", syrk_micro)
    guard("2 nlml tri A/B", nlml_ab)
    guard("3 cholinv alone", cholinv_alone)
    guard("4 var accuracy", var_accuracy)
    guard("5 opt steps", opt_steps)
    guard("6 batched nlml", batched_nlml)
    guard("7 nuts (risky, last)", nuts_2000)
    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
