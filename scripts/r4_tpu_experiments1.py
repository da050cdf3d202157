"""Round-4 TPU experiment batch 1 (run as ONE nohup'd process on the chip).

Measures, in order (each guarded; partial results stay usable):
  1. Dense NLML value+grad breakdown at n=8192 (VERDICT r3 #2).
  2. Symmetric/triangular-aware K^{-1} (syrk-tri) vs the full GEMM.
  3. _BASE sweep for the carried-inverse recursion.
  4. Amortised variance cache at N=262,144: build/query times + accuracy
     at ranks 64/256/512 (VERDICT r3 #1).
  5. Grid (circulant) NLML value+grad at N=2^20 (VERDICT r3 #4).
  6. Kronecker NLML value+grad at 1024x1024 (VERDICT r3 #4).
  7. NUTS ESS/s at n=2000 (VERDICT r3 #6).
  8. Chained-optimiser steps/s at n=2000 (VERDICT r3 #5).
  9. Batched NLML+grad: fast vs xla policy (VERDICT r3 #3).
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


# --- 1. Dense breakdown at n=8192 ------------------------------------------

def dense_breakdown():
    from stheno_tpu import EQ, GP, config
    from stheno_tpu.kernels import pairwise
    from stheno_tpu.matrix import dense as mdense
    from stheno_tpu.ops.chol import cholesky_with_inv

    n = 8192
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    def mk(fn, mul=1e-30):
        def make(iters):
            @jax.jit
            def many():
                def body(i, acc):
                    out = fn(jnp.asarray(2.0, dtype) + acc * 1e-30)
                    return acc + out * mul
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many
        return make

    # Gram build alone.
    @config.pin_matmul_precision
    def gram_val(ell):
        K = mdense(pairwise(EQ().stretch(ell), x[:, None]))
        return jnp.sum(K[::512, ::512])

    put("gram8192_ms", round(slope_time(mk(gram_val), 2, 12) * 1e3, 2))

    # cholesky_with_inv alone (sum of diag keeps it live).
    @config.pin_matmul_precision
    def chol_val(ell):
        K = jnp.asarray(mdense(pairwise(EQ().stretch(ell), x[:, None])))
        K = K + 1e-4 * jnp.eye(n, dtype=dtype)
        L, Linv = cholesky_with_inv(K)
        return jnp.sum(jnp.diagonal(L)) + jnp.sum(jnp.diagonal(Linv))

    put("cholinv8192_ms", round(slope_time(mk(chol_val), 2, 12) * 1e3, 2))

    # NLML value (auto policy = XLA for value-only) and value+grad.
    put("nlml8192_val_ms", round(slope_time(mk(nlml), 2, 12) * 1e3, 2))
    vg = jax.value_and_grad(nlml)
    put("nlml8192_vg_ms", round(
        slope_time(mk(lambda e: sum(vg(e)), mul=1e-30), 2, 12) * 1e3, 2))


# --- 2. syrk-tri K^{-1} ------------------------------------------------------

def syrk_tri(Linv, nb, prec):
    """C = Linv^T Linv for lower-triangular Linv: block-lower triangle only
    (mirrored), contracting only over the nonzero row range."""
    n = Linv.shape[-1]
    b = n // nb
    blocks = [[None] * nb for _ in range(nb)]
    for i in range(nb):
        for j in range(i + 1):
            # C[i, j] = sum_k Linv[k, i-blk]^T Linv[k, j-blk]; Linv is lower
            # so rows k < i*b of column-block i are zero.
            k0 = i * b
            Li = Linv[k0:, i * b:(i + 1) * b]
            Lj = Linv[k0:, j * b:(j + 1) * b]
            blocks[i][j] = jnp.matmul(
                Li.T, Lj, preferred_element_type=Linv.dtype, precision=prec
            )
    rows = []
    for i in range(nb):
        row = []
        for j in range(nb):
            if j <= i:
                row.append(blocks[i][j])
            else:
                row.append(jnp.swapaxes(blocks[j][i], -1, -2))
        rows.append(jnp.concatenate(row, axis=-1))
    return jnp.concatenate(rows, axis=-2)


def syrk_experiment():
    n = 8192
    r = np.random.RandomState(0)
    A = r.randn(n, n).astype(np.float32) / np.sqrt(n)
    A = A @ A.T + np.eye(n, dtype=np.float32)
    A = jnp.asarray(A)
    L = jnp.linalg.cholesky(A)
    eye = jnp.eye(n, dtype=dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Linv = jax.device_put(Linv)

    def mk(fn):
        def make(iters):
            @jax.jit
            def many():
                def body(i, acc):
                    C = fn(Linv + acc * 1e-30)
                    return acc + jnp.sum(C[::1024, ::1024]) * 1e-30
                return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
            return many
        return make

    full_h = lambda Li: jnp.matmul(
        Li.T, Li, preferred_element_type=dtype, precision=H3)
    full_hi = lambda Li: jnp.matmul(
        Li.T, Li, preferred_element_type=dtype, precision=HI)
    put("kinv8192_full_high_ms", round(slope_time(mk(full_h), 2, 22) * 1e3, 2))
    put("kinv8192_full_highest_ms", round(slope_time(mk(full_hi), 2, 22) * 1e3, 2))
    for nb in (4, 8, 16):
        f = lambda Li, nb=nb: syrk_tri(Li, nb, H3)
        put(f"kinv8192_syrktri{nb}_high_ms",
            round(slope_time(mk(f), 2, 22) * 1e3, 2))
    f8hi = lambda Li: syrk_tri(Li, 8, HI)
    put("kinv8192_syrktri8_highest_ms",
        round(slope_time(mk(f8hi), 2, 22) * 1e3, 2))
    # Correctness.
    ref = np.asarray(full_hi(Linv))
    got = np.asarray(syrk_tri(Linv, 8, HI))
    put("kinv8192_syrktri_maxrel",
        float(np.max(np.abs(got - ref)) / np.max(np.abs(ref))))


# --- 3. _BASE sweep ----------------------------------------------------------

def base_sweep():
    import stheno_tpu.ops.chol as chol_mod
    from stheno_tpu import EQ, GP

    n = 8192
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    orig = chol_mod._BASE
    try:
        for base in (256, 512, 1024):
            chol_mod._BASE = base
            vg = jax.value_and_grad(nlml)

            def make(iters):
                @jax.jit
                def many():
                    def body(i, acc):
                        v, g = vg(jnp.asarray(2.0, dtype) + acc * 1e-30)
                        return acc + (v + g) * 1e-30
                    return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
                return many

            put(f"nlml8192_vg_base{base}_ms",
                round(slope_time(make, 2, 12) * 1e3, 2))
    finally:
        chol_mod._BASE = orig


# --- 4. Amortised variance at 262k ------------------------------------------

def variance_262k():
    from stheno_tpu import EQ
    from stheno_tpu.iterative import (
        cached_posterior_var,
        eig_precond_state,
        iterative_posterior_var,
        variance_cache,
    )

    n = 262_144
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.0, dtype), "log_ell": jnp.asarray(0.0, dtype)}
    x_new = jnp.linspace(0.0, 10.0, 2048, dtype=dtype)

    # Reference on a 64-point subset (per-query-exact CG path).
    ref_pts = x_new[::32]
    var_ref = iterative_posterior_var(
        kf, params, x, y, 0.1, ref_pts, cg_tol=1e-5, max_cg_iters=300,
        precond_rank=64, block=4096, chunk=64, mode="host",
    )
    var_ref = np.asarray(var_ref)
    print("ref var head:", var_ref[:4], flush=True)

    for rank in (64, 256, 512):
        for refine in (False, True):
            tag = f"r{rank}_{'cg' if refine else 'spec'}"
            build = jax.jit(
                lambda p, key, rank=rank, refine=refine: variance_cache(
                    kf, p, x, 0.1, rank=rank, key=key, power_iters=2,
                    refine=refine, cg_tol=1e-2, max_cg_iters=12, block=4096,
                )
            )
            keys = iter(jax.random.split(jax.random.PRNGKey(rank), 4))
            cache = build(params, next(keys))
            jax.block_until_ready(cache)
            t_build = direct_time(
                lambda: jax.block_until_ready(build(params, next(keys))), 1
            )
            put(f"var262k_build_{tag}_s", round(t_build, 2))

            query = jax.jit(
                lambda p, c, xn: cached_posterior_var(
                    kf, p, x, c, xn, chunk=1024
                )
            )
            v = query(params, cache, x_new)
            jax.block_until_ready(v)
            shifts = iter(np.linspace(0, 1e-6, 4))
            t_query = direct_time(
                lambda: jax.block_until_ready(
                    query(params, cache, x_new + next(shifts))
                ),
                2,
            )
            put(f"var262k_query2048_{tag}_s", round(t_query, 3))
            got = np.asarray(v)[::32]
            denom = np.maximum(np.abs(var_ref), 1e-8)
            put(f"var262k_maxrel_{tag}",
                float(np.max(np.abs(got - var_ref) / denom)))

    # Shared-basis route: reuse the training precond state (rank 512).
    state = jax.jit(
        lambda p, key: eig_precond_state(kf, p, x, 512, key, block=4096)
    )(params, jax.random.PRNGKey(99))
    jax.block_until_ready(state)
    build2 = jax.jit(
        lambda p, st: variance_cache(
            kf, p, x, 0.1, precond_state=st, refine=True, cg_tol=1e-2,
            max_cg_iters=12, block=4096,
        )
    )
    cache2 = build2(params, state)
    jax.block_until_ready(cache2)
    t2 = direct_time(lambda: jax.block_until_ready(build2(params, state)), 1)
    put("var262k_build_from_state512_s", round(t2, 2))


# --- 5/6. Grid + Kronecker ---------------------------------------------------

def grid_1m():
    from stheno_tpu import EQ
    from stheno_tpu.iterative import grid_iterative_nlml

    n = 1 << 20
    axes = jnp.linspace(0.0, 100.0, n, dtype=dtype)
    yg = jnp.sin(axes) + 0.1 * jnp.asarray(
        np.random.RandomState(0).randn(n).astype(np.float32))
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.0, dtype), "log_ell": jnp.asarray(0.0, dtype)}

    vg = jax.jit(jax.value_and_grad(
        lambda p, key: grid_iterative_nlml(
            kf, p, axes, yg, 0.1, key, num_probes=8, cg_tol=1e-2,
            max_cg_iters=100, slq_steps=20, precond_rank=64,
        )
    ))
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 6))
    v, g = vg(params, next(keys))
    jax.block_until_ready((v, g))
    print("grid nlml value:", float(v), "grad:",
          {k_: float(v_) for k_, v_ in g.items()}, flush=True)
    t = direct_time(
        lambda: jax.block_until_ready(vg(params, next(keys))), 2)
    put("grid_nlml_n1048576_vg_s", round(t, 3))


def kron_1m():
    from stheno_tpu import EQ
    from stheno_tpu.iterative import kron_nlml

    n1 = n2 = 1024
    ax = (
        jnp.linspace(0.0, 10.0, n1, dtype=dtype),
        jnp.linspace(0.0, 8.0, n2, dtype=dtype),
    )
    r = np.random.RandomState(1)
    yk = jnp.asarray(r.randn(n1 * n2).astype(np.float32))
    kfs = lambda p: (
        jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell1"])),
        EQ().stretch(jnp.exp(p["log_ell2"])),
    )
    params = {
        "log_s2": jnp.asarray(0.0, dtype),
        "log_ell1": jnp.asarray(0.0, dtype),
        "log_ell2": jnp.asarray(0.0, dtype),
    }
    vg = jax.jit(jax.value_and_grad(
        lambda p: kron_nlml(kfs, p, ax, yk, 0.1)))
    v, g = vg(params)
    jax.block_until_ready((v, g))
    print("kron nlml value:", float(v), flush=True)
    ps = iter(np.linspace(0, 1e-6, 4))

    def step():
        p2 = dict(params)
        p2["log_s2"] = params["log_s2"] + next(ps)
        jax.block_until_ready(vg(p2))

    put("kron_nlml_n1048576_vg_s", round(direct_time(step, 2), 3))


# --- 7. NUTS ESS/s at n=2000 -------------------------------------------------

def nuts_2000():
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
    num_samples, num_warmup, chains = 96, 96, 4
    t0 = time.perf_counter()
    samples, accept = sample_nuts(
        logpost, init, jax.random.PRNGKey(0),
        num_samples=num_samples, num_warmup=num_warmup,
        num_chains=chains, max_depth=6,
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


# --- 8. Optimiser steps/s ----------------------------------------------------

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


# --- 9. Batched NLML+grad ----------------------------------------------------

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
    guard("1 dense breakdown", dense_breakdown)
    guard("2 syrk-tri", syrk_experiment)
    guard("3 base sweep", base_sweep)
    guard("4 variance 262k", variance_262k)
    guard("5 grid 1M", grid_1m)
    guard("6 kron 1M", kron_1m)
    guard("7 nuts 2000", nuts_2000)
    guard("8 opt steps", opt_steps)
    guard("9 batched nlml", batched_nlml)
    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
