"""Round-4 TPU experiment batch 3.

  1. Variance-cache accuracy at 262k AFTER the cancellation fix (the
     out-of-span energy is now the explicit-residual norm), + query time.
  2. Chained-optimiser steps/s with the chain program compiled BEFORE the
     timed region (batch 2 timed the scan compile).
  3. NUTS at n=2000 with adaptive jitter ON (batch 2 went NaN when warmup
     explored tiny noise — the documented f32 failure CLAUDE.md names
     adaptive jitter for).
"""

import json
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

RESULTS = {}


def put(key, value):
    RESULTS[key] = value
    print(f"RESULT {key} = {value}", flush=True)


def direct_time(fn, repeats=2):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)


def guard(name, fn):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)
    try:
        fn()
    except Exception:
        print(f"FAILED {name}:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


dtype = jnp.float32


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
        denom = np.maximum(np.abs(ref), 1e-5)
        put(f"varacc_{tag}_maxrel", float(np.max(np.abs(got - ref) / denom)))
        put(f"varacc_{tag}_maxabs", float(np.max(np.abs(got - ref))))
        put(f"varacc_{tag}_conservative_ok",
            bool(np.all(got >= ref - 2e-6)))
        if rank == 512 and refine:
            print("per-point |err| head/tail:",
                  np.abs(got - ref)[:6], np.abs(got - ref)[-6:], flush=True)
            # Query timing for the fixed (3-GEMM) form at 2048 points.
            x_var = jnp.linspace(0.0, 10.0, 2048, dtype=dtype)
            query = jax.jit(
                lambda p, c, xn: cached_posterior_var(
                    kf, p, x, c, xn, chunk=1024)
            )
            v = query(params, cache, x_var)
            jax.block_until_ready(v)
            sh = iter(np.linspace(0, 1e-6, 4))
            put("var262k_query2048_fixed_s", round(direct_time(
                lambda: jax.block_until_ready(
                    query(params, cache, x_var + next(sh))), 2), 3))


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

        # Warm up BOTH programs (the chain needs >= spd iters to trace).
        minimise_adam(f, vs, iters=2 * spd, rate=1e-3,
                      steps_per_dispatch=spd)
        t0 = time.perf_counter()
        minimise_adam(f, vs, iters=iters, rate=1e-3, steps_per_dispatch=spd)
        return iters / (time.perf_counter() - t0)

    put("adam_n2000_steps_per_s_k1", round(run(1, 100), 1))
    put("adam_n2000_steps_per_s_k20", round(run(20, 400), 1))
    put("adam_n2000_steps_per_s_k50", round(run(50, 1000), 1))
    put("adam_n2000_steps_per_s_k100", round(run(100, 2000), 1))


def nuts_2000():
    from stheno_tpu import EQ, GP, config
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
    config.set_adaptive_jitter(True)
    try:
        t0 = time.perf_counter()
        samples, accept = sample_nuts(
            logpost, init, jax.random.PRNGKey(0),
            num_samples=num_samples, num_warmup=num_warmup,
            num_chains=chains, max_depth=5,
        )
        wall = time.perf_counter() - t0
    finally:
        config.set_adaptive_jitter(False)
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
    guard("1 var accuracy (fixed)", var_accuracy)
    guard("2 opt steps (fixed warmup)", opt_steps)
    guard("3 nuts adaptive jitter", nuts_2000)
    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
