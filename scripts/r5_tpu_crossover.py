"""Round-5 TPU batch: the 16k-262k coverage hole (VERDICT r4 #7).

Measures the dense NLML at n=32,768 (value, then value+grad — the grad
recursion carries inv(L) and may exceed HBM; guarded) and the iterative
stochastic step at n = 16,384 / 32,768 / 65,536, to publish the
dense<->iterative crossover table in docs/scaling.md.
"""

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


def guard(name, fn):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)
    try:
        fn()
    except Exception:
        print(f"FAILED {name}:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()


def slope_time(make_loop, i1, i2, repeats=3):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


from stheno_tpu import EQ, GP
from stheno_tpu.iterative import iterative_nlml

dtype = jnp.float32


def dense_32k():
    n = 32768
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    # Value-only first (XLA cholesky; ~2x Gram in HBM).
    val = jax.jit(nlml)(jnp.asarray(2.0, dtype))
    assert np.isfinite(float(val)), val
    t0 = time.perf_counter()
    v2 = jax.jit(nlml)(jnp.asarray(2.0 + 1e-7, dtype))
    jax.block_until_ready(v2)
    put("dense32k_value_s", round(time.perf_counter() - t0, 3))

    vg = jax.jit(jax.value_and_grad(nlml))
    v, g = vg(jnp.asarray(2.0, dtype))
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    v, g = vg(jnp.asarray(2.0 + 1e-7, dtype))
    jax.block_until_ready(g)
    put("dense32k_value_grad_s", round(time.perf_counter() - t0, 3))
    put("dense32k_grad", float(g))


def iterative_small_n():
    for n in (16384, 32768, 65536):
        r = np.random.RandomState(0)
        x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
        y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))
        kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
        params = {
            "log_s2": jnp.asarray(0.0, dtype),
            "log_ell": jnp.asarray(0.0, dtype),
        }

        @jax.jit
        def vg(p, key):
            return jax.value_and_grad(
                lambda p: iterative_nlml(
                    kf, p, x, y, 0.1, key,
                    num_probes=16, cg_tol=1e-2, max_cg_iters=200,
                    slq_steps=30, precond_rank=64, block=8192,
                )
            )(p)

        keys = iter(jax.random.split(jax.random.PRNGKey(0), 8))
        v, g = vg(params, next(keys))
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        v, g = vg(params, next(keys))
        jax.block_until_ready(g)
        put(f"iter{n}_step_s", round(time.perf_counter() - t0, 3))


guard("dense 32k", dense_32k)
guard("iterative 16k/32k/64k", iterative_small_n)

print("\nALL RESULTS:", flush=True)
import json

print(json.dumps(RESULTS, indent=1), flush=True)
