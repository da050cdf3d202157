"""Round-4 TPU experiment batch 6: variance-cache build-cost sweep.

BENCH_r04 measured the rank-512 CG-refined cache build at 13.6 s — the
one-time cost of the amortised serving path. Batch 3 showed rank 256 and
512 give IDENTICAL query accuracy at the 262k bench problem (the error is
tail-dominated). Sweep (rank, power_iters) x refine to find the cheapest
build with unchanged accuracy; queries are re-checked against the rank-512
refined cache (the per-query-exact path is floor-polluted at interior
points — batch 3 finding — so cache-vs-cache agreement plus the
extrapolation points are the meaningful metric).
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


dtype = jnp.float32


def main():
    print("devices:", jax.devices(), flush=True)
    from stheno_tpu import EQ
    from stheno_tpu.iterative import cached_posterior_var, variance_cache

    n = 262_144
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
    params = {"log_s2": jnp.asarray(0.0, dtype), "log_ell": jnp.asarray(0.0, dtype)}
    pts = jnp.concatenate([
        jnp.linspace(0.21, 9.79, 48, dtype=dtype),
        jnp.asarray([-1.0, 11.0], dtype=dtype),
    ])

    ref = None
    for rank, piters, refine in (
        (512, 2, True),   # The benched config (reference cache).
        (256, 2, True),
        (256, 1, True),
        (128, 2, True),
        (256, 2, False),
    ):
        tag = f"r{rank}_p{piters}_{'cg' if refine else 'spec'}"
        try:
            build = jax.jit(
                lambda p, key, rank=rank, piters=piters, refine=refine:
                variance_cache(
                    kf, p, x, 0.1, rank=rank, key=key, power_iters=piters,
                    refine=refine, cg_tol=1e-3, max_cg_iters=20, block=4096,
                )
            )
            keys = iter(jax.random.split(jax.random.PRNGKey(rank + piters), 4))
            cache = build(params, next(keys))
            jax.block_until_ready(cache)
            put(f"build_{tag}_s", round(direct_time(
                lambda: jax.block_until_ready(build(params, next(keys))), 1
            ), 2))
            got = np.asarray(jax.jit(
                lambda p, c: cached_posterior_var(kf, p, x, c, pts, chunk=64)
            )(params, cache))
            if ref is None:
                ref = got
                print("ref head/tail:", got[:3], got[-3:], flush=True)
            else:
                put(f"acc_{tag}_maxabs_vs_r512", float(np.max(np.abs(got - ref))))
                put(f"acc_{tag}_extrap_maxabs",
                    float(np.max(np.abs(got[-2:] - ref[-2:]))))
        except Exception:
            print(f"FAILED {tag}:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()

    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
