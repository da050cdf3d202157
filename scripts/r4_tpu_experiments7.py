"""Round-4 TPU experiment batch 7: pathwise posterior sampling at 262k.

The pathwise (Matheron / random-feature) sampler is the servable form of
GP uncertainty (coherent posterior function draws); docs/scaling.md has
no at-scale measurement. Measure, at N = 262,144 on one v5e:

  1. Build: one shared CG solve for 8 draws (solver="cg", whitened
     preconditioning inherited from the iterative stack).
  2. Evaluation: 8 draws at 4,096 new points (two matmuls per draw
     batch — O(n_new (N + F))).
  3. Sanity: draw mean over samples tracks the posterior mean; draw
     spread is positive at extrapolation points.
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
    from stheno_tpu import EQ, pathwise_sampler

    n = 262_144
    r = np.random.RandomState(0)
    x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
    y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))

    try:
        t0 = time.perf_counter()
        # noise=0.1: the f32 validity region at N=262k requires
        # noise >~ ||K||*eps*sqrt(N) ~ 0.1 (docs/scaling.md); the first
        # pass used 0.01 and the whitened CG stalled -> junk draws with
        # no signal, which motivated the loud stall warning now in
        # pathwise_sampler (this rerun exercises it end-to-end).
        sample_fn, _, cg_info = pathwise_sampler(
            EQ(), x, y, 0.1, jax.random.PRNGKey(0),
            num_samples=8, num_features=2048, solver="cg",
            cg_tol=1e-4, max_cg_iters=200, precond_rank=64, block=8192,
            return_info=True,
        )
        put("pathwise262k_cg_rel_residual", float(cg_info["rel_residual"]))
        put("pathwise262k_cg_iters", int(cg_info["iters"]))
        x_new = jnp.linspace(-1.0, 11.0, 4096, dtype=dtype)
        draws = sample_fn(x_new)
        jax.block_until_ready(draws)
        put("pathwise262k_build_plus_first_eval_s",
            round(time.perf_counter() - t0, 2))
        shifts = iter(np.linspace(0, 1e-6, 6))
        put("pathwise262k_eval4096_s", round(direct_time(
            lambda: jax.block_until_ready(sample_fn(x_new + next(shifts))), 2
        ), 3))
        d = np.asarray(draws)
        put("pathwise262k_draws_finite", bool(np.all(np.isfinite(d))))
        interior = (np.asarray(x_new) > 0.5) & (np.asarray(x_new) < 9.5)
        rmse = float(np.sqrt(np.mean(
            (d[interior].mean(axis=1) - np.sin(np.asarray(x_new)[interior]))
            ** 2
        )))
        put("pathwise262k_drawmean_rmse_interior", round(rmse, 4))
        spread_extrap = float(d[~interior].std(axis=1).mean())
        spread_interior = float(d[interior].std(axis=1).mean())
        put("pathwise262k_spread_interior", round(spread_interior, 4))
        put("pathwise262k_spread_extrap", round(spread_extrap, 4))
    except Exception:
        print("FAILED pathwise262k:", flush=True)
        traceback.print_exc()
        sys.stdout.flush()

    print("\nALL RESULTS:", json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
