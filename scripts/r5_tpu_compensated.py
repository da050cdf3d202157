"""Round-5 TPU experiment batch 1: the compensated (two-float) solve path
at the N=262,144 north star (run as ONE nohup'd process on the chip —
CLAUDE.md remote-TPU discipline).

Measures, in order (each guarded; partial results stay usable):
  1. eig-precond state at rank 64: lam_max and the plain-f32 noise wall.
  2. Matvec cost ratio: plain ("high") vs compensated, slope-timed
     chained loops (8 RHS, block 8192).
  3. posterior_weights at noise=0.01 (10x below the wall): the plain path
     (expected: stall/garbage) vs the compensated path (expected:
     converges; VERDICT r4 #1 "Done" gate) — true residuals measured
     through the compensated matvec.
  4. Pathwise build cost at noise=0.1 (plain region; VERDICT r4 #5
     `pathwise_build_n262144_s`) and at noise=0.01 with the compensated
     solve (the r4 stall case, now expected to work), plus eval sanity.
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


def section(name):
    print(f"\n=== {name} === ({time.strftime('%H:%M:%S')})", flush=True)


def guard(name, fn):
    section(name)
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


from stheno_tpu import EQ, pathwise_sampler
from stheno_tpu.iterative import (
    eig_precond_state,
    kernel_matvec,
    posterior_weights,
)
from stheno_tpu.iterative.compensated import plain_noise_wall

N = 262_144
BLOCK = 8192
kernel_fn = lambda p: EQ()
rng = np.random.RandomState(0)
x = jnp.asarray(np.sort(rng.rand(N).astype(np.float32)) * 10)
y = jnp.sin(x) + 0.1 * jnp.asarray(rng.randn(N).astype(np.float32))

STATE = [None]


def s1_state():
    t0 = time.time()
    state = jax.jit(
        lambda xx: eig_precond_state(
            kernel_fn, None, xx, 64, jax.random.PRNGKey(1), block=BLOCK
        )
    )(x)
    jax.block_until_ready(state)
    put("state_build_s", round(time.time() - t0, 2))
    STATE[0] = state
    lam_max = float(jnp.max(state[1]))
    put("lam_max", round(lam_max, 1))
    put("plain_noise_wall", round(plain_noise_wall(lam_max, N, jnp.float32), 4))


def s2_matvec_ratio():
    v0 = jnp.asarray(rng.randn(N, 8).astype(np.float32))

    def make(comp):
        def make_loop(iters):
            @jax.jit
            def many(v=v0):
                def body(i, v):
                    w = kernel_matvec(
                        EQ(), x, v, noise=0.01, block=BLOCK, compensated=comp
                    )
                    return w / jnp.max(jnp.abs(w))

                out = lax.fori_loop(0, iters, body, v)
                return jnp.sum(out[::4096])

            return many

        return make_loop

    t_plain = slope_time(make(False), 1, 3)
    t_comp = slope_time(make(True), 1, 3)
    put("matvec_plain_s", round(t_plain, 4))
    put("matvec_comp_s", round(t_comp, 4))
    put("compensated_matvec_cost_ratio", round(t_comp / t_plain, 2))


def s3_solves():
    state = STATE[0]
    noise = 0.01

    def run(comp, tag):
        # EAGER for the compensated case: the segmented host-driven CG
        # bounds each device program (a jitted whole-CG program at ~12 s
        # per compensated matvec faulted the chip at ~10 min).
        def f(xx, yy, U, lam):
            return posterior_weights(
                kernel_fn, None, xx, yy, noise, cg_tol=1e-5,
                max_cg_iters=300 if not comp else 60,
                precond_state=(U, lam), block=BLOCK,
                compensated=comp,
            )
        if not comp:
            f = jax.jit(f)
        t0 = time.time()
        alpha, info = f(x, y, state[0], state[1])
        jax.block_until_ready(alpha)
        t = time.time() - t0
        # warm second call for the steady-state time
        t0 = time.time()
        alpha, info = f(x, y + 1e-6, state[0], state[1])
        jax.block_until_ready(alpha)
        t_warm = time.time() - t0
        put(f"weights_{tag}_iters", int(info["iters"]))
        put(f"weights_{tag}_white_res", float(info["rel_residual"]))
        put(f"weights_{tag}_cold_s", round(t, 2))
        put(f"weights_{tag}_warm_s", round(t_warm, 2))
        # True residual through the compensated operator.
        resid_fn = jax.jit(
            lambda xx, yy, a: jnp.linalg.norm(
                yy - kernel_matvec(
                    EQ(), xx, a, noise=noise, block=BLOCK, compensated=True
                )
            ) / jnp.linalg.norm(yy)
        )
        r = float(resid_fn(x, y + 1e-6, alpha))
        put(f"weights_{tag}_true_res", r)
        put(f"weights_{tag}_alpha_norm", round(float(jnp.linalg.norm(alpha)), 2))

    run(False, "plain")
    run(True, "comp")


def s4_pathwise():
    # (a) noise=0.1, plain region: the build cost the r4 bench omitted.
    t0 = time.time()
    sample_fn, _, info = pathwise_sampler(
        EQ(), x, y, 0.1, jax.random.PRNGKey(0),
        num_samples=8, num_features=2048, solver="cg",
        cg_tol=1e-4, max_cg_iters=200, precond_rank=64, block=BLOCK,
        return_info=True,
    )
    jax.block_until_ready(info["rel_residual"])
    put("pathwise_build_noise0.1_s", round(time.time() - t0, 2))
    put("pathwise_noise0.1_res", float(info["rel_residual"]))
    # Steady-state rebuild (compile cache warm).
    t0 = time.time()
    sample_fn, _, info = pathwise_sampler(
        EQ(), x, y + 1e-6, 0.1, jax.random.PRNGKey(0),
        num_samples=8, num_features=2048, solver="cg",
        cg_tol=1e-4, max_cg_iters=200, precond_rank=64, block=BLOCK,
        return_info=True,
    )
    jax.block_until_ready(info["rel_residual"])
    put("pathwise_build_noise0.1_warm_s", round(time.time() - t0, 2))

    # (b) noise=0.01 — the r4 stall case, on the compensated path (auto
    # resolves eagerly here).
    t0 = time.time()
    sample_fn, _, info = pathwise_sampler(
        EQ(), x, y, 0.01, jax.random.PRNGKey(0),
        num_samples=8, num_features=2048, solver="cg",
        cg_tol=1e-4, max_cg_iters=120, precond_rank=64, block=BLOCK,
        return_info=True, compensated="auto",
    )
    jax.block_until_ready(info["rel_residual"])
    put("pathwise_build_noise0.01_comp_s", round(time.time() - t0, 2))
    put("pathwise_noise0.01_comp_res", float(info["rel_residual"]))
    x_new = jnp.linspace(-1.0, 11.0, 4096, dtype=jnp.float32)
    draws = jax.jit(sample_fn)(x_new)
    jax.block_until_ready(draws)
    finite = bool(jnp.all(jnp.isfinite(draws)))
    spread_in = float(jnp.std(draws[2048], axis=-1).mean()) if draws.ndim else 0
    sd = jnp.std(draws, axis=1)
    put("pathwise_comp_draws_finite", finite)
    put("pathwise_comp_sd_interior", round(float(jnp.mean(sd[1000:3000])), 4))
    put("pathwise_comp_sd_extrap", round(float(jnp.mean(sd[:170])), 4))


guard("1. precond state / wall", s1_state)
guard("2. matvec cost ratio", s2_matvec_ratio)
guard("3. weights solves at noise=0.01", s3_solves)
guard("4. pathwise builds", s4_pathwise)

print("\nALL RESULTS:", flush=True)
import json

print(json.dumps(RESULTS, indent=1), flush=True)
