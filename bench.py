"""Benchmark: exact GP logpdf at N=2,000 (the reference's headline number:
219 ms +/- 35.7 ms per call on CPU, README_without_examples.md:689-690).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever backend JAX selects (TPU under the driver).

Timing: the TPU here sits behind a network tunnel where per-call host
round-trips cost ~0.4 s and ``block_until_ready`` is unreliable, so the
measurement chains ``iters`` calls inside a jitted ``lax.fori_loop`` (each
iteration's input depends on the previous result, defeating loop-invariant
hoisting) and fetches one scalar at the end; reported value is the min over
repeats."""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

BASELINE_MS = 219.0  # Reference's published per-call latency (CPU %timeit).


def main():
    from stheno_tpu import EQ, GP

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64

    n = 2000
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(y, ell):
        # Periodic-EQ prior with noise, matching the reference's benchmark
        # model (`README_without_examples.md:666-690`).
        f = GP(EQ().stretch(ell).periodic(jnp.asarray(1.0, dtype)))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    def make(iters):
        @jax.jit
        def many(y):
            def body(i, acc):
                # The acc-dependent *hyperparameter* keeps the whole call
                # live: the Gram build and its Cholesky depend on the
                # lengthscale, so XLA cannot hoist them out of the loop (the
                # reference's %timeit likewise re-does the full computation
                # every call).
                out = nlml(y, jnp.asarray(2.0, dtype) + acc * 1e-30)
                return acc + out * 1e-30

            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))

        return many

    # Dispatch-corrected slope timing: the remote-TPU tunnel costs ~25 ms
    # per host round-trip, which would inflate a min(total)/iters estimate
    # by ~0.5 ms/call. Timing two loop lengths and taking the slope isolates
    # the true per-call device latency.
    # Guard: the benched computation must be *correct*, not just fast. At
    # XLA's default matmul precision the f32 Gram/Cholesky NaN on TPU (see
    # stheno_tpu/config.py:matmul_precision); the library pins float32-
    # precision GEMMs, and this assert keeps the benchmark honest.
    val = float(jax.jit(nlml)(y, jnp.asarray(2.0, dtype)))
    assert val == val and abs(val) < 1e9, f"NLML not finite: {val}"

    i1, i2 = 10, 110
    m1, m2 = make(i1), make(i2)
    float(m1(y)), float(m2(y))  # Compile + warm up.
    t1s, t2s = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        float(m1(y))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(m2(y))
        t2s.append(time.perf_counter() - t0)
    per_call_ms = (min(t2s) - min(t1s)) / (i2 - i1) * 1e3

    print(
        json.dumps(
            {
                "metric": "exact_gp_logpdf_n2000_latency",
                "value": round(per_call_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / per_call_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
