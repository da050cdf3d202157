"""Structured step metrics and profiling helpers.

The reference has no observability layer (SURVEY.md §5: an unused module
logger and ``wbml.out.kv`` prints in examples). This provides:

- :class:`StepMetrics`: per-step NLML/grad-norm/wall-time/TFLOP-rate records
  with a compact line printer — the "structured step metrics" obligation.
- :func:`trace`: a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
- :func:`exact_gp_flops`: the roofline FLOP model for an exact-GP NLML step
  (Gram + Cholesky + solves), used to report achieved TFLOP/s.
"""

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["StepMetrics", "trace", "exact_gp_flops"]


def exact_gp_flops(n, d=1, grad=True):
    """FLOPs of an exact-GP NLML step at ``n`` points: Gram (2n^2 d),
    Cholesky (n^3/3), triangular solves (2n^2); the analytic gradient adds a
    triangular inversion + matmul (n^3/2 + n^3, matching the code below).

    This is the STANDARD-dense-algorithm count, used as a fixed normaliser
    for cross-round TFLOP/s comparisons — the library's structure-aware
    trmm/syrk products (``ops/trimul.py``, r4) execute fewer MACs than
    this count assumes, so "roofline TF/s" above the measured HIGHEST
    square-GEMM rate (~30-31 TF/s on v5e) means less work done, not
    faster GEMMs."""
    fwd = 2 * n * n * d + n**3 / 3 + 2 * n * n
    if grad:
        fwd += n**3 / 2 + n**3  # L^{-1} by blocked solve + K^{-1} matmul.
    return fwd


class StepMetrics:
    """Accumulates per-step records; ``log`` returns (and optionally prints)
    a dict of step metrics."""

    def __init__(self, flops_per_step=None, print_every=0):
        self.flops_per_step = flops_per_step
        self.print_every = print_every
        self.records = []
        self._last = time.perf_counter()

    def log(self, step, objective, grads=None, **extra):
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        rec = {
            "step": int(step),
            "objective": float(objective),
            "step_time_s": dt,
        }
        if grads is not None:
            sq = sum(
                float(jnp.sum(g.astype(jnp.float32) ** 2))
                for g in jax.tree.leaves(grads)
            )
            rec["grad_norm"] = sq**0.5
        if self.flops_per_step:
            rec["tflops_per_s"] = self.flops_per_step / dt / 1e12
        rec.update(extra)
        self.records.append(rec)
        if self.print_every and step % self.print_every == 0:
            print(
                "  ".join(
                    f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in rec.items()
                )
            )
        return rec


@contextlib.contextmanager
def trace(log_dir):
    """Profile the enclosed block with ``jax.profiler`` (view in
    TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
