"""Global numerical configuration.

The reference keeps two module-level knobs: ``B.epsilon`` (Cholesky jitter,
``/root/reference/README_without_examples.md:811-822``) and ``Measure.default``.
We keep an explicit, dtype-aware jitter policy instead: float64 paths get the
reference's 1e-12, float32/bfloat16 paths (the TPU MXU path) get a larger
default suited to single precision.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp

__all__ = [
    "epsilon",
    "jitter",
    "set_epsilon",
    "cholesky_impl",
    "set_cholesky_impl",
    "adaptive_jitter",
    "set_adaptive_jitter",
    "matmul_precision",
    "set_matmul_precision",
    "matmul_precision_ctx",
    "pin_matmul_precision",
    "accurate_dists",
    "accurate_dists_enabled",
]

#: Global jitter override. ``None`` means "dtype-aware default".
epsilon = None

_DTYPE_EPSILON = {
    jnp.dtype(jnp.float64): 1e-12,
    jnp.dtype(jnp.float32): 1e-8,
    jnp.dtype(jnp.bfloat16): 1e-4,
}


def set_epsilon(value):
    """Set the global Cholesky jitter. ``None`` restores dtype-aware defaults."""
    global epsilon
    epsilon = value


#: Escalating-jitter Cholesky: when True, dense factorisations probe a
#: ``stop_gradient`` copy and multiply the jitter by 10 until the factor is
#: finite (jit-safe ``lax.while_loop``). Off by default — the reference's
#: semantics are a fixed ``B.epsilon`` with a documented manual bump-and-
#: retry workflow; turn this on for float32/bfloat16 TPU runs where the
#: required jitter tracks ``||K||`` and no fixed value fits all scales.
adaptive_jitter = False


def set_adaptive_jitter(value):
    """Enable/disable the escalating-jitter dense Cholesky policy."""
    global adaptive_jitter
    adaptive_jitter = bool(value)


#: Dense-Cholesky implementation policy. "auto" picks per call site: on
#: accelerator backends at n >= 1024 *and while a gradient is flowing
#: through the factorisation* (detected from the tracer stack —
#: ``matrix/ops.py:_under_autodiff``) it uses the GEMM-rich recursion with
#: carried ``inv(L)`` (`ops/chol.py`), which makes the triangular-solve
#: VJPs GEMMs; for value-only inference it uses XLA's native kernel, which
#: is faster factor-only (measured v5e: NLML value 0.81 vs 1.03 ms at
#: n=2000, 16.5 vs 31.2 ms at n=8192). "xla" / "fast" force one choice.
cholesky_impl = "auto"


def set_cholesky_impl(value):
    """Set the dense-Cholesky policy: "auto", "xla", or "fast"."""
    global cholesky_impl
    if value not in ("auto", "xla", "fast"):
        raise ValueError(f"unknown cholesky_impl: {value!r}")
    cholesky_impl = value


#: MXU matmul precision for the library's own numerics. On TPU, XLA's
#: *default* lowers float32 ``dot`` to a single bfloat16 MXU pass (~185
#: TFLOP/s measured on a v5e) whose input rounding is catastrophic for GP
#: linear algebra: measured at n=2,000 (EQ-periodic NLML, f32), default
#: precision makes the Gram indefinite beyond any reasonable jitter (NLML =
#: NaN), and even a true-f32 Gram NaNs under a bfloat16-pass Cholesky; a
#: bfloat16-pass Gram alone corrupts the NLML *gradient* by ~64%. Even
#: "high" (three bf16 passes, 61 TF/s measured on an 8192 GEMM) is not
#: enough for the *factorisation*: with the Cholesky GEMMs at "high" the
#: n=2,000 NLML is off by 3-6e-2 relative and its gradient by ~500%
#: (the recursion's Schur complements and explicit triangular inverses
#: amplify the dropped lo*lo cross terms), while the Gram at "high" alone
#: only doubles the gradient error (2.2e-2 -> 4.0e-2). With "float32"
#: (= ``Precision.HIGHEST``, six passes, 30 TF/s) the NLML matches the f64
#: reference to 1.6e-4 and its gradient to 2.2e-2. The library therefore
#: pins "float32" on its own matmuls (Gram builds, Cholesky/solve GEMMs,
#: feature maps, distributed paths) at trace time, independent of the
#: ambient JAX default. Set to "high" to trade that accuracy for 2x GEMM
#: speed, or "default"/``None`` to inherit the ambient XLA behaviour.
matmul_precision = "float32"

_PRECISIONS = (
    None,
    "default",
    "bfloat16",
    "tensorfloat32",
    "high",
    "float32",
    "highest",
)


def set_matmul_precision(value):
    """Set the matmul precision used inside the library's numerics.

    ``"float32"``/``"highest"`` (default; six bf16 MXU passes, exact f32),
    ``"high"`` (three passes; 2x GEMM speed, loses ~2 digits on NLML values
    and the sign-level accuracy of gradients through dense factorisations),
    ``"bfloat16"``/``"tensorfloat32"`` (fast, reduced accuracy), or
    ``None``/``"default"`` to inherit the ambient JAX default."""
    global matmul_precision
    if value not in _PRECISIONS:
        raise ValueError(
            f"unknown matmul_precision {value!r}; expected one of {_PRECISIONS}"
        )
    if value != matmul_precision:
        matmul_precision = value
        # jnp ops carry internal ``jit(inline=True)`` caches whose key
        # snapshots the trace context at the *outermost* trace entry — a
        # precision context entered inside a re-traced function (what
        # ``pin_matmul_precision`` does) can therefore hit a jaxpr cached
        # under the previous setting. Drop the caches so the knob always
        # takes effect (measured repro: jnp.matmul re-trace keeps the old
        # precision without this).
        jax.clear_caches()


def matmul_precision_ctx():
    """Context manager applying the library matmul precision (trace-time)."""
    if matmul_precision in (None, "default"):
        return contextlib.nullcontext()
    return jax.default_matmul_precision(matmul_precision)


def pin_matmul_precision(fn):
    """Decorator: trace ``fn``'s body under the library matmul precision.

    Applied at the library's numeric chokepoints (kernel evaluation, dense
    factorisations/solves, iterative and distributed paths) so every ``dot``
    they emit carries an explicit precision, regardless of where the caller
    traces them. jit-safe: precision is a trace-time attribute."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with matmul_precision_ctx():
            return fn(*args, **kwargs)

    return wrapper


#: Trace-time flag: when set, ``kernels.pw_dists2`` computes squared
#: distances by direct differencing ``sum_d (x_id - y_jd)^2`` instead of
#: the MXU-friendly matmul identity ``||x||^2 + ||y||^2 - 2 x.y``. The
#: identity catastrophically cancels near the diagonal (absolute error
#: ``eps * ||x||^2``: with inputs spanning [0, 10] that is ~100 eps * K_ij
#: of *structured* entry error — the measured driver of the computed
#: Gram's indefiniteness at scale, CLAUDE.md "fixed jitter NaNs"); direct
#: differencing is relatively accurate at every distance for d elementwise
#: passes over the tile. Used by the compensated matvec
#: (``iterative/compensated.py``); enable explicitly for any small-noise
#: f32 Gram build.
_accurate_dists = False


@contextlib.contextmanager
def accurate_dists(enable=True):
    """Context manager: cancellation-free pairwise distances (trace-time
    static; see ``_accurate_dists``)."""
    global _accurate_dists
    prev = _accurate_dists
    _accurate_dists = bool(enable)
    try:
        yield
    finally:
        _accurate_dists = prev


def accurate_dists_enabled():
    """Whether the cancellation-free distance path is active."""
    return _accurate_dists


def jitter(dtype) -> float:
    """Cholesky jitter for ``dtype``: the global override if set, else a
    dtype-aware default (1e-12 for float64, matching the reference's
    ``B.epsilon``; 1e-8 for float32)."""
    if epsilon is not None:
        return epsilon
    return _DTYPE_EPSILON.get(jnp.dtype(dtype), 1e-8)
