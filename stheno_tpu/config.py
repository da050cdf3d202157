"""Global numerical configuration.

The reference keeps two module-level knobs: ``B.epsilon`` (Cholesky jitter,
``/root/reference/README_without_examples.md:811-822``) and ``Measure.default``.
We keep an explicit, dtype-aware jitter policy instead: float64 paths get the
reference's 1e-12, float32/bfloat16 paths (the TPU MXU path) get a larger
default suited to single precision.
"""

import jax.numpy as jnp

__all__ = [
    "epsilon",
    "jitter",
    "set_epsilon",
    "cholesky_impl",
    "set_cholesky_impl",
    "adaptive_jitter",
    "set_adaptive_jitter",
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


#: Dense-Cholesky implementation policy: "auto" uses the GEMM-rich recursive
#: factorisation (`ops/chol.py`) on accelerator backends above its base-case
#: size and XLA's native kernel otherwise; "xla" / "fast" force one choice.
cholesky_impl = "auto"


def set_cholesky_impl(value):
    """Set the dense-Cholesky policy: "auto", "xla", or "fast"."""
    global cholesky_impl
    if value not in ("auto", "xla", "fast"):
        raise ValueError(f"unknown cholesky_impl: {value!r}")
    cholesky_impl = value


def jitter(dtype) -> float:
    """Cholesky jitter for ``dtype``: the global override if set, else a
    dtype-aware default (1e-12 for float64, matching the reference's
    ``B.epsilon``; 1e-8 for float32)."""
    if epsilon is not None:
        return epsilon
    return _DTYPE_EPSILON.get(jnp.dtype(dtype), 1e-8)
