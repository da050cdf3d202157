"""Global RNG convenience.

The core sampling API is functional (`sample(key, ...)` with explicit
``jax.random`` keys — the reference's functional-state variant at
``/root/reference/stheno/random.py:331-355``). For eager, notebook-style use
the reference also offers a global-state variant; we mirror that with a
module-level key that is split on every draw. Do **not** rely on the global
variant inside ``jit`` — pass keys explicitly there."""

import jax

__all__ = ["set_global_key", "next_global_key"]

_global_key = jax.random.PRNGKey(0)


def set_global_key(key_or_seed):
    """Set the global RNG key (accepts a key or an integer seed)."""
    global _global_key
    if isinstance(key_or_seed, int):
        _global_key = jax.random.PRNGKey(key_or_seed)
    else:
        _global_key = key_or_seed


def next_global_key():
    """Split the global key and return a fresh subkey."""
    global _global_key
    _global_key, sub = jax.random.split(_global_key)
    return sub
