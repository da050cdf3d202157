"""Global RNG convenience.

The core sampling API is functional (`sample(key, ...)` with explicit
``jax.random`` keys — the reference's functional-state variant at
``/root/reference/stheno/random.py:331-355``). For eager, notebook-style use
the reference also offers a global-state variant; we mirror that with a
module-level key that is split on every draw. Do **not** rely on the global
variant inside ``jit`` — pass keys explicitly there."""

import jax

__all__ = ["set_global_key", "next_global_key"]

# Created lazily on first use: building a key at import time would
# initialise the XLA backend as a side effect of `import stheno_tpu`,
# which breaks anything that must run first (jax.distributed.initialize
# on multi-host clusters, platform/flag configuration).
_global_key = None


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
    if _global_key is None:
        _global_key = jax.random.PRNGKey(0)
    _global_key, sub = jax.random.split(_global_key)
    return sub
