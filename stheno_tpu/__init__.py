"""stheno_tpu: a TPU-native Gaussian-process inference engine.

A from-scratch JAX/XLA/Pallas implementation of the modelling capabilities of
``wesselb/stheno`` (reference at ``/root/reference``): a ``Measure``/``GP``
algebra with exact and pseudo-point conditioning, lowered onto structured
matrix linear algebra, fused Pallas Gram kernels, and ``shard_map``-based
distributed Cholesky for multi-chip exact GPs.
"""

from . import config
from .matrix import *  # noqa: F401,F403
from .kernels import *  # noqa: F401,F403
from .dist import *  # noqa: F401,F403
from .lazy import LazyMatrix, LazyVector
from .mo import *  # noqa: F401,F403
from .model import *  # noqa: F401,F403
from .b import B  # noqa: F401  (LAB-compatible op namespace)


class BreakingChangeWarning(UserWarning):
    """A breaking change."""


__version__ = "0.1.0"

import sys as _sys

__all__ = [
    n for n in dir(_sys.modules[__name__])
    if not n.startswith("_") and n not in ("config",)
] + ["config"]
