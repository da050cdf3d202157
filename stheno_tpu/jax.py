"""Import-compat shim mirroring the reference's backend modules
(``from stheno.jax import GP, EQ`` — ``/root/reference/stheno/jax.py``).
This framework is JAX-native, so the shim simply re-exports everything."""

from stheno_tpu import *  # noqa: F401,F403
from stheno_tpu import __all__  # noqa: F401
