from .checkpoint import load_pytree, load_vars, save_pytree, save_vars
from .monitor import StepMetrics, exact_gp_flops, trace

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_vars",
    "load_vars",
    "StepMetrics",
    "exact_gp_flops",
    "trace",
]
