from .cg import batched_cg
from .matvec import kernel_matvec
from .nlml import iterative_nlml, iterative_posterior_mean
from .pchol import pivoted_cholesky, woodbury_preconditioner
from .slq import lanczos, slq_logdet

__all__ = [
    "batched_cg",
    "kernel_matvec",
    "iterative_nlml",
    "iterative_posterior_mean",
    "pivoted_cholesky",
    "woodbury_preconditioner",
    "lanczos",
    "slq_logdet",
]
