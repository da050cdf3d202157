from .cholesky import dist_cholesky, dist_solve_lower, make_data_mesh
from .exact import dist_nlml, dist_posterior_predict, sharded_gram
from .hosts import initialize_hosts, make_hybrid_mesh
from .iterative import sharded_iterative_nlml, sharded_kernel_matvec
from .sparse import dist_elbo, dist_sparse_posterior

__all__ = [
    "dist_cholesky",
    "dist_solve_lower",
    "make_data_mesh",
    "dist_nlml",
    "dist_posterior_predict",
    "sharded_gram",
    "sharded_iterative_nlml",
    "sharded_kernel_matvec",
    "dist_elbo",
    "dist_sparse_posterior",
    "initialize_hosts",
    "make_hybrid_mesh",
]
