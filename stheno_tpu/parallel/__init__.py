from .cholesky import (
    dist_cholesky,
    dist_cholesky_with_inv,
    dist_solve_lower,
    make_data_mesh,
)
from .cholesky2d import (
    dist_cholesky_2d,
    dist_cholesky_2d_with_inv,
    dist_nlml_2d,
    make_grid_mesh,
)
from .exact import dist_nlml, dist_posterior_predict, sharded_gram
from .hosts import initialize_hosts, make_hybrid_mesh
from .iterative import sharded_iterative_nlml, sharded_kernel_matvec
from .sparse import dist_elbo, dist_sparse_posterior

__all__ = [
    "dist_cholesky",
    "dist_cholesky_with_inv",
    "dist_cholesky_2d",
    "dist_cholesky_2d_with_inv",
    "dist_nlml_2d",
    "dist_solve_lower",
    "make_data_mesh",
    "make_grid_mesh",
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
