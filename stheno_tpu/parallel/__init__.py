from .cholesky import dist_cholesky, dist_solve_lower, make_data_mesh
from .exact import dist_nlml, dist_posterior_predict, sharded_gram

__all__ = [
    "dist_cholesky",
    "dist_solve_lower",
    "make_data_mesh",
    "dist_nlml",
    "dist_posterior_predict",
    "sharded_gram",
]
