from .types import (
    AbstractMatrix,
    Constant,
    Dense,
    Diagonal,
    Kronecker,
    LowRank,
    LowerTriangular,
    UpperTriangular,
    Woodbury,
    Zero,
    is_structured,
)
from .ops import *  # noqa: F401,F403
from .ops import __all__ as _ops_all

__all__ = [
    "AbstractMatrix",
    "Constant",
    "Dense",
    "Diagonal",
    "Kronecker",
    "LowRank",
    "LowerTriangular",
    "UpperTriangular",
    "Woodbury",
    "Zero",
    "is_structured",
] + list(_ops_all)
