from .normal import Normal, Random, RandomProcess, RandomVector
from .rng import next_global_key, set_global_key

__all__ = [
    "Normal",
    "Random",
    "RandomProcess",
    "RandomVector",
    "next_global_key",
    "set_global_key",
]
