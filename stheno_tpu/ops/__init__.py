from .gram import gram, gram_available, set_gram_mode

__all__ = ["gram", "gram_available", "set_gram_mode"]
