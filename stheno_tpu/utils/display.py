"""Multi-line key-value rendering for distribution/model objects.

The reference renders ``Normal``/``FDD`` as indented key-value blocks via
``wbml.util.indented_kv`` (``/root/reference/stheno/random.py:8,119-132``,
``/root/reference/stheno/model/fdd.py:5,95-109``); this is the local
equivalent so ``print(normal)`` shows each component on its own indented
line with continuation lines of nested values aligned under the key.
"""

__all__ = ["indented_kv"]


def indented_kv(key, value, *, suffix="", indent=4):
    """Render ``key=value`` indented by ``indent`` spaces, with any
    continuation lines of ``value`` aligned one level deeper, followed by
    ``suffix``."""
    pad = " " * indent
    lines = str(value).split("\n")
    out = [f"{pad}{key}={lines[0]}"]
    out.extend(pad + " " * (len(str(key)) + 1) + line for line in lines[1:])
    return "\n".join(out) + suffix
