"""Test helpers mirroring the reference's comparison fixture
(``/root/reference/tests/util.py:34-57``): densify anything structured and
compare with numpy allclose."""

import numpy as np

from stheno_tpu.matrix import dense, is_structured

__all__ = ["approx"]


def _to_numpy(a):
    if is_structured(a):
        return np.asarray(dense(a))
    if isinstance(a, tuple):
        return tuple(_to_numpy(x) for x in a)
    # Normal-like objects (distributions): compare by mean and var. Note
    # jnp/np arrays also have `.mean`/`.var`, but as *methods* — exclude those.
    if hasattr(a, "mean") and hasattr(a, "var") and not callable(a.mean):
        return (_to_numpy(a.mean), _to_numpy(a.var))
    return np.asarray(a)


def approx(a, b, atol=1e-8, rtol=1e-8, desc=None):
    a, b = _to_numpy(a), _to_numpy(b)
    if isinstance(a, tuple) or isinstance(b, tuple):
        assert isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b)
        for ai, bi in zip(a, b):
            approx(ai, bi, atol=atol, rtol=rtol, desc=desc)
        return
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=desc)
