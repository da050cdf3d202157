"""Kernel-evaluation-count contract (ports the reference's pinned contract,
``/root/reference/tests/model/test_model.py:335-365``): posterior marginals
after ``PseudoObs`` may evaluate the base kernel *pairwise* only at
``(x_obs, x_ind)``, ``(x_ind, x_ind)``, ``(x_ind, x_new)`` and *elwise*
only at ``(x_obs, x_obs)``, ``(x_new, x_new)``. This is the strongest
guard against accidental O(N^2) work sneaking into the lazy posterior
path (an extra pairwise at ``(x_obs, x_obs)`` would be O(N^2) memory)."""

import jax.numpy as jnp
import numpy as np

from stheno_tpu import GP, PseudoObs
from stheno_tpu.kernels import pairwise as eval_pairwise
from stheno_tpu.kernels.kernel import EQ, pw_dists2, ew_dists2
from stheno_tpu.matrix import Dense


class TrackingEQ(EQ):
    """EQ kernel recording every pairwise/elwise evaluation."""

    def __init__(self):
        self.pairwise_calls = []
        self.elwise_calls = []

    def _pairwise(self, x, y):
        self.pairwise_calls.append(
            (np.asarray(x).ravel(), np.asarray(y).ravel())
        )
        return Dense(jnp.exp(-0.5 * pw_dists2(x, y)))

    def _elwise(self, x, y):
        self.elwise_calls.append(
            (np.asarray(x).ravel(), np.asarray(y).ravel())
        )
        return jnp.exp(-0.5 * ew_dists2(x, y))

    def __eq__(self, other):
        return self is other

    __hash__ = object.__hash__


def _as_sets(calls):
    return [
        (tuple(np.round(a, 10)), tuple(np.round(b, 10))) for a, b in calls
    ]


def test_pseudoobs_kernel_call_count():
    r = np.random.RandomState(0)
    x_obs = jnp.linspace(0.0, 5.0, 10)
    y_obs = jnp.asarray(r.randn(10))
    x_ind = jnp.linspace(0.0, 5.0, 5)
    x_new = jnp.asarray(r.randn(1))

    k = TrackingEQ()
    p = GP(1, k)
    p_post = p | PseudoObs(p(x_ind), (p(x_obs, 0.1), y_obs))
    mean, var = p_post(x_new).marginals()
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(var)))

    def key(u, v):
        return (tuple(np.round(np.asarray(u).ravel(), 10)),
                tuple(np.round(np.asarray(v).ravel(), 10)))

    allowed_pairwise = {
        key(x_obs, x_ind),
        key(x_ind, x_obs),  # transpose evaluation is equally cheap
        key(x_ind, x_ind),
        key(x_ind, x_new),
        key(x_new, x_ind),
    }
    allowed_elwise = {key(x_obs, x_obs), key(x_new, x_new)}

    got_pairwise = set(_as_sets(k.pairwise_calls))
    got_elwise = set(_as_sets(k.elwise_calls))
    assert got_pairwise <= allowed_pairwise, (
        f"forbidden pairwise evaluations: {got_pairwise - allowed_pairwise}"
    )
    assert got_elwise <= allowed_elwise, (
        f"forbidden elwise evaluations: {got_elwise - allowed_elwise}"
    )
    # The required evaluations did happen (pairwise obs x ind and ind x ind
    # in either orientation; elwise on the training diag for VFE).
    assert key(x_ind, x_ind) in got_pairwise
    assert (key(x_obs, x_ind) in got_pairwise) or (
        key(x_ind, x_obs) in got_pairwise
    )
    assert key(x_obs, x_obs) in got_elwise
    assert key(x_new, x_new) in got_elwise


def test_exact_obs_posterior_marginals_no_new_new_pairwise():
    """Exact conditioning: posterior marginals at x_new may never build the
    (x_new, x_new) pairwise Gram (the fused mean_var_diag path)."""
    r = np.random.RandomState(1)
    x_obs = jnp.linspace(0.0, 5.0, 8)
    y_obs = jnp.asarray(r.randn(8))
    x_new = jnp.asarray(r.randn(200))

    k = TrackingEQ()
    p = GP(k)
    p_post = p | (p(x_obs, 0.1), y_obs)
    mean, var = p_post(x_new).marginals()
    assert np.all(np.isfinite(np.asarray(var)))

    def key(u, v):
        return (tuple(np.round(np.asarray(u).ravel(), 10)),
                tuple(np.round(np.asarray(v).ravel(), 10)))

    forbidden = key(x_new, x_new)
    got_pairwise = set(_as_sets(k.pairwise_calls))
    assert forbidden not in got_pairwise, (
        "posterior marginals built the O(M^2) (x_new, x_new) Gram"
    )
    assert key(x_new, x_new) in set(_as_sets(k.elwise_calls))
