"""Checkpoint/metrics utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stheno_tpu.opt import Vars
from stheno_tpu.utils import (
    StepMetrics,
    exact_gp_flops,
    load_pytree,
    load_vars,
    save_pytree,
    save_vars,
)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(3.0), "b": (jnp.ones((2, 2)), jnp.asarray(5))}
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, tree)
    like = {"a": jnp.zeros(3), "b": (jnp.zeros((2, 2)), jnp.asarray(0))}
    out = load_pytree(path, like)
    np.testing.assert_allclose(np.asarray(out["a"]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(out["b"][0]), 1.0)
    assert int(out["b"][1]) == 5
    with pytest.raises(ValueError):
        load_pytree(path, {"only": jnp.zeros(1)})


def test_vars_roundtrip(tmp_path):
    vs = Vars()
    vs.positive(2.5, name="ell")
    vs.unbounded(-1.0, name="mu")
    path = str(tmp_path / "vars.npz")
    save_vars(path, vs)

    vs2 = Vars()
    vs2.positive(1.0, name="ell")
    vs2.unbounded(0.0, name="mu")
    load_vars(path, vs2)
    np.testing.assert_allclose(float(vs2["ell"]), 2.5, rtol=1e-10)
    np.testing.assert_allclose(float(vs2["mu"]), -1.0, rtol=1e-10)
    # Unknown parameter -> error.
    vs3 = Vars()
    vs3.positive(1.0, name="other")
    with pytest.raises(ValueError):
        load_vars(path, vs3)


def test_step_metrics():
    m = StepMetrics(flops_per_step=exact_gp_flops(1000))
    rec = m.log(0, 12.5, grads={"g": jnp.ones(4)})
    assert rec["objective"] == 12.5
    np.testing.assert_allclose(rec["grad_norm"], 2.0)
    assert "tflops_per_s" in rec
    assert len(m.records) == 1


def test_legacy_checkpoint_treedef_mismatch_hard_errors(tmp_path):
    """r4 self-review regression: a pre-path-fingerprint checkpoint (only
    __treedef__ stored) whose repr mismatches the template must HARD
    error — without key paths there is no evidence the structures match,
    and unflattening into different slots silently corrupts a resume."""
    import json

    tree = {"a": jnp.arange(3.0), "b": jnp.ones(2)}
    path = str(tmp_path / "legacy.npz")
    save_pytree(path, tree)
    # Strip the key-path fingerprint to simulate the r3 on-disk format.
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files if k != "__paths__"}
    np.savez(path, **arrays)

    # Same structure still loads.
    out = load_pytree(path, {"a": jnp.zeros(3), "b": jnp.zeros(2)})
    np.testing.assert_allclose(np.asarray(out["a"]), [0, 1, 2])

    # Same leaf count, different key layout: must raise, not warn.
    with pytest.raises(ValueError, match="predates key-path"):
        load_pytree(path, {"x": jnp.zeros(3), "y": jnp.zeros(2)})
