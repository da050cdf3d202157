"""Fault-tolerant training loop: resume after restart, bad-step rollback."""

import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from stheno_tpu.utils import resumable_minimise


def test_basic_minimise(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    obj = lambda p: jnp.sum((p["x"] - 2.0) ** 2)
    params, info = resumable_minimise(
        obj, {"x": jnp.zeros(2)}, steps=150, checkpoint_path=path,
        optimizer=optax.adam(0.1), trace=True,
    )
    assert info["resumed_from"] is None
    assert info["steps_run"] == 150
    assert info["objective_trace"][-1] < info["objective_trace"][0]
    np.testing.assert_allclose(np.asarray(params["x"]), 2.0, atol=0.1)


def test_resume_after_restart(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    obj = lambda p: jnp.sum((p["x"] - 2.0) ** 2)
    p0 = {"x": jnp.zeros(())}
    # First "process" runs 6 steps and dies.
    p1, info1 = resumable_minimise(
        obj, p0, steps=6, checkpoint_path=path, checkpoint_every=2,
        optimizer=optax.sgd(0.05),
    )
    assert os.path.exists(path)
    # Restarted process continues from the checkpoint, not from p0.
    p2, info2 = resumable_minimise(
        obj, p0, steps=12, checkpoint_path=path, checkpoint_every=2,
        optimizer=optax.sgd(0.05),
    )
    assert info2["resumed_from"] == 6
    assert info2["steps_run"] == 6
    # 12 total sgd steps from 0: x = 2 * (1 - 0.9^12)
    expected = 2.0 * (1 - 0.9**12)
    np.testing.assert_allclose(float(p2["x"]), expected, rtol=1e-5)


def test_rollback_on_nan(tmp_path):
    # log(1.5 - x): objective is NaN past x = 1.5; a big sgd step from
    # x=1.4 overshoots into the NaN region and must be halved back.
    path = str(tmp_path / "ckpt.npz")
    obj = lambda p: jnp.log(1.5 - p["x"]) + (p["x"] - 0.5) ** 2
    params, info = resumable_minimise(
        obj, {"x": jnp.asarray(1.4)}, steps=3, checkpoint_path=path,
        optimizer=optax.sgd(0.1), max_retries=8,
    )
    assert info["rejected_steps"] > 0
    assert bool(jnp.isfinite(obj(params)))


def test_raises_on_bad_init(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    obj = lambda p: jnp.log(-1.0 - p["x"] ** 2)
    with pytest.raises(FloatingPointError):
        resumable_minimise(
            obj, {"x": jnp.asarray(0.0)}, steps=2, checkpoint_path=path
        )


def test_rollback_recovers_under_adam(tmp_path):
    # Adam's update is invariant to gradient scaling (m_hat/sqrt(v_hat)),
    # so rollback must halve the post-optimizer UPDATE; halved gradients
    # would re-apply the identical diverging step forever. Objective:
    # quadratic bowl at 0.5 with NaN outside |x - 0.5| < 1 — an oversized
    # Adam step (~lr) overshoots the bowl into the NaN region and must be
    # halved back inside the domain.
    path = str(tmp_path / "ckpt.npz")
    obj = lambda p: (p["x"] - 0.5) ** 2 + 1e-6 * jnp.sqrt(
        1.0 - (p["x"] - 0.5) ** 2
    )
    params, info = resumable_minimise(
        obj, {"x": jnp.asarray(1.4)}, steps=3, checkpoint_path=path,
        optimizer=optax.adam(2.5), max_retries=6,
    )
    assert info["rejected_steps"] > 0
    assert bool(jnp.isfinite(obj(params)))
    assert abs(float(params["x"]) - 0.5) < 1.0


def test_trace_aligns_with_steps_despite_rollback(tmp_path):
    """objective_trace has exactly one entry per completed step (steps+1
    including the initial evaluation) even when rollback retries occur,
    and rollback_steps records which steps were rejected."""
    from stheno_tpu.utils.resilience import resumable_minimise

    calls = {"n": 0}

    def objective(p):
        calls["n"] += 1
        # A bowl with a NaN wall: large params diverge.
        return jnp.where(p["w"] ** 2 > 25.0, jnp.nan, 10.0 * (p["w"] - 3.0) ** 2)

    import optax

    params, info = resumable_minimise(
        objective,
        {"w": jnp.asarray(0.0)},  # First sgd step overshoots into the wall.
        steps=8,
        checkpoint_path=str(tmp_path / "ck.npz"),
        optimizer=optax.sgd(0.4),
        trace=True,
    )
    assert len(info["objective_trace"]) == 8 + 1
    assert info["rejected_steps"] >= 1  # The overshoot was caught.
    # The FIRST update (step 1: w=0 -> 24, through the NaN wall) is the
    # rejected one — rollback_steps must name it exactly.
    assert info["rollback_steps"] == [1], info["rollback_steps"]


def test_checkpoint_treedef_mismatch_raises(tmp_path):
    """Restoring into a same-leaf-count but differently structured state
    raises instead of silently scrambling leaves (ADVICE r2)."""
    from stheno_tpu.utils.checkpoint import load_pytree, save_pytree

    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"a": jnp.asarray(1.0), "b": jnp.asarray(2.0)})
    # Same leaf count, same structure: loads fine.
    out = load_pytree(path, {"a": jnp.asarray(0.0), "b": jnp.asarray(0.0)})
    assert float(out["a"]) == 1.0
    # Same leaf count, different structure: loud error.
    with pytest.raises(ValueError, match="structure"):
        load_pytree(path, {"a": (jnp.asarray(0.0), jnp.asarray(0.0))})


def test_checkpoint_treedef_repr_drift_warns_but_loads(tmp_path):
    """A treedef *repr* mismatch with identical leaf key paths (what a
    JAX/optax version change produces) warns and loads instead of
    hard-rejecting (r3 advisor finding); strict=True restores the raise."""
    import json

    import numpy as onp

    from stheno_tpu.utils.checkpoint import load_pytree, save_pytree

    path = str(tmp_path / "ck.npz")
    save_pytree(path, {"a": jnp.asarray(1.0), "b": jnp.asarray(2.0)})
    # Simulate a dependency changing the treedef repr: rewrite the stored
    # repr text while leaving leaves and key paths untouched.
    with onp.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    arrays["__treedef__"] = onp.frombuffer(
        json.dumps("PyTreeDef({'a': *, 'b': *}, renamed-by-upgrade)").encode(),
        dtype=onp.uint8,
    )
    onp.savez(path, **arrays)
    template = {"a": jnp.asarray(0.0), "b": jnp.asarray(0.0)}
    with pytest.warns(UserWarning, match="repr"):
        out = load_pytree(path, template)
    assert float(out["a"]) == 1.0 and float(out["b"]) == 2.0
    with pytest.raises(ValueError, match="repr"):
        load_pytree(path, template, strict=True)


def test_chained_dispatch_matches_per_step_trajectory(tmp_path):
    """steps_per_dispatch > 1 chains steps in one lax.scan dispatch; on a
    clean run the update sequence, trace, and final params are identical
    to per-step mode (VERDICT r3 #5)."""
    obj = lambda p: jnp.sum((p["x"] - 2.0) ** 2) + jnp.sum(p["y"] ** 4)
    init = {"x": jnp.zeros(2), "y": jnp.asarray(0.7)}
    p1, i1 = resumable_minimise(
        obj, init, steps=20, checkpoint_path=str(tmp_path / "a.npz"),
        optimizer=optax.adam(0.05), trace=True,
    )
    p2, i2 = resumable_minimise(
        obj, init, steps=20, checkpoint_path=str(tmp_path / "b.npz"),
        optimizer=optax.adam(0.05), trace=True, steps_per_dispatch=5,
    )
    np.testing.assert_allclose(np.asarray(p1["x"]), np.asarray(p2["x"]), rtol=1e-12)
    np.testing.assert_allclose(float(p1["y"]), float(p2["y"]), rtol=1e-12)
    assert len(i1["objective_trace"]) == len(i2["objective_trace"]) == 21
    np.testing.assert_allclose(
        i1["objective_trace"], i2["objective_trace"], rtol=1e-10
    )
    assert i2["steps_run"] == 20 and i2["rejected_steps"] == 0


def test_chained_dispatch_rollback_parity(tmp_path):
    """A NaN wall inside a chain freezes the scan, the chain is replayed
    step-granular, and the rollback outcome matches per-step mode."""
    def objective(p):
        return jnp.where(p["w"] ** 2 > 25.0, jnp.nan, 10.0 * (p["w"] - 3.0) ** 2)

    kw = dict(
        steps=8, optimizer=optax.sgd(0.4), trace=True, max_retries=6,
    )
    p1, i1 = resumable_minimise(
        objective, {"w": jnp.asarray(0.0)},
        checkpoint_path=str(tmp_path / "a.npz"), **kw,
    )
    p2, i2 = resumable_minimise(
        objective, {"w": jnp.asarray(0.0)},
        checkpoint_path=str(tmp_path / "b.npz"), steps_per_dispatch=4, **kw,
    )
    assert i2["rejected_steps"] >= 1
    assert i1["rollback_steps"] == i2["rollback_steps"] == [1]
    np.testing.assert_allclose(float(p1["w"]), float(p2["w"]), rtol=1e-10)
    np.testing.assert_allclose(
        i1["objective_trace"], i2["objective_trace"], rtol=1e-10
    )


def test_chained_dispatch_resumes_from_checkpoint(tmp_path):
    """Chained mode still checkpoints validated states at the configured
    cadence, and a restarted run resumes from them."""
    path = str(tmp_path / "ck.npz")
    obj = lambda p: jnp.sum((p["x"] - 2.0) ** 2)
    p0 = {"x": jnp.zeros(())}
    resumable_minimise(
        obj, p0, steps=8, checkpoint_path=path, checkpoint_every=2,
        optimizer=optax.sgd(0.05), steps_per_dispatch=4,
    )
    assert os.path.exists(path)
    p2, info = resumable_minimise(
        obj, p0, steps=16, checkpoint_path=path, checkpoint_every=2,
        optimizer=optax.sgd(0.05), steps_per_dispatch=4,
    )
    assert info["resumed_from"] in (7, 8)  # Last validated chain state.
    # Whole run must end at the same place as one uninterrupted run.
    p_ref, _ = resumable_minimise(
        obj, p0, steps=16, checkpoint_path=str(tmp_path / "ref.npz"),
        optimizer=optax.sgd(0.05),
    )
    np.testing.assert_allclose(float(p2["x"]), float(p_ref["x"]), rtol=1e-8)
