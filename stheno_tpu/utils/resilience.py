"""Fault-tolerant training loops: checkpointed optimisation with automatic
resume and non-finite-step recovery.

The reference has no failure-detection or recovery machinery (SURVEY.md §5:
"none — rely on restart semantics"); for long-running hyperparameter
optimisation on preemptible TPU slices this module supplies the missing
piece: a step-loop wrapper that (a) atomically checkpoints the last
*validated* ``(params, opt_state, step)`` pytree every ``checkpoint_every``
steps, (b) resumes mid-run from the newest checkpoint after a process
restart, and (c) detects non-finite objectives/gradients (f32 Cholesky
blow-ups, overshoot into NaN basins — see the optimiser-loop gotcha in
CLAUDE.md) and rolls back: the previous step's update is re-applied at a
halved scale until the objective evaluates finite again.

Checkpoint atomicity comes from :func:`save_pytree`'s write-then-rename;
a crash mid-write never corrupts the previous checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import load_pytree, save_pytree

__all__ = ["resumable_minimise"]


def _finite_flag(val, grads):
    """Single-scalar all-finite reduction, meant to run INSIDE the jitted
    value_and_grad — the host then fetches one scalar per step instead of
    every gradient leaf (each fetch costs the ~25-60 ms tunnel round-trip
    on the remote-TPU deployments this module targets)."""
    flag = jnp.isfinite(val)
    for l in jax.tree.leaves(grads):
        flag = jnp.logical_and(flag, jnp.all(jnp.isfinite(l)))
    return flag


def resumable_minimise(
    objective,
    params,
    *,
    steps,
    checkpoint_path,
    checkpoint_every=10,
    optimizer=None,
    rate=5e-3,
    max_retries=6,
    trace=False,
    steps_per_dispatch=1,
):
    """Minimise ``objective(params)`` with checkpoint/resume and bad-step
    rollback.

    A step is only *validated* once the objective evaluates finite at the
    parameters it produced — a diverged update (finite parameters landing
    in a region where the objective is NaN/inf) is therefore caught at the
    next evaluation, rolled back to the last validated state, and the same
    gradients re-applied at a halved scale (halving repeats up to
    ``max_retries`` times before ``FloatingPointError``). Checkpoints
    store the last validated state, so a resumed run never starts inside a
    bad region.

    Args:
        objective: scalar pytree -> () function (e.g. an NLML closure);
            differentiated with ``jax.value_and_grad`` under ``jit``.
        params: initial parameter pytree (ignored when a checkpoint with
            completed steps exists at ``checkpoint_path``).
        steps: total number of optimisation steps for the run.
        checkpoint_path: file path for the rolling checkpoint. A restarted
            process pointing at the same path continues where the dead one
            stopped.
        checkpoint_every: persist state every this many validated steps
            (and at the final step).
        optimizer: optional optax gradient transformation (default: Adam
            at ``rate``).
        max_retries: consecutive halvings tolerated per rollback episode.
        trace: collect per-step objective values.
        steps_per_dispatch: chain this many steps inside ONE jitted
            ``lax.scan`` dispatch (health-checked between chains — one
            scalar fetch per chain instead of per step; on the ~25-60 ms
            remote-TPU tunnel this is the difference between the tunnel
            and the step dominating). The scan freezes on the first
            non-finite step inside a chain; a failed chain is replayed
            step-by-step from its (validated) start state, so rollback
            semantics are exactly the per-step ones. Rollback episodes
            and checkpoints always run step-granular.

    Returns:
        ``(params, info)`` with ``info = {"steps_run", "resumed_from",
        "objective_trace", "rejected_steps", "rollback_steps"}``.
        ``objective_trace[i]`` (with ``trace=True``) is the objective
        after ``start + i`` validated updates — one entry per step, so
        it plots directly against step numbers; ``rollback_steps`` lists
        the steps whose first update attempt was rejected.
    """
    if optimizer is None:
        optimizer = optax.adam(rate)
    opt_state = optimizer.init(params)
    start_step = 0
    resumed_from = None

    state_template = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(0, jnp.int32),
    }
    if os.path.exists(checkpoint_path):
        state = load_pytree(checkpoint_path, like=state_template)
        params, opt_state = state["params"], state["opt_state"]
        start_step = int(state["step"])
        resumed_from = start_step

    @jax.jit
    def vg(params):
        val, grads = jax.value_and_grad(objective)(params)
        return val, grads, _finite_flag(val, grads)

    @jax.jit
    def apply(params, opt_state, grads, scale):
        # Scale the post-optimizer UPDATES, not the gradients: adaptive
        # optimizers like Adam are (near-)invariant to gradient scaling
        # (m_hat/sqrt(v_hat) cancels it), so halved-gradient retries would
        # re-apply the identical step and never recover.
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * scale, updates)
        return optax.apply_updates(params, updates), opt_state

    k = max(1, int(steps_per_dispatch))

    @jax.jit
    def chain_steps(params, opt_state):
        """``k`` full-scale steps in one dispatch (lax.scan). Freezes the
        carried state on the first non-finite evaluation (scan cannot bail
        early), so a poisoned chain returns its inputs' last-good state and
        ``ok=False`` — the host then replays it step-granular. Also carries
        the PRE-update state + grads of the last executed step: that is the
        rollback anchor (``validated``) after a good chain."""

        def body(carry, _):
            params, opt_state, ok, last_pre = carry
            val, grads = jax.value_and_grad(objective)(params)
            finite = jnp.logical_and(ok, _finite_flag(val, grads))
            updates, new_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)

            def keep(new, old):
                return jax.tree.map(
                    lambda a, b: jnp.where(finite, a, b), new, old
                )

            return (
                keep(new_params, params),
                keep(new_state, opt_state),
                finite,
                keep((params, opt_state, grads), last_pre),
            ), val

        init_pre = (params, opt_state, jax.tree.map(jnp.zeros_like, params))
        (pf, sf, ok, last_pre), vals = jax.lax.scan(
            body,
            (params, opt_state, jnp.asarray(True), init_pre),
            None,
            length=k,
        )
        return pf, sf, ok, last_pre, vals

    # ``history[i]`` is the objective after ``start_step + i`` validated
    # updates — exactly one entry per completed step (rollback retries
    # never append; only the evaluation that finally validates the step
    # does), so trace indices align with step numbers. Rollback episodes
    # are recorded separately in ``rollback_steps``.
    history = []
    rejected = 0
    rollback_steps = []
    # ``step`` counts completed (validated) parameter updates. The loop
    # evaluates at the top and breaks only after the *final* update's
    # parameters validate, so the returned/checkpointed state always has
    # ``steps`` applies and a finite objective.
    step = start_step
    # Last state whose objective evaluated finite, with the grads taken
    # there: (params, opt_state, grads). The rollback target.
    validated = None
    retries = 0
    scale = 1.0
    # After a failed chain, force this many step-granular iterations (the
    # chain's worth) so the bad step is localised and rolled back exactly
    # as in per-step mode.
    per_step_left = 0
    while True:
        if (
            k > 1
            and retries == 0
            and per_step_left == 0
            and validated is not None
            and step + k <= steps
        ):
            new_p, new_s, ok, last_pre, vals = chain_steps(params, opt_state)
            # ONE scalar fetch decides the whole chain's health.
            if bool(ok):
                params, opt_state = new_p, new_s
                validated = tuple(last_pre)
                if trace:
                    history.extend(float(v) for v in np.asarray(vals))
                first, last = step, step + k - 1
                step += k
                # (The final checkpoint at step == steps is saved by the
                # per-step tail below — chain mode only runs while
                # step + k <= steps, so `last` never reaches `steps`.)
                if any(
                    s % checkpoint_every == 0 for s in range(first, last + 1)
                ):
                    # The last VALIDATED state of the chain (its final
                    # step's pre-update params — the produced state is
                    # only validated by the next evaluation).
                    save_pytree(
                        checkpoint_path,
                        {
                            "params": validated[0],
                            "opt_state": validated[1],
                            "step": jnp.asarray(last, jnp.int32),
                        },
                    )
                continue
            per_step_left = k
        val, grads, finite = vg(params)
        # ONE scalar fetch decides validity; ``val`` itself is only
        # fetched when tracing is on.
        if not bool(finite):
            if validated is None:
                raise FloatingPointError(
                    "Objective/gradients non-finite at the initial "
                    "parameters."
                )
            if retries >= max_retries:
                raise FloatingPointError(
                    f"Non-finite objective persisted through "
                    f"{max_retries} halved-step retries at step {step}."
                )
            # Roll back: redo the last update from the last validated
            # state at halved update scale.
            rejected += 1
            # ``step`` was already advanced past the update that produced
            # these params, so the rejected step IS ``step``.
            if not rollback_steps or rollback_steps[-1] != step:
                rollback_steps.append(step)
            retries += 1
            scale *= 0.5
            params, opt_state = apply(
                validated[0], validated[1], validated[2], scale
            )
            continue
        retries = 0
        scale = 1.0
        per_step_left = max(0, per_step_left - 1)
        validated = (params, opt_state, grads)
        if trace:
            history.append(float(val))
        if step % checkpoint_every == 0 or step == steps:
            save_pytree(
                checkpoint_path,
                {
                    "params": params,
                    "opt_state": opt_state,
                    "step": jnp.asarray(step, jnp.int32),
                },
            )
        if step >= steps:
            break
        params, opt_state = apply(params, opt_state, grads, 1.0)
        step += 1

    info = {
        "steps_run": step - start_step,
        "resumed_from": resumed_from,
        "objective_trace": history,
        "rejected_steps": rejected,
        "rollback_steps": rollback_steps,
    }
    return params, info
