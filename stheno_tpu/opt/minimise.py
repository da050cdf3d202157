"""Gradient-based minimisation of objectives over :class:`Vars`.

Replaces the ``varz.minimise_l_bfgs_b`` / ``minimise_adam`` layer the
reference's examples lean on (``readme_example12_optimisation_varz.py:36-37``)
with optax under ``jit``: Adam for stochastic-friendly optimisation and
L-BFGS (optax's implementation with zoom linesearch) for fast deterministic
NLML fits."""

import jax
import jax.numpy as jnp
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


def minimise_adam(f, vs, iters=200, rate=5e-2, trace=False):
    """Minimise ``f(vs)`` with Adam over the latent parameters; assigns the
    optimised values back into ``vs`` and returns the final objective."""
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

    val = None
    for i in range(iters):
        params, state, val = step(params, state)
        if trace and (i % max(1, iters // 10) == 0):
            print(f"adam iter {i}: {float(val):.6f}")
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
