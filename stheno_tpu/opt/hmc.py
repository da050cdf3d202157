"""Hamiltonian Monte Carlo over kernel hyperparameters, chain-parallel.

The reference has no sampler — posterior hyperparameter inference is listed
as a build obligation (SURVEY.md §2.10: "NUTS/HMC sharded chain-parallel").
This is a jitted HMC with leapfrog integration and dual-averaging step-size
adaptation; chains run under ``vmap`` and are sharded across a device mesh
axis with ``NamedSharding`` when a mesh is supplied, so chains ride separate
chips with zero collectives."""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["sample_hmc"]


def _leapfrog(logpdf, q, p, step_size, n_steps):
    """Leapfrog with the gradient threaded through the carry: n_steps + 1
    gradient evaluations total, not 2 * n_steps (the end-of-step gradient is
    the next step's start-of-step gradient — same as nuts.py's integrator)."""
    grad = jax.grad(logpdf)

    def body(_, qpg):
        q, p, g = qpg
        p = jax.tree.map(lambda pi, gi: pi + 0.5 * step_size * gi, p, g)
        q = jax.tree.map(lambda qi, pi: qi + step_size * pi, q, p)
        g = grad(q)
        p = jax.tree.map(lambda pi, gi: pi + 0.5 * step_size * gi, p, g)
        return q, p, g

    q, p, _ = jax.lax.fori_loop(0, n_steps, body, (q, p, grad(q)))
    return q, p


def _kinetic(p):
    return 0.5 * sum(jnp.sum(pi**2) for pi in jax.tree.leaves(p))


def _hmc_step(logpdf, step_size, n_leapfrog, state, key):
    q, logp = state
    k_mom, k_acc = jax.random.split(key)
    leaves, treedef = jax.tree.flatten(q)
    mom_keys = jax.random.split(k_mom, len(leaves))
    p = treedef.unflatten(
        [
            jax.random.normal(k, l.shape, l.dtype)
            for k, l in zip(mom_keys, leaves)
        ]
    )
    q_new, p_new = _leapfrog(logpdf, q, p, step_size, n_leapfrog)
    logp_new = logpdf(q_new)
    log_accept = (logp_new - _kinetic(p_new)) - (logp - _kinetic(p))
    log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
    accept = jnp.log(jax.random.uniform(k_acc)) < log_accept
    q = jax.tree.map(lambda a, b: jnp.where(accept, b, a), q, q_new)
    logp = jnp.where(accept, logp_new, logp)
    return (q, logp), jnp.minimum(jnp.exp(log_accept), 1.0)


def _single_chain(
    logpdf, init, key, num_samples, num_warmup, step_size0, n_leapfrog, target_accept
):
    logp0 = logpdf(init)

    # Warmup with dual-averaging step-size adaptation (Hoffman & Gelman 2014,
    # Algorithm 5).
    mu = jnp.log(10 * step_size0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_body(carry, key):
        state, log_eps, log_eps_bar, h_bar, t = carry
        state, accept_prob = _hmc_step(
            logpdf, jnp.exp(log_eps), n_leapfrog, state, key
        )
        t = t + 1.0
        eta = 1.0 / (t + t0)
        h_bar = (1 - eta) * h_bar + eta * (target_accept - accept_prob)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (state, log_eps, log_eps_bar, h_bar, t), None

    warmup_keys = jax.random.split(key, num_warmup + 1)
    key = warmup_keys[0]
    (state, _, log_eps_bar, _, _), _ = jax.lax.scan(
        warmup_body,
        ((init, logp0), jnp.log(step_size0), jnp.log(step_size0), 0.0, 0.0),
        warmup_keys[1:],
    )
    step_size = jnp.exp(log_eps_bar)

    def sample_body(state, key):
        state, accept_prob = _hmc_step(logpdf, step_size, n_leapfrog, state, key)
        return state, (state[0], state[1], accept_prob)

    sample_keys = jax.random.split(key, num_samples)
    _, (qs, logps, accepts) = jax.lax.scan(sample_body, state, sample_keys)
    return qs, logps, jnp.mean(accepts)


def sample_hmc(
    logpdf,
    init,
    key,
    *,
    num_samples=500,
    num_warmup=200,
    step_size=0.1,
    n_leapfrog=16,
    num_chains=1,
    target_accept=0.8,
    mesh=None,
    chain_axis="chains",
):
    """Run HMC.

    Args:
        logpdf: callable pytree -> scalar log-density (e.g. NLML + prior).
        init: initial parameter pytree (single chain); chains are initialised
            by jittering ``init``.
        key: jax PRNG key.
        num_chains: chains, run under ``vmap`` and (if ``mesh`` is given)
            sharded over ``mesh`` axis ``chain_axis``.

    Returns:
        ``(samples, logps, accept_rate)`` with a leading
        ``(num_chains, num_samples)`` shape on every leaf.
    """
    key, k_init = jax.random.split(key)
    leaves, treedef = jax.tree.flatten(init)
    init_keys = jax.random.split(k_init, len(leaves))
    chain_inits = treedef.unflatten(
        [
            l[None] + 0.1 * jax.random.normal(k, (num_chains,) + l.shape, l.dtype)
            for k, l in zip(init_keys, leaves)
        ]
    )
    chain_keys = jax.random.split(key, num_chains)

    run = jax.vmap(
        lambda i, k: _single_chain(
            logpdf, i, k, num_samples, num_warmup, step_size, n_leapfrog,
            target_accept,
        )
    )

    if mesh is not None:
        # Normalise to Auto axis types: chains are embarrassingly parallel,
        # so we want plain data-placement sharding, not explicit-mode
        # propagation through the scan carries.
        auto_mesh = jax.sharding.Mesh(mesh.devices, mesh.axis_names)
        sharding = NamedSharding(auto_mesh, P(chain_axis))
        chain_inits = jax.tree.map(
            lambda l: jax.device_put(l, sharding), chain_inits
        )
        chain_keys = jax.device_put(chain_keys, sharding)
    qs, logps, accept = jax.jit(run)(chain_inits, chain_keys)
    return qs, logps, float(jnp.mean(accept))
