"""No-U-Turn Sampler (iterative, multinomial), chain-parallel.

NUTS over GP hyperparameters is part of this build's north star
(BASELINE.json: "NUTS/HMC over kernel hyperparameters sharded chain-parallel").
This is the iterative formulation (no recursion — fixed ``max_depth``
doubling loop with an O(depth) checkpoint stack for U-turn detection, the
jit-compatible scheme used by modern JAX samplers):

- trajectories double up to ``2^max_depth`` leapfrog steps;
- within a subtree, U-turns are checked against checkpointed left endpoints
  of every power-of-two aligned sub-subtree;
- proposals are drawn multinomially (streaming logsumexp weights) with
  biased-progressive sampling across subtrees;
- step size adapts by dual averaging on the subtree-averaged Metropolis
  statistic;
- chains run under ``vmap`` and shard over a mesh axis like
  :func:`stheno_tpu.opt.sample_hmc`.

Parameters are flattened to a single vector internally (ravel/unravel), so
any pytree works.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["sample_nuts"]

_DIVERGENCE_THRESHOLD = 1000.0


def _turning(q_minus, p_minus, q_plus, p_plus):
    dq = q_plus - q_minus
    return jnp.logical_or(jnp.dot(dq, p_minus) < 0, jnp.dot(dq, p_plus) < 0)


def _nuts_trajectory(logp_fn, q0, key, eps, max_depth):
    """One NUTS transition from ``q0``. Returns (q_new, accept_stat)."""
    dim = q0.shape[0]
    grad_fn = jax.value_and_grad(logp_fn)
    logp0, grad0 = grad_fn(q0)

    k_mom, k_dir, k_prog = jax.random.split(key, 3)
    p0 = jax.random.normal(k_mom, (dim,), q0.dtype)
    H0 = logp0 - 0.5 * jnp.dot(p0, p0)

    def leapfrog(q, p, grad, direction):
        e = direction * eps
        p_half = p + 0.5 * e * grad
        q_new = q + e * p_half
        logp_new, grad_new = grad_fn(q_new)
        p_new = p_half + 0.5 * e * grad_new
        return q_new, p_new, logp_new, grad_new

    # Subtree builder: 2^depth leapfrog steps from (q, p, grad) in a given
    # direction, with checkpointed U-turn detection.
    def build_subtree(carry_in, depth, direction, key):
        (q, p, grad) = carry_in
        n_leaves = 2**depth

        ckpt_q = jnp.zeros((max_depth + 1, dim), q.dtype)
        ckpt_p = jnp.zeros((max_depth + 1, dim), q.dtype)

        init = dict(
            q=q, p=p, grad=grad,
            prop=q, logw=-jnp.inf,
            sum_accept=0.0,
            turning=False, diverged=False,
            ckpt_q=ckpt_q, ckpt_p=ckpt_p,
            key=key,
        )

        def leaf_body(i, st):
            def do_step(st):
                q_new, p_new, logp_new, grad_new = leapfrog(
                    st["q"], st["p"], st["grad"], direction
                )
                # Leaf i is the state *after* this leapfrog. Store it as the
                # left endpoint of every aligned sub-subtree that starts at
                # leaf i (i % 2^k == 0).
                ckpt_q, ckpt_p = st["ckpt_q"], st["ckpt_p"]
                for k in range(max_depth + 1):
                    pred = (i % (2**k)) == 0
                    ckpt_q = ckpt_q.at[k].set(
                        jnp.where(pred, q_new, ckpt_q[k])
                    )
                    ckpt_p = ckpt_p.at[k].set(
                        jnp.where(pred, p_new, ckpt_p[k])
                    )
                H = logp_new - 0.5 * jnp.dot(p_new, p_new)
                delta = H - H0
                diverged = delta < -_DIVERGENCE_THRESHOLD
                logw_leaf = jnp.where(diverged, -jnp.inf, delta)
                accept_leaf = jnp.minimum(jnp.exp(delta), 1.0)
                # Streaming multinomial proposal within the subtree.
                logw_new = jnp.logaddexp(st["logw"], logw_leaf)
                key, sub = jax.random.split(st["key"])
                take = jnp.log(jax.random.uniform(sub)) < (logw_leaf - logw_new)
                prop = jnp.where(take, q_new, st["prop"])
                # U-turn check against every aligned sub-subtree start. The
                # chord must be *time*-oriented (first-built leaf is the
                # time-latest point when integrating backwards) while the
                # momenta stay raw phase-space momenta.
                turning = st["turning"]
                dq_build = q_new - ckpt_q
                for k in range(max_depth + 1):
                    closes = ((i + 1) % (2**k)) == 0
                    dq_time = direction * dq_build[k]
                    t_k = jnp.logical_or(
                        jnp.dot(dq_time, ckpt_p[k]) < 0,
                        jnp.dot(dq_time, p_new) < 0,
                    )
                    turning = jnp.logical_or(
                        turning, jnp.logical_and(closes & (k > 0), t_k)
                    )
                return dict(
                    q=q_new, p=p_new, grad=grad_new,
                    prop=prop, logw=logw_new,
                    sum_accept=st["sum_accept"] + accept_leaf,
                    turning=turning, diverged=st["diverged"] | diverged,
                    ckpt_q=ckpt_q, ckpt_p=ckpt_p, key=key,
                )

            stop = st["turning"] | st["diverged"]
            return lax.cond(stop, lambda s: s, do_step, st)

        out = lax.fori_loop(0, n_leaves, leaf_body, init)
        return out

    # Doubling loop.
    state = dict(
        q_minus=q0, p_minus=p0, grad_minus=grad0,
        q_plus=q0, p_plus=p0, grad_plus=grad0,
        prop=q0, logw=0.0,  # The root leaf has weight exp(H0 - H0) = 1.
        depth=0, turning=False, diverged=False,
        sum_accept=0.0, n_accept=0.0, key=k_prog,
    )

    def doubling_cond(st):
        return (
            (st["depth"] < max_depth)
            & ~st["turning"]
            & ~st["diverged"]
        )

    def doubling_body(st):
        key, k_dir, k_sub, k_bias = jax.random.split(st["key"], 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(q0.dtype)
        q_s = jnp.where(go_right, st["q_plus"], st["q_minus"])
        p_s = jnp.where(go_right, st["p_plus"], st["p_minus"])
        g_s = jnp.where(go_right, st["grad_plus"], st["grad_minus"])

        sub = build_subtree((q_s, p_s, g_s), st["depth"], direction, k_sub)

        # Merge endpoints.
        q_plus = jnp.where(go_right, sub["q"], st["q_plus"])
        p_plus = jnp.where(go_right, sub["p"], st["p_plus"])
        g_plus = jnp.where(go_right, sub["grad"], st["grad_plus"])
        q_minus = jnp.where(go_right, st["q_minus"], sub["q"])
        p_minus = jnp.where(go_right, st["p_minus"], sub["p"])
        g_minus = jnp.where(go_right, st["grad_minus"], sub["grad"])

        sub_ok = ~sub["turning"] & ~sub["diverged"]
        # Biased progressive sampling: take the subtree proposal with
        # probability min(1, w_sub / w_tree).
        take = sub_ok & (
            jnp.log(jax.random.uniform(k_bias)) < (sub["logw"] - st["logw"])
        )
        prop = jnp.where(take, sub["prop"], st["prop"])
        logw = jnp.where(sub_ok, jnp.logaddexp(st["logw"], sub["logw"]), st["logw"])

        tree_turning = _turning(q_minus, p_minus, q_plus, p_plus)
        return dict(
            q_minus=q_minus, p_minus=p_minus, grad_minus=g_minus,
            q_plus=q_plus, p_plus=p_plus, grad_plus=g_plus,
            prop=prop, logw=logw,
            depth=st["depth"] + 1,
            turning=sub["turning"] | tree_turning,
            diverged=sub["diverged"],
            sum_accept=st["sum_accept"] + sub["sum_accept"],
            n_accept=st["n_accept"] + 2.0 ** st["depth"],
            key=key,
        )

    out = lax.while_loop(doubling_cond, doubling_body, state)
    accept_stat = out["sum_accept"] / jnp.maximum(out["n_accept"], 1.0)
    return out["prop"], accept_stat


def _single_chain_nuts(logp_fn, q0, key, num_samples, num_warmup, step_size0,
                       max_depth, target_accept):
    mu = jnp.log(10 * step_size0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warm_body(carry, key):
        q, log_eps, log_eps_bar, h_bar, t = carry
        q, accept = _nuts_trajectory(logp_fn, q, key, jnp.exp(log_eps), max_depth)
        t = t + 1.0
        eta = 1.0 / (t + t0)
        h_bar = (1 - eta) * h_bar + eta * (target_accept - accept)
        log_eps = mu - jnp.sqrt(t) / gamma * h_bar
        w = t ** (-kappa)
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        return (q, log_eps, log_eps_bar, h_bar, t), None

    keys = jax.random.split(key, num_warmup + num_samples + 1)
    (q, _, log_eps_bar, _, _), _ = lax.scan(
        warm_body,
        (q0, jnp.log(step_size0), jnp.log(step_size0), 0.0, 0.0),
        keys[1 : num_warmup + 1],
    )
    eps = jnp.exp(log_eps_bar)

    def sample_body(q, key):
        q, accept = _nuts_trajectory(logp_fn, q, key, eps, max_depth)
        return q, (q, accept)

    _, (qs, accepts) = lax.scan(sample_body, q, keys[num_warmup + 1 :])
    return qs, jnp.mean(accepts)


def sample_nuts(
    logpdf,
    init,
    key,
    *,
    num_samples=500,
    num_warmup=300,
    step_size=0.1,
    max_depth=8,
    num_chains=1,
    target_accept=0.8,
    mesh=None,
    chain_axis="chains",
):
    """Run NUTS over a pytree of parameters.

    Returns ``(samples, accept_rate)`` with leaves shaped
    ``(num_chains, num_samples, ...)``."""
    q0_flat, unravel = ravel_pytree(init)
    logp_flat = lambda q: logpdf(unravel(q))

    key, k_init = jax.random.split(key)
    chain_inits = q0_flat[None] + 0.1 * jax.random.normal(
        k_init, (num_chains,) + q0_flat.shape, q0_flat.dtype
    )
    chain_keys = jax.random.split(key, num_chains)

    run = jax.vmap(
        lambda q, k: _single_chain_nuts(
            logp_flat, q, k, num_samples, num_warmup, step_size, max_depth,
            target_accept,
        )
    )

    if mesh is not None:
        auto_mesh = jax.sharding.Mesh(mesh.devices, mesh.axis_names)
        sharding = NamedSharding(auto_mesh, P(chain_axis))
        chain_inits = jax.device_put(chain_inits, sharding)
        chain_keys = jax.device_put(chain_keys, sharding)

    qs, accept = jax.jit(run)(chain_inits, chain_keys)
    samples = jax.vmap(jax.vmap(unravel))(qs)
    return samples, float(jnp.mean(accept))
