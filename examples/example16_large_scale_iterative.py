"""Large-scale exact-GP training and serving, the amortised way.

The pattern behind the N=262,144 north-star numbers (docs/scaling.md), at
a CI-friendly size: build the subspace-iteration preconditioner ONCE
(`eig_precond_state`), train with `iterative_nlml(precond_state=...)`
while watching the forward solver's health (`return_info=True` — a
stalled CG must never be silent), refresh the state on a cadence, then
serve the full posterior (mean AND variance diagonal) through the same
shared state. No N x N matrix is ever materialised.

No reference analogue: the reference tops out at dense Cholesky
(`/root/reference/stheno/model/observations.py`); this path is this
framework's O(N)-memory extension of the same exact-GP semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stheno_tpu.iterative import (
    eig_precond_state,
    iterative_nlml,
    iterative_posterior_mean,
    iterative_posterior_var,
)
from stheno_tpu import EQ
from stheno_tpu.utils import StepMetrics

n = 2000  # 262,144 on a v5e: same code, block=8192, rank=64.
rng = np.random.RandomState(0)
x = jnp.asarray(np.sort(rng.rand(n)) * 10)
y = jnp.sin(x) + 0.1 * jnp.asarray(rng.randn(n))


def kernel_fn(p):
    return jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))


params = {"log_s2": jnp.asarray(0.0), "log_ell": jnp.asarray(0.5)}
noise = 0.1
RANK, BLOCK, REFRESH_EVERY = 32, 256, 4

opt = optax.adam(5e-2)
opt_state = opt.init(params)
metrics = StepMetrics(print_every=1)


@jax.jit
def train_step(params, opt_state, state, key):
    def obj(p):
        return iterative_nlml(
            kernel_fn, p, x, y, noise, key,
            num_probes=8, cg_tol=1e-6, precond_state=state, block=BLOCK,
            return_info=True,
        )

    (val, info), grads = jax.value_and_grad(obj, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, val, info, grads


key = jax.random.PRNGKey(0)
state = eig_precond_state(kernel_fn, params, x, RANK, key, block=BLOCK)
for step in range(8):
    if step and step % REFRESH_EVERY == 0:
        # Warm-started refresh from the previous basis; a stale state is
        # exact regardless (it only costs CG iterations), so the cadence
        # is a speed knob, not a correctness one.
        state = eig_precond_state(
            kernel_fn, params, x, RANK, init=state[0], block=BLOCK
        )
    key, sub = jax.random.split(key)
    params, opt_state, val, info, grads = train_step(
        params, opt_state, state, sub
    )
    metrics.log(
        step, val, grads,
        cg_iters=int(info["cg_iters"]),
        cg_rel_residual=float(info["cg_rel_residual"]),
    )
    assert bool(info["cg_converged"])  # Loud, not silent (round-1 lesson).

# Serve the posterior, amortised (r4): ONE weights solve + ONE variance
# cache, then every query batch is GEMM work only — the recommended
# serving path (at 262k: ~0.07 s for 2048 variance points vs 38 s for
# the per-query-exact CG path). The rank-32 training state seeds the
# weights-solve preconditioner; the variance basis is WIDENED to the
# requested rank=256 from it (warm-started subspace sweep — the `key`
# supplies the extra probe columns).
from stheno_tpu.iterative import AmortisedPosterior

state = eig_precond_state(kernel_fn, params, x, RANK, init=state[0], block=BLOCK)
post = AmortisedPosterior(
    kernel_fn, params, x, y, noise,
    rank=256, key=jax.random.PRNGKey(42), precond_state=state,
    cg_tol=1e-8, var_cg_tol=1e-6, var_max_cg_iters=200,
    block=BLOCK, chunk=64,
)
x_new = jnp.linspace(0.0, 10.0, 200)
mean, lo, hi = post.marginal_credible_bounds(x_new)
var = post.var(x_new)
rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(x_new)) ** 2)))
print(f"posterior rmse vs truth: {rmse:.4f}")
print(
    f"mean var: {float(jnp.mean(var)):.5f}  "
    f"(weights CG residual: {float(post.solve_info['rel_residual']):.2e})"
)
assert rmse < 0.05
assert bool(jnp.all(var >= 0))
assert bool(jnp.all(lo <= mean)) and bool(jnp.all(mean <= hi))

# Per-query-exact fallbacks (same API family): iterative_posterior_mean /
# iterative_posterior_var re-run CG per call — use them for one-off
# queries or as the belt-and-braces path (mode="host" bounds each chunk
# in its own dispatch at extreme N).
mean1, info = iterative_posterior_mean(
    kernel_fn, params, x, y, noise, x_new[:16],
    cg_tol=1e-8, precond_state=state, block=BLOCK,
)
assert float(jnp.max(jnp.abs(mean1 - mean[:16]))) < 1e-4
