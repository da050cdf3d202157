"""Minibatch SVGP training (beyond the reference): the uncollapsed
Hensman-et-al.-2013 ELBO with interleaved natural-gradient steps on the
variational parameters and Adam steps on hyperparameters + inducing inputs.

The reference's sparse path (`PseudoObs`, example 10) collapses q(u)
analytically and must touch all N points per objective evaluation; this path
trains from minibatches, so one step is O(B M^2 + M^3) regardless of N —
the streaming regime for production-scale GPs. The whole step jits, and the
batch dimension data-parallelises over a mesh (see docs/scaling.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stheno_tpu import EQ, GP, PseudoObs, svgp_elbo, svgp_init, svgp_natgrad_step

N, M, B, NOISE = 4000, 24, 256, 0.05

r = np.random.RandomState(0)
x = jnp.asarray(np.sort(r.rand(N) * 10.0))
y = jnp.sin(2.0 * x) + 0.1 * x + jnp.asarray(np.sqrt(NOISE) * r.randn(N))

params = svgp_init(EQ(), jnp.linspace(0.0, 10.0, M))
theta = {"log_s2": jnp.asarray(0.0), "log_ell": jnp.asarray(0.0)}


def kernel(theta):
    return jnp.exp(theta["log_s2"]) * EQ().stretch(jnp.exp(theta["log_ell"]))


@jax.jit
def hyper_step(theta, params, opt_state, xb, yb):
    def loss(theta, params):
        return -svgp_elbo(kernel(theta), params, xb, yb, NOISE, N)

    val, (g_t, g_p) = jax.value_and_grad(loss, argnums=(0, 1))(theta, params)
    # z rides the Adam step alongside the hyperparameters; q_mu/q_sqrt are
    # updated by natural gradient below, so mask their Adam update out.
    g_p = {**g_p, "q_mu": jnp.zeros_like(g_p["q_mu"]),
           "q_sqrt": jnp.zeros_like(g_p["q_sqrt"])}
    updates, opt_state = opt.update((g_t, g_p), opt_state)
    u_t, u_p = updates
    return optax.apply_updates(theta, u_t), optax.apply_updates(params, u_p), opt_state, -val


@jax.jit
def nat_step(theta, params, xb, yb, rho):
    return svgp_natgrad_step(kernel(theta), params, xb, yb, NOISE, N, rho)


opt = optax.adam(2e-2)
opt_state = opt.init((theta, params))

for step in range(300):
    idx = jnp.asarray(r.choice(N, size=B, replace=False))
    xb, yb = x[idx][:, None], y[idx]
    params = nat_step(theta, params, xb, yb, rho=0.3 / (1.0 + 0.01 * step))
    theta, params, opt_state, elbo = hyper_step(theta, params, opt_state, xb, yb)
    if step % 100 == 0:
        print(f"step {step:4d}  minibatch ELBO {float(elbo):10.1f}")

# Compare against the collapsed VFE bound at the learned hyperparameters.
# One rho=1 full-batch natural-gradient step lands q(u) exactly on the
# collapsed optimum, so the two bounds must coincide.
k = kernel(theta)
params = svgp_natgrad_step(k, params, x[:, None], y, NOISE, N, rho=1.0)
full = float(svgp_elbo(k, params, x[:, None], y, NOISE, N))
f = GP(k)
opt_bound = float(f.measure.logpdf(PseudoObs(f(params["z"][:, 0]), (f(x, NOISE), y))))
print(f"full-batch uncollapsed ELBO: {full:10.1f}")
print(f"collapsed VFE at same (theta, z): {opt_bound:10.1f}  (equal: rho=1 full-batch step is optimal)")
print(f"learned lengthscale {float(jnp.exp(theta['log_ell'])):.3f}, "
      f"signal variance {float(jnp.exp(theta['log_s2'])):.3f}")
