"""Exact GP regression on a 2-D tensor grid via Kronecker structure
(beyond the reference): 4,096 observations, exact NLML + exact gradients +
exact posterior, never forming the 4096 x 4096 Gram.

The grid axes need not be uniform and the kernel only needs to be
separable across dimensions (EQ with per-axis stretches qualifies). Each
training step costs O(sum n_i^3 + N sum n_i) — per-axis eigendecompositions
plus MXU-friendly mode matmuls — versus O(N^3) for the dense path. Unlike
the CG/SLQ iterative path (example in docs/scaling.md), values and
gradients here carry no Monte Carlo noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stheno_tpu import EQ
from stheno_tpu.iterative import grid_coords, kron_nlml, kron_posterior

NOISE = 0.05

# Non-uniform tensor grid: 64 x 64 = 4,096 points.
r = np.random.RandomState(0)
axes = (
    jnp.asarray(np.sort(r.rand(64) * 10.0)),
    jnp.asarray(np.sort(r.rand(64) * 6.0)),
)
x = grid_coords(axes)
f_true = lambda x: jnp.sin(x[:, 0]) * jnp.cos(0.8 * x[:, 1])
y = f_true(x) + jnp.asarray(np.sqrt(NOISE) * r.randn(x.shape[0]))


def kernels(p):
    # Separable anisotropic EQ: s2 * EQ(ell_0) (x) EQ(ell_1).
    return (
        jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"][0])),
        EQ().stretch(jnp.exp(p["log_ell"][1])),
    )


params = {"log_s2": jnp.asarray(0.0), "log_ell": jnp.asarray([0.0, 0.0])}
opt = optax.adam(0.1)
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state):
    val, grads = jax.value_and_grad(
        lambda p: kron_nlml(kernels, p, axes, y, NOISE)
    )(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, val


for i in range(30):
    params, opt_state, nlml = step(params, opt_state)
    if i % 10 == 0:
        print(f"step {i:2d}  exact NLML = {float(nlml):.2f}")

x_new = jnp.asarray(r.rand(200, 2) * jnp.asarray([10.0, 6.0]))
mean, var = kron_posterior(kernels, params, axes, y, NOISE, x_new)
rmse = float(jnp.sqrt(jnp.mean((mean - f_true(x_new)) ** 2)))
print(f"held-out RMSE at 200 off-grid points: {rmse:.4f}")
print(f"learned lengthscales: {np.exp(np.asarray(params['log_ell']))}")
assert rmse < 0.1, rmse
