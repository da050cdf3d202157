"""Bayesian linear regression as a GP model: slope * x + intercept + noise,
all processes in one measure, posterior decomposed back into components.

Mirrors the reference's `readme_example6_blr.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import Delta, GP, Measure

x = jnp.linspace(0, 10, 100)
x_obs = jnp.linspace(0, 10, 30)

with Measure() as prior:
    slope = GP(1.0)
    intercept = GP(5.0)
    f = slope * (lambda z: jnp.asarray(z)) + intercept
    e = 0.2 * GP(Delta())
    y = f + e

key, y_obs = prior.sample(jax.random.PRNGKey(4), y(x_obs))
post = prior.condition(y(x_obs), y_obs[:, 0])

mean_slope, _ = post(slope)(jnp.zeros(1)).marginals()
mean_intercept, _ = post(intercept)(jnp.zeros(1)).marginals()
print(f"posterior slope:     {float(mean_slope[0]):.4f}")
print(f"posterior intercept: {float(mean_intercept[0]):.4f}")

mean_f, _ = post(f)(x).marginals()
coef = np.polyfit(np.asarray(x), np.asarray(mean_f), 1)
print(f"posterior f is the line {coef[0]:.4f} * x + {coef[1]:.4f}")
