"""Simple regression: prior sample -> condition -> credible bounds.

Mirrors the reference's `readme_example1_simple_regression.py` workflow with
the stheno_tpu API (no plotting; prints a summary instead).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP

x = jnp.linspace(0, 10, 100)
x_obs = jnp.linspace(0, 7, 20)

# Construct a prior.
f = GP(EQ())

# Sample a truth and noisy observations jointly from the prior.
key, f_true, y_obs = f.measure.sample(jax.random.PRNGKey(0), f(x), f(x_obs, 0.1))

# Condition on the observations to make predictions.
f_post = f | (f(x_obs, 0.1), y_obs[:, 0])
mean, lower, upper = f_post(x).marginal_credible_bounds()

err = np.abs(np.asarray(mean) - np.asarray(f_true)[:, 0])
cover = (np.asarray(lower) <= np.asarray(f_true)[:, 0]) & (
    np.asarray(f_true)[:, 0] <= np.asarray(upper)
)
print(f"mean abs error: {err.mean():.4f}")
print(f"credible-interval coverage of the truth: {cover.mean():.2%}")
