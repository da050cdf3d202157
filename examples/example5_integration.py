"""Derivative GPs and integration constants: model f, f', f'' in one
measure, pin f(0) and f'(0), then condition the second derivative on data.

Mirrors the reference's `readme_example5_integration.py` (smooth
integration with derivative processes; JAX autodiff supplies the kernel
derivatives instead of symbolic backend rules).
"""

import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure

with Measure() as prior:
    f = 0.7 * GP(EQ()).stretch(1.5)
    df = f.diff()
    ddf = df.diff()

# Pin integration constants: f(0) = 1, f'(0) = 0.
zero = jnp.zeros(1)
prior2 = prior.condition((f(zero), jnp.ones(1)), (df(zero), jnp.zeros(1)))
mean_f0, var_f0 = prior2(f)(zero).marginals()
print(f"f(0) posterior: {float(mean_f0[0]):.6f} +- {float(var_f0[0]):.2e}")

# Condition f'' on observations.
x_obs = jnp.linspace(0, 5, 30)
y_obs = -jnp.sin(x_obs)
post = prior2.condition(ddf(x_obs, 1e-6), y_obs)
mean_ddf, _ = post(ddf)(x_obs).marginals()
print(f"f'' fit max error: {np.max(np.abs(np.asarray(mean_ddf) - np.asarray(y_obs))):.2e}")
