"""A nonparametric basis: windowed GPs shifted to the observation points
sum to the model, and the posterior decomposes over the basis.

Mirrors the reference's `readme_example11_nonparametric_basis.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure

x = jnp.linspace(0, 10, 50)
x_obs = jnp.linspace(0, 10, 10)

with Measure() as prior:
    w = lambda z: jnp.exp(-(jnp.asarray(z) ** 2) / 0.5)  # Window.
    b = [(w * GP(EQ())).shift(float(xi)) for xi in np.asarray(x_obs)]  # Basis.
    f = sum(b)  # Model.

key, f_true, y_obs = prior.sample(jax.random.PRNGKey(7), f(x), f(x_obs, 0.2))
post = prior.condition(f(x_obs, 0.2), y_obs[:, 0])

mean_f, _ = post(f)(x).marginals()
total = np.zeros(len(x))
for bi in b:
    mean_b, _ = post(bi)(x).marginals()
    total += np.asarray(mean_b)
print(f"basis posteriors sum to the full posterior within {np.max(np.abs(total - np.asarray(mean_f))):.2e}")
