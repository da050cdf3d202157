"""Product of GPs via moment matching: f_prod = f1 * f2 is approximated by
a Gaussian with matched first and second moments.

Mirrors the reference's `readme_example9_product.py` (the reference README
notes the product is non-Gaussian and the result is an approximation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure

with Measure() as prior:
    f1 = GP(3.0, EQ())
    f2 = GP(3.0, EQ())
    f_prod = f1 * f2

x = jnp.linspace(0, 10, 50)
key, s1, s2 = prior.sample(jax.random.PRNGKey(5), f1(x), f2(x))

post = prior.condition((f1(x), s1[:, 0]), (f2(x), s2[:, 0]))
mean, lower, upper = post(f_prod)(x).marginal_credible_bounds()

true_prod = np.asarray(s1)[:, 0] * np.asarray(s2)[:, 0]
rel = np.sqrt(np.mean((np.asarray(mean) - true_prod) ** 2)) / np.sqrt(
    np.mean(true_prod**2)
)
print(f"moment-matched product: relative RMSE vs true product = {rel:.4f}")
