"""Decomposition of prediction into a smooth and a wiggly component.

Mirrors the reference's `readme_example2_decomposition.py`: build an
additive model in one Measure, condition the sum, and read off posterior
predictions for each component.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure, RQ

m = Measure()
f_smooth = GP(EQ().stretch(2.0), measure=m)
f_wiggly = GP(RQ(1e-1).stretch(0.5), measure=m)
f = f_smooth + f_wiggly

x = jnp.linspace(0, 10, 100)
key, y_smooth, y_wiggly = m.sample(jax.random.PRNGKey(1), f_smooth(x), f_wiggly(x))
y = (y_smooth + y_wiggly)[:, 0]

post = m.condition(f(x, 1e-6), y)
mean_s, _ = post(f_smooth)(x).marginals()
mean_w, _ = post(f_wiggly)(x).marginals()
mean_f, _ = post(f)(x).marginals()

recon = np.max(np.abs(np.asarray(mean_s) + np.asarray(mean_w) - np.asarray(mean_f)))
print(f"components sum to the full prediction within {recon:.2e}")
print(f"full prediction matches data within {np.max(np.abs(np.asarray(mean_f) - np.asarray(y))):.2e}")
