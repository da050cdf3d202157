"""Sparse (pseudo-point) regression: 2,000 observations summarised by 20
inducing points with the Titsias VFE approximation.

Mirrors the reference's `readme_example10_sparse.py`. For data-sharded
multi-chip sparse inference at much larger N, see
`stheno_tpu.parallel.dist_elbo` (docs/scaling.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, PseudoObs

x = jnp.linspace(0, 10, 2000)
x_ind = jnp.linspace(0, 10, 20)

f = GP(EQ().periodic(2.0))
key, y = f.measure.sample(jax.random.PRNGKey(6), f(x, 0.5))
y = y[:, 0]

obs = PseudoObs(f(x_ind), (f(x, 0.5), y))
elbo = float(f.measure.logpdf(obs))
lp = float(f.measure.logpdf(f(x, 0.5), y))
print(f"ELBO:        {elbo:.2f}")
print(f"exact logpdf: {lp:.2f}  (ELBO is a lower bound; gap {lp - elbo:.4f})")

post = f.measure.condition(obs)
mean, _ = post(f)(x).marginals()
dense_post = f | (f(x, 0.5), y)
mean_ref, _ = dense_post(x).marginals()
print(f"sparse vs exact posterior mean max diff: {np.max(np.abs(np.asarray(mean) - np.asarray(mean_ref))):.4f}")
