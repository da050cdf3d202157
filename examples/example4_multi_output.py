"""Multi-output regression with a vector-valued GP: latent processes mixed
by a matrix H, conditioned jointly on all outputs.

Mirrors the reference's `readme_example4_multi-output.py` VGP construction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure


class VGP:
    """A vector-valued GP: a list of scalar processes."""

    def __init__(self, ps):
        self.ps = ps

    def __add__(self, other):
        return VGP([f + g for f, g in zip(self.ps, other.ps)])

    def lmatmul(self, A):
        m, n = A.shape
        ps = [0 for _ in range(m)]
        for i in range(m):
            for j in range(n):
                ps[i] = A[i, j] * self.ps[j] + ps[i]
        return VGP(ps)


m_latent, p_out = 2, 4
H = np.random.RandomState(0).randn(p_out, m_latent)

x_obs = jnp.linspace(0, 10, 10)

with Measure() as prior:
    us = VGP([GP(EQ()) for _ in range(m_latent)])
    fs = us.lmatmul(H)

fdds = [f(x_obs, 0.01) for f in fs.ps]
out = prior.sample(jax.random.PRNGKey(3), *fdds)
samples = out[1:]

post = prior.condition(*((fdd, s[:, 0]) for fdd, s in zip(fdds, samples)))
for i, (f, s) in enumerate(zip(fs.ps, samples)):
    mean, _ = post(f)(x_obs).marginals()
    rmse = np.sqrt(np.mean((np.asarray(mean) - np.asarray(s)[:, 0]) ** 2))
    print(f"output {i}: posterior RMSE at observations = {rmse:.4f}")
