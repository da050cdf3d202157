"""GPAR-style composite model: the second output's GP takes (x, y1) as
input, so outputs are modelled autoregressively.

Mirrors the reference's `readme_example7_gpar.py` two-layer construction
with joint hyperparameter fitting.
"""

import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP
from stheno_tpu.opt import Vars, minimise_lbfgs

x_obs1 = jnp.linspace(0, 10, 30)
r = np.random.RandomState(1)
inds2 = np.sort(r.permutation(30)[:10])
x_obs2 = x_obs1[jnp.asarray(inds2)]

y1_obs = jnp.sin(x_obs1) + 0.05 * jnp.asarray(r.randn(30))
y2_obs = jnp.sin(x_obs2) ** 2 + 0.05 * jnp.asarray(r.randn(10))


def objective(vs):
    f1 = GP(vs.positive(1.0, name="var1") * EQ().stretch(vs.positive(1.0, name="scale1")))
    f2 = GP(vs.positive(1.0, name="var2") * EQ().stretch(vs.positive(1.0, name="scale2")))
    # Second layer sees (x, y1) as its input.
    x2 = jnp.stack([x_obs2, y1_obs[jnp.asarray(inds2)]], axis=1)
    lp = f1(x_obs1, vs.positive(0.1, name="noise1")).logpdf(y1_obs)
    lp = lp + f2(x2, vs.positive(0.1, name="noise2")).logpdf(y2_obs)
    return -lp


vs = Vars()
init = float(objective(vs))
final = minimise_lbfgs(objective, vs, iters=30)
print(f"joint NLML: {init:.2f} -> {final:.2f}")

f1 = GP(vs["var1"] * EQ().stretch(vs["scale1"]))
post = f1 | (f1(x_obs1, vs["noise1"]), y1_obs)
mean, _ = post(x_obs1).marginals()
rmse = np.sqrt(np.mean((np.asarray(mean) - np.sin(np.asarray(x_obs1))) ** 2))
print(f"first-layer RMSE vs sin: {rmse:.4f}")
