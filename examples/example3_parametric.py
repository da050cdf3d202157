"""Parametric hyperparameter learning: fit kernel variance/scale/noise by
maximising the log marginal likelihood, then predict.

Mirrors the reference's `readme_example3_parametric.py` (which uses Varz);
here the constrained-parameter container is `stheno_tpu.opt.Vars`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP
from stheno_tpu.opt import Vars, minimise_lbfgs

x = jnp.linspace(0, 10, 80)
f_gen = GP(2.0 * EQ().stretch(1.5))
key, y = f_gen.measure.sample(jax.random.PRNGKey(2), f_gen(x, 0.1))
y = y[:, 0]


def model(vs):
    return GP(vs.positive(1.0, name="var") * EQ().stretch(vs.positive(1.0, name="scale")))


def objective(vs):
    f = model(vs)
    return -f.measure.logpdf(f(x, vs.positive(0.1, name="noise")), y)


vs = Vars()
init = float(objective(vs))
final = minimise_lbfgs(objective, vs, iters=40)
print(f"NLML: {init:.2f} -> {final:.2f}")
for name in ("var", "scale", "noise"):
    print(f"{name}: {float(vs[name]):.4f}")

f = model(vs)
f_post = f | (f(x, vs["noise"]), y)
mean, _ = f_post(x).marginals()
rmse = np.sqrt(np.mean((np.asarray(mean) - np.asarray(y)) ** 2))
print(f"training RMSE: {rmse:.4f}")
