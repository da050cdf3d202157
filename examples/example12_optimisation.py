"""Hyperparameter optimisation with L-BFGS over constrained parameters
(the reference's `readme_example12_optimisation_varz.py`, with
`stheno_tpu.opt.Vars` playing Varz's role).
"""

import jax
import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP
from stheno_tpu.opt import Vars, minimise_lbfgs

x = jnp.linspace(0, 10, 100)
f_gen = GP(EQ().periodic(1.3))
key, y = f_gen.measure.sample(jax.random.PRNGKey(8), f_gen(x, 0.2))
y = y[:, 0]


def objective(vs):
    f = GP(
        vs.positive(1.0, name="var")
        * EQ().stretch(vs.positive(1.0, name="scale")).periodic(vs.positive(1.0, name="period"))
    )
    return -f.measure.logpdf(f(x, vs.positive(0.1, name="noise")), y)


vs = Vars()
init = float(objective(vs))
final = minimise_lbfgs(objective, vs, iters=40)
print(f"NLML: {init:.2f} -> {final:.2f}")
for name in ("var", "scale", "period", "noise"):
    print(f"{name}: {float(vs[name]):.4f}")

f = GP(vs["var"] * EQ().stretch(vs["scale"]).periodic(vs["period"]))
post = f | (f(x, vs["noise"]), y)
mean, _ = post(x).marginals()
print(f"training RMSE: {np.sqrt(np.mean((np.asarray(mean) - np.asarray(y)) ** 2)):.4f}")
