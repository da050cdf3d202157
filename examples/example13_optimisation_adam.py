"""Hyperparameter optimisation with Adam (the reference's
`readme_example13_optimisation_torch.py`, re-expressed with `jax.grad`
through the NLML and optax Adam under the hood).
"""

import jax
import jax.numpy as jnp

from stheno_tpu import EQ, GP
from stheno_tpu.opt import Vars, minimise_adam

x = jnp.linspace(0, 10, 100)
f_gen = GP(2.0 * EQ().stretch(1.0))
key, y = f_gen.measure.sample(jax.random.PRNGKey(9), f_gen(x, 0.1))
y = y[:, 0]


def objective(vs):
    f = GP(vs.positive(1.0, name="var") * EQ().stretch(vs.positive(1.0, name="scale")))
    return -f.measure.logpdf(f(x, vs.positive(0.2, name="noise")), y)


vs = Vars()
init = float(objective(vs))
final = minimise_adam(objective, vs, iters=200, rate=5e-2)
print(f"NLML: {init:.2f} -> {final:.2f}")
for name in ("var", "scale", "noise"):
    print(f"{name}: {float(vs[name]):.4f}")
