"""GP-modulated parametric model, jointly fit by Adam: y = (1 + a) * g(x)
with a GP modulation `a` and a small tanh network `g`.

Mirrors the reference's `readme_example8_gp-rnn.py` (which modulates an RNN
from wbml); the network here is a plain JAX MLP held in the same `Vars`
container as the GP hyperparameters, so one optimiser fits everything.
"""

import jax.numpy as jnp
import numpy as np

from stheno_tpu import EQ, GP, Measure
from stheno_tpu.opt import Vars, minimise_adam

x = jnp.linspace(0, 1, 60)[:, None]
r = np.random.RandomState(2)
a_true = 0.3 * jnp.asarray(np.sin(2 * np.pi * np.asarray(x)[:, 0]))
f_true = (1 + a_true) * jnp.sin(2 * jnp.pi * 3 * x[:, 0])
y = f_true + 0.05 * jnp.asarray(r.randn(60))


def net(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return (h @ params["w2"] + params["b2"])[:, 0]


def objective(vs):
    params = {
        "w1": vs.unbounded(0.1 * jnp.asarray(r.randn(1, 8)), name="w1", shape=(1, 8)),
        "b1": vs.unbounded(jnp.zeros(8), name="b1", shape=(8,)),
        "w2": vs.unbounded(0.1 * jnp.asarray(r.randn(8, 1)), name="w2", shape=(8, 1)),
        "b2": vs.unbounded(jnp.zeros(1), name="b2", shape=(1,)),
    }
    g = net(params, x)
    m = Measure()
    a = GP(1e-1 * EQ().stretch(vs.positive(0.2, name="a_scale")), measure=m)
    # y - g = a * g + noise: condition the modulation GP on the residual.
    f_mod = a * (lambda z: jnp.interp(jnp.asarray(z)[..., 0], x[:, 0], g))
    resid = y - g
    return -m.logpdf(f_mod(x, vs.positive(0.05, name="noise")), resid)


vs = Vars()
init = float(objective(vs))
final = minimise_adam(objective, vs, iters=100, rate=2e-2)
print(f"joint NLML: {init:.2f} -> {final:.2f}")
print(f"fitted modulation lengthscale: {float(vs['a_scale']):.4f}")
print(f"fitted noise: {float(vs['noise']):.4f}")
