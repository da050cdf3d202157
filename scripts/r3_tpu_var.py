"""Round-3 TPU posterior-variance experiments — RISKY batch.

The fused lax.map chunked variance program is known to FAULT the device at
N=262,144 on this toolchain (CLAUDE.md), and a fault wedges the tunnel for
many minutes. So each configuration runs as its OWN invocation of this
script (argv: N mode chunk [m]), launched sequentially by the driver shell
with safe configs first; a fault then costs only its own process.

Usage: python r3_tpu_var.py <N> <scan|host> <chunk> [m=2048]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")

from stheno_tpu import EQ
from stheno_tpu.iterative import (
    eig_precond_state,
    iterative_posterior_var,
)

N = int(sys.argv[1])
mode = sys.argv[2]
chunk = int(sys.argv[3])
m = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

print(f"CONFIG N={N} mode={mode} chunk={chunk} m={m}", flush=True)
r = np.random.RandomState(0)
x = jnp.asarray(np.sort(r.rand(N).astype(np.float32)) * 10)
y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(N).astype(np.float32))
kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
params = {"log_s2": jnp.asarray(0.0, jnp.float32),
          "log_ell": jnp.asarray(0.0, jnp.float32)}
x_new = jnp.linspace(0.0, 10.0, m, dtype=jnp.float32)

t0 = time.perf_counter()
state = eig_precond_state(kf, params, x, 64, jax.random.PRNGKey(5), block=8192)
jax.block_until_ready(state)
print(f"precond built {time.perf_counter()-t0:.2f}s", flush=True)

kw = dict(cg_tol=1e-4, max_cg_iters=200, precond_state=state, block=8192,
          chunk=chunk, mode=mode)

t0 = time.perf_counter()
if mode == "host":
    var = iterative_posterior_var(kf, params, x, y, 0.1, x_new, **kw)
else:
    var = jax.jit(
        lambda p: iterative_posterior_var(kf, p, x, y, 0.1, x_new, **kw)
    )(params)
var = np.asarray(var)
t1 = time.perf_counter() - t0
print(f"first run (incl compile): {t1:.2f}s", flush=True)
assert np.all(var >= 0), var.min()
assert np.all(np.isfinite(var)), "non-finite variance"
print(f"var[::256][:8]={var[::256][:8]}", flush=True)

# Steady-state timing (perturb params to dodge remote result caching).
t0 = time.perf_counter()
params2 = {"log_s2": params["log_s2"] + 1e-7, "log_ell": params["log_ell"]}
state2 = eig_precond_state(kf, params2, x, 64, jax.random.PRNGKey(6), block=8192)
kw2 = dict(kw, precond_state=state2)
if mode == "host":
    var2 = iterative_posterior_var(kf, params2, x, y, 0.1, x_new, **kw2)
else:
    var2 = jax.jit(
        lambda p: iterative_posterior_var(kf, p, x, y, 0.1, x_new, **kw2)
    )(params2)
jax.block_until_ready(var2)
print(f"steady (incl precond rebuild): {time.perf_counter()-t0:.2f}s", flush=True)
print("VAR RUN OK", flush=True)
