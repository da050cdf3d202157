"""Reproduce the r2-shaped 262k variance program: eig-preconditioner build
INSIDE the same jitted program as the lax.map chunk sweep (no prebuilt
state) — the configuration that faulted the device in r2."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
from stheno_tpu import EQ
from stheno_tpu.iterative import iterative_posterior_var

N, chunk, m = 262_144, 512, 2048
print(f"CONFIG r2-shape N={N} scan chunk={chunk} m={m}", flush=True)
r = np.random.RandomState(0)
x = jnp.asarray(np.sort(r.rand(N).astype(np.float32)) * 10)
y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(N).astype(np.float32))
kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
params = {"log_s2": jnp.asarray(0.0, jnp.float32),
          "log_ell": jnp.asarray(0.0, jnp.float32)}
x_new = jnp.linspace(0.0, 10.0, m, dtype=jnp.float32)
t0 = time.perf_counter()
var = jax.jit(
    lambda p: iterative_posterior_var(
        kf, p, x, y, 0.1, x_new, cg_tol=1e-4, max_cg_iters=200,
        precond_rank=64, block=8192, chunk=chunk, mode="scan",
    )
)(params)
var = np.asarray(var)
print(f"first run: {time.perf_counter()-t0:.2f}s min={var.min()} "
      f"finite={np.all(np.isfinite(var))}", flush=True)
print("OLDSHAPE OK", flush=True)
