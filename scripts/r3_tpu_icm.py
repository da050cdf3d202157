"""Multi-output ICM at scale on the v5e: iterative NLML+grad at
N = 131,072 x 2 tasks = 262,144 rows via the augmented-input Coregion."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
from stheno_tpu import EQ
from stheno_tpu.kernels import Coregion
from stheno_tpu.iterative import eig_precond_state, iterative_nlml

nx, t = 131_072, 2
r = np.random.RandomState(0)
x = np.sort(r.rand(nx).astype(np.float32)) * 10
xa = jnp.asarray(
    np.stack([np.repeat(x, t), np.tile(np.arange(t, dtype=np.float32), nx)], axis=1)
)
f1 = np.sin(x); f2 = 0.6 * np.sin(x) + 0.4 * np.cos(2 * x)
ya = jnp.asarray(
    (np.stack([f1, f2], 1).reshape(-1) + 0.1 * r.randn(nx * t)).astype(np.float32)
)

def kf(p):
    L = p["chol_B"]
    return (
        jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"])).select([0])
        * Coregion(L @ L.T).select([1])
    )

params = {
    "log_s2": jnp.asarray(0.0, jnp.float32),
    "log_ell": jnp.asarray(0.0, jnp.float32),
    "chol_B": jnp.asarray([[1.0, 0.0], [0.5, 0.8]], jnp.float32),
}
print("building precond...", flush=True)
t0 = time.perf_counter()
state = jax.jit(
    lambda p, k: eig_precond_state(kf, p, xa, 64, k, block=8192)
)(params, jax.random.PRNGKey(5))
jax.block_until_ready(state)
print(f"precond {time.perf_counter()-t0:.2f}s", flush=True)

@jax.jit
def vg(p, key):
    def obj(p):
        return iterative_nlml(
            kf, p, xa, ya, 0.1, key, num_probes=16, cg_tol=1e-2,
            max_cg_iters=200, slq_steps=30, precond_state=state, block=8192,
            return_info=True,
        )
    (v, info), g = jax.value_and_grad(obj, has_aux=True)(p)
    return v, info, g

keys = jax.random.split(jax.random.PRNGKey(0), 4)
t0 = time.perf_counter()
v, info, g = vg(params, keys[0]); jax.block_until_ready(v)
print(f"first (incl compile): {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
v, info, g = vg(params, keys[1]); jax.block_until_ready(v)
dt = time.perf_counter() - t0
gB = np.asarray(g["chol_B"])
print(f"ICM N=262,144 rows (131k x 2 tasks) amortised NLML+grad: {dt:.3f}s "
      f"nlml={float(v):.1f} cg_iters={int(info['cg_iters'])} "
      f"rel={float(info['cg_rel_residual']):.2e} gB={gB.tolist()}", flush=True)
assert np.isfinite(float(v)) and np.all(np.isfinite(gB))
print("ICM DONE", flush=True)
