"""NUTS chain-scaling sweep: dense metric, 16/32 vmapped chains."""
import sys, time, traceback
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
from stheno_tpu import EQ, GP, config
from stheno_tpu.opt import effective_sample_size, potential_scale_reduction, sample_nuts

n = 2000
r = np.random.RandomState(0)
x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
y = jnp.asarray((np.sin(np.asarray(x)) + 0.15 * r.randn(n)).astype(np.float32))

def logpost(p):
    f = GP(jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"])))
    lp = f.measure.logpdf(f(x, jnp.exp(p["log_noise"])), y)
    return lp - 0.5 * (p["log_ell"]**2 + p["log_s2"]**2 + p["log_noise"]**2)

init = {"log_ell": jnp.asarray(0.0, jnp.float32),
        "log_s2": jnp.asarray(0.0, jnp.float32),
        "log_noise": jnp.asarray(-1.9, jnp.float32)}
config.set_adaptive_jitter(True)
try:
    for chains in (16, 32):
        try:
            sample_nuts(logpost, init, jax.random.PRNGKey(1), num_samples=128,
                        num_warmup=192, num_chains=chains, max_depth=6,
                        adapt_mass="dense", dispatch_chunk=48)
            t0 = time.perf_counter()
            s, acc = sample_nuts(logpost, init, jax.random.PRNGKey(0),
                                 num_samples=128, num_warmup=192,
                                 num_chains=chains, max_depth=6,
                                 adapt_mass="dense", dispatch_chunk=48)
            wall = time.perf_counter() - t0
            ess = min(effective_sample_size(np.asarray(s[k])) for k in init)
            rhat = max(potential_scale_reduction(np.asarray(s[k])) for k in init)
            print(f"RESULT chains={chains}: accept={acc:.2f} min_ess={ess:.1f} "
                  f"rhat={rhat:.3f} wall={wall:.1f}s ess_per_s={ess/wall:.2f}",
                  flush=True)
        except Exception:
            print(f"FAILED chains={chains}:", flush=True)
            traceback.print_exc(); sys.stdout.flush()
finally:
    config.set_adaptive_jitter(False)
