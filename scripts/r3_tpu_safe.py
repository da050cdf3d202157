"""Round-3 TPU measurement batch — SAFE experiments only.

One serialized process (remote-TPU discipline, CLAUDE.md): dense
value+grad decomposition with the new analytic VJPs (E1), amortised
preconditioner + bf16 backward at N=262,144 (E2/E3), and the 262k
posterior mean (E4a). The potentially device-faulting posterior-variance
runs live in r3_tpu_var.py, run SEPARATELY so a fault cannot wedge this
batch. Prints one line per measurement, flushed."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

from stheno_tpu import EQ, GP
from stheno_tpu.utils import exact_gp_flops


def log(*a):
    print(*a, flush=True)


def slope_time(make_loop, i1, i2, repeats=4):
    m1, m2 = make_loop(i1), make_loop(i2)
    float(m1()), float(m2())
    t1s, t2s = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(m1()); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(m2()); t2s.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (i2 - i1)


def direct_time(fn, repeats=2):
    fn()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts)


log("backend:", jax.default_backend(), jax.devices())
dtype = jnp.float32

# ---------------- E1: dense value+grad decomposition -----------------------
from stheno_tpu import config as st_config
from stheno_tpu.kernels import pairwise
from stheno_tpu.matrix import dense as mdense

for n in (8192, 16384):
    x = jnp.linspace(0.0, 10.0, n, dtype=dtype)
    y = jnp.sin(x) + 0.3 * jnp.cos(3.2 * x)

    def nlml(ell):
        f = GP(EQ().stretch(ell))
        return -f.measure.logpdf(f(x, jnp.asarray(0.1, dtype)), y)

    def gram_only(ell):
        K = mdense(pairwise(EQ().stretch(ell), x[:, None]))
        return jnp.sum(jnp.asarray(K))

    def make(fn, iters, agg=lambda o: o):
        @jax.jit
        def many():
            def body(i, acc):
                out = agg(fn(jnp.asarray(2.0, dtype) + acc * 1e-30))
                return acc + out * 1e-30
            return lax.fori_loop(0, iters, body, jnp.asarray(0.0, dtype))
        return many

    i1, i2 = (2, 12) if n <= 8192 else (1, 5)
    vg = jax.value_and_grad(nlml)
    t_gram = slope_time(lambda i: make(gram_only, i), i1, i2)
    t_val_auto = slope_time(lambda i: make(nlml, i), i1, i2)
    st_config.set_cholesky_impl("fast")
    t_val_fast = slope_time(lambda i: make(nlml, i), i1, i2)
    st_config.set_cholesky_impl("auto")
    t_vg = slope_time(lambda i: make(vg, i, agg=lambda o: o[0] + o[1]), i1, i2)
    tflops = exact_gp_flops(n, grad=True) / t_vg / 1e12
    log(f"E1 n={n}: gram={t_gram*1e3:.2f}ms val_xla={t_val_auto*1e3:.2f}ms "
        f"val_fast={t_val_fast*1e3:.2f}ms vg={t_vg*1e3:.2f}ms "
        f"bwd_share={(t_vg-t_val_fast)*1e3:.2f}ms tflops={tflops:.2f}")

# ---------------- E2/E3: 262k amortised + bf16 backward --------------------
from stheno_tpu.iterative import eig_precond_state, iterative_nlml

n = 262_144
r = np.random.RandomState(0)
x = jnp.asarray(np.sort(r.rand(n).astype(np.float32)) * 10)
y = jnp.sin(x) + 0.1 * jnp.asarray(r.randn(n).astype(np.float32))
kf = lambda p: jnp.exp(p["log_s2"]) * EQ().stretch(jnp.exp(p["log_ell"]))
params = {"log_s2": jnp.asarray(0.0, dtype), "log_ell": jnp.asarray(0.0, dtype)}
COMMON = dict(num_probes=16, cg_tol=1e-2, max_cg_iters=200, slq_steps=30,
              block=8192)

def make_vg(precond_state=None, tile=None):
    kw = dict(COMMON)
    if precond_state is not None:
        kw["precond_state"] = precond_state
    else:
        kw["precond_rank"] = 64
    if tile is not None:
        kw["surrogate_tile_dtype"] = tile

    @jax.jit
    def vg(p, key):
        def obj(p):
            v, info = iterative_nlml(
                kf, p, x, y, 0.1, key, return_info=True, **kw
            )
            return v, info
        (v, info), g = jax.value_and_grad(obj, has_aux=True)(p)
        return v, info, g
    return vg

keys = jax.random.split(jax.random.PRNGKey(0), 64)
ki = iter(range(64))

# Preconditioner build cost (the thing being amortised).
t0 = time.perf_counter()
state = eig_precond_state(kf, params, x, 64, jax.random.PRNGKey(5), block=8192)
jax.block_until_ready(state)
log(f"E2 precond build (eager incl compile): {time.perf_counter()-t0:.2f}s")
build = jax.jit(lambda p, key: eig_precond_state(kf, p, x, 64, key, block=8192))
state = build(params, keys[next(ki)]); jax.block_until_ready(state)
t_build = direct_time(lambda: jax.block_until_ready(build(params, keys[next(ki)])))
log(f"E2 precond build (jit steady): {t_build:.3f}s")

results = {}
for name, vg in [
    ("baseline_fresh", make_vg()),
    ("amortised", make_vg(precond_state=state)),
    ("amortised_bf16", make_vg(precond_state=state, tile=jnp.bfloat16)),
    ("fresh_bf16", make_vg(tile=jnp.bfloat16)),
]:
    def step():
        v, info, g = vg(params, keys[next(ki)])
        assert np.isfinite(float(v)), (name, float(v))
        float(g["log_s2"])
        return v, info, g
    t = direct_time(step, repeats=2)
    v, info, g = vg(params, keys[next(ki)])
    results[name] = (t, float(v), float(g["log_s2"]), float(g["log_ell"]))
    log(f"E2 {name}: {t:.3f}s nlml={float(v):.1f} "
        f"g_s2={float(g['log_s2']):.3f} g_ell={float(g['log_ell']):.3f} "
        f"cg_iters={int(info['cg_iters'])} rel={float(info['cg_rel_residual']):.2e}")

# E3: gradient-quality — same key bf16 vs f32, vs across-key probe scatter.
vg_f32 = make_vg(precond_state=state)
vg_b16 = make_vg(precond_state=state, tile=jnp.bfloat16)
k0 = keys[40]
_, _, g32 = vg_f32(params, k0)
_, _, g16 = vg_b16(params, k0)
gs32 = []
for kk in keys[41:49]:
    _, _, gg = vg_f32(params, kk)
    gs32.append([float(gg["log_s2"]), float(gg["log_ell"])])
gs32 = np.asarray(gs32)
log(f"E3 same-key bf16-vs-f32 diff: "
    f"ds2={abs(float(g16['log_s2'])-float(g32['log_s2'])):.4f} "
    f"dell={abs(float(g16['log_ell'])-float(g32['log_ell'])):.4f}")
log(f"E3 across-key f32 probe std: s2={gs32[:,0].std():.4f} "
    f"ell={gs32[:,1].std():.4f}; mean s2={gs32[:,0].mean():.3f} "
    f"ell={gs32[:,1].mean():.3f}")

# E2b: stale-state convergence — state built at params, used at shifted
# params (optimiser-drift proxy): how many CG iterations does staleness buy?
params_far = {"log_s2": jnp.asarray(0.3, dtype), "log_ell": jnp.asarray(-0.4, dtype)}
_, info_stale, _ = vg_f32(params_far, keys[50])
vg_fresh_far = make_vg()
_, info_fresh, _ = vg_fresh_far(params_far, keys[50])
log(f"E2b stale-at-drifted-params: iters={int(info_stale['cg_iters'])} "
    f"rel={float(info_stale['cg_rel_residual']):.2e}; fresh: "
    f"iters={int(info_fresh['cg_iters'])} rel={float(info_fresh['cg_rel_residual']):.2e}")

# ---------------- E4a: 262k posterior mean --------------------------------
from stheno_tpu.iterative import iterative_posterior_mean

x_new = jnp.linspace(0.0, 10.0, 4096, dtype=dtype)

@jax.jit
def post_mean(p):
    return iterative_posterior_mean(
        kf, p, x, y, 0.1, x_new, cg_tol=1e-4, max_cg_iters=200,
        precond_state=state, block=8192,
    )

t0 = time.perf_counter()
mean, minfo = post_mean(params)
jax.block_until_ready(mean)
log(f"E4a posterior mean 262k (first incl compile): {time.perf_counter()-t0:.2f}s "
    f"iters={int(minfo['iters'])} rel={float(minfo['rel_residual']):.2e}")
pi = iter(np.linspace(0, 1e-6, 8))

def mean_step():
    p = {"log_s2": params["log_s2"] + next(pi), "log_ell": params["log_ell"]}
    jax.block_until_ready(post_mean(p)[0])

t_mean = direct_time(mean_step, repeats=2)
log(f"E4a posterior mean 262k steady: {t_mean:.3f}s; "
    f"mean[::1024]={np.asarray(mean)[::1024][:4]}")
log("SAFE BATCH DONE")
