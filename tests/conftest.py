import os

# Tests run on a virtual 8-device CPU mesh in float64, standing in for the
# reference's NumPy-float64 test matrix (cf. /root/reference/tests/__init__.py).
# JAX_PLATFORMS=axon is exported by the environment; we must *override* it, or
# every op compiles through the remote TPU compile helper (slow, and f64
# unsupported).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles of the distributed (GSPMD) graphs; identical HLO across runs
# (and across parametrised cases) loads from cache instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/stheno_tpu_test_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
