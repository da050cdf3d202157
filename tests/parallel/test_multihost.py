"""Two-process DCN smoke test: exercises ``initialize_hosts`` /
``make_hybrid_mesh`` and a cross-process psum through a real
``jax.distributed`` rendezvous over localhost (the reference has no
distributed runtime at all — SURVEY §5 'Distributed communication
backend'; in production the same code path rides DCN between TPU hosts)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = '''
import os, sys
# JAX_PLATFORMS/XLA_FLAGS must be set before the first backend
# initialisation, and jax.distributed.initialize must run before ANY
# backend-touching call (including jax.config.update("jax_platforms", ...),
# which resets and re-initialises the backend registry).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from stheno_tpu.parallel import initialize_hosts, make_hybrid_mesh

pid = int(sys.argv[1])
coord = sys.argv[2]
initialize_hosts(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
ndev = len(jax.devices())
assert ndev == 4, ndev  # 2 local CPU devices x 2 processes.

# Idempotence: a second call on the initialised runtime is a no-op.
initialize_hosts(coordinator_address=coord, num_processes=2, process_id=pid)

mesh = make_hybrid_mesh(chains=2)
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
    "chain": 2, "data": 2
}, mesh

# A cross-process collective: the chain axis spans the two processes, so
# this psum crosses the process boundary (DCN in production, TCP here).
from jax.sharding import PartitionSpec as P
from jax import shard_map
import jax.experimental.multihost_utils as mhu

local = jnp.arange(2.0).reshape(2, 1) + 10.0 * pid  # proc0: [0,1]; proc1: [10,11]
global_x = mhu.host_local_array_to_global_array(local, mesh, P("chain", None))

out = jax.jit(
    shard_map(
        lambda x: jax.lax.psum(x, "chain"),
        mesh=mesh,
        in_specs=P("chain", None),
        out_specs=P("chain", None),
    )
)(global_x)
got = np.asarray(
    mhu.global_array_to_host_local_array(out, mesh, P("chain", None))
)
# psum over chain adds the two processes' shards elementwise: [0,1]+[10,11].
np.testing.assert_allclose(got, np.asarray([[10.0], [12.0]]))

# --- Cross-process ITERATIVE path: the row-sharded blocked-Gram matvec
# and the stochastic NLML, with row blocks split across the process
# boundary (DCN in production). Every input is replicated-global; the
# matvec's all_gather and the surrogate's psums ride the 4-device
# "data" axis spanning both processes.
jax.config.update("jax_enable_x64", True)
from stheno_tpu import EQ
from stheno_tpu.parallel import sharded_iterative_nlml, sharded_kernel_matvec

mesh_d = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
n = 64
x_np = np.linspace(0.0, 10.0, n)
v_np = np.sin(np.arange(2 * n, dtype=np.float64)).reshape(n, 2)
y_np = np.sin(x_np) + 0.05 * np.cos(3.0 * x_np)


def rep(a):
    return mhu.host_local_array_to_global_array(jnp.asarray(a), mesh_d, P())


xg, vg_, yg = rep(x_np), rep(v_np), rep(y_np)
out = jax.jit(
    lambda x, v: sharded_kernel_matvec(EQ(), x, v, mesh_d, noise=0.1, block=8)
)(xg, vg_)
# Dense reference computed locally with numpy.
d2 = (x_np[:, None] - x_np[None, :]) ** 2
K = np.exp(-0.5 * d2) + 0.1 * np.eye(n)
err = float(jnp.linalg.norm(out - jnp.asarray(K @ v_np)))
assert err < 1e-8, err

kf = lambda p: jnp.exp(p["log_s2"]) * EQ()
val, info = sharded_iterative_nlml(
    kf, {"log_s2": jnp.asarray(0.0)}, xg, yg, 0.1, jax.random.PRNGKey(0),
    mesh_d, num_probes=16, cg_tol=1e-8, precond_rank=16, block=8,
    return_info=True,
)
assert bool(info["cg_converged"]), info
sign, ld = np.linalg.slogdet(K)
alpha = np.linalg.solve(K, y_np)
nlml_ref = 0.5 * (ld + y_np @ alpha + n * np.log(2 * np.pi))
assert abs(float(val) - nlml_ref) < 1.0, (float(val), nlml_ref)
print("proc %d OK" % pid, flush=True)
'''


def test_two_process_distributed_smoke(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    f = tmp_path / "worker.py"
    f.write_text(_WORKER)
    # Strip the TPU-tunnel sitecustomize triggers (PALLAS_AXON*): its
    # register() initialises the XLA backend at interpreter start, which
    # jax.distributed.initialize must precede.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
        and not k.startswith("PALLAS_AXON")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(f), str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process smoke test timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
