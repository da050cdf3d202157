"""Per-device communication-volume artifacts for the distributed Cholesky
layouts (VERDICT r2 #5): the O(N b) [1-D row-block] vs
O(N b (1/r + 1/c)) [2-D block-cyclic] per-device claims are validated
against the collectives XLA actually emitted (``utils/comm.py``), so a
layout regression that silently inflates ICI traffic fails here. The
pod-shaped (4x8 = 32 virtual devices) case runs in a subprocess because
the device count is fixed at backend init."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

import stheno_tpu.parallel.cholesky as c1d
import stheno_tpu.parallel.cholesky2d as c2d
from stheno_tpu.parallel import make_data_mesh
from stheno_tpu.parallel.cholesky2d import make_grid_mesh
from stheno_tpu.utils.comm import collective_traffic


def _loop_bytes(traffic):
    """Bytes from collectives inside loops (the per-panel cost; excludes
    the one-time entry relayout all-gathers)."""
    return sum(b * m for _, _, b, m in traffic["instructions"] if m > 1)


def _models(N, b, D, r, c, w=8):
    """Analytic per-device loop-communication models (ring cost)."""
    nb = N // b
    one_d = nb * (D - 1) / D * N * b * w
    # 2-D per panel: two nested diag psums (b x b) + the (N/r, b) panel
    # psum over the column axis + the (N/r, b) psum over the row axis.
    two_d = nb * (
        2 * (r - 1) / r * b * b * w
        + 2 * (c - 1) / c * b * b * w
        + 2 * (c - 1) / c * (N / r) * b * w
        + 2 * (r - 1) / r * (N / r) * b * w
    )
    return one_d, two_d


def test_comm_volume_matches_model_8dev():
    """On the in-process 8-device mesh, the HLO-measured per-device loop
    bytes equal the analytic models exactly (the models the pod-scale
    docs table is built from)."""
    N, b = 256, 32
    rng = np.random.RandomState(0)
    a = rng.randn(N, N)
    K = jnp.asarray(a @ a.T + N * np.eye(N))
    mesh1 = make_data_mesh(8)
    mesh2 = make_grid_mesh(2, 4)
    f1 = (
        jax.jit(lambda K: c1d._dist_cholesky_loop(K, mesh1, "data", b))
        .lower(K).compile()
    )
    f2 = (
        jax.jit(lambda K: c2d._dist_cholesky_2d_loop(K, mesh2, "rows", "cols", b))
        .lower(K).compile()
    )
    got1 = _loop_bytes(collective_traffic(f1))
    got2 = _loop_bytes(collective_traffic(f2))
    m1, m2 = _models(N, b, 8, 2, 4)
    np.testing.assert_allclose(got1, m1, rtol=1e-6)
    np.testing.assert_allclose(got2, m2, rtol=1e-6)


_WORKER = '''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import stheno_tpu.parallel.cholesky as c1d
import stheno_tpu.parallel.cholesky2d as c2d
from stheno_tpu.parallel import make_data_mesh
from stheno_tpu.parallel.cholesky2d import make_grid_mesh
from stheno_tpu.utils.comm import collective_traffic

N, b = 2048, 16
K = jnp.zeros((N, N))  # Compile-only: values are irrelevant to HLO.
mesh1 = make_data_mesh(32)
mesh2 = make_grid_mesh(4, 8)
f1 = jax.jit(
    lambda K: c1d._dist_cholesky_loop(K, mesh1, "data", b)
).lower(K).compile()
f2 = jax.jit(
    lambda K: c2d._dist_cholesky_2d_loop(K, mesh2, "rows", "cols", b)
).lower(K).compile()

def loop_bytes(t):
    return sum(bb * m for _, _, bb, m in t["instructions"] if m > 1)

got1 = loop_bytes(collective_traffic(f1))
got2 = loop_bytes(collective_traffic(f2))
nb = N // b
w = 8
m1 = nb * 31 / 32 * N * b * w
m2 = nb * (
    2 * 3 / 4 * b * b * w + 2 * 7 / 8 * b * b * w
    + 2 * 7 / 8 * (N / 4) * b * w + 2 * 3 / 4 * (N / 4) * b * w
)
assert abs(got1 - m1) / m1 < 0.02, (got1, m1)
assert abs(got2 - m2) / m2 < 0.02, (got2, m2)
# The 2-D layout's per-device loop traffic must beat 1-D on the 4x8 mesh
# (ratio ~0.85 here; the gap widens as sqrt(D) at pod scale).
assert got2 < 0.92 * got1, (got2, got1, got2 / got1)
print("OK", got1, got2, got2 / got1)
'''


def test_comm_volume_4x8_pod_shape():
    """4x8 (32-device) mesh: 2-D block-cyclic communicates measurably
    fewer per-device bytes than 1-D row-block, and both match the
    analytic model the docs scaling table extrapolates from."""
    env = {
        k: v for k, v in os.environ.items() if not k.startswith("PALLAS_AXON")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    out = subprocess.run(
        [sys.executable, "-c", _WORKER],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, (out.stdout, out.stderr)
    assert "OK" in out.stdout, out.stdout


def test_sharded_matvec_comm_matches_model():
    """The row-sharded iterative matvec costs ONE all_gather of the (n, p)
    block per chained application — (D-1)/D * n * p * w bytes per device,
    the per-CG-iteration ICI cost of the multi-chip iterative path. Two
    matvecs are chained because that is where the gather lives: a single
    terminal matvec legitimately leaves its output row-sharded (zero
    collectives — also asserted), and only feeding it back as the next
    replicated RHS forces the exchange, exactly as CG does."""
    from stheno_tpu import EQ
    from stheno_tpu.parallel import sharded_kernel_matvec

    n, p = 256, 4
    x = jnp.linspace(0.0, 10.0, n)
    v = jnp.asarray(np.random.RandomState(1).randn(n, p))
    mesh = make_data_mesh(8)

    def mv(x, vv):
        return sharded_kernel_matvec(EQ(), x, vv, mesh, noise=0.1, block=64)

    t1 = collective_traffic(jax.jit(mv).lower(x, v).compile())
    assert t1["total"] == 0.0, t1  # Terminal matvec: output stays sharded.
    t2 = collective_traffic(
        jax.jit(lambda x, v: mv(x, mv(x, v))).lower(x, v).compile()
    )
    model = (8 - 1) / 8 * n * p * 8  # f64 on the CPU test mesh.
    np.testing.assert_allclose(t2["total"], model, rtol=1e-6)
