"""Multi-host bootstrap and mesh construction.

The reference is single-process (SURVEY.md §5: no distributed communication
backend); scaling past one host is a build obligation. JAX's runtime does
the heavy lifting — each host calls :func:`initialize_hosts` once, after
which ``jax.devices()`` spans the whole slice and every ``shard_map``/GSPMD
path in :mod:`stheno_tpu.parallel` works unchanged: XLA routes collectives
over ICI within a slice and DCN across slices.

Typical multi-host driver::

    from stheno_tpu.parallel import initialize_hosts, make_hybrid_mesh

    initialize_hosts()                      # or pass coordinator/num/id
    mesh = make_hybrid_mesh(chains=jax.process_count())  # DCN x ICI
    # dist_nlml / dist_elbo / sharded_iterative_nlml over mesh as usual.
"""

import numpy as np

import jax

__all__ = ["initialize_hosts", "make_hybrid_mesh"]


def initialize_hosts(coordinator_address=None, num_processes=None, process_id=None):
    """Initialise the JAX distributed runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-detection (the
    common case on Cloud TPU slices); arguments are forwarded to
    ``jax.distributed.initialize`` for manual clusters. Safe to call on a
    single host: initialisation failures in a non-distributed environment
    are reported, not raised, so single-host scripts can share the driver
    code path."""
    # True idempotence: a second call on an already-initialised multi-host
    # runtime must be a no-op, not a re-raise of "already initialized".
    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return
    # A caller that names an explicit multi-process cluster asked for real
    # distribution: failures must surface, not degrade to single-process.
    explicit_cluster = num_processes is not None and num_processes > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e).lower():
            return
        if explicit_cluster or jax.process_count() > 1:
            raise
        import logging

        logging.getLogger(__name__).info(
            "single-process run; distributed init skipped (%s)", e
        )


def make_hybrid_mesh(chains=1, axis_chain="chain", axis_data="data"):
    """A 2D ``(chains, data)`` mesh: the chain axis maps across hosts (DCN —
    embarrassingly parallel HMC/NUTS chains or hyperparameter restarts), the
    data axis within hosts (ICI — the sharded Gram/Cholesky/ELBO paths).

    ``chains`` must divide the device count; ``chains=1`` degenerates to a
    pure data mesh compatible with every ``axis="data"`` entry point."""
    devices = np.array(jax.devices())
    if len(devices) % chains != 0:
        raise ValueError(
            f"chains={chains} does not divide device count {len(devices)}."
        )
    grid = devices.reshape(chains, len(devices) // chains)
    return jax.sharding.Mesh(grid, (axis_chain, axis_data))
