"""Checkpoint/resume for hyperparameter state.

The reference has none (SURVEY.md §5: persistence is the user's problem —
hyperparameters live in varz ``Vars`` or torch Parameters). Here: any pytree
(a ``Vars`` latent dict, optimiser state, HMC chains) serialises to a single
file via numpy's npz container, with the pytree structure stored alongside so
loading restores the exact tree."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree", "save_vars", "load_vars"]


def save_pytree(path, tree):
    """Serialise a pytree of arrays to ``path`` (npz + JSON treedef)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    # Store the structure via jax's own serialisable representation.
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_pytree(path, like):
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``like`` (the reference pytree providing the treedef).

    The stored treedef string is the structure fingerprint: loading into a
    template with a *different* structure — even one whose leaf count
    happens to match (e.g. a different optax chain) — raises instead of
    silently unflattening leaves into the wrong slots."""
    with np.load(path) as data:
        leaves = [
            jnp.asarray(data[f"leaf_{i}"])
            for i in range(len([k for k in data.files if k.startswith("leaf_")]))
        ]
        stored_treedef = None
        if "__treedef__" in data.files:
            stored_treedef = json.loads(bytes(data["__treedef__"]).decode())
    _, treedef = jax.tree.flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves; template has "
            f"{treedef.num_leaves}."
        )
    if stored_treedef is not None and stored_treedef != str(treedef):
        raise ValueError(
            "Checkpoint pytree structure does not match the template "
            "(same leaf count, different treedef — e.g. a different "
            f"optimizer/state layout).\n  stored:   {stored_treedef}\n"
            f"  template: {treedef}"
        )
    return treedef.unflatten(leaves)


def save_vars(path, vs):
    """Persist a :class:`stheno_tpu.opt.Vars` container's latent state."""
    names = sorted(vs.latent_dict().keys())
    latent = vs.latent_dict()
    arrays = {f"var_{n}": np.asarray(jax.device_get(latent[n])) for n in names}
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_vars(path, vs):
    """Restore latent values into ``vs`` (parameters must already be
    registered, e.g. by calling the model function once)."""
    with np.load(path) as data:
        latent = {
            k[len("var_") :]: jnp.asarray(data[k])
            for k in data.files
            if k.startswith("var_")
        }
    unknown = set(latent) - set(vs.latent_dict())
    if unknown:
        raise ValueError(f"Checkpoint contains unknown parameters {unknown}.")
    vs.assign_latent(latent)
    return vs
