"""Checkpoint/resume for hyperparameter state.

The reference has none (SURVEY.md §5: persistence is the user's problem —
hyperparameters live in varz ``Vars`` or torch Parameters). Here: any pytree
(a ``Vars`` latent dict, optimiser state, HMC chains) serialises to a single
file via numpy's npz container, with the pytree structure stored alongside so
loading restores the exact tree."""

import json
import os
import warnings

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["save_pytree", "load_pytree", "save_vars", "load_vars"]


def _tree_paths(tree):
    """Version-tolerant structure fingerprint: the key path of every leaf
    (``jax.tree_util.keystr``). Key paths name the *slots* (dict keys,
    namedtuple fields, sequence indices) and survive JAX/optax renaming
    their treedef reprs, which the raw ``str(treedef)`` does not."""
    return [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
    ]


def save_pytree(path, tree):
    """Serialise a pytree of arrays to ``path`` (npz + JSON treedef)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(l)) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8
    )
    arrays["__paths__"] = np.frombuffer(
        json.dumps(_tree_paths(tree)).encode(), dtype=np.uint8
    )
    # Store the structure via jax's own serialisable representation.
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_pytree(path, like, *, strict=False):
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``like`` (the reference pytree providing the treedef).

    Structural guards, hard to soft:

    - leaf count mismatch always raises (unflattening into the wrong
      slots is never recoverable);
    - leaf *key path* mismatch (dict keys / field names / positions —
      :func:`_tree_paths`) raises: same leaf count but genuinely
      different structure, e.g. a different optax chain;
    - a treedef *repr* mismatch with identical key paths only warns:
      pytree reprs are not stable across JAX/optax versions, and a
      dependency upgrade must not hard-reject a loadable checkpoint
      (r3 advisor finding). Pass ``strict=True`` to raise there too."""
    with np.load(path) as data:
        leaves = [
            jnp.asarray(data[f"leaf_{i}"])
            for i in range(len([k for k in data.files if k.startswith("leaf_")]))
        ]
        stored_treedef = None
        if "__treedef__" in data.files:
            stored_treedef = json.loads(bytes(data["__treedef__"]).decode())
        stored_paths = None
        if "__paths__" in data.files:
            stored_paths = json.loads(bytes(data["__paths__"]).decode())
    _, treedef = jax.tree.flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves; template has "
            f"{treedef.num_leaves}."
        )
    if stored_paths is not None and stored_paths != _tree_paths(like):
        raise ValueError(
            "Checkpoint pytree structure does not match the template "
            "(same leaf count, different leaf key paths — e.g. a "
            "different optimizer/state layout).\n"
            f"  stored:   {stored_paths}\n"
            f"  template: {_tree_paths(like)}"
        )
    if stored_treedef is not None and stored_treedef != str(treedef):
        if stored_paths is None:
            # Legacy checkpoint (no key-path fingerprint): the repr
            # mismatch is the ONLY structural evidence we have, so it
            # stays a hard error — softening it here would unflatten the
            # leaves into the wrong slots of a genuinely different
            # structure and silently corrupt a resumed run (r4
            # self-review finding).
            raise ValueError(
                "Checkpoint treedef repr does not match the template and "
                "the checkpoint predates key-path fingerprints, so the "
                "structures cannot be confirmed compatible.\n"
                f"  stored:   {stored_treedef}\n  template: {treedef}"
            )
        msg = (
            "Checkpoint treedef repr does not match the template, but the "
            "leaf key paths do — most likely a JAX/optax version change "
            "in the pytree repr. Loading anyway.\n"
            f"  stored:   {stored_treedef}\n  template: {treedef}"
        )
        if strict:
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
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
