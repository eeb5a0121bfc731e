"""Checkpoint / resume for solver carries.

The reference has no checkpointing — only full reset (SURVEY.md section 5,
solver/mod.rs:14 clear_cached_data). Here any solver carry (DFSPHCarry / WCSPHCarry —
arbitrary NamedTuple pytrees of arrays) round-trips to a single .npz file. Scalars in
the pytree (python ints/floats inside dataclass configs) are NOT saved: a checkpoint
restores *state*; the solver configuration is code.

Layout: each leaf is stored under its tree path ("particles/positions", ...), so the
file is introspectable with numpy alone and robust against NamedTuple field reorder.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _paths(pytree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(pytree)
    names = ["/".join(str(getattr(k, "name", getattr(k, "idx", k))) for k in path)
             for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return names, leaves, treedef


def save_checkpoint(path: str, carry) -> None:
    """Write a solver carry to `path` (.npz)."""
    names, leaves, _ = _paths(carry)
    arrays = {n: np.asarray(l) for n, l in zip(names, leaves)}
    assert len(arrays) == len(names), "duplicate leaf paths"
    np.savez(path, **arrays)


def load_checkpoint(path: str, template):
    """Read a checkpoint into the structure of `template` (a carry with the same
    shapes, e.g. fresh from `solver.init_carry`). Returns a new carry."""
    names, leaves, treedef = _paths(template)
    with np.load(path) as data:
        missing = [n for n in names if n not in data]
        if missing:
            raise KeyError(f"checkpoint {path} is missing leaves: {missing}")
        new_leaves = []
        for name, leaf in zip(names, leaves):
            stored = data[name]
            if stored.shape != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {name}: checkpoint {stored.shape} "
                    f"vs template {tuple(leaf.shape)}"
                )
            new_leaves.append(jnp.asarray(stored, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
