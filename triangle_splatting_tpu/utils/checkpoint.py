"""Checkpoint IO: pickle (reference ``torch.save`` parity,
VanillaTS_model.py save_ckpt) or Orbax (TPU-native: async-capable, sharded,
multi-host safe — the right choice for pod-scale training where parameters
live sharded across hosts).

Select with ``trainer.ckpt_format: pickle | orbax`` (default pickle).
``load_ckpt`` auto-detects the format. The Orbax layout stores the
flattened leaves in ``<path>.orbax/`` and the (pickled) treedef in the
main file, so registered dataclass pytrees (TriangleParams etc.) restore
with their types intact.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


def _host(blob):
    return jax.tree_util.tree_map(
        lambda x: None if x is None else np.asarray(x), blob)


def save_ckpt(path, blob: dict, fmt: str = "pickle") -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = _host(blob)
    if fmt == "orbax":
        import orbax.checkpoint as ocp
        leaves, treedef = jax.tree_util.tree_flatten(blob)
        leaves = [np.asarray(leaf) for leaf in leaves]
        # orbax refuses zero-size arrays (e.g. f_rest at sh degree 0);
        # record their shape/dtype in the sidecar and placeholder them
        empty = {i: (leaf.shape, leaf.dtype.str) for i, leaf in
                 enumerate(leaves) if leaf.size == 0}
        leaves = [np.zeros(1, np.int8) if i in empty else leaf
                  for i, leaf in enumerate(leaves)]
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path.resolve().parent / (path.name + ".orbax"),
                   leaves, force=True)
        with open(path, "wb") as f:
            pickle.dump({"__orbax__": True, "treedef": treedef,
                         "empty": empty}, f)
        return
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_ckpt(path) -> dict:
    path = Path(path)
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if isinstance(blob, dict) and blob.get("__orbax__"):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        leaves = ckptr.restore(path.resolve().parent / (path.name + ".orbax"))
        leaves = [np.zeros(blob["empty"][i][0],
                           np.dtype(blob["empty"][i][1]))
                  if i in blob["empty"] else leaf
                  for i, leaf in enumerate(leaves)]
        return jax.tree_util.tree_unflatten(blob["treedef"], leaves)
    return blob
