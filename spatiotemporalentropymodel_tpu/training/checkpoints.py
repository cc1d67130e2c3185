"""Checkpoint save/load/resume.

Parity: the reference saves torch dicts {epoch, iterations, state_dict,
optimizer, aux_optimizer, lr_scheduler} (trainSTEM.py:238-262) and resume
restores all of them (trainSTEM.py:134-143, train_stem_roi.py:141-166); its
CDF buffers need a shape-surgery dance on load (models/utils.py:46-109).

Here a checkpoint is one .npz-of-pytrees file: every leaf (params, both
optimizer states, codec tables, counters) is a NumPy array keyed by its tree
path, plus a pickled treedef — no shape surgery ever, atomic rename on save,
and best/latest bookkeeping like the reference's best-checkpoint copies.
"""

import gzip
import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree) -> Dict[str, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": pickle.dumps(treedef),
    }


def _unflatten(blob):
    treedef = pickle.loads(blob["treedef"])
    return jax.tree_util.tree_unflatten(treedef, list(blob["leaves"]))


def save_checkpoint(state: Dict[str, Any], path: str) -> None:
    """Atomically write a checkpoint dict (arbitrary pytrees as values)."""
    payload = {k: _flatten(v) for k, v in state.items()}
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    opener = gzip.open if path.endswith(".gz") else open
    try:
        os.close(fd)
        with opener(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Dict[str, Any]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        payload = pickle.load(f)
    return {k: _unflatten(v) for k, v in payload.items()}


class CheckpointManager:
    """latest/best rotation (trainSTEM.py:238-248 keeps a best copy)."""

    def __init__(self, directory: str, prefix: str = "ckpt"):
        self.directory = directory
        self.prefix = prefix
        os.makedirs(directory, exist_ok=True)
        self.best_metric = float("inf")

    @property
    def latest_path(self) -> str:
        return os.path.join(self.directory, f"{self.prefix}_latest.pkl")

    @property
    def best_path(self) -> str:
        return os.path.join(self.directory, f"{self.prefix}_best.pkl")

    def save(self, state: Dict[str, Any], metric: Optional[float] = None) -> bool:
        """Save latest; copy to best if metric improved. Returns is_best."""
        save_checkpoint(state, self.latest_path)
        if metric is not None and metric < self.best_metric:
            self.best_metric = metric
            save_checkpoint(state, self.best_path)
            return True
        return False

    def restore_latest(self) -> Optional[Dict[str, Any]]:
        if os.path.exists(self.latest_path):
            return load_checkpoint(self.latest_path)
        return None
