"""Stable on-disk format for weights-only agent snapshots.

Round-1 snapshots were raw pickles of nested variable trees — loadable only by this code.
Snapshots are now a single ``.npz`` (zip of raw ``.npy`` members, readable by any numpy —
or any zip tool — without importing this package): one member per leaf, named by the
"/"-joined tree path, e.g. ``denoiser/params/unet/d_blocks_0/resblocks_0/conv1/kernel``.

The trainer's full resume state (optimizers, counters, dataset metadata) remains an
internal pickle (``checkpoints/state.pt``); only the portable agent artifacts
(``checkpoints/agent_versions/*.npz``, reference: src/utils.py:209-230) use this format.
Legacy pickle snapshots from earlier runs still load (sniffed by file magic).
"""

from __future__ import annotations

import os
import pickle
import zipfile
from pathlib import Path
from typing import Any, Dict

import numpy as np

SEP = "/"


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split(SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_agent_snapshot(sd: Dict[str, Any], path: Path) -> None:
    """Atomic write (tmp + rename) of a nested variables tree as flat-keyed npz."""
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with tmp.open("wb") as f:
        np.savez(f, **flatten_tree(sd))
    os.replace(tmp, path)


def load_agent_snapshot(path: Path) -> Dict[str, Any]:
    """Load a snapshot: flat-keyed npz (stable format) or a legacy pickle."""
    path = Path(path)
    if zipfile.is_zipfile(path):
        with np.load(path) as z:
            return unflatten_tree({k: z[k] for k in z.files})
    with path.open("rb") as f:  # legacy raw-pickle snapshot
        return pickle.load(f)
