"""Checkpointing with the reference's naming + best-only retention.

The reference keeps exactly one checkpoint, the best by val_loss_epoch, named
"model-{epoch:02d}-{val_loss:.2f}" which PL renders as
"model-epoch=XX-val_loss=Y.YY.ckpt" (base_model_tests/training.py:204-210);
eval CLIs later pick it up as the first entry of model_info/
(testing_script.py:11). We reproduce the filename scheme and single-file
format (flax msgpack), storing params (+ optional optimizer state for
resume) and metadata.
"""

from __future__ import annotations

import json
import os
from os.path import join
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_pure(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params,
    meta: Optional[dict] = None,
    opt_state=None,
) -> str:
    """Serialize params (+ optional opt_state) and JSON-able meta to `path`."""
    payload = {
        "params": serialization.to_state_dict(_to_pure(params)),
        "meta_json": json.dumps(meta or {}),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(_to_pure(opt_state))
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template=None, opt_state_template=None):
    """Restore a checkpoint. With templates, state-dicts are re-folded onto
    matching pytrees; otherwise raw nested dicts are returned.

    Returns (params, meta, opt_state-or-None).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload.get("meta_json", "{}"))
    params = payload["params"]
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    opt_state = payload.get("opt_state")
    if opt_state is not None and opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template, opt_state)
    return params, meta, opt_state


class BestCheckpointKeeper:
    """save_top_k=1 ModelCheckpoint on a min-monitored metric
    (training.py:204-210): keeps only the best epoch's file, named
    model-epoch=XX-val_loss=Y.YY.ckpt in `dirpath`."""

    def __init__(self, dirpath: str):
        self.dirpath = dirpath
        os.makedirs(dirpath, exist_ok=True)
        self.best_metric = float("inf")
        self.best_path: Optional[str] = None

    def update(self, epoch: int, val_loss: float, params, meta: Optional[dict] = None, opt_state=None) -> Optional[str]:
        """Save if this epoch improves the monitor; returns new path or None."""
        if val_loss >= self.best_metric:
            return None
        name = f"model-epoch={epoch:02d}-val_loss={val_loss:.2f}.ckpt"
        path = join(self.dirpath, name)
        full_meta = {"epoch": epoch, "val_loss": float(val_loss)}
        full_meta.update(meta or {})
        save_checkpoint(path, params, full_meta, opt_state=opt_state)
        if self.best_path and self.best_path != path and os.path.exists(self.best_path):
            os.remove(self.best_path)
        self.best_metric = float(val_loss)
        self.best_path = path
        return path


def find_checkpoint(model_info_dir: str) -> str:
    """First entry of a model_info/ dir — how the reference's testing fleet
    locates the best checkpoint (testing_script.py:11)."""
    entries = sorted(os.listdir(model_info_dir))
    if not entries:
        raise FileNotFoundError(f"no checkpoint in {model_info_dir}")
    return join(model_info_dir, entries[0])
