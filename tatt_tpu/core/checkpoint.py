"""Checkpointing.

Reference behavior (``interfaces/base.py:621-672``): per-model
``model_best_acc_<i>.pth`` on new best sum-accuracy, ``checkpoint.pth``
every saveInterval, students saved beside as
``recognizer_best_acc_<i>.pth``; optimizer state NOT saved (a gap we fix —
SURVEY §5.4).  Here a checkpoint is one msgpack file holding the whole
``TrainState`` (params + batch stats + optimizer) plus an info dict.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

from tatt_tpu.train.state import TrainState


def save_checkpoint(
    path: str,
    state: TrainState,
    info: Optional[dict] = None,
    best_history: Optional[dict] = None,
    converge: Optional[list] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # host-side copy (works for sharded arrays too)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    payload = {
        "state": serialization.to_state_dict(host_state),
        "info": info or {},
        "best_history_res": best_history or {},
        # convergence history embedded like the reference
        # (super_resolution.py:1169-1172); msgpack needs plain types
        "converge": _plain(converge or []),
    }
    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(_to_serializable, payload)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)


def restore_checkpoint(path: str, state: TrainState) -> tuple[TrainState, dict]:
    """Restore into the structure of ``state``; returns (state, info).

    Extras (``best_history_res``, ``converge``) ride along inside the
    returned info dict under ``_best_history`` / ``_converge``."""
    with open(path, "rb") as fh:
        payload = serialization.msgpack_restore(fh.read())
    restored = serialization.from_state_dict(state, payload["state"])
    info = dict(payload.get("info", {}))
    info["_best_history"] = payload.get("best_history_res", {})
    info["_converge"] = payload.get("converge", [])
    return restored, info


def _plain(x: Any) -> Any:
    """Recursively convert to msgpack-safe plain Python types."""
    if isinstance(x, dict):
        return {k: _plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_plain(v) for v in x]
    if isinstance(x, np.generic):
        return x.item()
    return x


def _to_serializable(x: Any) -> Any:
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x)
    return x


def latest_checkpoint(ckpt_dir: str, prefix: str = "checkpoint") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = [
        f for f in os.listdir(ckpt_dir) if f.startswith(prefix) and f.endswith(".ckpt")
    ]
    if not candidates:
        return None
    return os.path.join(ckpt_dir, sorted(candidates)[-1])
