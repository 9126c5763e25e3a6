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


def save_variables_npz(path: str, variables: dict, **metadata) -> None:
    """Save a flax variables dict (``{"params": ..., "batch_stats": ...}``)
    as a flat ``.npz`` — the interchange format for standalone weight
    assets (pretrained recognizers, judge weights).  Keys are '/'-joined
    paths; scalar ``metadata`` entries ride along under ``__meta_<k>``."""
    flat = {}

    def _walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    _walk(variables, "")
    for k, v in metadata.items():
        flat[f"__meta_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **flat)
    os.replace(tmp, path)


def load_variables_npz(path: str) -> tuple[dict, dict]:
    """Inverse of :func:`save_variables_npz`; returns (variables, metadata)."""
    data = np.load(path)
    variables: dict = {}
    metadata: dict = {}
    for key in data.files:
        if key.startswith("__meta_"):
            v = data[key]
            metadata[key[len("__meta_") :]] = v.item() if v.ndim == 0 else v
            continue
        node = variables
        *parts, leaf = key.split("/")
        for part in parts:
            node = node.setdefault(part, {})
        node[leaf] = data[key]
    return variables, metadata


def is_torch_checkpoint(path: str) -> bool:
    """True for reference-format ``.pth`` files: torch>=1.6 zip archives
    or legacy pickle streams (protocol byte ``0x80``).  Our ``.ckpt``
    msgpack payloads start with a msgpack map byte, never either."""
    import zipfile

    if zipfile.is_zipfile(path):
        return True
    with open(path, "rb") as fh:
        return fh.read(1) == b"\x80"


def resolve_resume_path(path: str) -> str:
    """``--resume`` accepts a file OR a run directory, like the reference
    (``interfaces/base.py:398-443``: a dir selects ``model_best_acc_
    <iter>.pth``).  A dir prefers our native checkpoints, then falls back
    to reference-style ``.pth`` names by highest numeric suffix."""
    if not os.path.isdir(path):
        return path
    names = set(os.listdir(path))
    for pick in ("model_best_acc_0.ckpt", "checkpoint.ckpt"):
        if pick in names:
            return os.path.join(path, pick)
    best = [
        f
        for f in names
        if f.startswith("model_best_acc_") and f.endswith(".pth")
    ]
    if best:
        # the reference names these per MODEL-COPY index i (it loads
        # model_best_acc_<i>.pth into model_list[i], base.py:403-423);
        # copy 0 is the canonical first model.  Trainer._resume_torch
        # picks up the per-i siblings for stu_iter>1 runs.
        def _num(f: str) -> int:
            try:
                return int(f[len("model_best_acc_") : -len(".pth")])
            except ValueError:
                return 1 << 30

        return os.path.join(path, min(best, key=_num))
    if "checkpoint.pth" in names:
        return os.path.join(path, "checkpoint.pth")
    raise FileNotFoundError(f"no checkpoint found under {path}")


def merge_variables(dst: dict, src: dict, report: dict, prefix: str = "") -> dict:
    """Non-strict state-dict merge (the reference loads ``strict=False``,
    ``base.py:421``): leaves present in both with matching shapes come
    from ``src``; ``dst``-only leaves keep their current values (counted
    in ``report['missing']``); ``src``-only entries are recorded in
    ``report['unexpected']``; shape conflicts in ``report['mismatched']``."""
    import jax.numpy as jnp

    out: dict = {}
    for k, v in dst.items():
        kp = f"{prefix}{k}"
        s = src.get(k) if isinstance(src, dict) else None
        if isinstance(v, dict):
            out[k] = merge_variables(
                v, s if isinstance(s, dict) else {}, report, kp + "/"
            )
        elif s is None or isinstance(s, dict):
            report["missing"] = report.get("missing", 0) + 1
            out[k] = v
        elif tuple(np.shape(s)) != tuple(np.shape(v)):
            report.setdefault("mismatched", []).append(
                (kp, tuple(np.shape(s)), tuple(np.shape(v)))
            )
            out[k] = v
        else:
            out[k] = jnp.asarray(np.asarray(s), dtype=getattr(v, "dtype", None))
    if isinstance(src, dict):
        for k in src:
            if k not in dst:
                report.setdefault("unexpected", []).append(f"{prefix}{k}")
    return out


def latest_checkpoint(ckpt_dir: str, prefix: str = "checkpoint") -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    candidates = [
        f for f in os.listdir(ckpt_dir) if f.startswith(prefix) and f.endswith(".ckpt")
    ]
    if not candidates:
        return None
    return os.path.join(ckpt_dir, sorted(candidates)[-1])
