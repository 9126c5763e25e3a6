"""Import reference PyTorch ``.pth`` weights into tatt_tpu flax trees.

The pretrained recognizers are *inputs* to the system, not retrained
(reference ``README.md:28-35``: crnn.pth, ASTER, MORAN demo weights).
This module maps their state dicts onto our module trees.  torch (CPU)
is only imported lazily here — the training/runtime path never needs it.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if isinstance(blob, dict) and "state_dict_G" in blob:
        blob = blob["state_dict_G"]
    return {k.replace("module.", ""): _np(v) for k, v in blob.items()}


def _conv(sd: Mapping[str, np.ndarray], name: str, bias: bool = True) -> dict:
    out = {"kernel": sd[f"{name}.weight"]}
    if bias and f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _bn(sd: Mapping[str, np.ndarray], name: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _linear(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _birnn(sd: Mapping[str, np.ndarray], name: str) -> dict:
    return {
        "w_ih": np.stack(
            [sd[f"{name}.weight_ih_l0"], sd[f"{name}.weight_ih_l0_reverse"]]
        ),
        "w_hh": np.stack(
            [sd[f"{name}.weight_hh_l0"], sd[f"{name}.weight_hh_l0_reverse"]]
        ),
        "b_ih": np.stack(
            [sd[f"{name}.bias_ih_l0"], sd[f"{name}.bias_ih_l0_reverse"]]
        ),
        "b_hh": np.stack(
            [sd[f"{name}.bias_hh_l0"], sd[f"{name}.bias_hh_l0_reverse"]]
        ),
    }


def import_crnn(path_or_sd) -> dict:
    """Reference ``crnn.pth`` (``model/crnn/crnn.py``) -> flax variables
    for :class:`tatt_tpu.models.recognizers.crnn.CRNN`."""
    sd = (
        load_state_dict(path_or_sd) if isinstance(path_or_sd, str) else path_or_sd
    )
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i in range(7):
        params[f"conv{i}"] = _conv(sd, f"cnn.conv{i}")
    for i in (2, 4, 6):
        p, s = _bn(sd, f"cnn.batchnorm{i}")
        params[f"batchnorm{i}"] = p
        stats[f"batchnorm{i}"] = s
    for j in (0, 1):
        params[f"rnn{j}"] = {
            "rnn": _birnn(sd, f"rnn.{j}.rnn"),
            "embedding": _linear(sd, f"rnn.{j}.embedding"),
        }
    return {"params": params, "batch_stats": stats}
