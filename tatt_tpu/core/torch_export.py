"""Export tatt_tpu flax trees to reference-layout torch state dicts.

The inverse of :mod:`tatt_tpu.core.torch_import` for the modules a
downstream torch consumer would load: a recognizer trained on TPU here
(``tatt_tpu/train/pretrain.py``) can be handed back to the reference
stack as a ``crnn.pth``-shaped state dict (key names and tensor layouts
of ``model/crnn/crnn.py:29-92``).  numpy-only — the caller wraps values
in ``torch.from_numpy`` when materializing an ``nn.Module``.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_crnn(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Flax CRNN variables -> reference ``crnn.pth`` state dict.

    Layout notes (each the inverse of ``torch_import``): conv kernels are
    stored OIHW already (import keeps torch layout, ``torch_import._conv``);
    linear kernels transpose back; BiLSTM direction-0/1 stacks split into
    ``*_l0`` / ``*_l0_reverse``.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: dict[str, np.ndarray] = {}
    for i in range(7):
        conv = params[f"conv{i}"]
        sd[f"cnn.conv{i}.weight"] = _np(conv["kernel"])
        if "bias" in conv:
            sd[f"cnn.conv{i}.bias"] = _np(conv["bias"])
    for i in (2, 4, 6):
        bn_p = params[f"batchnorm{i}"]
        bn_s = stats[f"batchnorm{i}"]
        sd[f"cnn.batchnorm{i}.weight"] = _np(bn_p["scale"])
        sd[f"cnn.batchnorm{i}.bias"] = _np(bn_p["bias"])
        sd[f"cnn.batchnorm{i}.running_mean"] = _np(bn_s["mean"])
        sd[f"cnn.batchnorm{i}.running_var"] = _np(bn_s["var"])
        sd[f"cnn.batchnorm{i}.num_batches_tracked"] = np.asarray(0, np.int64)
    for j in (0, 1):
        rnn = params[f"rnn{j}"]["rnn"]
        for key, tname in (
            ("w_ih", "weight_ih_l0"),
            ("w_hh", "weight_hh_l0"),
            ("b_ih", "bias_ih_l0"),
            ("b_hh", "bias_hh_l0"),
        ):
            stacked = _np(rnn[key])
            sd[f"rnn.{j}.rnn.{tname}"] = stacked[0]
            sd[f"rnn.{j}.rnn.{tname}_reverse"] = stacked[1]
        emb = params[f"rnn{j}"]["embedding"]
        sd[f"rnn.{j}.embedding.weight"] = _np(emb["kernel"]).T
        sd[f"rnn.{j}.embedding.bias"] = _np(emb["bias"])
    return sd
