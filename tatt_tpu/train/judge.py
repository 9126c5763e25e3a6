"""Eval judges — the reference's ``test_bible`` (``super_resolution.py:485-513``).

A judge is (jitted forward, host decode) for one of CRNN / ASTER / MORAN,
applied to SR, LR, and HR images during eval.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.core.charset import AsterInfo, ctc_greedy_decode, decode_aster_ids


def make_judge(
    test_model: str,
    variables,
    voc_type: str = "all",
    width: int = 100,
    crnn_model=None,
) -> Callable[[jnp.ndarray], list[str]]:
    """Returns ``judge(images_nchw_rgb01) -> list[str]``.

    ``crnn_model``: optional CRNN instance matching non-default-width
    weights (e.g. the in-repo-pretrained fixture judge)."""
    if test_model == "CRNN":
        from tatt_tpu.models.recognizers.crnn import CRNN, parse_crnn_input

        model = crnn_model if crnn_model is not None else CRNN()

        @jax.jit
        def fwd(v, images):
            return model.apply(v, parse_crnn_input(images[:, :3], width))

        def judge(images):
            return ctc_greedy_decode(np.asarray(fwd(variables, images)))

        return judge

    if test_model == "ASTER":
        from tatt_tpu.models.recognizers.aster import (
            AsterRecognizer,
            parse_aster_input,
        )

        info = AsterInfo(voc_type)
        model = AsterRecognizer(num_classes=info.rec_num_classes, max_len=100)

        @jax.jit
        def fwd(v, images):
            preds, _scores = model.apply(v, parse_aster_input(images))
            return preds

        def judge(images):
            return decode_aster_ids(np.asarray(fwd(variables, images)), info)

        return judge

    if test_model == "MORAN":
        from tatt_tpu.models.recognizers.moran import (
            MORAN,
            decode_moran_ids,
            parse_moran_input,
        )

        model = MORAN()

        @jax.jit
        def fwd(v, images):
            l2r, _ = model.apply(v, parse_moran_input(images))
            return jnp.argmax(l2r, axis=-1)

        def judge(images):
            return decode_moran_ids(np.asarray(fwd(variables, images)))

        return judge

    raise ValueError(f"unknown test_model {test_model!r}")
