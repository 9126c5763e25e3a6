import random

import numpy as np
from PIL import Image

from tatt_tpu.data.degradation import blur_ensemble, manmade_degradation


def test_manmade_degradation_shape_and_range():
    rng = random.Random(0)
    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 128, 3)) * 255).astype(np.uint8)
    )
    out = manmade_degradation(img, rng)
    assert out.size == img.size
    arr = np.asarray(out)
    assert arr.dtype == np.uint8


def test_blur_ensemble_runs():
    rng = random.Random(1)
    img = Image.fromarray(
        (np.random.default_rng(1).random((16, 64, 3)) * 255).astype(np.uint8)
    )
    out = blur_ensemble(img, rng, p=1.0)  # force every augmenter
    assert out.size == img.size
