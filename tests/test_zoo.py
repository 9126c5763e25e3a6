"""Shape smoke tests for the baseline SR zoo."""

import jax
import jax.numpy as jnp
import pytest

from tatt_tpu.models.zoo.esrgan import RRDBNet, RRDBNet_TL
from tatt_tpu.models.zoo.resnets import (
    EDSR,
    RDN,
    RDN_TL,
    LapSRN,
    SRResNet,
    SRResNet_TL,
)
from tatt_tpu.models.zoo.simple import (
    BICUBIC,
    SCGAN,
    SCGAN_TL,
    SRCNN,
    SRCNN_TL,
    VDSR,
    VDSR_TL,
)

RNG = jax.random.PRNGKey(0)
X3 = jnp.zeros((2, 3, 16, 64))
X4 = jnp.zeros((2, 4, 16, 64))
T = jnp.zeros((2, 37, 1, 26))


@pytest.mark.parametrize(
    "model,x",
    [
        (SRCNN(), X3),
        (VDSR(num_blocks=2), X3),
        (SCGAN(), X4),
        (SRResNet(mask=True), X4),
        (EDSR(num_blocks=2), X3),
        (LapSRN(), X3),
        (RDN(), X3),
        (RRDBNet(nb=2), X4),
        (BICUBIC(), X4),
    ],
)
def test_plain_models(model, x):
    variables = model.init(RNG, x)
    y = model.apply(variables, x)
    assert y.shape == (2, x.shape[1], 32, 128)


@pytest.mark.parametrize(
    "model",
    [
        SRCNN_TL(),
        VDSR_TL(num_blocks=2),
        SCGAN_TL(),
        SRResNet_TL(mask=True, out_text_channels=64),
        RDN_TL(),
        RRDBNet_TL(nb=2),
    ],
)
def test_tl_models(model):
    variables = model.init(RNG, X4, T)
    y, aux = model.apply(variables, X4, T)
    assert y.shape == (2, 4, 32, 128)
    assert "spatial_t_emb" in aux
