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


def test_han():
    from tatt_tpu.models.zoo.han import HAN

    model = HAN(n_resgroups=2, n_resblocks=2, n_feats=16)
    variables = model.init(RNG, X3)
    y = model.apply(variables, X3)
    assert y.shape == (2, 3, 32, 128)


def test_pcan_and_tl():
    from tatt_tpu.models.zoo.pcan import PCAN, PCAN_TL

    model = PCAN(srb_nums=2, hidden_units=8)
    variables = model.init(RNG, X4)
    assert model.apply(variables, X4).shape == (2, 4, 32, 128)

    model = PCAN_TL(srb_nums=2, hidden_units=8, out_text_channels=8)
    variables = model.init(RNG, X4, T)
    y, aux = model.apply(variables, X4, T)
    assert y.shape == (2, 4, 32, 128)


def test_tbsrn_and_tl():
    from tatt_tpu.models.zoo.tbsrn import TBSRN, TBSRN_TL

    model = TBSRN(srb_nums=1, hidden_units=32, mask=True)
    variables = model.init(RNG, X4)
    assert model.apply(variables, X4).shape == (2, 4, 32, 128)

    model = TBSRN_TL(srb_nums=1, hidden_units=32, mask=True, out_text_channels=8)
    variables = model.init(RNG, X4, T)
    y, aux = model.apply(variables, X4, T)
    assert y.shape == (2, 4, 32, 128)


def test_transr_v4():
    from tatt_tpu.models.zoo.transformer_sr import SRTransformerV4

    model = SRTransformerV4(t_encoder_num=1, t_decoder_num=1, d_model=1024)
    variables = model.init(RNG, X4, T)
    y, aux = model.apply(variables, X4, T)
    assert y.shape == (2, 4, 32, 128)
