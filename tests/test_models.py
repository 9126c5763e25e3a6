"""Shape/smoke tests for the model zoo core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tatt_tpu.models.recognizers.crnn import CRNN, parse_crnn_input
from tatt_tpu.models.tsrn import TATT, TSRN, TSRN_TL


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_crnn_shapes(rng):
    model = CRNN()
    x = jnp.zeros((2, 1, 32, 100))
    variables = model.init(rng, x)
    logits = model.apply(variables, x)
    assert logits.shape == (26, 2, 37)


def test_parse_crnn_input():
    x = jnp.zeros((2, 4, 16, 64))
    y = parse_crnn_input(x)
    assert y.shape == (2, 1, 32, 100)


def test_tsrn_shapes(rng):
    model = TSRN(srb_nums=2, hidden_units=8)
    x = jnp.zeros((2, 4, 16, 64))
    variables = model.init(rng, x)
    y = model.apply(variables, x)
    assert y.shape == (2, 4, 32, 128)
    assert "batch_stats" in variables


def test_tsrn_tl_shapes(rng):
    model = TSRN_TL(srb_nums=2, hidden_units=8, out_text_channels=16)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    variables = model.init(rng, x, t)
    y, aux = model.apply(variables, x, t)
    assert y.shape == (2, 4, 32, 128)
    assert aux["trans_feat"].shape == (2, 16, 16, 64)


def test_tatt_shapes(rng):
    model = TATT(srb_nums=2, hidden_units=8, out_text_channels=16)
    x = jnp.zeros((2, 4, 16, 64))
    t = jax.nn.softmax(jnp.zeros((2, 37, 1, 26)), axis=1)
    variables = model.init(rng, x, t)
    y, aux = model.apply(variables, x, t)
    assert y.shape == (2, 4, 32, 128)
    assert aux["pr_weights"].shape == (2, 16 * 64, 26)
    assert aux["spatial_t_emb"].shape == (2, 16, 16, 64)


def test_tatt_train_mode_with_stn(rng):
    model = TATT(srb_nums=1, hidden_units=8, out_text_channels=16, stn=True)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    variables = model.init(rng, x, t, train=True)
    y, aux = model.apply(
        variables,
        x,
        t,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )[0]
    assert y.shape == (2, 4, 32, 128)


def test_tsrn_tl_sft(rng):
    from tatt_tpu.models.tsrn import TSRN_TL_SFT

    model = TSRN_TL_SFT(srb_nums=1, hidden_units=4, out_text_channels=8)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    variables = model.init(rng, x, t)
    y, aux = model.apply(variables, x, t)
    assert y.shape == (2, 4, 32, 128)


def test_tsrn_c2f(rng):
    from tatt_tpu.models.tsrn import TSRN_C2F

    model = TSRN_C2F(srb_nums=1, hidden_units=4)
    x = jnp.zeros((2, 4, 16, 64))
    variables = model.init(rng, x)
    y, coarse = model.apply(variables, x)
    assert y.shape == (2, 4, 32, 128)
    assert coarse.shape == (2, 4, 16, 64)


def test_sem_tsrn(rng):
    from tatt_tpu.models.tsrn import SEM_TSRN

    model = SEM_TSRN(srb_nums=1, hidden_units=4)
    x = jnp.zeros((2, 4, 16, 64))
    variables = model.init(rng, x)
    y, vecs = model.apply(variables, x)
    assert y.shape == (2, 4, 32, 128)
    assert len(vecs) == 1 and vecs[0].shape == (2, 300)
