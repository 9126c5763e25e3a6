import jax
import jax.numpy as jnp

from tatt_tpu.models.recognizers.tpg import TPGModel, parse_opt_input


def test_tpg_ctc_shapes():
    model = TPGModel(num_class=37, output_channel=64)
    x = parse_opt_input(jnp.zeros((2, 3, 32, 128)))
    assert x.shape == (2, 1, 32, 512)
    # narrow test input for CPU speed
    x = jnp.zeros((2, 1, 32, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    # W: 64 -> 32 -> 16 -> 17 -> 18 -> 17  (pools + strided convs)
    assert logits.shape[1] == 2 and logits.shape[2] == 37


def test_tpg_bilstm_variant():
    model = TPGModel(num_class=37, output_channel=64, sequence_modeling="BiLSTM", hidden_size=16)
    x = jnp.zeros((2, 1, 32, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape[2] == 37
