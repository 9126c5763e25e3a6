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


def test_tpg_vgg_variant():
    import jax
    import jax.numpy as jnp

    m = TPGModel(num_class=37, feature_extraction="VGG", output_channel=64)
    x = jnp.zeros((2, 1, 32, 100))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape[1] == 2 and out.shape[2] == 37


def test_tpg_rcnn_variant():
    import jax
    import jax.numpy as jnp

    m = TPGModel(num_class=37, feature_extraction="RCNN", output_channel=32)
    x = jnp.zeros((2, 1, 32, 100))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape[1] == 2 and out.shape[2] == 37


def test_tpg_attn_head():
    import jax
    import jax.numpy as jnp
    import numpy as np

    m = TPGModel(
        num_class=38, feature_extraction="VGG", output_channel=64,
        prediction="Attn", hidden_size=32,
    )
    x = jnp.zeros((2, 1, 32, 100))
    text = jnp.zeros((2, 26), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, train=True, text=text)
    # teacher-forced train path
    out_tf, _ = m.apply(
        v, x, train=True, text=text, batch_max_length=25,
        mutable=["batch_stats"],
    )
    assert out_tf.shape == (26, 2, 38)
    # greedy eval path
    out_greedy = m.apply(v, x, train=False, batch_max_length=25)
    assert out_greedy.shape == (26, 2, 38)
    assert np.isfinite(np.asarray(out_greedy)).all()
