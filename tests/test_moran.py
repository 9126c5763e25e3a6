import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.models.recognizers.moran import (
    MORAN,
    decode_moran_ids,
    parse_moran_input,
)


def test_moran_eval_shapes():
    model = MORAN(num_classes=37, num_steps=20)
    x = parse_moran_input(jnp.ones((2, 3, 32, 128)) * 0.5)
    assert x.shape == (2, 1, 32, 100)
    variables = model.init(jax.random.PRNGKey(0), x)
    l2r, r2l = model.apply(variables, x)
    assert l2r.shape == (2, 20, 37) and r2l.shape == (2, 20, 37)
    assert np.isfinite(np.asarray(l2r)).all()


def test_decode_moran_ids():
    # '0..9a..z$': id 10 = 'a', id 36 = '$'
    ids = np.array([[10, 11, 36, 12], [36, 10, 10, 10]])
    assert decode_moran_ids(ids) == ["ab", ""]
