import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.losses.perceptual import (
    LPIPS_TAPS,
    VGG16Features,
    generator_loss,
    lpips_vgg,
)


def _tiny_vgg_vars():
    model = VGG16Features()
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 128)))


def test_vgg_feature_taps():
    variables = _tiny_vgg_vars()
    feats = VGG16Features().apply(variables, jnp.zeros((1, 3, 32, 128)))
    for tap in LPIPS_TAPS:
        assert tap in feats
    assert feats[3].shape == (1, 64, 32, 128)
    assert feats[29].shape == (1, 512, 2, 8)


def test_generator_loss_and_lpips_run():
    variables = _tiny_vgg_vars()
    a = jnp.zeros((2, 4, 32, 128)) + 0.4
    b = jnp.zeros((2, 4, 32, 128)) + 0.6
    gl = float(generator_loss(variables, a, b))
    assert np.isfinite(gl) and gl > 0
    lins = [np.abs(np.random.default_rng(i).standard_normal(c)) for i, c in
            zip(range(5), (64, 128, 256, 512, 512))]
    d = lpips_vgg(variables, lins, a, b)
    assert d.shape == (2,)
    same = lpips_vgg(variables, lins, a, a)
    assert np.allclose(np.asarray(same), 0.0, atol=1e-6)
