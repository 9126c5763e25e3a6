"""NCHW <-> NHWC equivalence of the layout-switchable blocks.

The NHWC trunks (TATT/TSRN/CRNN, round 3) must be bit-for-bit the same
computation as the NCHW formulation — same params (OIHW kernels), same
outputs to fp rounding.  These tests pin each switchable block directly,
independent of the end-to-end torch-parity suites."""

import numpy as np
import pytest


def _rand(shape, seed=0):
    import jax.numpy as jnp

    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_conv2d_formats_match():
    import jax

    from tatt_tpu.models.common import Conv2d

    x = _rand((2, 6, 8, 12))
    m_nchw = Conv2d(10, (3, 3), padding=(1, 1))
    m_nhwc = Conv2d(10, (3, 3), padding=(1, 1), data_format="NHWC")
    params = m_nchw.init(jax.random.PRNGKey(0), x)
    y1 = m_nchw.apply(params, x)
    y2 = m_nhwc.apply(params, x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5, rtol=1e-5)


def test_lane_packed_conv_formats_match():
    import jax

    from tatt_tpu.models.common import Conv2d

    x = _rand((2, 16, 8, 16))
    m_nchw = Conv2d(4, (9, 9), padding=(4, 4), lane_pack=4)
    m_nhwc = Conv2d(4, (9, 9), padding=(4, 4), lane_pack=4, data_format="NHWC")
    params = m_nchw.init(jax.random.PRNGKey(0), x)
    y1 = m_nchw.apply(params, x)
    y2 = m_nhwc.apply(params, x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("copies", [1, 2])
def test_batchnorm_formats_match(copies):
    import jax

    from tatt_tpu.models.common import BatchNorm2d

    x = _rand((4, 6, 5, 7), seed=1) * 3.0 + 0.5
    m1 = BatchNorm2d(copies=copies)
    m2 = BatchNorm2d(copies=copies, data_format="NHWC")
    v1 = m1.init(jax.random.PRNGKey(0), x, True)
    y1, mut1 = m1.apply(v1, x, True, mutable=["batch_stats"])
    y2, mut2 = m2.apply(
        v1, x.transpose(0, 2, 3, 1), True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2.transpose(0, 3, 1, 2)), atol=1e-5, rtol=1e-5
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut1["batch_stats"][k]),
            np.asarray(mut2["batch_stats"][k]),
            atol=1e-5,
            rtol=1e-5,
        )


def test_pixel_shuffle_nhwc_torch_order():
    from tatt_tpu.models.common import pixel_shuffle, pixel_shuffle_nhwc

    x = _rand((2, 16, 3, 5), seed=2)
    y1 = pixel_shuffle(x, 2)
    y2 = pixel_shuffle_nhwc(x.transpose(0, 2, 3, 1), 2).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=0, rtol=0)


def test_gru_block_formats_match():
    import jax

    from tatt_tpu.models.tsrn import GruBlock

    x = _rand((2, 8, 4, 6), seed=3)
    m1 = GruBlock(8)
    m2 = GruBlock(8, data_format="NHWC")
    params = m1.init(jax.random.PRNGKey(0), x)
    y1 = m1.apply(params, x)
    y2 = m2.apply(params, x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5, rtol=1e-5)


def test_srb_tl_formats_match():
    import jax

    from tatt_tpu.models.tsrn import RecurrentResidualBlockTL

    x = _rand((2, 8, 4, 6), seed=4)
    tp = _rand((2, 8, 4, 6), seed=5)
    m1 = RecurrentResidualBlockTL(8, 8)
    m2 = RecurrentResidualBlockTL(8, 8, data_format="NHWC")
    params = m1.init(jax.random.PRNGKey(0), x, tp, True)
    y1, _ = m1.apply(params, x, tp, True, mutable=["batch_stats"])
    y2, _ = m2.apply(
        params,
        x.transpose(0, 2, 3, 1),
        tp.transpose(0, 2, 3, 1),
        True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2.transpose(0, 3, 1, 2)), atol=1e-5, rtol=1e-5
    )
