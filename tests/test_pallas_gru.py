"""Pallas fused GRU vs the lax.scan reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tatt_tpu.kernels.pallas_gru import bigru_pallas
from tatt_tpu.kernels.rnn import bigru_apply

RNG = np.random.default_rng(0)


def _params(in_f, hidden):
    w_ih = RNG.standard_normal((2, 3 * hidden, in_f)).astype(np.float32) * 0.2
    w_hh = RNG.standard_normal((2, 3 * hidden, hidden)).astype(np.float32) * 0.2
    b_ih = RNG.standard_normal((2, 3 * hidden)).astype(np.float32) * 0.1
    b_hh = RNG.standard_normal((2, 3 * hidden)).astype(np.float32) * 0.1
    return w_ih, w_hh, b_ih, b_hh


def test_pallas_gru_forward_matches_scan():
    rows, length, in_f, hidden = 8, 12, 16, 8
    x = RNG.standard_normal((rows, length, in_f)).astype(np.float32)
    params = _params(in_f, hidden)
    want = np.asarray(bigru_apply(jnp.asarray(x), *map(jnp.asarray, params)))
    got = np.asarray(
        bigru_pallas(jnp.asarray(x), *map(jnp.asarray, params), interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_pallas_gru_grad_matches_scan():
    rows, length, in_f, hidden = 4, 6, 8, 8
    x = RNG.standard_normal((rows, length, in_f)).astype(np.float32)
    w_ih, w_hh, b_ih, b_hh = map(jnp.asarray, _params(in_f, hidden))

    def loss_scan(x_, w_ih_, w_hh_, b_hh_):
        y = bigru_apply(x_, w_ih_, w_hh_, b_ih, b_hh_)
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    def loss_pallas(x_, w_ih_, w_hh_, b_hh_):
        y = bigru_pallas(x_, w_ih_, w_hh_, b_ih, b_hh_, interpret=True)
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    want = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), w_ih, w_hh, b_hh
    )
    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), w_ih, w_hh, b_hh
    )
    for g, w, name in zip(got, want, ("dx", "dw_ih", "dw_hh", "db_hh")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_pallas_lstm_forward_and_grad():
    from tatt_tpu.kernels.pallas_lstm import bilstm_pallas
    from tatt_tpu.kernels.rnn import bilstm_apply

    rows, length, in_f, hidden = 4, 6, 8, 8
    x = RNG.standard_normal((rows, length, in_f)).astype(np.float32)
    w_ih = RNG.standard_normal((2, 4 * hidden, in_f)).astype(np.float32) * 0.2
    w_hh = RNG.standard_normal((2, 4 * hidden, hidden)).astype(np.float32) * 0.2
    b_ih = RNG.standard_normal((2, 4 * hidden)).astype(np.float32) * 0.1
    b_hh = RNG.standard_normal((2, 4 * hidden)).astype(np.float32) * 0.1

    want = np.asarray(bilstm_apply(jnp.asarray(x), w_ih, w_hh, b_ih, b_hh))
    got = np.asarray(
        bilstm_pallas(jnp.asarray(x), w_ih, w_hh, b_ih, b_hh, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def loss_scan(x_, w_ih_, w_hh_, b_hh_):
        y = bilstm_apply(x_, w_ih_, w_hh_, b_ih, b_hh_)
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    def loss_pallas(x_, w_ih_, w_hh_, b_hh_):
        y = bilstm_pallas(x_, w_ih_, w_hh_, b_ih, b_hh_, interpret=True)
        return (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    want_g = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b_hh)
    )
    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(
        jnp.asarray(x), jnp.asarray(w_ih), jnp.asarray(w_hh), jnp.asarray(b_hh)
    )
    for g, w, name in zip(got_g, want_g, ("dx", "dw_ih", "dw_hh", "db_hh")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_pallas_gru_pre_projection_fold():
    """pre_kernel/pre_bias fold a 1x1 conv exactly: pallas(x, pre=P) ==
    scan(x @ P^T + pb) for values AND grads (GruBlock's conv1 fusion)."""
    rows, length, cin, cmid, hidden = 8, 12, 10, 6, 8
    x = jnp.asarray(RNG.standard_normal((rows, length, cin)).astype(np.float32))
    P = jnp.asarray(RNG.standard_normal((cmid, cin)).astype(np.float32) * 0.3)
    pb = jnp.asarray(RNG.standard_normal((cmid,)).astype(np.float32) * 0.1)
    w_ih, w_hh, b_ih, b_hh = map(jnp.asarray, _params(cmid, hidden))

    def loss_ref(x_, P_, pb_, w_ih_):
        y = bigru_apply(x_ @ P_.T + pb_, w_ih_, w_hh, b_ih, b_hh)
        return (y * jnp.sin(jnp.arange(y.size).reshape(y.shape))).sum()

    def loss_fused(x_, P_, pb_, w_ih_):
        y = bigru_pallas(
            x_, w_ih_, w_hh, b_ih, b_hh, interpret=True,
            pre_kernel=P_, pre_bias=pb_,
        )
        return (y * jnp.sin(jnp.arange(y.size).reshape(y.shape))).sum()

    want, want_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        x, P, pb, w_ih
    )
    got, got_g = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        x, P, pb, w_ih
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for g, w, name in zip(got_g, want_g, ("dx", "dP", "dpb", "dw_ih")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=1e-3, err_msg=name
        )


@pytest.mark.parametrize("scan_axis", [1, 2])
def test_pallas_gru_nhwc_scan_axis_matches_transposed(scan_axis):
    """The 4-D NHWC entry scanning axis 1 (H) or 2 (W) in place equals the
    classic transpose + [R, L, C] path, for values AND all grads — the
    relayout-free gru1 path (GruBlock scan="h")."""
    from tatt_tpu.kernels.pallas_gru import bigru_core_nhwc

    n, h, w, c, hidden = 2, 4, 6, 10, 8
    x4 = jnp.asarray(RNG.standard_normal((n, h, w, c)).astype(np.float32))
    w_ih, w_hh, b_ih, b_hh = map(jnp.asarray, _params(c, hidden))

    def loss_ref(x_, w_ih_, w_hh_, b_hh_):
        if scan_axis == 1:
            seq = x_.transpose(0, 2, 1, 3).reshape(n * w, h, c)
            y = bigru_apply(seq, w_ih_, w_hh_, b_ih, b_hh_)
            y = y.reshape(n, w, h, 2 * hidden).transpose(0, 2, 1, 3)
        else:
            seq = x_.reshape(n * h, w, c)
            y = bigru_apply(seq, w_ih_, w_hh_, b_ih, b_hh_)
            y = y.reshape(n, h, w, 2 * hidden)
        return y, (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    def loss_nhwc(x_, w_ih_, w_hh_, b_hh_):
        y = bigru_core_nhwc(
            x_, w_ih_, b_ih, w_hh_, b_hh_, scan_axis, True
        )
        return y, (y * jnp.cos(jnp.arange(y.size).reshape(y.shape))).sum()

    want_y, _ = loss_ref(x4, w_ih, w_hh, b_hh)
    got_y, _ = loss_nhwc(x4, w_ih, w_hh, b_hh)
    np.testing.assert_allclose(
        np.asarray(got_y), np.asarray(want_y), atol=1e-5, rtol=1e-4
    )

    want_g = jax.grad(lambda *a: loss_ref(*a)[1], argnums=(0, 1, 2, 3))(
        x4, w_ih, w_hh, b_hh
    )
    got_g = jax.grad(lambda *a: loss_nhwc(*a)[1], argnums=(0, 1, 2, 3))(
        x4, w_ih, w_hh, b_hh
    )
    for g, wt, name in zip(got_g, want_g, ("dx", "dw_ih", "dw_hh", "db_hh")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wt), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_grublock_nhwc_scan_h_matches_nchw():
    """GruBlock(scan="h") on NHWC == the NCHW transpose formulation with
    identical params (the RecurrentResidualBlock gru1 seam)."""
    from tatt_tpu.models.tsrn import GruBlock

    n, c, h, w = 2, 10, 4, 6
    x = jnp.asarray(RNG.standard_normal((n, c, h, w)).astype(np.float32))
    nchw = GruBlock(8, data_format="NCHW")
    nhwc = GruBlock(8, data_format="NHWC", scan="h")
    variables = nchw.init(jax.random.PRNGKey(3), x.transpose(0, 1, 3, 2))
    want = nchw.apply(variables, x.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
    got = nhwc.apply(variables, x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4
    )
