"""Bidirectional GRU / LSTM as TPU-friendly scans.

The reference leans on cuDNN RNNs everywhere hot:
  - ``GruBlock``: BiGRU over a spatial axis, 2x per SRB x 5 SRBs
    (``model/tsrn.py:1067-1084``)
  - ``InfoTransformer.gru_encoding``: BiGRU with 1024 features smoothing the
    query table across width (``model/transformer_v2.py:177,215-221``)
  - CRNN / ASTER BiLSTMs (``model/crnn/crnn.py:10``,
    ``model/recognizer/resnet_aster.py:87``)

TPU formulation: hoist every input projection into one large batched matmul
(MXU, all timesteps at once), then ``lax.scan`` the recurrence with a single
[rows, hidden] x [hidden, gates] matmul per step.  Both directions run in
the same scan — the reversed sequence is stacked on a leading direction
axis, so each step does one einsum over (direction, rows, hidden).

Parameters use torch's layout (``weight_ih_l0`` [3H, In], gate order r,z,n
for GRU and i,f,g,o for LSTM) so reference ``.pth`` checkpoints import
verbatim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.models.common import torch_conv_init


def _stack_bidir(x: jnp.ndarray) -> jnp.ndarray:
    """[R, L, C] -> [2, R, L, C] with the second copy time-reversed."""
    return jnp.stack([x, jnp.flip(x, axis=1)], axis=0)


def _unstack_bidir(y: jnp.ndarray) -> jnp.ndarray:
    """[2, R, L, H] -> [R, L, 2H]: forward output cat reversed-back backward."""
    fwd = y[0]
    bwd = jnp.flip(y[1], axis=1)
    return jnp.concatenate([fwd, bwd], axis=-1)


def bigru_apply(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    unroll: int = 2,
) -> jnp.ndarray:
    """Bidirectional GRU.

    ``x``: [R, L, In].  Weights carry a leading direction axis:
    ``w_ih`` [2, 3H, In], ``w_hh`` [2, 3H, H], biases [2, 3H].
    Returns [R, L, 2H].
    """
    rows, length, _ = x.shape
    hidden = w_hh.shape[-1]
    dt = x.dtype

    xs = _stack_bidir(x)  # [2, R, L, In]
    # All input projections in one MXU pass: [2, R, L, 3H]
    gates_x = (
        jnp.einsum("drli,dgi->drlg", xs, w_ih.astype(dt))
        + b_ih.astype(dt)[:, None, None, :]
    )
    gates_x = gates_x.transpose(2, 0, 1, 3)  # [L, 2, R, 3H] scan-major

    w_hh_t = w_hh.transpose(0, 2, 1).astype(dt)  # [2, H, 3H]
    b_hh_c = b_hh.astype(dt)[:, None, :]  # [2, 1, 3H]

    def step(h, gx):
        # h: [2, R, H]; gx: [2, R, 3H]
        gh = jnp.einsum("drh,dhg->drg", h, w_hh_t) + b_hh_c
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, rows, hidden), dt)
    _, ys = jax.lax.scan(step, h0, gates_x, unroll=unroll)
    # ys: [L, 2, R, H] -> [2, R, L, H]
    return _unstack_bidir(ys.transpose(1, 2, 0, 3))


def bilstm_apply(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    unroll: int = 2,
) -> jnp.ndarray:
    """Bidirectional LSTM; same conventions as :func:`bigru_apply` with
    4H gate rows in torch order (i, f, g, o)."""
    rows, length, _ = x.shape
    hidden = w_hh.shape[-1]
    dt = x.dtype

    xs = _stack_bidir(x)
    gates_x = (
        jnp.einsum("drli,dgi->drlg", xs, w_ih.astype(dt))
        + b_ih.astype(dt)[:, None, None, :]
    )
    gates_x = gates_x.transpose(2, 0, 1, 3)

    w_hh_t = w_hh.transpose(0, 2, 1).astype(dt)
    b_hh_c = b_hh.astype(dt)[:, None, :]

    def step(carry, gx):
        h, c = carry
        gh = jnp.einsum("drh,dhg->drg", h, w_hh_t) + b_hh_c
        g = gx + gh
        gi, gf, gg, go = jnp.split(g, 4, axis=-1)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        gg = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_new = f * c + i * gg
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((2, rows, hidden), dt)
    (_, _), ys = jax.lax.scan(step, (h0, h0), gates_x, unroll=unroll)
    return _unstack_bidir(ys.transpose(1, 2, 0, 3))


def gru_cell(
    x: jnp.ndarray,
    h: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
) -> jnp.ndarray:
    """One torch-semantics GRU step: ``x`` [B, In], ``h`` [B, H],
    ``w_ih`` [3H, In], ``w_hh`` [3H, H].  Used by the ASTER attention
    decoder (``model/recognizer/attention_recognition_head.py:248``)."""
    gx = x @ w_ih.T.astype(x.dtype) + b_ih.astype(x.dtype)
    gh = h @ w_hh.T.astype(x.dtype) + b_hh.astype(x.dtype)
    xr, xz, xn = jnp.split(gx, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _rnn_param_init(in_features: int, hidden: int):
    """Torch RNN init: every weight/bias ~ U(-1/sqrt(H), 1/sqrt(H))."""
    return torch_conv_init(hidden)


def _use_pallas_gru() -> bool:
    """Fused Pallas recurrence on TPU; lax.scan elsewhere (and under
    TATT_PALLAS_GRU=0)."""
    import os

    flag = os.environ.get("TATT_PALLAS_GRU", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class BiGRU(nn.Module):
    """Drop-in for ``nn.GRU(in, hidden, bidirectional=True)`` output[0].

    ``pre_kernel`` / ``pre_bias`` fold a preceding 1x1 conv
    (``y = x @ pre_kernel^T + pre_bias``, ``pre_kernel`` [Cmid, Cin]) into
    the input projection — adjacent linear maps compose exactly, and one
    MXU pass replaces conv + projection (GruBlock's ``conv1``,
    ``model/tsrn.py:1067-1084``).  The GRU's own ``w_ih`` keeps the
    checkpoint shape [2, 3H, Cmid]."""

    hidden: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pre_kernel: Optional[jnp.ndarray] = None,
        pre_bias: Optional[jnp.ndarray] = None,
        scan_axis: int = 2,
    ) -> jnp.ndarray:
        """``x`` [R, L, In] (3-D) or NHWC [N, H, W, In] (4-D).  For 4-D
        input, ``scan_axis`` picks the recurrence axis (1=H, 2=W) and no
        input transpose is materialized on the fused-kernel path — see
        ``pallas_gru.bigru_core_nhwc``.  Returns [R, L, 2H] or
        [N, H, W, 2H]."""
        in_f = x.shape[-1] if pre_kernel is None else pre_kernel.shape[0]
        init = _rnn_param_init(in_f, self.hidden)
        w_ih = self.param("w_ih", init, (2, 3 * self.hidden, in_f))
        w_hh = self.param("w_hh", init, (2, 3 * self.hidden, self.hidden))
        b_ih = self.param("b_ih", init, (2, 3 * self.hidden))
        b_hh = self.param("b_hh", init, (2, 3 * self.hidden))
        from tatt_tpu.kernels.pallas_gru import compose_input_projection

        w_eff, b_eff = compose_input_projection(
            w_ih, b_ih, pre_kernel, pre_bias
        )
        # The fused kernel lays rows on lanes and gates on sublanes; it
        # only pays off for many-row, small-hidden recurrences (the
        # GruBlocks).  Few-row / wide-hidden cases (the TP query GRU:
        # rows=1, H=512) pad catastrophically — keep those on the scan.
        if x.ndim == 4:
            n, h, w, _ = x.shape
            rows = n * w if scan_axis == 1 else n * h
            if _use_pallas_gru() and rows >= 128 and self.hidden <= 128:
                from tatt_tpu.kernels.pallas_gru import bigru_core_nhwc

                return bigru_core_nhwc(
                    x, w_eff, b_eff, w_hh, b_hh, scan_axis
                )
            # scan fallback (CPU, or small-rows/wide-hidden on TPU): the
            # classic transpose + sequence view — this branch DOES
            # materialize the H<->W transpose the NHWC entry avoids
            if scan_axis == 1:
                seq = x.transpose(0, 2, 1, 3).reshape(n * w, h, x.shape[-1])
                y = bigru_apply(seq, w_eff, w_hh, b_eff, b_hh)
                return y.reshape(n, w, h, 2 * self.hidden).transpose(
                    0, 2, 1, 3
                )
            seq = x.reshape(n * h, w, x.shape[-1])
            y = bigru_apply(seq, w_eff, w_hh, b_eff, b_hh)
            return y.reshape(n, h, w, 2 * self.hidden)
        rows = x.shape[0]
        if _use_pallas_gru() and rows >= 128 and self.hidden <= 128:
            from tatt_tpu.kernels.pallas_gru import bigru_core

            return bigru_core(x, w_eff, b_eff, w_hh, b_hh)
        return bigru_apply(x, w_eff, w_hh, b_eff, b_hh)


class BiLSTM(nn.Module):
    """Drop-in for ``nn.LSTM(in, hidden, bidirectional=True)`` output[0].
    ``num_layers`` stacks layers like torch (layer k>0 consumes 2H)."""

    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in range(self.num_layers):
            in_f = x.shape[-1]
            init = _rnn_param_init(in_f, self.hidden)
            suffix = f"_l{layer}" if self.num_layers > 1 else ""
            w_ih = self.param(f"w_ih{suffix}", init, (2, 4 * self.hidden, in_f))
            w_hh = self.param(
                f"w_hh{suffix}", init, (2, 4 * self.hidden, self.hidden)
            )
            b_ih = self.param(f"b_ih{suffix}", init, (2, 4 * self.hidden))
            b_hh = self.param(f"b_hh{suffix}", init, (2, 4 * self.hidden))
            if _use_pallas_gru() and x.shape[0] >= 64 and self.hidden <= 256:
                from tatt_tpu.kernels.pallas_lstm import bilstm_pallas

                x = bilstm_pallas(x, w_ih, w_hh, b_ih, b_hh)
            else:
                x = bilstm_apply(x, w_ih, w_hh, b_ih, b_hh)
        return x
