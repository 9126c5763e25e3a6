"""Fused bidirectional-LSTM recurrence as a Pallas TPU kernel.

Same design as :mod:`tatt_tpu.kernels.pallas_gru` (grid over row tiles x
time chunks, h/c carried in VMEM scratch, input projections precomputed by
XLA), for the CRNN / ASTER BiLSTM heads.  The forward emits both h and c
sequences so the backward pass can recompute the gates instead of
materializing them.  Gate order follows torch: i, f, g, o.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tatt_tpu.kernels.pallas_gru import _pick_tiles


def _lstm_fwd_kernel(w_ref, b_ref, gx_ref, hs_ref, cs_ref, h_ref, c_ref):
    t = pl.program_id(1)
    chunk = gx_ref.shape[0]
    hdim = h_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    for s in range(chunk):
        for d in range(2):
            h = h_ref[d]
            c = c_ref[d]
            g = (
                jnp.dot(w_ref[d], h, preferred_element_type=jnp.float32)
                + b_ref[d]
                + gx_ref[s, d]
            )  # [4H, R]
            i = jax.nn.sigmoid(g[0:hdim])
            f = jax.nn.sigmoid(g[hdim : 2 * hdim])
            gg = jnp.tanh(g[2 * hdim : 3 * hdim])
            o = jax.nn.sigmoid(g[3 * hdim : 4 * hdim])
            c_new = f * c + i * gg
            h_new = o * jnp.tanh(c_new)
            h_ref[d] = h_new
            c_ref[d] = c_new
            hs_ref[s, d] = h_new.astype(hs_ref.dtype)
            cs_ref[s, d] = c_new.astype(cs_ref.dtype)


def _lstm_bwd_kernel(
    w_ref, b_ref, gx_ref, hs_prev_ref, cs_prev_ref, cs_ref, dys_ref,
    dgx_ref, dw_ref, db_ref, dh_ref, dc_ref,
):
    rt = pl.program_id(0)
    i_chunk = pl.program_id(1)
    chunk = gx_ref.shape[0]
    hdim = dh_ref.shape[1]

    @pl.when(i_chunk == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    @pl.when((i_chunk == 0) & (rt == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    for s in range(chunk - 1, -1, -1):
        for d in range(2):
            h_prev = hs_prev_ref[s, d].astype(jnp.float32)
            c_prev = cs_prev_ref[s, d].astype(jnp.float32)
            c_t = cs_ref[s, d].astype(jnp.float32)
            g = (
                jnp.dot(w_ref[d], h_prev, preferred_element_type=jnp.float32)
                + b_ref[d]
                + gx_ref[s, d]
            )
            i = jax.nn.sigmoid(g[0:hdim])
            f = jax.nn.sigmoid(g[hdim : 2 * hdim])
            gg = jnp.tanh(g[2 * hdim : 3 * hdim])
            o = jax.nn.sigmoid(g[3 * hdim : 4 * hdim])
            tc = jnp.tanh(c_t)

            dh = dh_ref[d] + dys_ref[s, d].astype(jnp.float32)
            do = dh * tc * o * (1.0 - o)
            dc = dc_ref[d] + dh * o * (1.0 - tc * tc)
            di = dc * gg * i * (1.0 - i)
            dgg = dc * i * (1.0 - gg * gg)
            df = dc * c_prev * f * (1.0 - f)
            d_g = jnp.concatenate([di, df, dgg, do], axis=0)  # [4H, R]
            dgx_ref[s, d] = d_g.astype(dgx_ref.dtype)

            dw_ref[d] += jnp.dot(d_g, h_prev.T, preferred_element_type=jnp.float32)
            db_ref[d] += d_g.sum(axis=1, keepdims=True)

            dh_ref[d] = jnp.dot(
                w_ref[d].T, d_g, preferred_element_type=jnp.float32
            )
            dc_ref[d] = dc * f


def _fwd_call(gates_x, w_hh, b_hh, interpret):
    length, _, gdim, rows = gates_x.shape
    hdim = gdim // 4
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=False)
    return pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(rows // row_block, length // chunk),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, t: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, t: (0, 0, 0)),
            pl.BlockSpec((chunk, 2, gdim, row_block), lambda r, t: (t, 0, 0, r)),
        ],
        out_specs=[
            pl.BlockSpec((chunk, 2, hdim, row_block), lambda r, t: (t, 0, 0, r)),
            pl.BlockSpec((chunk, 2, hdim, row_block), lambda r, t: (t, 0, 0, r)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, 2, hdim, rows), gates_x.dtype),
            jax.ShapeDtypeStruct((length, 2, hdim, rows), gates_x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, hdim, row_block), jnp.float32),
            pltpu.VMEM((2, hdim, row_block), jnp.float32),
        ],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates_x)


def _bwd_call(w_hh, b_hh, gates_x, hs, cs, dys, interpret):
    length, _, gdim, rows = gates_x.shape
    hdim = gdim // 4
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=True)
    nchunks = length // chunk
    hs_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    cs_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    rev = lambda r, i: (nchunks - 1 - i, 0, 0, r)
    dgx, dw, db = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(rows // row_block, nchunks),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((chunk, 2, gdim, row_block), rev),
            pl.BlockSpec((chunk, 2, hdim, row_block), rev),
            pl.BlockSpec((chunk, 2, hdim, row_block), rev),
            pl.BlockSpec((chunk, 2, hdim, row_block), rev),
            pl.BlockSpec((chunk, 2, hdim, row_block), rev),
        ],
        out_specs=[
            pl.BlockSpec((chunk, 2, gdim, row_block), rev),
            pl.BlockSpec((2, gdim, hdim), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, 2, gdim, rows), gates_x.dtype),
            jax.ShapeDtypeStruct((2, gdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((2, gdim, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, hdim, row_block), jnp.float32),
            pltpu.VMEM((2, hdim, row_block), jnp.float32),
        ],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates_x, hs_prev, cs_prev, cs, dys)
    return dgx, dw, db.reshape(2, gdim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_recurrence(gates_x, w_hh, b_hh, interpret=False):
    """``gates_x``: [L, 2, 4H, R] -> hidden states [L, 2, H, R]."""
    hs, _cs = _fwd_call(gates_x, w_hh, b_hh, interpret)
    return hs


def _lstm_fwd(gates_x, w_hh, b_hh, interpret):
    hs, cs = _fwd_call(gates_x, w_hh, b_hh, interpret)
    return hs, (gates_x, w_hh, b_hh, hs, cs)


def _lstm_bwd(interpret, residuals, dys):
    gates_x, w_hh, b_hh, hs, cs = residuals
    dgx, dw, db = _bwd_call(w_hh, b_hh, gates_x, hs, cs, dys, interpret)
    return dgx, dw.astype(w_hh.dtype), db.astype(b_hh.dtype)


lstm_recurrence.defvjp(_lstm_fwd, _lstm_bwd)


def bilstm_pallas(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`tatt_tpu.kernels.rnn.bilstm_apply`."""
    rows, length, _ = x.shape
    dt = x.dtype
    xs = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)
    gates_x = (
        jnp.einsum("drli,dgi->ldgr", xs, w_ih.astype(dt))
        + b_ih.astype(dt)[None, :, :, None]
    )
    ys = lstm_recurrence(gates_x, w_hh.astype(dt), b_hh.astype(dt), interpret)
    fwd = ys[:, 0]
    bwd = jnp.flip(ys[:, 1], axis=0)
    out = jnp.concatenate([fwd, bwd], axis=1)
    return out.transpose(2, 0, 1)
