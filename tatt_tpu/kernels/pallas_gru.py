"""Fused bidirectional-GRU recurrence as a Pallas TPU kernel.

The XLA ``lax.scan`` formulation (kernels/rnn.py) pays ~20-30us of loop
and buffer bookkeeping per timestep — 50-100x the arithmetic of the tiny
per-step matmul — and the 10 GruBlocks dominate the TATT step.  This
kernel runs the whole recurrence in ONE pallas_call:

  - grid = (L,): TPU grid steps execute sequentially, so the hidden state
    lives in a VMEM scratch carried across steps; Pallas double-buffers
    the per-step gate blocks from HBM automatically.
  - both directions are stacked on a leading axis (inputs pre-flipped by
    the caller), so one kernel handles fwd+bwd halves.
  - layout is [L, 2, 3H, R] / [2, H, R]: rows R on lanes, gates on
    sublanes, so the per-step matmul is [3H, H] @ [H, R] on the MXU.

Training runs through a custom VJP whose backward is a second kernel
scanning time in reverse: it recomputes the gates from the saved hidden
states (one extra matmul) instead of materializing per-step activations,
accumulates dW_hh/db_hh in VMEM scratch, and emits per-step d(gates_x)
for XLA to turn into dW_ih / dx with one large matmul.

Input projections stay OUTSIDE the kernel — one big MXU matmul over all
timesteps is exactly what XLA is best at.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_fwd_kernel(w_ref, b_ref, gx_ref, ys_ref, h_ref):
    """One grid step = CHUNK timesteps.  w: [2, 3H, H]; b: [2, 3H, 1];
    gx block: [C, 2, 3H, R]; ys block: [C, 2, H, R]; h scratch: [2, H, R]."""
    t = pl.program_id(1)  # time-chunk index (fastest grid dim)
    chunk = gx_ref.shape[0]
    hdim = h_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    for s in range(chunk):
        for d in range(2):
            h = h_ref[d]  # [H, R]
            gh = (
                jnp.dot(w_ref[d], h, preferred_element_type=jnp.float32)
                + b_ref[d]
            )  # [3H, R]
            gx = gx_ref[s, d]  # [3H, R]
            xr, xz, xn = (
                gx[0:hdim],
                gx[hdim : 2 * hdim],
                gx[2 * hdim : 3 * hdim],
            )
            hr, hz, hn = (
                gh[0:hdim],
                gh[hdim : 2 * hdim],
                gh[2 * hdim : 3 * hdim],
            )
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            h_ref[d] = h_new
            ys_ref[s, d] = h_new.astype(ys_ref.dtype)


def _gru_bwd_kernel(
    w_ref, b_ref, gx_ref, ys_prev_ref, dys_ref, dgx_ref, dw_ref, db_ref,
    dh_ref,
):
    """Reverse-time grid step of CHUNK timesteps.  Grid index i maps to
    chunk (nchunks-1-i); within the chunk, time runs backwards.
    ``ys_prev`` is the hidden state sequence shifted by one (zeros at t=0,
    built by the caller), so no masking is needed.  dw/db accumulate
    across the whole grid in f32 output blocks."""
    rt = pl.program_id(0)
    i = pl.program_id(1)  # reversed time-chunk index (fastest grid dim)
    chunk = gx_ref.shape[0]
    hdim = dh_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when((i == 0) & (rt == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    for s in range(chunk - 1, -1, -1):
        for d in range(2):
            h_prev = ys_prev_ref[s, d].astype(jnp.float32)
            gh = (
                jnp.dot(w_ref[d], h_prev, preferred_element_type=jnp.float32)
                + b_ref[d]
            )
            gx = gx_ref[s, d]
            xr, xz, xn = gx[0:hdim], gx[hdim : 2 * hdim], gx[2 * hdim : 3 * hdim]
            hr, hz, hn = gh[0:hdim], gh[hdim : 2 * hdim], gh[2 * hdim : 3 * hdim]
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)

            dh = dh_ref[d] + dys_ref[s, d].astype(jnp.float32)
            dz = dh * (h_prev - n) * z * (1.0 - z)
            dn = dh * (1.0 - z) * (1.0 - n * n)
            dr = dn * hn * r * (1.0 - r)
            d_ghn = dn * r
            # hidden-gate grads: [dr, dz, dn*r]; input-gate grads differ in
            # the n slot (xn enters pre-tanh directly): [dr, dz, dn]
            d_gh = jnp.concatenate([dr, dz, d_ghn], axis=0)  # [3H, R]
            d_gx = jnp.concatenate([dr, dz, dn], axis=0)
            dgx_ref[s, d] = d_gx.astype(dgx_ref.dtype)

            dw_ref[d] += jnp.dot(
                d_gh, h_prev.T, preferred_element_type=jnp.float32
            )
            db_ref[d] += d_gh.sum(axis=1, keepdims=True)

            dh_prev = dh * z + jnp.dot(
                w_ref[d].T, d_gh, preferred_element_type=jnp.float32
            )
            dh_ref[d] = dh_prev


def _pick_tiles(length: int, gdim: int, rows: int, backward: bool):
    """(row_block, chunk): row tile <= 1024 lanes, then the largest time
    chunk whose double-buffered streamed blocks fit comfortably in VMEM."""
    row_block = rows
    for cand in (1024, 512, 256, 128):
        if rows > 1024 and rows % cand == 0:
            row_block = cand
            break
    hdim = gdim // 3
    # bytes streamed per chunk unit (x2 directions, f32):
    per_c = 2 * (gdim + hdim) * row_block * 4  # fwd: gx in + ys out
    if backward:
        per_c = 2 * (2 * gdim + 3 * hdim) * row_block * 4  # + dgx, ys_prev, dys
    budget = 5 * 1024 * 1024  # x2 double-buffering ~ 10MB, rest for scratch
    chunk = 1
    for c in range(1, length + 1):
        if length % c == 0 and c * per_c <= budget:
            chunk = c
    return row_block, chunk


def _fwd_call(gates_x: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
              interpret: bool) -> jnp.ndarray:
    length, _, gdim, rows = gates_x.shape
    hdim = gdim // 3
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=False)
    return pl.pallas_call(
        _gru_fwd_kernel,
        grid=(rows // row_block, length // chunk),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, t: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, t: (0, 0, 0)),
            pl.BlockSpec((chunk, 2, gdim, row_block), lambda r, t: (t, 0, 0, r)),
        ],
        out_specs=pl.BlockSpec(
            (chunk, 2, hdim, row_block), lambda r, t: (t, 0, 0, r)
        ),
        out_shape=jax.ShapeDtypeStruct((length, 2, hdim, rows), gates_x.dtype),
        scratch_shapes=[pltpu.VMEM((2, hdim, row_block), jnp.float32)],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates_x)


def _bwd_call(w_hh, b_hh, gates_x, ys, dys, interpret: bool):
    length, _, gdim, rows = gates_x.shape
    hdim = gdim // 3
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=True)
    nchunks = length // chunk
    # h_{t-1} sequence: zeros at t=0 (one XLA pad+slice, no kernel masking)
    ys_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    rev = lambda r, i: (nchunks - 1 - i, 0, 0, r)
    dgx, dw, db = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(rows // row_block, nchunks),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((chunk, 2, gdim, row_block), rev),
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
        scratch_shapes=[pltpu.VMEM((2, hdim, row_block), jnp.float32)],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates_x, ys_prev, dys)
    return dgx, dw, db.reshape(2, gdim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_recurrence(gates_x, w_hh, b_hh, interpret=False):
    """Bidirectional GRU recurrence.

    ``gates_x``: [L, 2, 3H, R] precomputed input projections (direction 1
    already time-flipped); ``w_hh``: [2, 3H, H]; ``b_hh``: [2, 3H].
    Returns hidden states [L, 2, H, R].
    """
    return _fwd_call(gates_x, w_hh, b_hh, interpret)


def _gru_fwd(gates_x, w_hh, b_hh, interpret):
    ys = _fwd_call(gates_x, w_hh, b_hh, interpret)
    return ys, (gates_x, w_hh, b_hh, ys)


def _gru_bwd(interpret, residuals, dys):
    gates_x, w_hh, b_hh, ys = residuals
    dgx, dw, db = _bwd_call(w_hh, b_hh, gates_x, ys, dys, interpret)
    return dgx, dw.astype(w_hh.dtype), db.astype(b_hh.dtype)


gru_recurrence.defvjp(_gru_fwd, _gru_bwd)


def bigru_pallas(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for :func:`tatt_tpu.kernels.rnn.bigru_apply` backed by the
    fused kernel.  ``x``: [R, L, In] -> [R, L, 2H]."""
    rows, length, _ = x.shape
    hdim = w_hh.shape[-1]
    dt = x.dtype

    xs = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)  # [2, R, L, In]
    # input projections for all steps in one MXU pass, emitted directly in
    # kernel layout [L, 2, 3H, R]
    gates_x = (
        jnp.einsum("drli,dgi->ldgr", xs, w_ih.astype(dt))
        + b_ih.astype(dt)[None, :, :, None]
    )
    ys = gru_recurrence(
        gates_x, w_hh.astype(dt), b_hh.astype(dt), interpret
    )  # [L, 2, H, R]
    fwd = ys[:, 0]  # [L, H, R]
    bwd = jnp.flip(ys[:, 1], axis=0)
    out = jnp.concatenate([fwd, bwd], axis=1)  # [L, 2H, R]
    return out.transpose(2, 0, 1)  # [R, L, 2H]
