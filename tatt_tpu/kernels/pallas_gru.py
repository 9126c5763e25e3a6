"""Fused bidirectional-GRU recurrence as a Pallas TPU kernel.

The XLA ``lax.scan`` formulation (kernels/rnn.py) pays ~20-30us of loop
and buffer bookkeeping per timestep — 50-100x the arithmetic of the tiny
per-step matmul — and the 10 GruBlocks dominate the TATT step.  This
kernel runs the whole recurrence in ONE pallas_call:

  - grid = (row tiles, time chunks): TPU grid steps execute sequentially,
    so the hidden state lives in a VMEM scratch carried across steps;
    Pallas double-buffers the per-step gate blocks from HBM automatically.
  - both directions run in the same kernel.  Direction 1 (the backward
    scan) is handled by MIRRORED BLOCK INDEX MAPS: its gate blocks are
    read at time chunk ``nt-1-t`` and its outputs written there, with the
    in-chunk step order reversed.  Nothing is ever materialized
    time-flipped in HBM — the round-3 trace showed the caller-side
    ``stack([x, flip(x)])`` relayout costing ~1.1 ms/step across the 10
    GruBlocks, all of it pure data movement.
  - layout is [.., 3H, R] per (direction, time): rows R on lanes, gates
    on sublanes, so the per-step matmul is [3H, H] @ [H, R] on the MXU.

Training runs through a custom VJP whose backward is a second kernel
scanning each direction's time order in reverse: it recomputes the gates
from the saved hidden states (one extra matmul) instead of materializing
per-step activations, accumulates dW_hh/db_hh in VMEM scratch, and emits
per-step d(gates_x) from which the wrapper forms dx / dW with two large
matmuls (one per direction — no stacked [2,..] relayout).

Input projections stay OUTSIDE the kernel — one big MXU matmul over all
timesteps is exactly what XLA is best at.  ``compose_input_projection``
additionally folds a preceding 1x1 conv (GruBlock's ``conv1``,
``model/tsrn.py:1067-1084``) into that matmul: conv and projection are
adjacent linear maps with no nonlinearity between, so
``(x @ P^T) @ W_ih^T == x @ (W_ih P)^T`` exactly — one MXU pass instead
of two, no intermediate activation round-trip through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def compose_input_projection(w_ih, b_ih, pre_kernel=None, pre_bias=None):
    """Fold a preceding linear map ``y = x @ P^T + pb`` (a 1x1 conv with
    OI matrix ``P`` [Cmid, Cin]) into GRU/LSTM input projections.

    Returns effective ``(w [2, G, Cin], b [2, G])`` in the params' dtype
    (f32), computed once per step — the contraction is tiny relative to
    the activations it saves."""
    if pre_kernel is None:
        return w_ih, b_ih
    w_eff = jnp.einsum("dgm,mi->dgi", w_ih, pre_kernel)
    b_eff = b_ih
    if pre_bias is not None:
        b_eff = b_eff + jnp.einsum("dgm,m->dg", w_ih, pre_bias)
    return w_eff, b_eff


def _gru_fwd_kernel(w_ref, b_ref, gxf_ref, gxb_ref, ysf_ref, ysb_ref, h_ref):
    """One grid step = CHUNK timesteps of both directions.
    w: [2, 3H, H]; b: [2, 3H, 1]; gxf/gxb blocks: [1, C, 3H, R] (dir 0 at
    chunk t, dir 1 at chunk nt-1-t); ysf/ysb blocks: [C, H, R]; h scratch:
    [2, H, R].  Direction 1 walks its chunk back-to-front so its hidden
    state consumes inputs in descending time while every output lands at
    its forward-time slot."""
    t = pl.program_id(1)  # time-chunk index (fastest grid dim)
    chunk = gxf_ref.shape[1]
    hdim = h_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)

    for s in range(chunk):
        # direction 0: forward time
        h0 = h_ref[0]
        gh = (
            jnp.dot(w_ref[0], h0, preferred_element_type=jnp.float32)
            + b_ref[0]
        )
        h0_new = _gru_combine(gxf_ref[0, s], gh, h0, hdim)
        h_ref[0] = h0_new
        ysf_ref[s] = h0_new.astype(ysf_ref.dtype)
        # direction 1: descending time within the mirrored chunk
        s2 = chunk - 1 - s
        h1 = h_ref[1]
        gh = (
            jnp.dot(w_ref[1], h1, preferred_element_type=jnp.float32)
            + b_ref[1]
        )
        h1_new = _gru_combine(gxb_ref[0, s2], gh, h1, hdim)
        h_ref[1] = h1_new
        ysb_ref[s2] = h1_new.astype(ysb_ref.dtype)


def _gru_combine(gx, gh, h, hdim):
    xr, xz, xn = gx[0:hdim], gx[hdim : 2 * hdim], gx[2 * hdim : 3 * hdim]
    hr, hz, hn = gh[0:hdim], gh[hdim : 2 * hdim], gh[2 * hdim : 3 * hdim]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _gru_bwd_step(w_d, b_d, gx, h_prev, dh_in, hdim):
    """Shared backward cell: returns (d_gx, dh_prev, d_gh)."""
    gh = jnp.dot(w_d, h_prev, preferred_element_type=jnp.float32) + b_d
    xr, xz, xn = gx[0:hdim], gx[hdim : 2 * hdim], gx[2 * hdim : 3 * hdim]
    hr, hz, hn = gh[0:hdim], gh[hdim : 2 * hdim], gh[2 * hdim : 3 * hdim]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)

    dz = dh_in * (h_prev - n) * z * (1.0 - z)
    dn = dh_in * (1.0 - z) * (1.0 - n * n)
    dr = dn * hn * r * (1.0 - r)
    d_ghn = dn * r
    # hidden-gate grads: [dr, dz, dn*r]; input-gate grads differ in the n
    # slot (xn enters pre-tanh directly): [dr, dz, dn]
    d_gh = jnp.concatenate([dr, dz, d_ghn], axis=0)  # [3H, R]
    d_gx = jnp.concatenate([dr, dz, dn], axis=0)
    dh_prev = dh_in * z + jnp.dot(
        w_d.T, d_gh, preferred_element_type=jnp.float32
    )
    return d_gx, dh_prev, d_gh


def _gru_bwd_kernel(
    w_ref, b_ref, gxf_ref, gxb_ref, ysfA_ref, ysfB_ref, ysbA_ref, ysbB_ref,
    dyf_ref, dyb_ref,
    dgxf_ref, dgxb_ref, dw_ref, db_ref, dbx_ref, dh_ref,
):
    """Backward grid step of CHUNK timesteps, each direction walking its
    own processing order in reverse: dir 0 reads chunks ``nt-1-i`` with
    in-chunk time descending; dir 1 reads chunks ``i`` ascending.

    ``h_prev`` comes straight from the saved hidden-state sequences —
    nothing shifted is materialized in HBM: each direction streams its
    own ys block TWICE (A = the processing chunk, B = the time-adjacent
    chunk) and the one step per chunk that crosses the block boundary
    reads B; the direction's global seed step uses zeros.  dw/db (hidden
    side) and dbx (input-gate bias side, saving the caller's [L, 3H, R]
    reduction) accumulate across the whole grid in f32 output blocks."""
    rt = pl.program_id(0)
    i = pl.program_id(1)  # fastest grid dim
    nt = pl.num_programs(1)
    chunk = gxf_ref.shape[1]
    hdim = dh_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when((i == 0) & (rt == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbx_ref[...] = jnp.zeros_like(dbx_ref)

    for s in range(chunk):
        # direction 0: reverse of forward time; processing chunk nt-1-i.
        # h_prev for in-chunk step sd is ysf[sd-1]; sd == 0 crosses into
        # the previous chunk (ysfB, its last step), zeros at global t=0.
        sd = chunk - 1 - s
        if sd > 0:
            h_prev = ysfA_ref[sd - 1].astype(jnp.float32)
        else:
            h_prev = jnp.where(
                i == nt - 1,  # processing chunk 0: the seed chunk
                jnp.zeros((hdim, ysfA_ref.shape[2]), jnp.float32),
                ysfB_ref[chunk - 1].astype(jnp.float32),
            )
        dh_in = dh_ref[0] + dyf_ref[sd].astype(jnp.float32)
        d_gx, dh_prev, d_gh = _gru_bwd_step(
            w_ref[0], b_ref[0], gxf_ref[0, sd], h_prev, dh_in, hdim
        )
        dgxf_ref[sd] = d_gx.astype(dgxf_ref.dtype)
        dw_ref[0] += jnp.dot(
            d_gh, h_prev.T, preferred_element_type=jnp.float32
        )
        db_ref[0] += d_gh.sum(axis=1, keepdims=True)
        dbx_ref[0] += d_gx.sum(axis=1, keepdims=True)
        dh_ref[0] = dh_prev
        # direction 1: reverse of its descending-time processing order;
        # h_prev at step s is ysb[s+1]; s == chunk-1 crosses into the
        # NEXT chunk (ysbB, its first step), zeros at global t=L-1.
        if s < chunk - 1:
            h_prev = ysbA_ref[s + 1].astype(jnp.float32)
        else:
            h_prev = jnp.where(
                i == nt - 1,  # processing the last chunk: the seed chunk
                jnp.zeros((hdim, ysbA_ref.shape[2]), jnp.float32),
                ysbB_ref[0].astype(jnp.float32),
            )
        dh_in = dh_ref[1] + dyb_ref[s].astype(jnp.float32)
        d_gx, dh_prev, d_gh = _gru_bwd_step(
            w_ref[1], b_ref[1], gxb_ref[0, s], h_prev, dh_in, hdim
        )
        dgxb_ref[s] = d_gx.astype(dgxb_ref.dtype)
        dw_ref[1] += jnp.dot(
            d_gh, h_prev.T, preferred_element_type=jnp.float32
        )
        db_ref[1] += d_gh.sum(axis=1, keepdims=True)
        dbx_ref[1] += d_gx.sum(axis=1, keepdims=True)
        dh_ref[1] = dh_prev


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
        # per direction: gx in + dgx out (gdim each) + ysA/ysB/dy (hdim each)
        per_c = 2 * (2 * gdim + 3 * hdim) * row_block * 4
    budget = 5 * 1024 * 1024  # x2 double-buffering ~ 10MB, rest for scratch
    chunk = 1
    for c in range(1, length + 1):
        if length % c == 0 and c * per_c <= budget:
            chunk = c
    return row_block, chunk


def _fwd_call(gates: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
              interpret: bool):
    """gates: [2, L, 3H, R] in FORWARD time for both directions."""
    _, length, gdim, rows = gates.shape
    hdim = gdim // 3
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=False)
    nt = length // chunk
    ysf, ysb = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(rows // row_block, nt),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, t: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, t: (0, 0, 0)),
            pl.BlockSpec(
                (1, chunk, gdim, row_block), lambda r, t: (0, t, 0, r)
            ),
            pl.BlockSpec(
                (1, chunk, gdim, row_block),
                lambda r, t: (1, nt - 1 - t, 0, r),
            ),
        ],
        out_specs=[
            pl.BlockSpec((chunk, hdim, row_block), lambda r, t: (t, 0, r)),
            pl.BlockSpec(
                (chunk, hdim, row_block), lambda r, t: (nt - 1 - t, 0, r)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, hdim, rows), gates.dtype),
            jax.ShapeDtypeStruct((length, hdim, rows), gates.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((2, hdim, row_block), jnp.float32)],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates, gates)
    return ysf, ysb


def _bwd_call(w_hh, b_hh, gates, ysf, ysb, dyf, dyb, interpret: bool):
    _, length, gdim, rows = gates.shape
    hdim = gdim // 3
    row_block, chunk = _pick_tiles(length, gdim, rows, backward=True)
    nt = length // chunk
    fwd_t = lambda r, i: (nt - 1 - i, 0, r)  # dir-0 refs: reverse order
    bwd_t = lambda r, i: (i, 0, r)  # dir-1 refs: forward order
    # the time-adjacent chunk each direction's boundary step reads from
    # (clamped at the direction's seed chunk, where the kernel uses zeros)
    fwd_prev = lambda r, i: (jnp.maximum(nt - 2 - i, 0), 0, r)
    bwd_next = lambda r, i: (jnp.minimum(i + 1, nt - 1), 0, r)
    dgxf, dgxb, dw, db, dbx = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(rows // row_block, nt),
        in_specs=[
            pl.BlockSpec((2, gdim, hdim), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
            pl.BlockSpec(
                (1, chunk, gdim, row_block),
                lambda r, i: (0, nt - 1 - i, 0, r),
            ),
            pl.BlockSpec(
                (1, chunk, gdim, row_block), lambda r, i: (1, i, 0, r)
            ),
            pl.BlockSpec((chunk, hdim, row_block), fwd_t),
            pl.BlockSpec((chunk, hdim, row_block), fwd_prev),
            pl.BlockSpec((chunk, hdim, row_block), bwd_t),
            pl.BlockSpec((chunk, hdim, row_block), bwd_next),
            pl.BlockSpec((chunk, hdim, row_block), fwd_t),
            pl.BlockSpec((chunk, hdim, row_block), bwd_t),
        ],
        out_specs=[
            pl.BlockSpec((chunk, gdim, row_block), fwd_t),
            pl.BlockSpec((chunk, gdim, row_block), bwd_t),
            pl.BlockSpec((2, gdim, hdim), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
            pl.BlockSpec((2, gdim, 1), lambda r, i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((length, gdim, rows), gates.dtype),
            jax.ShapeDtypeStruct((length, gdim, rows), gates.dtype),
            jax.ShapeDtypeStruct((2, gdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((2, gdim, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, gdim, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, hdim, row_block), jnp.float32)],
        interpret=interpret,
    )(w_hh, b_hh.reshape(2, gdim, 1), gates, gates, ysf, ysf, ysb, ysb,
      dyf, dyb)
    return dgxf, dgxb, dw, db.reshape(2, gdim), dbx.reshape(2, gdim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def bigru_core(x, w_eff, b_eff, w_hh, b_hh, interpret=False):
    """Bidirectional GRU over ``x`` [R, L, In] with pre-composed input
    projections ``w_eff`` [2, 3H, In] / ``b_eff`` [2, 3H].  Returns
    [R, L, 2H]."""
    out, _ = _core_fwd_impl(x, w_eff, b_eff, w_hh, b_hh, interpret)
    return out


def _core_fwd_impl(x, w_eff, b_eff, w_hh, b_hh, interpret):
    dt = x.dtype
    # one MXU pass for all timesteps of BOTH directions, no flipped copy
    gates = (
        jnp.einsum("rli,dgi->dlgr", x, w_eff.astype(dt))
        + b_eff.astype(dt)[:, None, :, None]
    )  # [2, L, 3H, R]
    ysf, ysb = _fwd_call(gates, w_hh.astype(dt), b_hh.astype(dt), interpret)
    out = jnp.concatenate([ysf, ysb], axis=1)  # [L, 2H, R]
    out = out.transpose(2, 0, 1)  # [R, L, 2H]
    return out, (x, w_eff, b_eff, gates, ysf, ysb, w_hh, b_hh)


def _core_fwd(x, w_eff, b_eff, w_hh, b_hh, interpret):
    out, res = _core_fwd_impl(x, w_eff, b_eff, w_hh, b_hh, interpret)
    return out, res


def _core_bwd(interpret, res, dout):
    x, w_eff, b_eff, gates, ysf, ysb, w_hh, b_hh = res
    dt = gates.dtype
    hdim = w_hh.shape[-1]
    dys = dout.astype(dt).transpose(1, 2, 0)  # [L, 2H, R]
    dyf, dyb = dys[:, :hdim], dys[:, hdim:]
    dgxf, dgxb, dw_hh, db_hh, db_eff = _bwd_call(
        w_hh.astype(dt), b_hh.astype(dt), gates, ysf, ysb, dyf, dyb,
        interpret,
    )
    # input-projection backward per direction — two large matmuls, no
    # stacked [2, ...] dgx relayout in HBM.  Emitted [L, R, I] (the dot's
    # natural rhs-free-minor layout) then swapped on the major dims only,
    # which is tile-granular — asking for "rli" directly made XLA keep
    # dgx's r-minor layout through the add and pay a within-tile
    # relayout copy per GruBlock (~108us x10, round-3 trace).
    dx = jnp.einsum("lgr,gi->lri", dgxf, w_eff[0].astype(dt)) + jnp.einsum(
        "lgr,gi->lri", dgxb, w_eff[1].astype(dt)
    )
    dx = dx.transpose(1, 0, 2)
    dw_eff = jnp.stack(
        [
            jnp.einsum("lgr,rli->gi", dgxf, x),
            jnp.einsum("lgr,rli->gi", dgxb, x),
        ]
    )
    return (
        dx.astype(x.dtype),
        dw_eff.astype(w_eff.dtype),
        db_eff.astype(b_eff.dtype),
        dw_hh.astype(w_hh.dtype),
        db_hh.astype(b_hh.dtype),
    )


bigru_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# 4-D NHWC entry: scan a chosen spatial axis WITHOUT transposing the
# activation.  GruBlock's gru1 scans HEIGHT; the 3-D API forces the caller
# to relayout [N,H,W,C] -> [N,W,H,C] going in and back coming out (the
# round-4 trace priced those H<->W copies + the seam reshapes at
# ~2.4 ms/step across the 5 TL blocks, tsrn.py:71-130).  Here the gates
# projection einsum reads the NHWC tensor directly (contraction over C is
# layout-native) and emits straight into the kernel's [2, L, 3H, R]
# blocked layout — the only relayout left is the one the kernel's
# R-minor <-> C-minor boundary inherently requires, once on the way out.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bigru_core_nhwc(x4, w_eff, b_eff, w_hh, b_hh, scan_axis, interpret=False):
    """Bidirectional GRU over axis ``scan_axis`` (1=H or 2=W) of ``x4``
    [N, H, W, C], with pre-composed input projections ``w_eff``
    [2, 3H, C] / ``b_eff`` [2, 3H].  Returns [N, H, W, 2H] — the scanned
    axis keeps its place; no input transpose is ever materialized."""
    out, _ = _core4_fwd_impl(x4, w_eff, b_eff, w_hh, b_hh, scan_axis,
                             interpret)
    return out


def _core4_fwd_impl(x4, w_eff, b_eff, w_hh, b_hh, scan_axis, interpret):
    assert scan_axis in (1, 2), scan_axis
    n, h, w, _ = x4.shape
    dt = x4.dtype
    hdim = w_hh.shape[-1]
    if scan_axis == 2:  # scan width; rows = N*H
        gates = jnp.einsum("nhwc,dgc->dwgnh", x4, w_eff.astype(dt))
        length, rows = w, n * h
    else:  # scan height; rows = N*W
        gates = jnp.einsum("nhwc,dgc->dhgnw", x4, w_eff.astype(dt))
        length, rows = h, n * w
    gates = gates.reshape(2, length, 3 * hdim, rows) + b_eff.astype(dt)[
        :, None, :, None
    ]
    ysf, ysb = _fwd_call(gates, w_hh.astype(dt), b_hh.astype(dt), interpret)
    out = jnp.concatenate([ysf, ysb], axis=1)  # [L, 2H, R]
    if scan_axis == 2:
        out = out.reshape(w, 2 * hdim, n, h).transpose(2, 3, 0, 1)
    else:
        out = out.reshape(h, 2 * hdim, n, w).transpose(2, 0, 3, 1)
    return out, (x4, w_eff, b_eff, gates, ysf, ysb, w_hh, b_hh)


def _core4_fwd(x4, w_eff, b_eff, w_hh, b_hh, scan_axis, interpret):
    return _core4_fwd_impl(x4, w_eff, b_eff, w_hh, b_hh, scan_axis, interpret)


def _core4_bwd(scan_axis, interpret, res, dout):
    x4, w_eff, b_eff, gates, ysf, ysb, w_hh, b_hh = res
    dt = gates.dtype
    hdim = w_hh.shape[-1]
    n, h, w, _ = x4.shape
    if scan_axis == 2:
        dys = dout.astype(dt).transpose(2, 3, 0, 1).reshape(w, 2 * hdim, -1)
    else:
        dys = dout.astype(dt).transpose(1, 3, 0, 2).reshape(h, 2 * hdim, -1)
    dyf, dyb = dys[:, :hdim], dys[:, hdim:]
    dgxf, dgxb, dw_hh, db_hh, db_eff = _bwd_call(
        w_hh.astype(dt), b_hh.astype(dt), gates, ysf, ysb, dyf, dyb,
        interpret,
    )
    # dx in [L, R, C] (the dot's natural layout), then major-dims-only
    # swaps back to NHWC — tile-granular, same as the 3-D path
    dx = jnp.einsum("lgr,gc->lrc", dgxf, w_eff[0].astype(dt)) + jnp.einsum(
        "lgr,gc->lrc", dgxb, w_eff[1].astype(dt)
    )
    if scan_axis == 2:
        dx = dx.reshape(w, n, h, -1).transpose(1, 2, 0, 3)
        dgxf4 = dgxf.reshape(w, 3 * hdim, n, h)
        dgxb4 = dgxb.reshape(w, 3 * hdim, n, h)
        dw_eff = jnp.stack(
            [
                jnp.einsum("wgnh,nhwc->gc", dgxf4, x4),
                jnp.einsum("wgnh,nhwc->gc", dgxb4, x4),
            ]
        )
    else:
        dx = dx.reshape(h, n, w, -1).transpose(1, 0, 2, 3)
        dgxf4 = dgxf.reshape(h, 3 * hdim, n, w)
        dgxb4 = dgxb.reshape(h, 3 * hdim, n, w)
        dw_eff = jnp.stack(
            [
                jnp.einsum("hgnw,nhwc->gc", dgxf4, x4),
                jnp.einsum("hgnw,nhwc->gc", dgxb4, x4),
            ]
        )
    return (
        dx.astype(x4.dtype),
        dw_eff.astype(w_eff.dtype),
        db_eff.astype(b_eff.dtype),
        dw_hh.astype(w_hh.dtype),
        db_hh.astype(b_hh.dtype),
    )


bigru_core_nhwc.defvjp(_core4_fwd, _core4_bwd)


def bigru_pallas(
    x: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    interpret: bool = False,
    pre_kernel: jnp.ndarray | None = None,
    pre_bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in for :func:`tatt_tpu.kernels.rnn.bigru_apply` backed by the
    fused kernel.  ``x``: [R, L, In] -> [R, L, 2H].  ``pre_kernel`` /
    ``pre_bias`` fold a preceding 1x1 conv (``y = x @ pre_kernel^T +
    pre_bias``) into the input projection."""
    w_eff, b_eff = compose_input_projection(w_ih, b_ih, pre_kernel, pre_bias)
    return bigru_core(x, w_eff, b_eff, w_hh, b_hh, interpret)
