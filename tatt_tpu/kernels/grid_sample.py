"""Bilinear grid sampling and affine grids.

XLA has no ``grid_sample`` primitive; the reference depends on torch's for
TPS rectification (``model/tps_spatial_transformer.py:10-17,104-113``),
batched rotation augmentation (``interfaces/super_resolution.py:154-155``),
and MORAN's offset-grid rectifier (``model/moran/morn.py``).  This module
provides an XLA formulation (vectorized 4-tap gather with zero padding,
torch ``align_corners=False`` semantics — the torch 1.8 default the
reference runs under).  For the small feature maps involved (≤ 32×128)
the gather lowers well; a Pallas kernel is kept as an optimization hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(
    x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """``x``: [N, C, H, W]; ``grid``: [N, Ho, Wo, 2] with (x, y) in [-1, 1].

    Zero padding outside the image, matching torch's default
    ``padding_mode='zeros'``.
    """
    n, c, h, w = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    tx = ix - ix0
    ty = iy - iy0

    def gather(py, px):
        """Gather x[:, :, py, px] with zero padding; py/px: [N, Ho, Wo]."""
        inb = (py >= 0) & (py < h) & (px >= 0) & (px < w)
        pyc = jnp.clip(py, 0, h - 1).astype(jnp.int32)
        pxc = jnp.clip(px, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(n, c, h * w)
        idx = (pyc * w + pxc).reshape(n, -1)  # [N, Ho*Wo]
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        vals = vals.reshape(n, c, *py.shape[1:])
        return vals * inb[:, None].astype(x.dtype)

    v00 = gather(iy0, ix0)
    v01 = gather(iy0, ix0 + 1)
    v10 = gather(iy0 + 1, ix0)
    v11 = gather(iy0 + 1, ix0 + 1)

    tx = tx[:, None].astype(x.dtype)
    ty = ty[:, None].astype(x.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def grid_sample_bilinear_mxu(
    x: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Exact bilinear grid sampling as two dense einsums (MXU) instead of
    a 4-tap gather (slow on TPU).  For every output pixel p the bilinear
    weight over input column xi is the tent ``max(0, 1-|ix_p - xi|)`` and
    separably over row yi — so

        tmp[n,c,p,yi] = sum_xi kx[n,p,xi] * x[n,c,yi,xi]
        out[n,c,p]    = sum_yi ky[n,p,yi] * tmp[n,c,p,yi]

    Taps outside the image contribute nothing, which is exactly torch's
    ``padding_mode='zeros'``; values match :func:`grid_sample_bilinear`
    to f32 rounding.  Cost is O(P*(W+H)) MACs per channel — ~1 GFLOP for
    the TPS warp at batch 128, trivially MXU-bound."""
    n, c, h, w = x.shape
    ho, wo = grid.shape[1], grid.shape[2]
    dt = x.dtype
    gx = grid[..., 0].reshape(n, ho * wo)
    gy = grid[..., 1].reshape(n, ho * wo)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
    xs = jnp.arange(w, dtype=ix.dtype)
    ys = jnp.arange(h, dtype=iy.dtype)
    kx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, :, None] - xs)).astype(dt)
    ky = jnp.maximum(0.0, 1.0 - jnp.abs(iy[:, :, None] - ys)).astype(dt)
    # batched GEMM over n: [C*H, W] @ [W, P]
    tmp = jnp.einsum("ncyx,npx->ncpy", x, kx)
    # row reduction as a VPU multiply-add — expressing this as an einsum
    # ("ncpy,npy->ncp") makes XLA lower n*p tiny matvecs
    out = (tmp * ky[:, None, :, :]).sum(axis=-1)
    return out.reshape(n, c, ho, wo)


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    method: str = "auto",
) -> jnp.ndarray:
    """Dispatching grid sample: 'gather' (4-tap), 'mxu' (einsum), or
    'auto' — einsum on accelerators, gather on CPU (where scalar gathers
    are cheap and the dense weights are not)."""
    if method == "auto":
        method = "gather" if jax.default_backend() == "cpu" else "mxu"
    if method == "mxu":
        return grid_sample_bilinear_mxu(x, grid, align_corners)
    return grid_sample_bilinear(x, grid, align_corners)


def affine_grid(
    theta: jnp.ndarray, size: tuple[int, int, int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Torch-compatible ``F.affine_grid``: ``theta`` [N, 2, 3] ->
    grid [N, H, W, 2] of (x, y) sampling locations in [-1, 1]."""
    n, _, h, w = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(1, h * w, 3)
    out = jnp.einsum(
        "nhk,nok->nho",
        jnp.broadcast_to(base, (n, h * w, 3)),
        theta,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(n, h, w, 2)


def _rotation_theta(arc, rand_offs, h, w, off_range=0.2):
    ratios = h / float(w)
    ratios_mul = ratios + (rand_offs * off_range * 2.0) - off_range
    cos, sin = jnp.cos(arc), jnp.sin(arc)
    return cos, sin * ratios_mul, -sin / ratios_mul, cos


def _shear_x(images: jnp.ndarray, coef: jnp.ndarray) -> jnp.ndarray:
    """x-shear resample: x_in = x_out + coef * y_out (normalized coords),
    as a per-row linear-interp matmul — the MXU replaces the gather."""
    n, c, h, w = images.shape
    dt = images.dtype
    y_norm = (2.0 * jnp.arange(h) + 1.0) / h - 1.0  # [H]
    shift = coef[:, None] * y_norm[None, :] * (w / 2.0)  # [N, H]
    jin = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    jout = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    d = jin - (jout + shift[:, :, None, None])
    wmat = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(dt)  # [N, H, Win, Wout]
    return jnp.einsum("bcyi,byio->bcyo", images, wmat)


def _shear_y(images: jnp.ndarray, coef: jnp.ndarray) -> jnp.ndarray:
    """y-shear resample: y_in = y_out + coef * x_out."""
    n, c, h, w = images.shape
    dt = images.dtype
    x_norm = (2.0 * jnp.arange(w) + 1.0) / w - 1.0  # [W]
    shift = coef[:, None] * x_norm[None, :] * (h / 2.0)  # [N, W]
    iin = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    iout = jnp.arange(h, dtype=jnp.float32)[None, None, None, :]
    d = iin - (iout + shift[:, :, None, None])
    wmat = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(dt)  # [N, W, Hin, Hout]
    return jnp.einsum("bciw,bwio->bcow", images, wmat)


def rotate_batch_shear(
    images: jnp.ndarray,
    arc: jnp.ndarray,
    rand_offs: jnp.ndarray,
    off_range: float = 0.2,
) -> jnp.ndarray:
    """Rotation aug as a 3-shear decomposition (x, y, x), each shear one
    dense einsum: gathers lower terribly on TPU (a 32x128 batch rotation
    costs ~12 ms via grid_sample vs <1 ms here).  The unit-determinant
    affine M = Shx(a) Shy(b) Shx(c) with b = r, a = c = (cos-1)/r (exact);
    composing three linear interps adds slightly more smoothing than one
    bilinear pass — an accepted deviation for the training augmentation.
    """
    n, c, h, w = images.shape
    p, q, r, s = _rotation_theta(arc, rand_offs, h, w, off_range)
    safe_r = jnp.where(jnp.abs(r) < 1e-6, 1.0, r)
    a = jnp.where(jnp.abs(r) < 1e-6, 0.0, (p - 1.0) / safe_r)
    b = r
    cc = jnp.where(jnp.abs(r) < 1e-6, 0.0, (s - 1.0) / safe_r)
    out = _shear_x(images, cc)
    out = _shear_y(out, b)
    return _shear_x(out, a)


def rotate_batch(
    images: jnp.ndarray,
    arc: jnp.ndarray,
    rand_offs: jnp.ndarray,
    off_range: float = 0.2,
    method: str = "auto",
) -> jnp.ndarray:
    """Batched rotation with aspect-ratio compensation — the reference's
    ``torch_rotate_img`` (``interfaces/super_resolution.py:126-157``).

    ``arc``: [N] angles in radians; ``rand_offs``: [N] uniforms in [0, 1).
    ``method``: 'gather' (torch-exact bilinear), 'shear' (MXU-friendly),
    or 'auto' (shear on accelerators, gather on CPU).
    """
    if method == "auto":
        import jax as _jax

        method = "gather" if _jax.default_backend() == "cpu" else "shear"
    if method == "shear":
        return rotate_batch_shear(images, arc, rand_offs, off_range)
    n, c, h, w = images.shape
    p, q, r, s = _rotation_theta(arc, rand_offs, h, w, off_range)
    zero = jnp.zeros_like(arc)
    theta = jnp.stack([p, q, zero, r, s, zero], axis=1).reshape(n, 2, 3)
    grid = affine_grid(theta, (n, c, h, w))
    return grid_sample_bilinear(images, grid)
