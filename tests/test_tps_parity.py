"""TPS rectification parity vs the reference's precomputed-matrix method
(``model/tps_spatial_transformer.py``)."""

import itertools

import numpy as np
import torch
import torch.nn.functional as F

from tatt_tpu.models.stn import build_output_control_points, tps_transform


def _torch_tps(images, source_ctrl, out_hw, num_ctrl=20, margins=(0.05, 0.05)):
    """Reference TPS forward, reconstructed with torch ops."""
    th, tw = out_hw

    def partial_repr(a, b):
        diff = a.view(a.shape[0], 1, 2) - b.view(1, b.shape[0], 2)
        dist = (diff**2).sum(-1)
        rep = 0.5 * dist * torch.log(dist)
        rep[rep != rep] = 0
        return rep

    tcp = torch.from_numpy(
        build_output_control_points(num_ctrl, margins).astype(np.float32)
    )
    n = num_ctrl
    fk = torch.zeros(n + 3, n + 3)
    fk[:n, :n] = partial_repr(tcp, tcp)
    fk[:n, -3] = 1
    fk[-3, :n] = 1
    fk[:n, -2:] = tcp
    fk[-2:, :n] = tcp.t()
    inv = torch.inverse(fk)

    hw = th * tw
    coords = torch.tensor(
        list(itertools.product(range(th), range(tw))), dtype=torch.float32
    )
    y = coords[:, 0:1] / (th - 1)
    x = coords[:, 1:2] / (tw - 1)
    coord = torch.cat([x, y], dim=1)
    repr_mat = torch.cat(
        [partial_repr(coord, tcp), torch.ones(hw, 1), coord], dim=1
    )

    b = source_ctrl.shape[0]
    yy = torch.cat([source_ctrl, torch.zeros(b, 3, 2)], 1)
    mapping = torch.matmul(inv, yy)
    src_coord = torch.matmul(repr_mat, mapping)
    grid = src_coord.view(-1, th, tw, 2).clamp(0, 1) * 2 - 1
    return F.grid_sample(images, grid, align_corners=False)


def test_tps_solve_runs_at_full_precision():
    """The TPS solve einsums must carry explicit HIGHEST precision: the
    inverse kernel has entries up to ±87 that cancel down to [0, 1] grid
    coords, so the TPU's default bf16-multiply einsum produces grid errors
    of ~0.4 image widths (the round-4 soak collapse).  CPU runs are exact
    either way, so pin the precision attribute in the jaxpr instead."""
    import jax
    import jax.numpy as jnp

    images = jnp.zeros((2, 4, 16, 64), jnp.bfloat16)
    ctrl = jnp.zeros((2, 20, 2), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(lambda im, c: tps_transform(im, c, (16, 64)))(
        images, ctrl
    )
    dots = [
        e
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "dot_general"
        # the two solve contractions have the (N+3)-sized contracting dim
        and 23 in (e.invars[0].aval.shape + e.invars[1].aval.shape)
    ]
    assert len(dots) >= 2, "TPS solve einsums not found in jaxpr"
    for e in dots:
        assert e.params["precision"] == (
            jax.lax.Precision.HIGHEST,
            jax.lax.Precision.HIGHEST,
        ), f"TPS solve dot_general lost HIGHEST precision: {e.params}"
        for v in e.invars:
            assert v.aval.dtype == jnp.float32, "TPS solve must run in f32"


def test_tps_matches_reference():
    torch.set_num_threads(1)
    rng = np.random.default_rng(0)
    images = rng.random((2, 4, 16, 64)).astype(np.float32)
    # control points near the identity border grid with jitter
    base = build_output_control_points(20, (0.05, 0.05)).astype(np.float32)
    ctrl = base[None] + rng.normal(0, 0.02, (2, 20, 2)).astype(np.float32)

    want = _torch_tps(
        torch.from_numpy(images), torch.from_numpy(ctrl), (16, 64)
    ).numpy()
    got = np.asarray(tps_transform(images, ctrl, (16, 64)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_bf16_grid_error_bound():
    """The warp consumes the grid in the compute dtype (models/stn.py):
    quantizing the f32-solved grid to bf16 moves sampling positions by at
    most 2^-9 of the [-1, 1] range (~0.03 LR px) — quantify that this
    perturbs warped FIXTURE crops by under the images' own bf16
    quantization scale, unlike the solve-in-bf16 bug (grid errors up to
    0.4 image widths, round-4 soak collapse)."""
    import jax.numpy as jnp

    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.kernels.grid_sample import grid_sample
    from tatt_tpu.models.stn import build_output_control_points, tps_matrices

    ds = SyntheticTextDataset(n=4, seed=7)
    lr = np.stack(
        [np.asarray(ds[i][1], np.float32).transpose(2, 0, 1) for i in range(4)]
    ) / 255.0  # [4, 3, 16, 64]

    rng = np.random.default_rng(1)
    base = build_output_control_points(20, (0.05, 0.05)).astype(np.float32)
    ctrl = base[None] + rng.normal(0, 0.02, (4, 20, 2)).astype(np.float32)

    inv_k, coord_repr = tps_matrices(16, 64, 20, (0.05, 0.05))
    padded = np.concatenate([ctrl, np.zeros((4, 3, 2), np.float32)], axis=1)
    mapping = np.einsum("ab,nbc->nac", inv_k, padded)
    grid = np.einsum("ha,nac->nhc", coord_repr, mapping).reshape(4, 16, 64, 2)
    grid = np.clip(grid, 0.0, 1.0) * 2.0 - 1.0

    gb = np.asarray(jnp.asarray(grid, jnp.bfloat16), np.float32)
    # positional quantization: <= 2^-8 spacing over [-1, 1], i.e. at most
    # 2^-8 * W/2 = 1/8 px horizontally (1/32 px vertically)
    assert np.abs(gb - grid).max() <= 2.0**-8

    out_f32 = np.asarray(grid_sample(lr, grid, method="gather"))
    out_bf = np.asarray(grid_sample(lr, gb, method="gather"))
    # worst-case output perturbation = sharpest edge gradient x the 1/8 px
    # jitter (~0.06 on these crops); the solve-in-bf16 bug moved samples
    # ~0.4 image WIDTHS (~26 px), i.e. full-range errors everywhere.  The
    # jitter is also 6-13x under the fixture's own blur radius
    # (0.8-1.6 px) and the +-2 px TextZoom registration error.
    diff = np.abs(out_bf - out_f32)
    assert diff.max() < 0.1
    assert diff.mean() < 1e-3
