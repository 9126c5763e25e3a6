"""Localize the TPS forward mismatch vs torch: compare (a) the solved
source coordinates, (b) grid_sample outputs on IDENTICAL grids.

Run: JAX_PLATFORMS=cpu python experiments/tps_grid_diff.py
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

_tv = types.ModuleType("torchvision")
_tr = types.ModuleType("torchvision.transforms")
_tm = types.ModuleType("torchvision.models")
_tr.ToTensor = object
_tv.transforms = _tr
_tv.models = _tm
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tr)
sys.modules.setdefault("torchvision.models", _tm)

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tatt_tpu.kernels import grid_sample as gs
from tatt_tpu.models import stn as stn_mod


def main() -> None:
    rng = np.random.default_rng(0)
    n, c, h, w = 2, 4, 16, 64
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    base = stn_mod.build_output_control_points(20, (0.01, 0.01)).astype(np.float32)
    ctrl = base[None] + rng.normal(0, 0.02, (n, 20, 2)).astype(np.float32)

    from model.tps_spatial_transformer import TPSSpatialTransformer

    tps_t = TPSSpatialTransformer(
        output_image_size=(h, w), num_control_points=20, margins=(0.05, 0.05)
    )
    with torch.no_grad():
        Y = torch.cat(
            [torch.from_numpy(ctrl), tps_t.padding_matrix.expand(n, 3, 2)], 1
        )
        mapping_t = torch.matmul(tps_t.inverse_kernel, Y)
        source_t = torch.matmul(tps_t.target_coordinate_repr, mapping_t).numpy()

    inv_k, coord_repr = stn_mod.tps_matrices(h, w, 20, (0.05, 0.05))
    padded = np.concatenate([ctrl, np.zeros((n, 3, 2), np.float32)], axis=1)
    mapping_j = np.einsum("ab,nbc->nac", inv_k, padded)
    source_j = np.einsum("ha,nac->nhc", coord_repr, mapping_j)

    print("inverse_kernel maxdiff:", np.abs(inv_k - tps_t.inverse_kernel.numpy()).max())
    print(
        "coord_repr maxdiff:",
        np.abs(coord_repr - tps_t.target_coordinate_repr.numpy()).max(),
    )
    print("source_coord maxdiff:", np.abs(source_j - source_t).max())

    # same grid through both samplers
    grid_np = np.clip(source_t.reshape(n, h, w, 2), 0.0, 1.0) * 2.0 - 1.0
    y_torch = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid_np)
    ).numpy()
    y_gather = np.asarray(
        gs.grid_sample(jnp.asarray(x), jnp.asarray(grid_np), method="gather")
    )
    y_torch_ac = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid_np), align_corners=True
    ).numpy()
    print("same-grid sample maxdiff (ours-vs-torch acF):", np.abs(y_gather - y_torch).max())
    print("same-grid sample maxdiff (ours-vs-torch acT):", np.abs(y_gather - y_torch_ac).max())


if __name__ == "__main__":
    main()
