"""Gradient check for the STN/TPS path: d(loss)/d(ctrl points) through
our grid_sample (gather AND mxu variants) vs torch's grid_sample +
TPSSpatialTransformer on identical inputs.

The soak collapse reproduces with plain+STN (diag_recipe), so the
suspect set is: TPS solve, grid construction, grid_sample gradient
w.r.t. the grid.  This isolates all three numerically on CPU.

Run: JAX_PLATFORMS=cpu python experiments/stn_grad_check.py
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("OMP_NUM_THREADS", "1")

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

import jax
import jax.numpy as jnp
import torch

from tatt_tpu.kernels import grid_sample as gs
from tatt_tpu.models import stn as stn_mod


def main() -> None:
    rng = np.random.default_rng(0)
    n, c, h, w = 4, 4, 16, 64
    x = rng.standard_normal((n, c, h, w)).astype(np.float32)
    tgt = rng.standard_normal((n, c, h, w)).astype(np.float32)
    # control points near identity with a small random perturbation
    base = stn_mod.build_output_control_points(20, (0.01, 0.01)).astype(np.float32)
    ctrl = base[None] + rng.normal(0, 0.02, (n, 20, 2)).astype(np.float32)

    # --- torch reference ---------------------------------------------
    from model.tps_spatial_transformer import TPSSpatialTransformer

    tps_t = TPSSpatialTransformer(
        output_image_size=(h, w), num_control_points=20, margins=(0.05, 0.05)
    )
    xt = torch.from_numpy(x)
    ct = torch.from_numpy(ctrl).requires_grad_(True)
    yt, _ = tps_t(xt, ct)
    loss_t = ((yt - torch.from_numpy(tgt)) ** 2).mean()
    loss_t.backward()
    g_torch = ct.grad.numpy()
    y_torch = yt.detach().numpy()

    # --- ours, both samplers -----------------------------------------
    def loss_fn(ctrl_j, method):
        # replicate tps_transform but force the sampler
        inv_k, coord_repr = stn_mod.tps_matrices(h, w, 20, (0.05, 0.05))
        padded = jnp.concatenate([ctrl_j, jnp.zeros((n, 3, 2))], axis=1)
        mapping = jnp.einsum("ab,nbc->nac", jnp.asarray(inv_k), padded)
        source = jnp.einsum("ha,nac->nhc", jnp.asarray(coord_repr), mapping)
        grid = jnp.clip(source.reshape(n, h, w, 2), 0.0, 1.0) * 2.0 - 1.0
        y = gs.grid_sample(jnp.asarray(x), grid, method=method)
        return ((y - jnp.asarray(tgt)) ** 2).mean(), y

    for method in ("gather", "mxu"):
        (lv, y), g = jax.value_and_grad(
            lambda cj: loss_fn(cj, method), has_aux=True
        )(jnp.asarray(ctrl))
        y = np.asarray(y)
        g = np.asarray(g)
        print(
            f"{method:6s}: loss {float(lv):.6f} torch {float(loss_t):.6f} "
            f"| out maxdiff {np.abs(y - y_torch).max():.2e} "
            f"| grad maxdiff {np.abs(g - g_torch).max():.2e} "
            f"relmax {np.abs(g - g_torch).max() / (np.abs(g_torch).max() + 1e-12):.2e}"
        )

    # --- full STNHead + TPS gradient (our stn module end-to-end) -----
    head = stn_mod.STNHead()
    vars_ = head.init(jax.random.PRNGKey(0), jnp.asarray(x), True)

    def e2e(params):
        pts = head.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            jnp.asarray(x),
            True,
            mutable=["batch_stats"],
        )[0]
        y = stn_mod.tps_transform(jnp.asarray(x), pts, (h, w))
        return ((y - jnp.asarray(tgt)) ** 2).mean()

    g = jax.grad(e2e)(vars_["params"])
    norms = {
        k: float(
            sum(jnp.sum(v**2) for v in jax.tree_util.tree_leaves(sub)) ** 0.5
        )
        for k, sub in g.items()
    }
    print("e2e grad norms per submodule:", {k: round(v, 5) for k, v in norms.items()})


if __name__ == "__main__":
    main()
