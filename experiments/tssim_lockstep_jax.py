"""Lockstep arm of the rotate+tssim stall hunt: run OUR train step from
the torch arm's EXACT initial weights and rotation-angle sequence.

The torch reference arm (experiments/tssim_ab_torch.py, seed 0) converges
on the shared fixture; our bf16 arm stalls at ~11 dB.  This arm removes
two variables at once — parameter init and the rotation randomness — by
regenerating the torch init (same seeds, same construction order),
importing it through core/torch_import, and feeding the torch arm's
numpy rotation draws into the step via the rot_arc/rot_offs override.

  converges  -> the stall was init/rng, not the compute path
  stalls     -> compute-path divergence; bisect loss terms next

Run: python experiments/tssim_lockstep_jax.py [tssim|plain] [dtype] [rot_method]
"""

import math
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

WEIGHTS = "/tmp/tssim_lockstep_weights.npz"


def dump_torch_init() -> None:
    """Regenerate the torch arm's init exactly (same seeds + order)."""
    if os.path.exists(WEIGHTS):
        return
    import torch

    _tv = types.ModuleType("torchvision")
    _tr = types.ModuleType("torchvision.transforms")
    _tm = types.ModuleType("torchvision.models")
    _tr.ToTensor = object
    _tv.transforms = _tr
    _tv.models = _tm
    sys.modules.setdefault("torchvision", _tv)
    sys.modules.setdefault("torchvision.transforms", _tr)
    sys.modules.setdefault("torchvision.models", _tm)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from model.crnn.crnn import CRNN
    from model.tsrn import TSRN_TL_TRANS

    torch.manual_seed(0)
    np.random.seed(0)
    model = TSRN_TL_TRANS(
        scale_factor=2, width=128, height=32, STN=True, srb_nums=5,
        mask=True, hidden_units=32,
    )
    stu = CRNN(32, 1, 37, 256)
    tea = CRNN(32, 1, 37, 256)
    blobs = {}
    for tag, mod in (("model", model), ("stu", stu), ("tea", tea)):
        for k, v in mod.state_dict().items():
            blobs[f"{tag}::{k}"] = v.detach().numpy()
    np.savez(WEIGHTS, **blobs)
    print(f"dumped torch init -> {WEIGHTS}")


def load_sd(tag: str) -> dict:
    data = np.load(WEIGHTS)
    pre = f"{tag}::"
    return {k[len(pre):]: data[k] for k in data.files if k.startswith(pre)}


def main(arm="tssim", dtype="float32", rot_method=None) -> None:
    dump_torch_init()

    if rot_method:
        import tatt_tpu.kernels.grid_sample as gs
        import tatt_tpu.train.steps as steps_mod

        orig = gs.rotate_batch
        forced = lambda img, arc, offs, off_range=0.2, method=None: orig(
            img, arc, offs, off_range, method=rot_method
        )
        steps_mod.rotate_batch = forced

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    from experiments.tssim_ab_common import EVAL_EVERY, ITERS, make_fixture, psnr_rgb
    from tatt_tpu.core.torch_import import import_crnn, import_tatt
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer
    from tatt_tpu.train.steps import StepConfig, make_eval_step, make_train_step

    data = np.load(make_fixture())
    batch = {
        "images_hr": jnp.asarray(data["images_hr"]),
        "images_lr": jnp.asarray(data["images_lr"]),
    }
    b = int(batch["images_lr"].shape[0])

    # the torch arm's exact per-iter rotation draws (np.random seed 0,
    # consumed 2 draws of size b per iter in this order)
    np.random.seed(0)
    arcs, offs = [], []
    for _ in range(ITERS + 1):
        angle = np.random.rand(b) * 5.0 * 2 - 5.0
        arcs.append((angle / 180.0 * math.pi).astype(np.float32))
        offs.append(np.random.rand(b).astype(np.float32))

    # STN=True to match the torch arm (the round-1 A/B trained the jax
    # arm WITHOUT STN — not the reference recipe)
    sr_model = TATT(
        srb_nums=5, hidden_units=32, out_text_channels=64,
        query_gru_mode="reference", stn=True,
    )
    crnn = CRNN()
    sr_vars = import_tatt(load_sd("model"))
    stu_vars = import_crnn(load_sd("stu"))
    teacher_vars = import_crnn(load_sd("tea"))

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    state = TrainState.create(
        [sr_vars], [stu_vars], make_optimizer(1e-3, beta1=0.5)
    )
    cfg = StepConfig(
        tssim_loss=(arm == "tssim"),
        fused_tssim=os.environ.get("AB_FUSED", "0") == "1",
        rotate_train=5.0,
        use_distill=True,
        gradient=True,
        compute_dtype=dtype,
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    eval_step = jax.jit(make_eval_step(sr_apply, crnn_apply))

    print(f"lockstep arm={arm} dtype={dtype} rot={rot_method or 'auto'} iters={ITERS}")
    for it in range(ITERS + 1):
        if it % EVAL_EVERY == 0:
            sr, _ = eval_step(state, batch)
            p = psnr_rgb(np.asarray(sr), data["images_hr"])
            print(f"iter {it:4d} eval_psnr {p:6.2f}", flush=True)
        fed = dict(batch)
        fed["rot_arc"] = jnp.asarray(arcs[it])
        fed["rot_offs"] = jnp.asarray(offs[it])
        state, metrics = step(state, teacher_vars, fed, jax.random.PRNGKey(it))
        if it < 3 or it % 50 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(
                f"  step {it}: total {m.get('loss_total', 0):.3f} "
                f"sr {m.get('loss_sr', 0):.3f} "
                f"tssim {m.get('loss_tssim', 0):.3f} "
                f"distill {m.get('loss_distill', 0):.3f} "
                f"| sr_out mean {m.get('sr_mean', 0):.4f} "
                f"min {m.get('sr_min', 0):.3f} max {m.get('sr_max', 0):.3f} "
                f"grad_norm {m.get('grad_norm_sr', 0):.3f}",
                flush=True,
            )
            gn = sorted(
                ((k, v) for k, v in m.items() if k.startswith("gnorm/")),
                key=lambda kv: -kv[1],
            )
            print(
                "    " + " ".join(f"{k[6:]}={v:.1f}" for k, v in gn[:8]),
                flush=True,
            )
    print("done")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "tssim",
        sys.argv[2] if len(sys.argv) > 2 else "float32",
        sys.argv[3] if len(sys.argv) > 3 else None,
    )
