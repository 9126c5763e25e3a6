"""Per-loss-term gradient attribution for the tssim stall (lockstep
weights + rotation draws).  Each step computes THREE separate gradients
of the SR params — image term only, tssim term only, ssim-eval — prints
their norms, then applies the normal total update.

Run: TATT_PALLAS_GRU=0 python experiments/term_grads_jax.py [n_steps]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np

from experiments.tssim_lockstep_jax import dump_torch_init, load_sd


def main(n_steps: int = 4) -> None:
    dump_torch_init()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    from experiments.tssim_ab_common import make_fixture
    from tatt_tpu.core.torch_import import import_crnn, import_tatt
    from tatt_tpu.kernels.grid_sample import rotate_batch
    from tatt_tpu.losses.image import image_loss
    from tatt_tpu.losses.ssim import tri_ssim
    from tatt_tpu.models.recognizers.crnn import CRNN, parse_crnn_input
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer
    from tatt_tpu.train.steps import StepConfig, make_train_step

    data = np.load(make_fixture())
    images_hr0 = jnp.asarray(data["images_hr"])
    images_lr0 = jnp.asarray(data["images_lr"])
    b = int(images_lr0.shape[0])

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
        tssim_loss=True, rotate_train=5.0, use_distill=True, gradient=True,
        compute_dtype="float32",
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))

    def norm(tree):
        return jnp.sqrt(
            sum(
                jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree_util.tree_leaves(tree)
            )
        )

    @jax.jit
    def term_grads(state, batch):
        images_hr = batch["images_hr"]
        images_lr = batch["images_lr"]
        arc, offs = batch["rot_arc"], batch["rot_offs"]
        images_lr_r = rotate_batch(images_lr, arc, offs)
        images_hr_r = rotate_batch(images_hr, arc, offs)
        images_lr_ret = rotate_batch(images_lr_r, -arc, offs)

        lr_luma = parse_crnn_input(images_lr_r[:, :3])
        stu_v = {
            "params": state.student_params[0],
            "batch_stats": state.student_batch_stats[0],
        }
        logits, _ = crnn_apply(stu_v, lr_luma, True, mutable=["batch_stats"])
        prior = jax.lax.stop_gradient(
            jax.nn.softmax(logits, axis=-1).transpose(1, 2, 0)[:, :, None, :]
        )

        def forward(p, lr_in, key):
            (sr, _), _ = sr_apply(
                {"params": p, "batch_stats": state.sr_batch_stats[0]},
                lr_in, prior, True,
                rngs={"dropout": jax.random.PRNGKey(key)},
                mutable=["batch_stats"],
            )
            return sr

        def img_term(p):
            sr = forward(p, images_lr_r, 0)
            return image_loss(sr, images_hr_r, gradient=True).mean() * 100.0

        def tssim_term(p):
            sr = forward(p, images_lr_r, 0)
            sr_ret = forward(p, images_lr_ret, 100)
            sr_ret_rot = rotate_batch(sr_ret, arc, offs)
            return (1.0 - tri_ssim(sr_ret_rot, sr, images_hr_r)) * 10.0

        def mse_only(p):
            sr = forward(p, images_lr_r, 0)
            return ((sr - images_hr_r) ** 2).mean() * 100.0

        def tssim_sr_only(p):
            sr = forward(p, images_lr_r, 0)
            sr_ret = jax.lax.stop_gradient(forward(p, images_lr_ret, 100))
            sr_ret_rot = rotate_batch(sr_ret, arc, offs)
            return (1.0 - tri_ssim(sr_ret_rot, sr, images_hr_r)) * 10.0

        def tssim_ret_only(p):
            sr = jax.lax.stop_gradient(forward(p, images_lr_r, 0))
            sr_ret = forward(p, images_lr_ret, 100)
            sr_ret_rot = rotate_batch(sr_ret, arc, offs)
            return (1.0 - tri_ssim(sr_ret_rot, sr, images_hr_r)) * 10.0

        def mse_ret(p):
            # plain MSE backpropped ONLY through the sr_ret forward:
            # isolates "does the second forward's VJP explode for any loss"
            sr_ret = forward(p, images_lr_ret, 100)
            return ((sr_ret - images_hr_r) ** 2).mean() * 100.0

        p = state.sr_params[0]
        gi = jax.grad(img_term)(p)
        gt = jax.grad(tssim_term)(p)
        gm = jax.grad(mse_only)(p)
        gts = jax.grad(tssim_sr_only)(p)
        gtr = jax.grad(tssim_ret_only)(p)
        gmr = jax.grad(mse_ret)(p)
        out = {
            "img": norm(gi),
            "tssim": norm(gt),
            "mse_only": norm(gm),
            "tssim_via_sr": norm(gts),
            "tssim_via_ret": norm(gtr),
            "mse_via_ret": norm(gmr),
        }
        # per-layer gain profile of the two cotangent types through the
        # SAME forward (the ret branch)
        for key in gtr:
            out[f"T/{key}"] = norm(gtr[key])
            out[f"M/{key}"] = norm(gmr[key])
        return out

    np.random.seed(0)
    batch = {"images_hr": images_hr0, "images_lr": images_lr0}
    for it in range(n_steps):
        angle = np.random.rand(b) * 5.0 * 2 - 5.0
        fed = dict(batch)
        fed["rot_arc"] = jnp.asarray((angle / 180.0 * math.pi).astype(np.float32))
        fed["rot_offs"] = jnp.asarray(np.random.rand(b).astype(np.float32))
        tg = {k: float(v) for k, v in term_grads(state, fed).items()}
        print(
            f"step {it}: "
            + " ".join(
                f"{k}={v:.1f}" for k, v in tg.items() if "/" not in k
            ),
            flush=True,
        )
        layers = sorted({k[2:] for k in tg if k.startswith("T/")})
        print(
            "    ratio T/M: "
            + " ".join(
                f"{name}={tg['T/'+name]/max(tg['M/'+name],1e-9):.0f}"
                f"(T={tg['T/'+name]:.0f})"
                for name in layers
            ),
            flush=True,
        )

        # dump the raw tri_ssim input tensors for the cross-framework
        # input-gradient comparison (experiments/term_grads_torch.py)
        @jax.jit
        def dump_tensors(state, batch):
            images_hr = batch["images_hr"]
            images_lr = batch["images_lr"]
            arc, offs = batch["rot_arc"], batch["rot_offs"]
            images_lr_r = rotate_batch(images_lr, arc, offs)
            images_hr_r = rotate_batch(images_hr, arc, offs)
            images_lr_ret = rotate_batch(images_lr_r, -arc, offs)
            lr_luma = parse_crnn_input(images_lr_r[:, :3])
            stu_v = {
                "params": state.student_params[0],
                "batch_stats": state.student_batch_stats[0],
            }
            logits, _ = crnn_apply(stu_v, lr_luma, True, mutable=["batch_stats"])
            prior = jax.nn.softmax(logits, axis=-1).transpose(1, 2, 0)[:, :, None, :]

            def forward(lr_in, key):
                (sr, _), _ = sr_apply(
                    {"params": state.sr_params[0], "batch_stats": state.sr_batch_stats[0]},
                    lr_in, prior, True,
                    rngs={"dropout": jax.random.PRNGKey(key)},
                    mutable=["batch_stats"],
                )
                return sr

            sr = forward(images_lr_r, 0)
            sr_ret = forward(images_lr_ret, 100)
            sr_ret_rot = rotate_batch(sr_ret, arc, offs)
            return sr, sr_ret_rot, images_hr_r

        sr_d, srr_d, hr_d = dump_tensors(state, fed)
        np.savez(
            f"/tmp/tssim_tensors_step{it}.npz",
            sr=np.asarray(sr_d), sr_ret_rot=np.asarray(srr_d),
            hr=np.asarray(hr_d),
        )
        state, metrics = step(state, teacher_vars, fed, jax.random.PRNGKey(it))
    print("done")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
