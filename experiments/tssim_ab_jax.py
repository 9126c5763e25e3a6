"""JAX arm of the rotate+tssim A/B: full-size TATT memorizing the shared
fixed batch on the real TPU.  Arms: +tssim / -tssim (both rotate 5°).

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/tssim_ab_jax.py [tssim|plain]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import jax.numpy as jnp
import numpy as np

from experiments.tssim_ab_common import EVAL_EVERY, ITERS, make_fixture, psnr_rgb
from tatt_tpu.models.recognizers.crnn import CRNN
from tatt_tpu.models.tsrn import TATT
from tatt_tpu.train.state import TrainState, make_optimizer
from tatt_tpu.train.steps import StepConfig, make_eval_step, make_train_step


def main(arm: str = "tssim", dtype: str = "bfloat16") -> None:
    if arm.endswith("-gather"):
        # bisect arm: torch-exact bilinear-gather rotation instead of the
        # 3-shear MXU decomposition
        import tatt_tpu.kernels.grid_sample as gs
        import tatt_tpu.train.steps as steps_mod

        orig = gs.rotate_batch
        forced = lambda img, arc, offs, off_range=0.2, method="gather": orig(
            img, arc, offs, off_range, method="gather"
        )
        gs.rotate_batch = forced
        steps_mod.rotate_batch = forced
        arm = arm[: -len("-gather")]
    data = np.load(make_fixture())
    batch = {
        "images_hr": jnp.asarray(data["images_hr"]),
        "images_lr": jnp.asarray(data["images_lr"]),
    }

    rng = jax.random.PRNGKey(0)
    sr_model = TATT(srb_nums=5, hidden_units=32, out_text_channels=64)
    crnn = CRNN()
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    sr_vars = sr_model.init(k1, x, t, train=True)
    stu_vars = crnn.init(k2, luma)
    teacher_vars = crnn.init(k3, luma)

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(variables, lr, prior, train=train, rngs=rngs, mutable=mutable)

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    state = TrainState.create(
        [sr_vars], [stu_vars], make_optimizer(1e-3, beta1=0.5)
    )
    cfg = StepConfig(
        tssim_loss=(arm == "tssim"),
        rotate_train=5.0,
        use_distill=True,
        gradient=True,
        compute_dtype=dtype,
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    eval_step = jax.jit(make_eval_step(sr_apply, crnn_apply))

    @jax.jit
    def train_mode_probe(state, batch):
        """SR forward in TRAIN mode (batch statistics, no stats update) on
        the original LR — isolates BN running-stats corruption: if this
        PSNR is healthy while eval_psnr is collapsed, the running stats
        (used only at eval) are the problem."""
        from tatt_tpu.models.recognizers.crnn import parse_crnn_input

        luma = parse_crnn_input(batch["images_lr"][:, :3])
        stu_vars = {
            "params": state.student_params[0],
            "batch_stats": state.student_batch_stats[0],
        }
        logits, _ = crnn_apply(stu_vars, luma, True, mutable=["batch_stats"])
        prior = jax.nn.softmax(logits, axis=-1).transpose(1, 2, 0)[:, :, None, :]
        sr_vars = {
            "params": state.sr_params[0],
            "batch_stats": state.sr_batch_stats[0],
        }
        (sr, _), _ = sr_apply(
            sr_vars, batch["images_lr"], prior, True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        return sr

    print(f"arm={arm} dtype={dtype} iters={ITERS}")
    metrics = None
    for it in range(ITERS + 1):
        if it % EVAL_EVERY == 0:
            sr, _ = eval_step(state, batch)
            p = psnr_rgb(np.asarray(sr), data["images_hr"])
            pt = psnr_rgb(
                np.asarray(train_mode_probe(state, batch)), data["images_hr"]
            )
            m = (
                {k: float(v) for k, v in metrics.items()} if metrics else {}
            )
            print(
                f"iter {it:4d} eval_psnr {p:6.2f} trainmode_psnr {pt:6.2f} "
                f"loss {m.get('loss_total', float('nan')):8.3f} "
                f"sr {m.get('loss_sr', float('nan')):7.3f} "
                f"tssim {m.get('loss_tssim', float('nan')):6.3f}",
                flush=True,
            )
        state, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(it))
    print("done")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "tssim",
        sys.argv[2] if len(sys.argv) > 2 else "bfloat16",
    )
