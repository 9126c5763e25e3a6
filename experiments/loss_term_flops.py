"""Prove every loss term executes in the compiled train step: XLA cost
analysis of the jitted step with each term toggled — a disabled term must
DROP the compiled FLOPs (if a term were DCE'd, removing it would change
nothing).  Burns the round-1 BENCH_NOTES caveat.

Run: python experiments/loss_term_flops.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

from tatt_tpu.data.collate import collate
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.models.recognizers.crnn import CRNN
from tatt_tpu.models.tsrn import TATT
from tatt_tpu.train.observe import cost_analysis
from tatt_tpu.train.state import TrainState, make_optimizer
from tatt_tpu.train.steps import StepConfig, make_train_step

BATCH = 64


def main() -> None:
    rng = jax.random.PRNGKey(0)
    sr_model = TATT(srb_nums=5, hidden_units=32, out_text_channels=64, stn=True)
    crnn = CRNN()
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    k1, k2, k3 = jax.random.split(rng, 3)
    sr_vars = sr_model.init(k1, x, t, train=True)
    stu_vars = crnn.init(k2, luma)
    teacher_vars = crnn.init(k3, luma)

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    state = TrainState.create(
        [sr_vars], [stu_vars], make_optimizer(1e-3, beta1=0.5)
    )
    ds = SyntheticTextDataset(n=BATCH)
    batch = collate([ds[i] for i in range(BATCH)]).device_arrays()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variants = {
        "full": dict(),
        "-tssim": dict(tssim_loss=False),
        "-distill": dict(use_distill=False),
        "-gradient_prior": dict(gradient=False),
        "-rotation": dict(rotate_train=0.0),
    }
    base = dict(
        tssim_loss=True, rotate_train=5.0, use_distill=True, gradient=True,
        compute_dtype="bfloat16",
    )
    flops = {}
    for name, delta in variants.items():
        cfg = StepConfig(**{**base, **delta})
        step = make_train_step(sr_apply, crnn_apply, crnn_apply, cfg)
        c = cost_analysis(step, state, teacher_vars, batch, jax.random.PRNGKey(0))
        flops[name] = c.get("flops", -1)
        ref = flops["full"]
        drop = (ref - flops[name]) / ref * 100 if name != "full" and ref > 0 else 0.0
        print(
            f"{name:>16}: {flops[name]/1e9:9.1f} GFLOP/step"
            + (f"  ({drop:+.1f}% vs full)" if name != "full" else ""),
            flush=True,
        )
    assert all(flops[k] < flops["full"] for k in flops if k != "full"), (
        "a disabled loss term did not reduce compiled FLOPs — "
        "it must have been dead in the full graph"
    )
    print("OK: every loss term contributes compiled FLOPs")


if __name__ == "__main__":
    main()
