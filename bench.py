"""Benchmark: full-size TATT training throughput on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: the canonical TATT recipe (batch 64, TSRN_TL_TRANS with 5 SRBs
+ full CRNN student/teacher, distill + gradient-prior + TSSIM losses,
rotation aug — ``train_TATT.sh:1``), timed over full jitted train steps.

``vs_baseline``: the reference publishes no throughput (SURVEY §6).  The
baseline constant below is our standing estimate of the reference PyTorch
implementation on one A100: batch 64 at ~0.30 s/iter => ~215 images/sec
(cuDNN GRU-dominated; measured proxies in BENCH_NOTES.md).  Ratio > 3.0
is the BASELINE.json target.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

import os as _os

A100_PYTORCH_IMAGES_PER_SEC = 215.0  # estimated reference throughput
BATCH = int(_os.environ.get("BENCH_BATCH", 64))
STEPS = 100  # many chained steps amortize the host<->TPU relay latency
WARMUP = 3


def _wait_for_accelerator(max_wait_s: float = 900.0) -> None:
    """Probe accelerator init in a SUBPROCESS (an in-process backend-init
    failure can be sticky) and wait out transient relay outages, bounded.

    The TPU here is attached through a relay that goes UNAVAILABLE for
    stretches; without this, a round-end bench run during a blip records
    a spurious failure.  No-op once the first probe succeeds.
    """
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    probe = "import jax; jax.devices()"
    while True:
        r = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, timeout=600
        )
        if r.returncode == 0:
            return
        if time.time() > deadline:
            sys.stderr.write(
                "bench: accelerator still unavailable after "
                f"{max_wait_s:.0f}s; proceeding (expect failure)\n"
            )
            return
        time.sleep(60.0)


def main() -> None:
    _wait_for_accelerator()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

    from tatt_tpu.data.collate import collate
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer
    from tatt_tpu.train.steps import StepConfig, make_train_step

    import os

    rng = jax.random.PRNGKey(0)
    # stn=True: the canonical recipe trains with --STN (train_TATT.sh:1),
    # so the headline number prices the graph the flagship actually runs.
    # BENCH_STN=0 measures the STN-less ablation.
    use_stn = os.environ.get("BENCH_STN", "1") == "1"
    sr_model = TATT(srb_nums=5, hidden_units=32, out_text_channels=64, stn=use_stn)
    crnn = CRNN()  # full-size: nh=256, channels up to 512

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

    # faithful fused path: bn_copies=2 clone computes per-copy BN stats
    sr_model_fused = sr_model.clone(bn_copies=2)

    def sr_apply_fused(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model_fused.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    tx = make_optimizer(1e-3, beta1=0.5)
    state = TrainState.create([sr_vars], [stu_vars], tx)

    cfg = StepConfig(
        # ablation knobs for time attribution (BENCH_NOTES round 3)
        tssim_loss=os.environ.get("BENCH_TSSIM", "1") == "1",
        rotate_train=5.0 if os.environ.get("BENCH_ROTATE", "1") == "1" else 0.0,
        use_distill=os.environ.get("BENCH_DISTILL", "1") == "1",
        compute_dtype="bfloat16",
        # default-on since round 3: per-copy BN stats make the fused 2B
        # forward numerically faithful to the two-forward reference path
        fused_tssim=os.environ.get("BENCH_FUSED_TSSIM", "1") == "1",
    )
    step = jax.jit(
        make_train_step(
            sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_fused
        ),
        donate_argnums=0,
    )

    ds = SyntheticTextDataset(n=BATCH)
    batch = collate([ds[i] for i in range(BATCH)]).device_arrays()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # BENCH_SCAN=K > 1: run K steps inside ONE jitted lax.scan (the
    # Trainer's --steps_per_dispatch path), STEPS/K outer dispatches.
    # Isolates pure device time from per-dispatch overhead.  Measured
    # round 3: 1,491 img/s at K=10 vs 1,501 per-step — dispatch overhead
    # on this relay-attached chip is ~nil; the step is device-bound.
    scan_k = int(os.environ.get("BENCH_SCAN", "1"))
    if scan_k > 1:
        from tatt_tpu.train.steps import make_multi_train_step

        inner = make_train_step(
            sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_fused
        )
        multi = jax.jit(
            make_multi_train_step(inner, scan_k), donate_argnums=0
        )
        stacked = {
            k: jnp.broadcast_to(v, (scan_k,) + v.shape) for k, v in batch.items()
        }

        @partial(jax.jit, donate_argnums=0)
        def step(state, teacher_vars, batch_unused, rng):
            new_state, ms = multi(
                state, teacher_vars, stacked, jax.random.split(rng, scan_k)
            )
            return new_state, {"loss_total": ms["loss_total"][-1]}

    n_calls = STEPS // scan_k

    # NOTE: on this remote-attached TPU, block_until_ready returns at
    # dispatch; a host fetch of a scalar is the only true barrier.
    for i in range(WARMUP):
        state, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(i))
    float(metrics["loss_total"])

    t0 = time.perf_counter()
    for i in range(n_calls):
        state, metrics = step(
            state, teacher_vars, batch, jax.random.PRNGKey(WARMUP + i)
        )
    loss = float(metrics["loss_total"])  # forces completion of the chain
    dt = time.perf_counter() - t0
    assert loss == loss, "non-finite loss in benchmark"
    STEPS_RUN = n_calls * scan_k

    images_per_sec = BATCH * STEPS_RUN / dt

    # ---- honest accounting extras (VERDICT r1 #6) ----
    # measured FLOPs/step from XLA's cost analysis of the exact compiled
    # train step -> MFU vs the v5e bf16 peak (197 TFLOP/s/chip)
    extras = {}
    try:
        from tatt_tpu.train.observe import cost_analysis

        costs = cost_analysis(
            make_train_step(
                sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_fused
            ),
            state,
            teacher_vars,
            batch,
            jax.random.PRNGKey(0),
        )
        flops = costs.get("flops", 0.0)
        if flops > 0:
            sec_per_step = dt / STEPS_RUN
            peak = 197e12  # TPU v5e bf16 peak FLOP/s per chip
            extras["flops_per_step"] = round(flops, 0)
            extras["mfu"] = round(flops / sec_per_step / peak, 4)
    except Exception:
        pass

    # eval-path fps (the reference prints this per eval,
    # super_resolution.py:1688-1690): student prior -> SR forward, eval mode
    try:
        from tatt_tpu.train.steps import make_eval_step

        eval_step = jax.jit(make_eval_step(sr_apply, crnn_apply))
        sr, _ = eval_step(state, batch)
        np.asarray(sr[0, 0, 0, 0])  # sync
        t1 = time.perf_counter()
        for _ in range(STEPS):
            sr, _ = eval_step(state, batch)
        np.asarray(sr[0, 0, 0, 0])
        extras["eval_images_per_sec"] = round(
            BATCH * STEPS / (time.perf_counter() - t1), 2
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "tatt_train_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    images_per_sec / A100_PYTORCH_IMAGES_PER_SEC, 3
                ),
                # the reference publishes no throughput; 215 img/s A100 is
                # our documented estimate (BENCH_NOTES.md), not a measurement
                "baseline_is_estimate": True,
                "stn": use_stn,
                "fused_tssim": cfg.fused_tssim,
                **({"scan_k": scan_k} if scan_k > 1 else {}),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
