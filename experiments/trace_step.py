"""Capture a device profiler trace of the canonical train step and rank
leaf-op cost.  Run on the real chip (no JAX_PLATFORMS override):

    python experiments/trace_step.py [out.json]

Prints a per-category and top-op table from the perfetto trace the
profiler writes (the same methodology as the round-3 BENCH_NOTES step
trace; see "step-residual investigation")."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")


def build_step():
    from tatt_tpu.data.collate import collate
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer
    from tatt_tpu.train.steps import StepConfig, make_train_step

    batch_n = int(os.environ.get("BENCH_BATCH", 64))
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
        return sr_model.apply(variables, lr, prior, train=train, rngs=rngs, mutable=mutable)

    fused = sr_model.clone(bn_copies=2)

    def sr_apply_fused(variables, lr, prior, train, rngs=None, mutable=False):
        return fused.apply(variables, lr, prior, train=train, rngs=rngs, mutable=mutable)

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    tx = make_optimizer(1e-3, beta1=0.5)
    state = TrainState.create([sr_vars], [stu_vars], tx)
    cfg = StepConfig(
        tssim_loss=True, rotate_train=5.0, use_distill=True,
        compute_dtype="bfloat16", fused_tssim=True,
    )
    step = jax.jit(
        make_train_step(sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_fused),
        donate_argnums=0,
    )
    ds = SyntheticTextDataset(n=batch_n)
    batch = collate([ds[i] for i in range(batch_n)]).device_arrays()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return step, state, teacher_vars, batch


def main():
    step, state, teacher_vars, batch = build_step()
    rng = jax.random.PRNGKey(1)
    for i in range(3):  # warmup + compile
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, teacher_vars, batch, sub)
    float(metrics["loss_total"])  # true barrier on the relay-attached chip

    trace_dir = "/tmp/tatt_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    n_traced = 5
    for i in range(n_traced):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, teacher_vars, batch, sub)
    float(metrics["loss_total"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    # device-thread complete events only
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0.0)
        args = ev.get("args", {}) or {}
        # leaf ops: skip the module-level envelope events
        if name.startswith("jit_") or "pipeline" in name.lower():
            continue
        by_op[name] += dur
        cat = "other"
        nl = name.lower()
        if "conv" in nl:
            cat = "convolution"
        elif "custom-call" in nl or "gru" in nl:
            cat = "custom-call"
        elif any(k in nl for k in ("copy", "transpose", "bitcast", "reshape", "slice", "concatenate", "pad")):
            cat = "data formatting"
        elif "fusion" in nl:
            cat = "fusion"
        elif any(k in nl for k in ("reduce", "scatter", "gather", "while", "dot", "rng", "sort", "iota", "cholesky", "select")):
            cat = nl.split(".")[0].split("_")[0]
        by_cat[cat] += dur

    total = sum(by_op.values())
    print(f"\ntraced {n_traced} steps; device leaf-op total {total/1e3/n_traced:.2f} ms/step")
    print("\n== by category (us/step) ==")
    for cat, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:24s} {d/n_traced:10.0f}")
    print("\n== top 30 ops (us/step) ==")
    for name, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/n_traced:10.0f}  {name[:110]}")

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"by_op_us_per_step": {k: v / n_traced for k, v in by_op.items()},
                       "by_cat_us_per_step": {k: v / n_traced for k, v in by_cat.items()}}, f)


if __name__ == "__main__":
    main()
