"""GRU recurrence roofline (VERDICT r2 Next #3).

Derives a hardware lower bound for the sequential BiGRU chains that
dominate the TATT step, measures the Pallas kernel against it, and
reports what fraction of the whole train step the recurrences explain.

Per-timestep floor model (TPU v5e, 128x128 MXU @ ~940 MHz): the chain is
serial in t, so each step must at minimum issue the hidden-gate matmul
[3H, H] @ [H, R].  The MXU computes an [M, K] @ [K, N] tile-walk in
ceil(M/128)*ceil(K/128)*ceil(N/128) * 128 cycles; nothing can overlap
across steps because step t+1's K-operand is step t's output.  The VPU
gate math (~10 elementwise ops on [3H, R]) and the VMEM streams are an
order of magnitude below that and overlap with the MXU.

Run on the real chip:  python experiments/gru_roofline.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

MXU_CLOCK_HZ = 940e6
MXU_TILE = 128

# the flagship step's recurrence sites at batch 64 (models/tsrn.py):
#   srb gru1: seq over H=16, rows = B*W = 4096, hidden 32, input 128
#   srb gru2: seq over W=64, rows = B*H = 1024, hidden 32, input 64
#   query GRU: seq over W=64, rows = 1, hidden 512, input 1024
# x5 SRBs for gru1/gru2; x2 for the fused-tssim 2B forward.
CONFIGS = [
    ("srb_gru1", 4096, 16, 32, 128, 5),
    ("srb_gru2", 1024, 64, 32, 64, 5),
    ("query_gru", 1, 64, 512, 1024, 1),
]

BATCH = 64
DTYPE = jnp.bfloat16


def mxu_cycles(m: int, k: int, n: int) -> float:
    import math

    return (
        math.ceil(m / MXU_TILE)
        * math.ceil(k / MXU_TILE)
        * math.ceil(n / MXU_TILE)
        * MXU_TILE
    )


def chain_floor_us(length: int, hid: int, rows: int, n_matmuls: int) -> float:
    """Serial-chain floor: length steps x n_matmuls dependent [3H,H]@[H,R]
    (fwd: 1; bwd: gate recompute + dW accumulation + dh backprop = 3)."""
    cyc = mxu_cycles(3 * hid, hid, rows) * n_matmuls * length
    return cyc / MXU_CLOCK_HZ * 1e6


def sync(x):
    # relay TPU: block_until_ready returns at dispatch; a host fetch of a
    # scalar is the only true barrier (bench.py:84-85)
    np.asarray(jnp.sum(x).astype(jnp.float32))


def time_fn(fn, *args, iters=30):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(fn(*args))
    o = outs[-1]
    sync(o if not isinstance(o, tuple) else o[0])
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main() -> None:
    from tatt_tpu.kernels.pallas_gru import bigru_pallas

    rng = np.random.default_rng(0)
    results = {}
    total_fwd = total_bwd = total_floor_fwd = total_floor_bwd = 0.0

    for name, rows, length, hid, xin, count in CONFIGS:
        x = jnp.asarray(rng.standard_normal((rows, length, xin)), DTYPE)
        w_ih = jnp.asarray(rng.standard_normal((2, 3 * hid, xin)) * 0.05, DTYPE)
        w_hh = jnp.asarray(rng.standard_normal((2, 3 * hid, hid)) * 0.05, DTYPE)
        b_ih = jnp.zeros((2, 3 * hid), DTYPE)
        b_hh = jnp.zeros((2, 3 * hid), DTYPE)

        fwd = jax.jit(lambda *a: bigru_pallas(*a))

        def loss(*a):
            return jnp.sum(bigru_pallas(*a).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

        t_fwd = time_fn(fwd, x, w_ih, w_hh, b_ih, b_hh)
        t_both = time_fn(grad, x, w_ih, w_hh, b_ih, b_hh)

        fl_fwd = chain_floor_us(length, hid, rows, 1)
        fl_bwd = chain_floor_us(length, hid, rows, 3)
        results[name] = {
            "rows": rows, "length": length, "hidden": hid, "count": count,
            "fwd_us": round(t_fwd, 1),
            "fwd_bwd_us": round(t_both, 1),
            "floor_fwd_us": round(fl_fwd, 1),
            "floor_fwd_bwd_us": round(fl_fwd + fl_bwd, 1),
            "fwd_vs_floor": round(t_fwd / fl_fwd, 2),
            "fwd_bwd_vs_floor": round(t_both / (fl_fwd + fl_bwd), 2),
            "per_step_us": round(t_fwd / length, 3),
        }
        total_fwd += t_fwd * count
        total_bwd += t_both * count
        total_floor_fwd += fl_fwd * count
        total_floor_bwd += (fl_fwd + fl_bwd) * count

    # whole-step context: one fused-tssim train step at the bench config
    step_us = None
    try:
        import os

        os.environ.setdefault("BENCH_BATCH", str(BATCH))
        from tatt_tpu.data.collate import collate
        from tatt_tpu.data.synthetic import SyntheticTextDataset
        from tatt_tpu.models.recognizers.crnn import CRNN
        from tatt_tpu.models.tsrn import TATT
        from tatt_tpu.train.state import TrainState, make_optimizer
        from tatt_tpu.train.steps import StepConfig, make_train_step

        sr_model = TATT(srb_nums=5, hidden_units=32, out_text_channels=64, stn=True)
        sr_fused = sr_model.clone(bn_copies=2)
        crnn = CRNN()
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        sr_vars = sr_model.init(
            k1, jnp.zeros((2, 4, 16, 64)), jnp.zeros((2, 37, 1, 26)), train=True
        )
        stu = crnn.init(k2, jnp.zeros((2, 1, 32, 100)))
        teach = crnn.init(k3, jnp.zeros((2, 1, 32, 100)))
        state = TrainState.create([sr_vars], [stu], make_optimizer(1e-3, 0.5))
        cfg = StepConfig(
            tssim_loss=True, rotate_train=5.0, use_distill=True,
            compute_dtype="bfloat16", fused_tssim=True,
        )
        step = jax.jit(
            make_train_step(
                lambda v, lr, p, t, rngs=None, mutable=False: sr_model.apply(
                    v, lr, p, train=t, rngs=rngs, mutable=mutable
                ),
                lambda v, lu, t, mutable=False: crnn.apply(
                    v, lu, train=t, mutable=mutable
                ),
                lambda v, lu, t, mutable=False: crnn.apply(
                    v, lu, train=t, mutable=mutable
                ),
                cfg,
                sr_apply_fused=lambda v, lr, p, t, rngs=None, mutable=False: sr_fused.apply(
                    v, lr, p, train=t, rngs=rngs, mutable=mutable
                ),
            )
        )
        ds = SyntheticTextDataset(n=BATCH)
        batch = {
            k: jnp.asarray(v)
            for k, v in collate([ds[i] for i in range(BATCH)]).device_arrays().items()
        }
        state, m = step(state, teach, batch, jax.random.PRNGKey(0))
        float(m["loss_total"])
        t0 = time.perf_counter()
        n = 20
        for i in range(n):
            state, m = step(state, teach, batch, jax.random.PRNGKey(i))
        float(m["loss_total"])
        step_us = (time.perf_counter() - t0) / n * 1e6
    except Exception as exc:  # keep the kernel numbers even if this fails
        print("step timing failed:", exc)

    # fused-tssim doubles rows through the SRB GRUs (2B batch), so scale
    # the per-forward chain costs x~2 for the srb entries when comparing
    # against the fused step; report both plain and fused-share estimates.
    report = {
        "per_kernel": results,
        "chain_total_fwd_us": round(total_fwd, 1),
        "chain_total_fwd_bwd_us": round(total_bwd, 1),
        "chain_floor_fwd_us": round(total_floor_fwd, 1),
        "chain_floor_fwd_bwd_us": round(total_floor_bwd, 1),
        "kernel_vs_floor": round(total_bwd / total_floor_bwd, 2),
        "train_step_us": round(step_us, 1) if step_us else None,
        "gru_share_of_step": (
            round(total_bwd / step_us, 3) if step_us else None
        ),
        "mxu_model": "ceil(M/128)*ceil(K/128)*ceil(N/128)*128 cyc @ 940MHz",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
