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
# impl: the dispatch heuristic in kernels/rnn.py — the query GRU's
# degenerate [1, 64, 1024] shape stays on the XLA scan (lanes would pad
# catastrophically in the pallas layout).
CONFIGS = [
    ("srb_gru1", 4096, 16, 32, 128, 5, "pallas"),
    ("srb_gru2", 1024, 64, 32, 64, 5, "pallas"),
    ("query_gru", 1, 64, 512, 1024, 1, "scan"),
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
    """Serial-chain floor: length steps x n_matmuls chain-dependent
    [3H,H]@[H,R] matmuls.  fwd: 1 (the hidden-gate matmul).  bwd: also 1 —
    the only matmul on the serial dh chain is the W^T @ d_gh backprop; the
    gate recompute reads ys (saved), and dW/db/dgx are off-chain.  This is
    the PESSIMISTIC per-tile model (K padded to 128 cycles); the MXU may
    stream K=32 faster, so measured times modestly below this floor are
    possible and indicate the kernel adds no overhead beyond the MXU."""
    cyc = mxu_cycles(3 * hid, hid, rows) * n_matmuls * length
    return cyc / MXU_CLOCK_HZ * 1e6


def sync(x):
    # relay TPU: block_until_ready returns at dispatch; a host fetch of a
    # scalar is the only true barrier (bench.py:84-85)
    np.asarray(jnp.sum(x).astype(jnp.float32))


def time_chain(fn, x, *weights, n_lo=4, n_hi=64):
    """Per-call device time via in-jit amplification: ONE dispatch runs the
    kernel n times inside a fori_loop whose carry feeds the next call (so
    steps serialize on the device), and the slope between two loop counts
    cancels dispatch/relay constants.  The carry perturbation uses a tiny
    scale (not 0.0) so the loop body can't be simplified away."""

    def loop(n):
        @jax.jit
        def run(xc):
            def body(_, c):
                out = fn(c, *weights)
                lead = out[0] if isinstance(out, tuple) else out
                eps = (jnp.sum(lead).astype(jnp.float32) * 1e-30).astype(
                    c.dtype
                )
                return c + eps

            return jax.lax.fori_loop(0, n, body, xc)

        return run

    run_lo, run_hi = loop(n_lo), loop(n_hi)
    sync(run_lo(x))
    sync(run_hi(x))

    def measure(run, reps=8):
        best = float("inf")
        for _ in range(3):  # best-of-3 medians out relay jitter
            t0 = time.perf_counter()
            xc = x
            for _ in range(reps):
                xc = run(xc)
            sync(xc)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t_lo, t_hi = measure(run_lo), measure(run_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e6  # us per call


def main() -> None:
    from tatt_tpu.kernels.pallas_gru import bigru_pallas
    from tatt_tpu.kernels.rnn import bigru_apply

    rng = np.random.default_rng(0)
    results = {}
    total_fwd = total_bwd = total_floor_fwd = total_floor_bwd = 0.0

    for name, rows, length, hid, xin, count, impl in CONFIGS:
        x = jnp.asarray(rng.standard_normal((rows, length, xin)), DTYPE)
        w_ih = jnp.asarray(rng.standard_normal((2, 3 * hid, xin)) * 0.05, DTYPE)
        w_hh = jnp.asarray(rng.standard_normal((2, 3 * hid, hid)) * 0.05, DTYPE)
        b_ih = jnp.zeros((2, 3 * hid), DTYPE)
        b_hh = jnp.zeros((2, 3 * hid), DTYPE)

        run = bigru_pallas if impl == "pallas" else bigru_apply

        def loss(*a, _r=run):
            return jnp.sum(_r(*a).astype(jnp.float32))

        grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

        print(f"timing {name} fwd...", flush=True)
        t_fwd = time_chain(run, x, w_ih, w_hh, b_ih, b_hh)
        print(f"timing {name} fwd+bwd...", flush=True)
        t_both = time_chain(grad, x, w_ih, w_hh, b_ih, b_hh)
        print(f"{name}: fwd {t_fwd:.0f}us fwd+bwd {t_both:.0f}us", flush=True)

        fl_fwd = chain_floor_us(length, hid, rows, 1)
        fl_bwd = chain_floor_us(length, hid, rows, 1)
        results[name] = {
            "rows": rows, "length": length, "hidden": hid, "count": count,
            "impl": impl,
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

    # Whole-step context comes from bench.py (100 chained steps, host-fetch
    # barrier — the only step-timing method that survives the relay; the
    # in-process variants measured seconds/step of transport artifacts).
    # The fused-tssim forward doubles the SRB GRU rows (2B batch), which
    # roughly doubles those kernels' time: scale srb entries x2 for the
    # fused-step share.
    report = {
        "per_kernel": results,
        "chain_total_fwd_us": round(total_fwd, 1),
        "chain_total_fwd_bwd_us": round(total_bwd, 1),
        "chain_floor_fwd_us": round(total_floor_fwd, 1),
        "chain_floor_fwd_bwd_us": round(total_floor_bwd, 1),
        "kernel_vs_floor": round(total_bwd / total_floor_bwd, 2),
        "mxu_model": "ceil(M/128)*ceil(K/128)*ceil(N/128)*128 cyc @ 940MHz"
        " (pessimistic: K<128 may stream faster)",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
