"""GRU-adjacent data-movement seams vs their relayout speed-of-light
(VERDICT r4 Next #3).

The round-4 conv roofline put ~7 ms/step of the 27.5 ms step on GRU-
adjacent DATA MOVEMENT (call-site gate projections emitting the kernel's
R-minor layout, gru1's H<->W transposes, ys output transposes).  This
harness prices each seam in ISOLATION on the real chip against two
floors:

  - stream floor: bytes/HBM_BW for a pure read+write of the same bytes
    (measured here as `x + 1`, not assumed)
  - the same op expressed WITHOUT the layout change (e.g. the gates
    einsum emitting its natural C-minor output), so the delta is the
    relayout cost alone

If a seam sits at its floor, the 7 ms is the price of the algorithm on
this memory system and the roofline story is closed; if not, the gap is
the optimization target.

Shapes are the flagship's at batch 64 with the fused-tssim 2B forward
(models/tsrn.py): gru1 consumes cat [128, 16, 64, 128] scanning H,
gru2 consumes [128, 16, 64, 64] scanning W; hidden 32 => gates 96.

Run on the real chip:  python experiments/seam_roofline.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

DT = jnp.bfloat16
N, H, W = 128, 16, 64  # 2B images (fused tssim), trunk spatial dims
C_GRU1, C_GRU2, GATES, HID = 128, 64, 96, 32


def _sync(out) -> None:
    # on this relay-attached TPU, block_until_ready returns at dispatch
    # (BENCH_NOTES round 1); a host fetch is the only true barrier
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]


def timeit(fn, *args, iters=200):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def bytes_of(*shapes, dtype=DT):
    it = np.dtype(dtype.dtype if hasattr(dtype, "dtype") else dtype).itemsize
    return sum(int(np.prod(s)) * it for s in shapes)


def main() -> None:
    key = jax.random.PRNGKey(0)
    results = {}

    # -- measured stream floor: read + write the gru1 cat tensor --------
    x1 = jax.random.normal(key, (N, H, W, C_GRU1), DT)
    t = timeit(lambda a: a + 1.0, x1)
    bw = bytes_of((N, H, W, C_GRU1)) * 2 / (t * 1e-6) / 1e9
    results["stream_floor"] = {"us": t, "GBps": bw}
    print(f"stream (x+1)      {t:8.1f} us  -> measured HBM ~{bw:.0f} GB/s")

    def floor_us(*shapes):
        """floor for moving (reading once + writing once) a tensor of the
        given shape(s) at the measured stream bandwidth."""
        return bytes_of(*shapes) * 2 / (bw * 1e9) * 1e6

    def floor_moved(in_shapes, out_shapes):
        """floor when input and output shapes differ: in read once, out
        written once."""
        return (bytes_of(*in_shapes) + bytes_of(*out_shapes)) / (bw * 1e9) * 1e6

    # -- seam 1: gru1 H<->W transpose (in: 128ch cat, out: 64ch) --------
    t_in = timeit(lambda a: a.transpose(0, 2, 1, 3), x1)
    x1o = jax.random.normal(key, (N, W, H, C_GRU2), DT)
    t_out = timeit(lambda a: a.transpose(0, 2, 1, 3), x1o)
    f_in = floor_us((N, H, W, C_GRU1))
    f_out = floor_us((N, W, H, C_GRU2))
    results["gru1_transpose_in"] = {"us": t_in, "floor_us": f_in}
    results["gru1_transpose_out"] = {"us": t_out, "floor_us": f_out}
    print(f"gru1 T in  (128c) {t_in:8.1f} us  floor {f_in:6.1f}  ({t_in/f_in:.1f}x)")
    print(f"gru1 T out ( 64c) {t_out:8.1f} us  floor {f_out:6.1f}  ({t_out/f_out:.1f}x)")

    # -- seam 2: gates projection emitting the kernel's R-minor layout --
    # gru2's call: x [R=N*H, L=W, C] -> gates [2, L, 3H, R]
    rows = N * H
    seq = jax.random.normal(key, (rows, W, C_GRU2), DT)
    w_eff = jax.random.normal(key, (2, GATES, C_GRU2), DT)
    t_nat = timeit(
        lambda a, w: jnp.einsum("rli,dgi->drlg", a, w), seq, w_eff
    )
    t_kern = timeit(
        lambda a, w: jnp.einsum("rli,dgi->dlgr", a, w), seq, w_eff
    )
    f_gates = floor_moved(
        [(rows, W, C_GRU2)], [(2, W, GATES, rows)]
    )
    results["gates_natural"] = {"us": t_nat, "floor_us": f_gates}
    results["gates_kernel_layout"] = {"us": t_kern, "floor_us": f_gates}
    print(f"gates einsum natural(drlg) {t_nat:8.1f} us   kernel(dlgr) {t_kern:8.1f} us"
          f"   floor {f_gates:6.1f}   relayout delta {t_kern - t_nat:+.1f}")

    # -- seam 3: ys output transpose [L, 2H, R] -> [R, L, 2H] -----------
    ys = jax.random.normal(key, (W, 2 * HID, rows), DT)
    t_ys = timeit(lambda a: a.transpose(2, 0, 1), ys)
    f_ys = floor_us((W, 2 * HID, rows))
    results["ys_out_transpose"] = {"us": t_ys, "floor_us": f_ys}
    print(f"ys out T          {t_ys:8.1f} us  floor {f_ys:6.1f}  ({t_ys/f_ys:.1f}x)")

    # -- context: one full GruBlock fwd and fwd+bwd ---------------------
    from tatt_tpu.models.tsrn import GruBlock

    gb = GruBlock(C_GRU2, data_format="NHWC", scan="w")
    xg = jax.random.normal(key, (N, H, W, C_GRU2), DT)
    vs = gb.init(jax.random.PRNGKey(1), xg)

    t_fwd = timeit(lambda v, a: gb.apply(v, a), vs, xg)

    def loss(v, a):
        return jnp.sum(gb.apply(v, a).astype(jnp.float32) ** 2)

    t_grad = timeit(jax.grad(loss, argnums=(0, 1)), vs, xg)
    results["grublock_fwd"] = {"us": t_fwd}
    results["grublock_fwd_bwd"] = {"us": t_grad}
    print(f"GruBlock fwd      {t_fwd:8.1f} us   fwd+bwd {t_grad:8.1f} us")

    out = "/tmp/seam_roofline.json"
    with open(out, "w") as f:
        json.dump(jax.tree.map(float, results), f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
