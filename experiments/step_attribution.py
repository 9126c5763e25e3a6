"""Per-component time attribution for the flagship train step (round 3).

The bench.py ablations bound component costs only coarsely (knocking out
--tssim_loss also removes rotations of sr_ret, tri_ssim, AND the fused
2B forward at once).  This harness times each subgraph of the step in
ISOLATION on the real chip, with the same in-jit fori_loop amplification
used by gru_roofline.py (the only per-kernel timing that survives the
relay: the slope between two loop counts cancels dispatch constants).

Components (batch 64, canonical recipe shapes):
  gen_fwd          single-copy TATT(stn) forward, train-mode BN
  gen_fwd_bwd      + backward to params
  fused_fwd_bwd    2B packed forward (per-copy BN), fwd+bwd
  fused_shared_bn  2B packed forward with SHARED BN stats (bn_copies=1)
                   -- the delta vs fused_fwd_bwd prices the per-copy BN
  crnn_fwd         teacher CRNN forward (eval BN)
  crnn_fwd_bwd     student CRNN fwd+bwd
  parse            parse_crnn_input (bicubic 32x100 + luma) on HR
  rotations        the 3 forward-path rotate_batch calls (lr, hr, lr_ret)
  rot_back         rotate_batch on the 32x128 SR output (loss-side)
  tri_ssim         TRI_SSIM fwd+bwd wrt sr_ret and sr
  image_loss       MSE + gradient prior fwd+bwd wrt sr
  adam_update      optax adam on the full SR+student param tree

Run on the real chip:  python experiments/step_attribution.py [component ...]

Each invocation appends its measurements to /tmp/step_attribution.json so
the full table can be assembled across several bounded runs (compiles are
slow through the relay; the persistent jax compilation cache makes
re-invocations cheap).  With no args, all components run in order.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

BATCH = 64
CDT = jnp.bfloat16


def sync(x):
    np.asarray(jnp.sum(x).astype(jnp.float32))


def time_fn(fn, x, n_lo=None, n_hi=None, reps=4):
    """us per call of fn(x)->pytree, via loop-count slope (gru_roofline).

    Cheap kernels (<500us) need a wide loop-count spread or relay noise
    swamps the slope (round-3 first pass measured crnn_fwd NEGATIVE with
    n 2..10); override with N_LO/N_HI env vars."""
    n_lo = n_lo or int(os.environ.get("N_LO", 2))
    n_hi = n_hi or int(os.environ.get("N_HI", 10))

    def loop(n):
        @jax.jit
        def run(xc):
            def body(_, c):
                out = fn(c)
                lead = jax.tree_util.tree_leaves(out)[0]
                eps = (jnp.sum(lead).astype(jnp.float32) * 1e-30).astype(
                    c.dtype
                )
                return c + eps

            return jax.lax.fori_loop(0, n, body, xc)

        return run

    run_lo, run_hi = loop(n_lo), loop(n_hi)
    sync(run_lo(x))
    sync(run_hi(x))

    def measure(run):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            xc = x
            for _ in range(reps):
                xc = run(xc)
            sync(xc)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    t_lo, t_hi = measure(run_lo), measure(run_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e6


def main() -> None:
    from tatt_tpu.kernels.grid_sample import rotate_batch
    from tatt_tpu.losses.image import image_loss
    from tatt_tpu.losses.ssim import tri_ssim
    from tatt_tpu.models.recognizers.crnn import CRNN, parse_crnn_input
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import make_optimizer

    rng = jax.random.PRNGKey(0)
    sr_model = TATT(srb_nums=5, hidden_units=32, out_text_channels=64, stn=True)
    fused2 = sr_model.clone(bn_copies=2)
    crnn = CRNN()

    x1 = jnp.zeros((2, 4, 16, 64))
    t1 = jnp.zeros((2, 37, 1, 26))
    luma1 = jnp.zeros((2, 1, 32, 100))
    k1, k2 = jax.random.split(rng)
    sr_vars = sr_model.init(k1, x1, t1, train=True)
    stu_vars = crnn.init(k2, luma1)

    r = np.random.default_rng(0)
    lr = jnp.asarray(r.random((BATCH, 4, 16, 64)), CDT)
    hr = jnp.asarray(r.random((BATCH, 4, 32, 128)), jnp.float32)
    prior = jnp.asarray(r.random((BATCH, 37, 1, 26)), CDT)
    luma = jnp.asarray(r.random((BATCH, 1, 32, 100)), CDT)
    arc = jnp.asarray(r.random(BATCH) * 0.08, jnp.float32)
    offs = jnp.asarray(r.random(BATCH), jnp.float32)
    sr_img = jnp.asarray(r.random((BATCH, 4, 32, 128)), jnp.float32)

    want = set(sys.argv[1:])

    def sel(name):
        return not want or name in want

    path = "/tmp/step_attribution.json"
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))

    def record(name, value):
        results[name] = round(value, 1)
        json.dump(results, open(path, "w"), indent=1)
        print(name, results[name], flush=True)

    # --- generator forward (train BN, mutable stats) ---
    def gen_fwd(lr_in):
        (out, _aux), _mut = sr_model.apply(
            sr_vars, lr_in, prior, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return out

    if sel("gen_fwd"):
        record("gen_fwd", time_fn(gen_fwd, lr))

    # --- generator fwd+bwd ---
    def gen_loss(params, lr_in):
        (out, _aux), _mut = sr_model.apply(
            {"params": params, "batch_stats": sr_vars["batch_stats"]},
            lr_in, prior, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def gen_fwd_bwd(lr_in):
        return jax.grad(gen_loss)(sr_vars["params"], lr_in)

    if sel("gen_fwd_bwd"):
        record("gen_fwd_bwd", time_fn(gen_fwd_bwd, lr))

    # --- fused 2B fwd+bwd, per-copy BN ---
    lr2 = jnp.concatenate([lr, lr], axis=0)
    prior2 = jnp.concatenate([prior, prior], axis=0)

    def fused_loss(params, lr_in):
        (out, _aux), _mut = fused2.apply(
            {"params": params, "batch_stats": sr_vars["batch_stats"]},
            lr_in, prior2, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def fused_fwd_bwd(lr_in):
        return jax.grad(fused_loss)(sr_vars["params"], lr_in)

    if sel("fused_fwd_bwd"):
        record("fused_fwd_bwd", time_fn(fused_fwd_bwd, lr2))

    # --- fused 2B fwd+bwd, SHARED BN stats (prices per-copy BN) ---
    def shared_loss(params, lr_in):
        (out, _aux), _mut = sr_model.apply(
            {"params": params, "batch_stats": sr_vars["batch_stats"]},
            lr_in, prior2, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def fused_shared_bn(lr_in):
        return jax.grad(shared_loss)(sr_vars["params"], lr_in)

    if sel("fused_shared_bn"):
        record("fused_shared_bn", time_fn(fused_shared_bn, lr2))

    # --- CRNN teacher fwd (eval BN) ---
    def crnn_fwd(lm):
        return crnn.apply(stu_vars, lm, train=False)

    if sel("crnn_fwd"):
        record("crnn_fwd", time_fn(crnn_fwd, luma))

    # --- CRNN student fwd+bwd ---
    def crnn_loss(params, lm):
        logits, _mut = crnn.apply(
            {"params": params, "batch_stats": stu_vars["batch_stats"]},
            lm, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(logits.astype(jnp.float32) ** 2)

    def crnn_fwd_bwd(lm):
        return jax.grad(crnn_loss)(stu_vars["params"], lm)

    if sel("crnn_fwd_bwd"):
        record("crnn_fwd_bwd", time_fn(crnn_fwd_bwd, luma))

    # --- parse (bicubic to 32x100 + luma) on HR ---
    def parse(h):
        return parse_crnn_input(h[:, :3])

    if sel("parse_hr"):
        record("parse_hr", time_fn(parse, hr))

    # --- the 3 forward-path rotations (grad flows through hr/lr aug? no:
    # aug is outside loss_fn; fwd only) ---
    def rotations(lr_in):
        a = rotate_batch(lr_in, arc, offs)
        b = rotate_batch(hr, arc, offs)
        c = rotate_batch(a, -arc, offs)
        return a + c, b

    if sel("rotations_fwd"):
        record("rotations_fwd", time_fn(rotations, lr))

    # --- loss-side rotate back of SR (needs grad) ---
    def rotb_loss(s):
        return jnp.sum(rotate_batch(s, arc, offs) ** 2)

    def rot_back(s):
        return jax.grad(rotb_loss)(s)

    if sel("rot_back_fwd_bwd"):
        record("rot_back_fwd_bwd", time_fn(rot_back, sr_img))

    # --- TRI_SSIM fwd+bwd wrt (sr_ret, sr) ---
    def tri_loss(s):
        return (1.0 - tri_ssim(s, sr_img, hr)) * 10.0

    def tri_fwd_bwd(s):
        return jax.grad(tri_loss)(s)

    if sel("tri_ssim_fwd_bwd"):
        record("tri_ssim_fwd_bwd", time_fn(tri_fwd_bwd, sr_img))

    # --- image loss (MSE + gradient prior) fwd+bwd ---
    def img_loss(s):
        return image_loss(s, hr, gradient=True).mean() * 100.0

    def img_fwd_bwd(s):
        return jax.grad(img_loss)(s)

    if sel("image_loss_fwd_bwd"):
        record("image_loss_fwd_bwd", time_fn(img_fwd_bwd, sr_img))

    # --- generator submodules in isolation (fused batch 2B=128) ---
    # names the kernel the next optimization should target: each is
    # fwd+bwd wrt (params, input) on the shapes the fused step runs
    from flax import linen as nn

    from tatt_tpu.models.common import Conv2d, PReLU, pixel_shuffle
    from tatt_tpu.models.stn import STNHead, tps_transform
    from tatt_tpu.models.tp_interpreter import TPInterpreter
    from tatt_tpu.models.tsrn import RecurrentResidualBlockTL, UpsampleBlock

    B2 = 2 * BATCH
    rr = np.random.default_rng(1)
    x_in = jnp.asarray(rr.random((B2, 4, 16, 64)), CDT)  # model input
    b1_feat = jnp.asarray(rr.random((B2, 64, 16, 64)), CDT)  # stem features
    up_feat = jnp.asarray(rr.random((B2, 64, 32, 128)), CDT)  # post-upsample
    prior2b = jnp.asarray(rr.random((B2, 37, 1, 26)), CDT)

    def timed_module(name, mod, *args, train_kw=True):
        if not sel(name):
            return
        init_args = tuple(
            a[:2] if hasattr(a, "shape") else a for a in args
        )
        variables = mod.init(
            jax.random.PRNGKey(0), *init_args,
            **({"train": True} if train_kw else {}),
        )

        def loss(params, a0):
            out = mod.apply(
                {"params": params, **{
                    k: v for k, v in variables.items() if k != "params"
                }},
                a0, *args[1:],
                **({"train": True} if train_kw else {}),
                mutable=[k for k in variables if k != "params"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )[0]
            lead = out[0] if isinstance(out, tuple) else out
            return jnp.sum(lead.astype(jnp.float32) ** 2)

        def fwd_bwd(a0):
            return jax.grad(loss, argnums=(0, 1))(variables["params"], a0)

        record(name, time_fn(fwd_bwd, args[0]))

    class _Block1(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return PReLU(name="act")(
                Conv2d(64, (9, 9), padding=(4, 4), name="conv")(x)
            )

    class _Final(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return jnp.tanh(Conv2d(4, (9, 9), padding=(4, 4), name="conv")(x))

    class _STN(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            ctrl = STNHead(bn_copies=2, name="stn_head")(x, train)
            return tps_transform(x, ctrl, (16, 64))

    timed_module("sub_block1", _Block1(), x_in)
    timed_module("sub_final", _Final(), up_feat)
    timed_module("sub_up", UpsampleBlock(64, 2), b1_feat, train_kw=False)
    timed_module(
        "sub_srb",
        RecurrentResidualBlockTL(64, 64, bn_copies=2),
        b1_feat,
        b1_feat,  # text map has the same shape as the features
    )
    timed_module(
        "sub_tp",
        TPInterpreter(
            text_emb=37, d_model=64, output_size=(16, 64), dropout=0.1,
            query_gru_mode="width",
        ),
        b1_feat,
        prior2b,
        False,  # deterministic
        train_kw=False,
    )
    timed_module("sub_stn", _STN(), x_in)

    # --- adam update over the full param tree ---
    tx = make_optimizer(1e-3, beta1=0.5)
    full_params = {"sr": sr_vars["params"], "student": stu_vars["params"]}
    opt_state = tx.init(full_params)

    def adam(g_seed):
        grads = jax.tree_util.tree_map(
            lambda p: p * g_seed[0, 0, 0, 0].astype(p.dtype), full_params
        )
        updates, _ = tx.update(grads, opt_state, full_params)
        return updates

    if sel("adam_update"):
        record("adam_update", time_fn(adam, sr_img))

    needed = {p for p in (
        "fused_fwd_bwd", "crnn_fwd", "crnn_fwd_bwd", "parse_hr",
        "rotations_fwd", "rot_back_fwd_bwd", "tri_ssim_fwd_bwd",
        "image_loss_fwd_bwd", "adam_update", "gen_fwd_bwd",
        "fused_shared_bn")}
    if not needed <= set(results):
        print("partial:", json.dumps(results, indent=1))
        return
    total_modeled = (
        results["fused_fwd_bwd"]
        + results["crnn_fwd"]          # teacher
        + results["crnn_fwd_bwd"]      # student
        + 2 * results["parse_hr"]      # hr + lr parse (lr is smaller; upper bound)
        + results["rotations_fwd"]
        + results["rot_back_fwd_bwd"]
        + results["tri_ssim_fwd_bwd"]
        + results["image_loss_fwd_bwd"]
        + results["adam_update"]
    )
    report = {
        "per_component_us": {k: round(v, 1) for k, v in results.items()},
        "modeled_step_us": round(total_modeled, 1),
        "per_copy_bn_cost_us": round(
            results["fused_fwd_bwd"] - results["fused_shared_bn"], 1
        ),
        "fused_vs_2x_single_us": round(
            results["fused_fwd_bwd"] - 2 * results["gen_fwd_bwd"], 1
        ),
        "note": "compare modeled_step_us against bench.py's measured "
        "step (45.4ms at 1410 img/s); residual = fusion interactions "
        "+ BN running-stat updates + metrics",
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
