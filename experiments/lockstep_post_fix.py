"""Full-recipe post-TPS-fix lockstep: our step vs the torch reference
(VERDICT r4 Next #4).

Runs BOTH arms of the canonical recipe (STN ON, rotation 5, tssim,
distill, gradient — ``train_TATT.sh:1`` semantics) on the shared
fixture with shared initial weights and shared per-iter rotation draws:

  - torch arm: the reference code itself (experiments/tssim_ab_torch.py,
    AB_STN=1), CPU f32
  - jax arm:   experiments/tssim_lockstep_jax.py — our train step from
    the torch arm's EXACT init (core/torch_import) and the torch arm's
    numpy rotation sequence; STN on; f32 (and optionally bf16)

The arms still differ in dropout draws (independent RNGs, p=0.1 in the
transformer), so agreement is statistical: we assert the loss curves
track within tolerance and the final eval PSNRs agree within a dB —
this is the strongest accuracy-parity statement available without real
TextZoom + pretrained recognizer weights
(``interfaces/super_resolution.py:575-1085``).

Existing lockstep/tssim A/B experiments predate the TPS-precision fix
(4d2ff1c) or trained the jax arm without STN; this one exercises the
fixed STN path in both arms.

Run: python experiments/lockstep_post_fix.py [iters]
Writes experiments/out/lockstep_post_fix.json and asserts agreement.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "out", "lockstep_post_fix.json")


def run_arm(cmd: list[str], env_extra: dict, tag: str) -> dict:
    env = dict(os.environ)
    env.setdefault("OMP_NUM_THREADS", "1")
    env.update(env_extra)
    print(f"[{tag}] {' '.join(cmd)}", flush=True)
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=os.path.dirname(HERE)
    )
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"{tag} arm failed rc={proc.returncode}")
    psnr = [
        (int(m.group(1)), float(m.group(2)))
        for m in re.finditer(r"iter\s+(\d+) eval_psnr\s+([\d.]+)", proc.stdout)
    ]
    loss = [
        (int(m.group(1)), float(m.group(2)))
        for m in re.finditer(r"step (\d+): total ([\d.]+)", proc.stdout)
    ]
    return {"psnr": psnr, "loss": loss}


def main(iters: int = 300) -> None:
    env_iters = {"AB_ITERS": str(iters), "AB_EVAL_EVERY": "25"}

    torch_arm = run_arm(
        [sys.executable, os.path.join(HERE, "tssim_ab_torch.py"), "tssim"],
        {**env_iters, "AB_STN": "1"},
        "torch",
    )
    jax_arm = run_arm(
        [
            sys.executable,
            os.path.join(HERE, "tssim_lockstep_jax.py"),
            "tssim",
            "float32",
        ],
        env_iters,
        "jax-f32",
    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"iters": iters, "torch": torch_arm, "jax": jax_arm}, f, indent=1)
    print(f"wrote {OUT}", flush=True)

    # --- assertions -----------------------------------------------------
    t_psnr = dict(torch_arm["psnr"])
    j_psnr = dict(jax_arm["psnr"])
    t_final = t_psnr[max(t_psnr)]
    j_final = j_psnr[max(j_psnr)]
    t0, j0 = t_psnr[0], j_psnr[0]
    print(
        f"final eval PSNR: torch {t_final:.2f} dB  jax {j_final:.2f} dB "
        f"(iter0: {t0:.2f} / {j0:.2f})",
        flush=True,
    )
    # both arms must LEARN (rise well above their iter-0 forward)...
    assert t_final > t0 + 5.0, f"torch arm failed to learn: {t0} -> {t_final}"
    assert j_final > j0 + 5.0, f"jax arm failed to learn: {j0} -> {j_final}"
    # ...and agree within a dB at the end (dropout draws differ)
    assert abs(t_final - j_final) < 1.0, (
        f"final PSNR disagree: torch {t_final} vs jax {j_final}"
    )

    # loss curves: iter-0 must match closely (same weights, same inputs,
    # pre-dropout-divergence the first total is near-deterministic), and
    # the tail means must track
    t_loss = dict(torch_arm["loss"])
    j_loss = dict(jax_arm["loss"])
    rel0 = abs(t_loss[0] - j_loss[0]) / t_loss[0]
    print(f"iter-0 total loss: torch {t_loss[0]:.3f} jax {j_loss[0]:.3f} "
          f"(rel {rel0:.3%})", flush=True)
    assert rel0 < 0.05, f"iter-0 loss mismatch {rel0:.3%}"
    common_tail = sorted(set(t_loss) & set(j_loss))[-3:]
    tmean = sum(t_loss[i] for i in common_tail) / len(common_tail)
    jmean = sum(j_loss[i] for i in common_tail) / len(common_tail)
    rel_tail = abs(tmean - jmean) / tmean
    print(f"tail loss means (iters {common_tail}): torch {tmean:.3f} "
          f"jax {jmean:.3f} (rel {rel_tail:.3%})", flush=True)
    assert rel_tail < 0.15, f"tail loss diverged {rel_tail:.3%}"
    print("LOCKSTEP OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
