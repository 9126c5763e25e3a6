"""End-to-end Trainer throughput on the chip (host collate + transfer +
device step), vs bench.py's device-only rate.

bench.py reuses one resident device batch, so it prices the jitted step
alone.  Real training pays the host pipeline AND the host->device batch
transfer — on this relay-attached chip the transfer rides the tunnel, so
the gap between this number and bench.py bounds the relay/transfer tax.

Prints the Trainer's own periodic "(N img/s)" logs; the LAST line is the
steady-state estimate (cumulative, so run enough iters that the compile
amortizes — default 300).

Run (real chip): python experiments/trainer_rate.py [iters]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")


def main(iters: int = 300) -> None:
    from tatt_tpu.cli.main import main as cli_main

    argv = [
        "--arch", "tatt", "--batch_size", "64", "--STN", "--mask",
        "--use_distill", "--gradient", "--sr_share", "--stu_iter", "1",
        "--rotate_train", "5.0", "--tssim_loss", "--test_model", "CRNN",
        "--synthetic", "1024", "--max_iters", str(iters),
        "--workers", "1", "--vis_dir", "/tmp/trainer_rate_vis",
    ]  # keep iters < valInterval(400) so no eval pass skews the timing
    cli_main(argv)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
