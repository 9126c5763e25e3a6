"""JAX side of the tri_ssim input-gradient comparison on the dumped
tensors (CPU, no model): compute (1 - tri_ssim(srr, sr, hr)) * 10 and
input grads — compare against term_grads_torch.py line by line.

Run: JAX_PLATFORMS=cpu python experiments/term_grads_jax_inputs.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from tatt_tpu.losses.ssim import tri_ssim

for it in range(10):
    path = f"/tmp/tssim_tensors_step{it}.npz"
    if not os.path.exists(path):
        continue
    d = np.load(path)

    def loss_fn(srr, sr):
        return (1.0 - tri_ssim(srr, sr, jnp.asarray(d["hr"]))) * 10.0

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(d["sr_ret_rot"]), jnp.asarray(d["sr"])
    )
    gsrr, gsr = grads
    print(
        f"step {it}: loss {float(loss):.4f} "
        f"|grad sr| {float(jnp.linalg.norm(gsr)):.2f} "
        f"|grad sr_ret| {float(jnp.linalg.norm(gsrr)):.2f}",
        flush=True,
    )
