import os
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import time
import jax.numpy as jnp
import numpy as np
from tatt_tpu.core.mesh import make_mesh, replicate, shard_batch
from tatt_tpu.data.collate import collate
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.models.recognizers.crnn import CRNN
from tatt_tpu.models.tsrn import TATT
from tatt_tpu.train.state import TrainState, make_optimizer
from tatt_tpu.train.steps import StepConfig, make_eval_step, make_train_step
from tatt_tpu.losses.ssim import psnr

sr_model = TATT(srb_nums=1, hidden_units=4, out_text_channels=8, stn=True)
sr_fused = sr_model.clone(bn_copies=2)
crnn = CRNN(nh=16, nm=(8, 8, 16, 16, 32, 32, 32))
x = jnp.zeros((2, 4, 16, 64)); t = jnp.zeros((2, 37, 1, 26)); luma = jnp.zeros((2, 1, 32, 100))
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
state = TrainState.create([sr_model.init(k1, x, t, train=True)], [crnn.init(k2, luma)], make_optimizer(1e-3, 0.5))
teacher = crnn.init(k3, luma)
sr_apply = lambda v, lr, p, tr, rngs=None, mutable=False: sr_model.apply(v, lr, p, train=tr, rngs=rngs, mutable=mutable)
sr_apply_f = lambda v, lr, p, tr, rngs=None, mutable=False: sr_fused.apply(v, lr, p, train=tr, rngs=rngs, mutable=mutable)
crnn_apply = lambda v, lu, tr, mutable=False: crnn.apply(v, lu, train=tr, mutable=mutable)
cfg = StepConfig(tssim_loss=True, rotate_train=5.0, use_distill=True, fused_tssim=True)
step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_f), donate_argnums=0)
eval_step = jax.jit(make_eval_step(sr_apply, crnn_apply))

ds = SyntheticTextDataset(n=8)
batch = {k: jnp.asarray(v) for k, v in collate([ds[i] for i in range(8)]).device_arrays().items()}
mesh = make_mesh()
sharded = shard_batch(mesh, batch)
state = replicate(mesh, state)
teacher_r = replicate(mesh, teacher)
sr0, _ = eval_step(state, sharded)
p0 = float(psnr(np.asarray(sr0), np.asarray(batch["images_hr"])))
t0 = time.time()
first = None
for i in range(40):
    state, m = step(state, teacher_r, sharded, jax.random.PRNGKey(i))
    l = float(m["loss_total"])
    if first is None:
        first = l
    if i % 5 == 0 or i == 39:
        print(f"iter {i}: loss {l:.3f}", flush=True)
sr1, _ = eval_step(state, sharded)
p1 = float(psnr(np.asarray(sr1), np.asarray(batch["images_hr"])))
print(f"loss {first:.2f} -> {l:.2f} ({first/l:.1f}x), eval PSNR {p0:.2f} -> {p1:.2f} dB, {time.time()-t0:.0f}s")
assert first / l > 5.0 and p1 > p0 + 5.0, "verify drive: learning signal too weak"
print("VERIFY OK")
