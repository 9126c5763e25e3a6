import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.data.collate import collate
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.models.tsrn import TSRN
from tatt_tpu.train.degrade import make_degrade_step
from tatt_tpu.train.state import TrainState, make_optimizer


def test_degrade_mission_step():
    model = TSRN(srb_nums=1, hidden_units=4)
    x = jnp.zeros((2, 4, 16, 64))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    variables = [model.init(k, x, train=True) for k in keys]

    def apply_fn(v, images, train, mutable=False):
        # TSRN natively expects LR input; the mission resizes around it
        out = model.apply(v, images[:, :4], train=train, mutable=mutable)
        if mutable:
            return out
        return out, {"batch_stats": {}}

    tx = make_optimizer(1e-3)
    state = TrainState.create(variables, [{"params": {}}], tx)
    step = jax.jit(make_degrade_step(apply_fn, apply_fn))

    ds = SyntheticTextDataset(n=4)
    batch = collate([ds[i] for i in range(4)]).device_arrays()
    # degrade model consumes HR: resize HR to the model's input size first
    from tatt_tpu.kernels.resize import resize_bicubic

    batch["images_hr"] = np.asarray(batch["images_hr"])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))
