import os

import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from tatt_tpu.models.tsrn import TSRN
from tatt_tpu.train.state import TrainState, make_optimizer


def test_checkpoint_roundtrip(tmp_path):
    model = TSRN(srb_nums=1, hidden_units=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 64)))
    tx = make_optimizer(1e-3)
    state = TrainState.create([variables], [{"params": {}}], tx)
    state = state.replace(step=state.step + 7)

    path = os.path.join(tmp_path, "ckpt", "checkpoint_000007.ckpt")
    save_checkpoint(path, state, info={"arch": "tsrn", "iters": 7})

    blank = TrainState.create([model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 16, 64)))], [{"params": {}}], tx)
    restored, info = restore_checkpoint(path, blank)
    assert int(restored.step) == 7
    assert info["arch"] == "tsrn"
    a = jax.tree_util.tree_leaves(state.sr_params)[0]
    b = jax.tree_util.tree_leaves(restored.sr_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
