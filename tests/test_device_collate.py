"""Device-collate fast path: uint8 batches normalized inside the jitted
step must match the host collate (``resizeNormalize`` semantics,
``dataset/dataset.py:1266-1319``) and produce identical training steps.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.data.collate import collate
from tatt_tpu.data.device_pipeline import (
    device_normalize,
    host_normalize_u8,
    prep_image_batch,
)
from tatt_tpu.data.synthetic import SyntheticTextDataset


def _samples(n=8, seed=3):
    ds = SyntheticTextDataset(n=n, seed=seed)
    return [ds[i] for i in range(n)]


def test_device_normalize_matches_host_collate():
    samples = _samples()
    host = collate(samples, mask=True)
    raw = collate(samples, mask=True, raw=True)
    assert raw.images_hr.dtype == np.uint8
    assert raw.images_hr.shape == (8, 32, 128, 3)

    dev_hr = np.asarray(device_normalize(jnp.asarray(raw.images_hr), True))
    dev_lr = np.asarray(device_normalize(jnp.asarray(raw.images_lr), True))
    # RGB channels are the same arithmetic on both paths -> bit-equal;
    # the mask's PIL fixed-point luma is integer-exact, only the mean
    # threshold can tie-break differently (float summation order)
    np.testing.assert_array_equal(dev_hr[:, :3], host.images_hr[:, :3])
    np.testing.assert_array_equal(dev_lr[:, :3], host.images_lr[:, :3])
    assert np.mean(dev_hr[:, 3] != host.images_hr[:, 3]) < 1e-3
    assert np.mean(dev_lr[:, 3] != host.images_lr[:, 3]) < 1e-3

    # numpy twin used by eval-side consumers
    np.testing.assert_array_equal(
        host_normalize_u8(raw.images_hr, True)[:, :3], host.images_hr[:, :3]
    )


def test_label_tensors_identical_between_paths():
    samples = _samples()
    host = collate(samples, mask=True)
    raw = collate(samples, mask=True, raw=True)
    np.testing.assert_array_equal(host.label_vecs, raw.label_vecs)
    np.testing.assert_array_equal(host.ctc_targets, raw.ctc_targets)
    np.testing.assert_array_equal(host.weighted_tics, raw.weighted_tics)
    assert host.label_strs == raw.label_strs


def test_train_step_accepts_raw_batch():
    """The same jitted step runs uint8 and float batches; losses agree to
    mask-tie tolerance (the arithmetic is shared once prepped)."""
    from tatt_tpu.core.mesh import make_mesh, replicate, shard_batch
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer
    from tatt_tpu.train.steps import StepConfig, make_train_step

    samples = _samples()
    host = collate(samples, mask=True).device_arrays()
    raw = collate(samples, mask=True, raw=True).device_arrays()
    assert raw["images_lr"].dtype == np.uint8

    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(0)
    sr_model = TATT(srb_nums=1, hidden_units=4, out_text_channels=8)
    crnn = CRNN(nh=8, nm=(4, 4, 8, 8, 16, 16, 16))
    k1, k2, k3 = jax.random.split(rng, 3)
    sr_vars = sr_model.init(
        k1, jnp.zeros((2, 4, 16, 64)), jnp.zeros((2, 37, 1, 26)), train=True
    )
    stu_vars = crnn.init(k2, jnp.zeros((2, 1, 32, 100)))
    teacher = replicate(mesh, crnn.init(k3, jnp.zeros((2, 1, 32, 100))))

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(variables, lr, prior, train=train, rngs=rngs, mutable=mutable)

    def crnn_apply(variables, luma, train, mutable=False):
        return crnn.apply(variables, luma, train=train, mutable=mutable)

    cfg = StepConfig(
        tssim_loss=False, rotate_train=0.0, use_distill=True, mask=True
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    tx = make_optimizer(1e-3, 0.5)

    s_host = replicate(mesh, TrainState.create([sr_vars], [stu_vars], tx))
    s_raw = replicate(mesh, TrainState.create([sr_vars], [stu_vars], tx))
    _, m_host = step(s_host, teacher, shard_batch(mesh, host), jax.random.PRNGKey(1))
    _, m_raw = step(s_raw, teacher, shard_batch(mesh, raw), jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_raw["loss_total"]), float(m_host["loss_total"]), rtol=1e-5
    )


def test_prep_passthrough_for_float_batches():
    batch = {"images_hr": jnp.zeros((2, 4, 8, 8)), "other": jnp.ones((2,))}
    out = prep_image_batch(batch, True)
    assert out["images_hr"] is batch["images_hr"]
