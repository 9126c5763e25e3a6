"""--bn_per_replica: DataParallel per-replica BatchNorm semantics
(VERDICT r4 Next #7; reference ``interfaces/base.py:390,688,846``).

Default (sync-BN): batch stats are global reductions over the sharded
batch.  With ``set_bn_replicas(D)``: stats per contiguous batch shard —
each device normalizes with its own slice's statistics, and running
averages keep only each copy's replica-0 group (DataParallel retains the
master replica's buffer updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tatt_tpu.models.common import BatchNorm2d, bn_replicas, set_bn_replicas


@pytest.fixture(autouse=True)
def _reset_replicas():
    yield
    set_bn_replicas(1)


def _init_and_apply(x, copies=1):
    bn = BatchNorm2d(copies=copies)
    vs = bn.init(jax.random.PRNGKey(0), x, True)
    y, mut = bn.apply(vs, x, True, mutable=["batch_stats"])
    return np.asarray(y, np.float32), jax.tree.map(np.asarray, mut["batch_stats"])


def _ref_groupnorm(x, k):
    """Per-contiguous-group BN in numpy."""
    n = x.shape[0] // k
    out = np.empty_like(x)
    means, vars_ = [], []
    for g in range(k):
        sl = x[g * n : (g + 1) * n]
        m = sl.mean(axis=(0, 2, 3))
        v = sl.var(axis=(0, 2, 3))
        out[g * n : (g + 1) * n] = (sl - m[:, None, None]) / np.sqrt(
            v[:, None, None] + 1e-5
        )
        means.append(m)
        vars_.append(v * sl.size / (sl.size - x.shape[1]) if False else v)
    return out, np.stack(means), np.stack(vars_)


def test_per_replica_stats_match_per_shard_reference():
    rng = np.random.default_rng(0)
    # distinct per-shard distributions so per-replica != sync
    x = np.concatenate(
        [
            (i + 1.0) + (0.5 + 0.1 * i) * rng.standard_normal((2, 4, 3, 5))
            for i in range(8)
        ]
    ).astype(np.float32)
    xj = jnp.asarray(x)

    y_sync, _ = _init_and_apply(xj)
    set_bn_replicas(8)
    assert bn_replicas() == 8
    y_rep, stats = _init_and_apply(xj)

    want, means, _ = _ref_groupnorm(x, 8)
    np.testing.assert_allclose(y_rep, want, atol=1e-4, rtol=1e-4)
    # and it must NOT equal sync-BN on this deliberately shard-skewed batch
    assert np.abs(y_rep - y_sync).max() > 0.5

    # running stats fold only replica 0 (momentum 0.9 over zeros/ones init)
    np.testing.assert_allclose(
        stats["mean"], 0.1 * means[0], atol=1e-5, rtol=1e-5
    )


def test_per_replica_composes_with_fused_copies():
    """copies=2 (fused tssim) x replicas=4 -> 8 contiguous groups; running
    stats fold groups 0 and 4 (each copy's replica 0) in order."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 3, 2, 4)).astype(np.float32) + np.repeat(
        np.arange(8.0), 2
    ).reshape(16, 1, 1, 1).astype(np.float32)
    xj = jnp.asarray(x)
    set_bn_replicas(4)
    y, stats = _init_and_apply(xj, copies=2)
    want, means, vars_ = _ref_groupnorm(x, 8)
    np.testing.assert_allclose(y, want, atol=1e-4, rtol=1e-4)
    mom = 0.9
    n = x[:2].size // x.shape[1]
    exp_mean = (1 - mom) * means[4] + mom * (1 - mom) * means[0]
    np.testing.assert_allclose(stats["mean"], exp_mean, atol=1e-5, rtol=1e-5)
    unb = vars_ * n / (n - 1)
    exp_var = (
        mom * mom * 1.0 + mom * (1 - mom) * unb[0] + (1 - mom) * unb[4]
    )
    np.testing.assert_allclose(stats["var"], exp_var, atol=1e-4, rtol=1e-4)


def test_per_replica_is_device_local_on_the_mesh():
    """Jit the BN forward over an 8-device mesh with the batch sharded:
    per-replica groups align with shards, so the compiled module must not
    contain a cross-device collective for the stats (all-reduce appears
    only in the sync-BN default)."""
    from tatt_tpu.core.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    if len(mesh.devices.ravel()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 4, 3, 5)).astype(np.float32)

    def lowered(replicas):
        set_bn_replicas(replicas)
        bn = BatchNorm2d()
        vs = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
        xs = shard_batch(mesh, {"x": x})["x"]
        fn = jax.jit(
            lambda v, a: bn.apply(v, a, True, mutable=["batch_stats"])[0]
        )
        txt = fn.lower(vs, xs).compile().as_text()
        set_bn_replicas(1)
        return txt

    sync_hlo = lowered(1)
    rep_hlo = lowered(8)
    assert "all-reduce" in sync_hlo
    assert "all-reduce" not in rep_hlo
