"""Multi-worker DataLoader: same batches, same order as single-worker."""

import numpy as np

from tatt_tpu.data.loader import DataLoader
from tatt_tpu.data.synthetic import SyntheticTextDataset


def _collect(loader):
    return [(b.images_hr.copy(), list(b.label_strs)) for b in loader]


def test_num_workers_preserves_order_and_content():
    ds = SyntheticTextDataset(n=30, seed=3)
    kw = dict(mask=True)
    a = _collect(
        DataLoader(ds, 8, shuffle=True, drop_last=False, seed=7,
                   collate_kwargs=kw, num_workers=1)
    )
    b = _collect(
        DataLoader(ds, 8, shuffle=True, drop_last=False, seed=7,
                   collate_kwargs=kw, num_workers=3, prefetch=2)
    )
    assert len(a) == len(b) == 4
    for (ha, la), (hb, lb) in zip(a, b):
        np.testing.assert_array_equal(ha, hb)
        assert la == lb


def test_num_workers_multi_epoch_reshuffles():
    ds = SyntheticTextDataset(n=16, seed=0)
    loader = DataLoader(ds, 4, shuffle=True, drop_last=True, seed=1,
                        collate_kwargs=dict(mask=True), num_workers=2)
    e1 = [tuple(b.label_strs) for b in loader]
    e2 = [tuple(b.label_strs) for b in loader]
    assert sorted(sum(e1, ())) == sorted(sum(e2, ()))
    assert e1 != e2  # epoch seed advances
