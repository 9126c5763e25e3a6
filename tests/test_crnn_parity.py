"""CRNN forward parity against a torch implementation with the reference
architecture and state-dict key layout (``model/crnn/crnn.py:29-92``)."""

import numpy as np
import torch
import torch.nn as nn

from tatt_tpu.core.torch_import import import_crnn
from tatt_tpu.models.recognizers.crnn import CRNN


class _TorchBiLSTM(nn.Module):
    def __init__(self, n_in, n_hidden, n_out):
        super().__init__()
        self.rnn = nn.LSTM(n_in, n_hidden, bidirectional=True)
        self.embedding = nn.Linear(n_hidden * 2, n_out)

    def forward(self, x):
        rec, _ = self.rnn(x)
        t, b, h = rec.size()
        out = self.embedding(rec.view(t * b, h))
        return out.view(t, b, -1)


def _torch_crnn(nclass=37, nh=256, nm=(64, 128, 256, 256, 512, 512, 512)):
    ks = [3, 3, 3, 3, 3, 3, 2]
    ps = [1, 1, 1, 1, 1, 1, 0]
    cnn = nn.Sequential()
    n_in = 1
    for i in range(7):
        cnn.add_module(f"conv{i}", nn.Conv2d(n_in, nm[i], ks[i], 1, ps[i]))
        if i in (2, 4, 6):
            cnn.add_module(f"batchnorm{i}", nn.BatchNorm2d(nm[i]))
        cnn.add_module(f"relu{i}", nn.ReLU(True))
        if i == 0:
            cnn.add_module("pool0", nn.MaxPool2d(2, 2))
        elif i == 1:
            cnn.add_module("pool1", nn.MaxPool2d(2, 2))
        elif i == 3:
            cnn.add_module("pool2", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        elif i == 5:
            cnn.add_module("pool3", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
        n_in = nm[i]

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = cnn
            self.rnn = nn.Sequential(
                _TorchBiLSTM(nm[6], nh, nh), _TorchBiLSTM(nh, nh, nclass)
            )

        def forward(self, x):
            conv = self.cnn(x)
            b, c, h, w = conv.size()
            assert h == 1
            conv = conv.squeeze(2).permute(2, 0, 1)
            return self.rnn(conv)

    return M()


def test_crnn_forward_parity():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    nm = (8, 8, 16, 16, 32, 32, 32)
    tm = _torch_crnn(nh=16, nm=nm).eval()
    x = np.random.default_rng(0).standard_normal((2, 1, 32, 100)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = import_crnn(sd)
    model = CRNN(nh=16, nm=nm)
    got = np.asarray(model.apply(variables, x, train=False))
    assert got.shape == want.shape == (26, 2, 37)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)
