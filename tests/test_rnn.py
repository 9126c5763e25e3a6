"""BiGRU/BiLSTM parity vs torch cuDNN-semantics RNNs."""

import numpy as np
import torch

from tatt_tpu.kernels.rnn import bigru_apply, bilstm_apply


def _torch_rnn_params(rnn):
    w_ih = np.stack(
        [rnn.weight_ih_l0.detach().numpy(), rnn.weight_ih_l0_reverse.detach().numpy()]
    )
    w_hh = np.stack(
        [rnn.weight_hh_l0.detach().numpy(), rnn.weight_hh_l0_reverse.detach().numpy()]
    )
    b_ih = np.stack(
        [rnn.bias_ih_l0.detach().numpy(), rnn.bias_ih_l0_reverse.detach().numpy()]
    )
    b_hh = np.stack(
        [rnn.bias_hh_l0.detach().numpy(), rnn.bias_hh_l0_reverse.detach().numpy()]
    )
    return w_ih, w_hh, b_ih, b_hh


def test_bigru_matches_torch():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    rows, length, in_f, hidden = 6, 16, 12, 8
    rnn = torch.nn.GRU(in_f, hidden, bidirectional=True, batch_first=True)
    x = np.random.default_rng(1).standard_normal((rows, length, in_f)).astype(
        np.float32
    )
    want = rnn(torch.from_numpy(x))[0].detach().numpy()
    got = np.asarray(bigru_apply(x, *_torch_rnn_params(rnn)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bilstm_matches_torch():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    rows, length, in_f, hidden = 4, 26, 16, 8
    rnn = torch.nn.LSTM(in_f, hidden, bidirectional=True, batch_first=True)
    x = np.random.default_rng(2).standard_normal((rows, length, in_f)).astype(
        np.float32
    )
    want = rnn(torch.from_numpy(x))[0].detach().numpy()
    got = np.asarray(bilstm_apply(x, *_torch_rnn_params(rnn)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
