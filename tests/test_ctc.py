"""CTC loss parity vs torch.nn.CTCLoss(blank=0, reduction='none')."""

import numpy as np
import torch

from tatt_tpu.kernels.ctc import ctc_loss


def test_ctc_matches_torch():
    torch.manual_seed(0)
    torch.set_num_threads(1)
    T, B, C, S = 26, 4, 37, 10
    logits = torch.randn(T, B, C)
    log_probs = logits.log_softmax(2)
    target_lengths = torch.tensor([3, 10, 1, 7])
    targets_padded = torch.zeros(B, S, dtype=torch.long)
    flat = []
    for i, tl in enumerate(target_lengths):
        vals = torch.randint(1, C, (int(tl),))
        targets_padded[i, : int(tl)] = vals
        flat.append(vals)
    input_lengths = torch.full((B,), T, dtype=torch.long)

    want = torch.nn.CTCLoss(blank=0, reduction="none")(
        log_probs, torch.cat(flat), input_lengths, target_lengths
    ).numpy()

    got = np.asarray(
        ctc_loss(
            log_probs.numpy(),
            targets_padded.numpy(),
            input_lengths.numpy(),
            target_lengths.numpy(),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_ctc_repeated_labels():
    torch.manual_seed(1)
    torch.set_num_threads(1)
    T, B, C = 12, 2, 5
    log_probs = torch.randn(T, B, C).log_softmax(2)
    # repeated labels exercise the skip-transition mask
    targets_padded = torch.tensor([[2, 2, 3, 0], [1, 1, 1, 1]])
    target_lengths = torch.tensor([3, 4])
    input_lengths = torch.full((B,), T, dtype=torch.long)
    flat = torch.tensor([2, 2, 3, 1, 1, 1, 1])
    want = torch.nn.CTCLoss(blank=0, reduction="none")(
        log_probs, flat, input_lengths, target_lengths
    ).numpy()
    got = np.asarray(
        ctc_loss(
            log_probs.numpy(),
            targets_padded.numpy(),
            input_lengths.numpy(),
            target_lengths.numpy(),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_ctc_zero_length_target():
    torch.set_num_threads(1)
    T, B, C = 8, 2, 5
    log_probs = torch.randn(T, B, C).log_softmax(2)
    targets_padded = torch.tensor([[0, 0], [1, 2]])
    target_lengths = torch.tensor([0, 2])
    input_lengths = torch.full((B,), T, dtype=torch.long)
    want = torch.nn.CTCLoss(blank=0, reduction="none")(
        log_probs, torch.tensor([1, 2]), input_lengths, target_lengths
    ).numpy()
    got = np.asarray(
        ctc_loss(
            log_probs.numpy(),
            targets_padded.numpy(),
            input_lengths.numpy(),
            target_lengths.numpy(),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
