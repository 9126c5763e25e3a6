"""CTC loss — log-semiring forward algorithm as a ``lax.scan``.

Replaces ``torch.nn.CTCLoss(blank=0, reduction='none')`` used by the
``--use_label`` text-focus loss (``interfaces/super_resolution.py:51,
842-852``).  Static shapes: targets are padded to a fixed max length and
masked by ``target_lengths``, so the whole loss jits into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ctc_loss(
    log_probs: jnp.ndarray,  # [T, B, C] log-softmax outputs
    targets: jnp.ndarray,  # [B, S] class ids (blank=0 excluded)
    input_lengths: jnp.ndarray,  # [B]
    target_lengths: jnp.ndarray,  # [B]
    blank: int = 0,
) -> jnp.ndarray:
    """Per-sample negative log likelihood [B] (reduction='none')."""
    # The log-semiring scan accumulates ~T=26 logaddexp steps; in bf16
    # the per-step rounding (rel 2^-8) compounds into O(0.1) nll error.
    # Always run the dynamic program in f32 (pinned by
    # tests/test_precision_audit.py).
    log_probs = log_probs.astype(jnp.float32)
    t_max, b, c = log_probs.shape
    s_max = targets.shape[1]
    l = 2 * s_max + 1  # extended label length

    # extended label sequence: blank, t1, blank, t2, ..., blank
    ext = jnp.full((b, l), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)

    # transitions: alpha[s] <- alpha[s] + alpha[s-1] (+ alpha[s-2] if the
    # current label differs from the one two back and is not blank)
    ids = jnp.arange(l)
    is_label = (ids % 2) == 1
    ext_prev2 = jnp.concatenate(
        [jnp.full((b, 2), -1, targets.dtype), ext[:, :-2]], axis=1
    )
    allow_skip = is_label[None, :] & (ext != ext_prev2)

    # valid extended positions per sample: s < 2*target_len + 1
    ext_valid = ids[None, :] < (2 * target_lengths[:, None] + 1)

    def emit(lp_t):
        # lp_t: [B, C] -> [B, L] log prob of each extended symbol
        return jnp.take_along_axis(lp_t, ext, axis=1)

    alpha0 = jnp.full((b, l), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[0, jnp.arange(b), blank])
    first_label = jnp.take_along_axis(
        log_probs[0], ext[:, 1:2], axis=1
    )[:, 0]
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(target_lengths > 0, first_label, NEG_INF)
    )

    def step(carry, inputs):
        alpha, t = carry, inputs["t"]
        lp = inputs["lp"]  # [B, C]
        shift1 = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1
        )
        shift2 = jnp.concatenate(
            [jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1
        )
        shift2 = jnp.where(allow_skip, shift2, NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(alpha, shift1), shift2)
        new_alpha = merged + emit(lp)
        new_alpha = jnp.where(ext_valid, new_alpha, NEG_INF)
        # freeze alpha past each sample's input length
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    ts = jnp.arange(1, t_max)
    alpha, _ = jax.lax.scan(
        step, alpha0, {"t": ts, "lp": log_probs[1:]}
    )

    # final: logaddexp of positions 2*len and 2*len-1
    end_blank = 2 * target_lengths
    end_label = jnp.maximum(2 * target_lengths - 1, 0)
    a_blank = jnp.take_along_axis(alpha, end_blank[:, None], axis=1)[:, 0]
    a_label = jnp.where(
        target_lengths > 0,
        jnp.take_along_axis(alpha, end_label[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    return -jnp.logaddexp(a_blank, a_label)
