"""Text-prior distillation loss.

``semantic_loss`` mirrors ``loss/semantic_loss.py:10-38``: mean |gt - pred|
plus torch ``KLDivLoss`` (default reduction 'mean' — i.e. elementwise mean,
not batchmean) between log(pred) and the teacher distribution.  The train
loop scales by 100 (``interfaces/super_resolution.py:879``).
"""

from __future__ import annotations

import jax.numpy as jnp


def semantic_loss(pred_vec: jnp.ndarray, gt_vec: jnp.ndarray) -> jnp.ndarray:
    """``pred_vec``/``gt_vec``: softmax distributions, any matching shape
    (reference feeds [T, B, C] softmax outputs)."""
    margin_loss = jnp.abs(gt_vec - pred_vec).mean()
    # torch KLDivLoss(log_input, target) mean: mean(target*(log target - log_input))
    gt = gt_vec + 1e-20
    kl = gt * (jnp.log(gt) - jnp.log(pred_vec + 1e-20))
    ce_loss = kl.mean()
    return margin_loss + ce_loss
