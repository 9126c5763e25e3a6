"""Degradation mission — the ``TextDegrade`` trainer
(``interfaces/degradation.py:50-244``, not wired into the reference's
``main.py`` but part of its interface surface).

Trains a degradation generator (HR -> realistic LR) and a deblur generator
(degraded -> HR) jointly: ``loss = crit(degrade(HR), LR)*100 +
crit(deblur(degrade(HR)), HR)*100`` with the usual Adam + 0.25 clip.  The
reference reuses the SR generator for both roles; outputs are resized to
the target scale where the arch's native scale differs (its dead code
never resolved this).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tatt_tpu.kernels.resize import resize_bicubic
from tatt_tpu.losses.image import image_loss
from tatt_tpu.train.state import TrainState, clip_grads_per_model


def make_degrade_step(degrade_apply: Callable, deblur_apply: Callable):
    """``*_apply(variables, images, train, mutable) -> (out, mutated)``.
    State layout: sr_params = (degrade, deblur)."""

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        images_hr = batch["images_hr"]
        images_lr = batch["images_lr"]
        lh, lw = images_lr.shape[-2:]
        hh, hw = images_hr.shape[-2:]

        def loss_fn(params):
            dg_vars = {
                "params": params["sr"][0],
                "batch_stats": state.sr_batch_stats[0],
            }
            db_vars = {
                "params": params["sr"][1],
                "batch_stats": state.sr_batch_stats[1],
            }
            images_dr, dg_mut = degrade_apply(
                dg_vars, images_hr, True, mutable=["batch_stats"]
            )
            images_dr_lr = resize_bicubic(images_dr, lh, lw)
            images_sr, db_mut = deblur_apply(
                db_vars, images_dr_lr, True, mutable=["batch_stats"]
            )
            images_sr = resize_bicubic(images_sr, hh, hw)
            loss_degrade = image_loss(images_dr_lr, images_lr).mean() * 100.0
            loss_deblur = image_loss(images_sr, images_hr).mean() * 100.0
            total = loss_degrade + loss_deblur
            metrics = {
                "loss_total": total,
                "loss_degrade": loss_degrade,
                "loss_deblur": loss_deblur,
            }
            return total, (
                (dg_mut["batch_stats"], db_mut["batch_stats"]),
                metrics,
            )

        params = {"sr": state.sr_params, "student": state.student_params}
        (loss, (sr_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = {
            "sr": clip_grads_per_model(grads["sr"], 0.25),
            "student": grads["student"],
        }
        updates, new_opt_state = state.tx.update(grads, state.opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return (
            state.replace(
                step=state.step + 1,
                sr_params=new_params["sr"],
                student_params=new_params["student"],
                sr_batch_stats=sr_stats,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    return step_fn
