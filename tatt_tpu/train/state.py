"""Train state: SR model(s) + student recognizer(s) + one joint optimizer.

Reference semantics being reproduced (``interfaces/super_resolution.py``,
``interfaces/base.py:496-563``):
  - ``model_list``: ``stu_iter`` SR models unless ``--sr_share`` (:466-469)
  - ``aster_student``: ``stu_iter`` trainable CRNNs unless ``--tpg_share``
  - one Adam(lr, betas=(beta1, 0.999)) over SR + student parameters
  - checkpoints store params AND optimizer state (fixing the reference gap
    where optimizer state is dropped, SURVEY §5.4)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    sr_params: tuple
    sr_batch_stats: tuple
    student_params: tuple
    student_batch_stats: tuple
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, sr_variables, student_variables, tx):
        """``sr_variables``/``student_variables``: lists of flax variable
        dicts ({'params': ..., 'batch_stats': ...})."""
        sr_params = tuple(v["params"] for v in sr_variables)
        sr_stats = tuple(v.get("batch_stats", {}) for v in sr_variables)
        stu_params = tuple(v["params"] for v in student_variables)
        stu_stats = tuple(v.get("batch_stats", {}) for v in student_variables)
        opt_state = tx.init({"sr": sr_params, "student": stu_params})
        return cls(
            step=jnp.zeros((), jnp.int32),
            sr_params=sr_params,
            sr_batch_stats=sr_stats,
            student_params=stu_params,
            student_batch_stats=stu_stats,
            opt_state=opt_state,
            tx=tx,
        )


def make_optimizer(lr: float, beta1: float = 0.5) -> optax.GradientTransformation:
    """Adam(lr, betas=(beta1, 0.999)) as the reference configures
    (``base.py:527-528``, ``config`` beta1 0.5)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=beta1, b2=0.999)


def clip_grads_per_model(grads, max_norm: float = 0.25):
    """torch ``clip_grad_norm_(model.parameters(), 0.25)`` applied to each
    SR model separately (``super_resolution.py:1083-1084``); student grads
    are NOT clipped in the reference."""

    def clip_one(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        total = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
        scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
        return jax.tree_util.tree_map(lambda x: x * scale.astype(x.dtype), tree)

    return tuple(clip_one(g) for g in grads)
