"""Training state container and optimizer construction."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mdcnet_tpu.train.schedule import cyclic_triangular


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array

    def next_rngs(self, *names):
        """Split per-step rng streams deterministically from (rng, step)."""
        base = jax.random.fold_in(self.rng, self.step)
        keys = jax.random.split(base, len(names) + 1)
        return dict(zip(names, keys[1:])), keys[0]


def make_optimizer(train_cfg) -> optax.GradientTransformation:
    """AdamW + cyclic triangular LR stepped per batch
    (trail_01.py:209, 220-224)."""
    schedule = cyclic_triangular(train_cfg.base_lr, train_cfg.max_lr,
                                 train_cfg.step_size_up)
    tx = optax.adamw(learning_rate=schedule,
                     weight_decay=train_cfg.weight_decay)
    clip = getattr(train_cfg, "grad_clip_norm", 0.0)
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def create_train_state(model, cfg, rng: jax.Array,
                       sample_images, sample_tgt) -> TrainState:
    params = model.init({"params": rng}, sample_images, sample_tgt)
    if getattr(cfg.model, "pretrained_path", ""):
        # start the encoder from converted ImageNet weights (the reference
        # trains from timm pretrained=True, model.py:15-17)
        from mdcnet_tpu.models.pretrained import graft_pretrained_encoder
        params = graft_pretrained_encoder(params, cfg.model.pretrained_path)
    tx = make_optimizer(cfg.train)
    return TrainState(params=params, opt_state=tx.init(params["params"]),
                      step=jnp.zeros((), jnp.int32),
                      rng=jax.random.fold_in(rng, 1))
