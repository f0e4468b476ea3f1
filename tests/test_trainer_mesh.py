"""Mesh-aware Trainer: data-parallel training on the virtual device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.parallel import sharding as sh
from mdcnet_tpu.train.loop import Trainer
from mdcnet_tpu.train.state import create_train_state
from tests.test_pipeline import synthetic_records
from tests.test_text import make_tokenizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


class TestMeshTrainer:
    def test_dp_training_epoch_runs_and_learns(self):
        import dataclasses
        cfg = test_preset()
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=8))
        from mdcnet_tpu.data.pipeline import make_loaders
        rec = synthetic_records(40)
        tok = make_tokenizer(max_len=cfg.data.max_len)
        train_loader, _, _ = make_loaders(rec, tok, cfg.data,
                                          synthetic_images=True)
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(
            model, cfg, rng,
            jnp.zeros((8, cfg.data.img_size, cfg.data.img_size, 3)),
            jnp.zeros((8, cfg.data.max_len - 1), jnp.int32))

        mesh = sh.make_mesh(data=4, model=2)
        trainer = Trainer(model, cfg, mesh=mesh)
        state = trainer.shard_state(state)
        with mesh:
            state, m0 = trainer.train_epoch(state, train_loader)
            state, m1 = trainer.train_epoch(state, train_loader)
        assert m1["ce_loss"] < m0["ce_loss"]
        # params stayed sharded through updates
        leaf = state.params["params"]["decoder"]["layer0"]["linear1"]["kernel"]
        assert any(ax is not None for ax in leaf.sharding.spec)
