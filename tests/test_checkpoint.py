"""Checkpoint save/restore round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.train.checkpoint import CheckpointManager
from mdcnet_tpu.train.state import create_train_state
from mdcnet_tpu.train.step import make_train_step


class TestCheckpoint:
    def test_roundtrip_preserves_params_and_step(self, tmp_path):
        cfg = test_preset()
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3))
        y = np.full((2, cfg.data.max_len), PAD_ID, np.int32)
        y[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        state = create_train_state(model, cfg, rng, images, y[:, :-1])
        train_step, eval_step = make_train_step(model, cfg)
        state, _ = train_step(state, images, y)

        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
        mgr.save(state)
        assert mgr.latest_step() == 1

        template = create_train_state(model, cfg, jax.random.PRNGKey(9),
                                      images, y[:, :-1])
        restored = mgr.restore(template)
        assert int(restored.step) == 1
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored leaves must be device arrays (numpy leaves re-upload
        # per jitted call — the tunnel trap documented in docs/PERF.md)
        leaf = jax.tree_util.tree_leaves(restored.params)[0]
        assert isinstance(leaf, jax.Array)

        # training continues from the restored state
        restored, metrics = train_step(restored, images, y)
        assert int(restored.step) == 2
        assert np.isfinite(float(metrics["total_loss"]))
