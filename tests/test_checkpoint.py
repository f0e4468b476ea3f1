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


class TestParamsOnlySave:
    def test_save_params_feeds_restore_params(self, tmp_path):
        """Intermediate params-only saves (train_flagship --save-every)
        must stay readable through the same ``restore_params`` path the
        bench and --resume-params use, including after a later full-state
        save garbage-collects them (max_to_keep=1)."""
        cfg = test_preset()
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3))
        y = jnp.zeros((2, cfg.data.max_len - 1), jnp.int32)
        state = create_train_state(model, cfg, rng, images, y)

        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
        mgr.save_params(state.params, step=7)
        assert mgr.latest_step() == 7
        restored = mgr.restore_params(model, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        mgr.save(state, step=9)  # final full save GCs the params-only one
        assert mgr.latest_step() == 9
        restored = mgr.restore_params(model, cfg)
        assert len(jax.tree_util.tree_leaves(restored)) == len(
            jax.tree_util.tree_leaves(state.params))

    def test_full_restore_falls_back_on_params_only(self, tmp_path):
        """--resume against a params-only intermediate save must not crash
        on the TrainState structure mismatch: restore() detects the
        {"params": ...} tree and returns the template with restored params
        (fresh optimizer) plus a warning (ADVICE r04 high)."""
        cfg = test_preset()
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3))
        y = jnp.zeros((2, cfg.data.max_len - 1), jnp.int32)
        state = create_train_state(model, cfg, rng, images, y)

        mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
        mgr.save_params(state.params, step=7)

        template = create_train_state(model, cfg, jax.random.PRNGKey(9),
                                      images, y)
        restored = mgr.restore(template)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state comes from the template (fresh), not the ckpt
        for a, b in zip(jax.tree_util.tree_leaves(template.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResume:
    def test_train_from_config_resumes_latest(self, tmp_path):
        """Kill/restart continuity: a second train_from_config run on the
        same checkpoint dir picks up params+moments+step (VERDICT r1 item 8)."""
        import dataclasses
        from mdcnet_tpu.train.loop import train_from_config
        from tests.test_pipeline import synthetic_records
        from tests.test_text import make_tokenizer

        cfg = test_preset()
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, batch_size=4),
            train=dataclasses.replace(cfg.train, patience=100,
                                      checkpoint_dir=str(tmp_path / "ck")))
        rec = synthetic_records(48)  # valid split must exceed one batch
        tok = make_tokenizer(max_len=cfg.data.max_len)

        s1 = train_from_config(cfg, rec, tok, synthetic_images=True,
                               epochs=1)
        first_steps = int(s1.step)
        assert first_steps > 0
        s2 = train_from_config(cfg, rec, tok, synthetic_images=True,
                               epochs=1)
        assert int(s2.step) > first_steps  # continued, not restarted
        s3 = train_from_config(cfg, rec, tok, synthetic_images=True,
                               epochs=1, resume=False)
        assert int(s3.step) == first_steps  # fresh start when disabled
