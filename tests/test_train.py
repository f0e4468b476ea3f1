"""Training step tests: loss semantics, schedule, and one optimization step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.models import build_model
from mdcnet_tpu.train import losses
from mdcnet_tpu.train.schedule import cyclic_triangular
from mdcnet_tpu.train.state import create_train_state
from mdcnet_tpu.train.step import make_train_step


class TestLosses:
    def test_ce_matches_torch_ignore_index(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(2, 6, 310)).astype(np.float32)
        targets = rng.integers(0, 305, size=(2, 6))
        targets[0, 4:] = PAD_ID
        want = torch.nn.functional.cross_entropy(
            torch.tensor(logits).reshape(-1, 310),
            torch.tensor(targets).reshape(-1), ignore_index=PAD_ID).item()
        got = float(losses.cross_entropy_ignore_pad(
            jnp.asarray(logits), jnp.asarray(targets)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_coord_smoothed_ce_sigma0_is_plain_ce(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(2, 6, 310)).astype(np.float32))
        targets = jnp.asarray(rng.integers(0, 305, size=(2, 6)))
        a = losses.cross_entropy_ignore_pad(logits, targets)
        b = losses.coord_smoothed_cross_entropy(logits, targets,
                                                num_bins=224, sigma=0.0)
        np.testing.assert_allclose(float(a), float(b))

    def test_coord_smoothing_rewards_near_miss(self):
        """A 1-bin coordinate miss must cost less than a 50-bin miss under
        smoothing, while one-hot CE prices them identically."""
        num_bins, v = 224, 310
        tgt = jnp.asarray([[100]])
        mk = lambda peak: jnp.zeros((1, 1, v)).at[0, 0, peak].set(8.0)
        near, far = mk(101), mk(150)
        sig = lambda lg: float(losses.coord_smoothed_cross_entropy(
            lg, tgt, num_bins=num_bins, sigma=2.0))
        hard = lambda lg: float(losses.cross_entropy_ignore_pad(lg, tgt))
        assert sig(near) < sig(far)
        np.testing.assert_allclose(hard(near), hard(far), rtol=1e-6)

    def test_coord_smoothing_leaves_word_targets_one_hot(self):
        """Targets outside the coordinate window (labels/words/specials)
        must be priced exactly like plain CE."""
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(2, 5, 310)).astype(np.float32))
        targets = jnp.asarray(rng.integers(258, 305, size=(2, 5)))  # no coords
        a = losses.cross_entropy_ignore_pad(logits, targets)
        b = losses.coord_smoothed_cross_entropy(logits, targets,
                                                num_bins=224, sigma=2.0)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_l1_is_sum_of_abs(self):
        params = {"a": jnp.array([1.0, -2.0]), "b": {"c": jnp.array([[3.0]])}}
        assert float(losses.l1_regularization(params)) == 6.0

    def test_composite_weighting(self):
        logits = jnp.zeros((1, 3, 10))
        targets = jnp.array([[1, 2, 3]])
        params = {"w": jnp.array([2.0])}
        total, m = losses.composite_loss(logits, targets, params,
                                         jnp.asarray(0.8),
                                         iou_loss_weight=0.5, l1_lambda=1e-7)
        want = 0.5 * m["ce_loss"] + 1e-7 * 2.0 + 0.5 * 0.8
        np.testing.assert_allclose(float(total), float(want), rtol=1e-6)

    def test_nondiff_giou_carries_no_gradient(self):
        def f(g):
            total, _ = losses.composite_loss(
                jnp.zeros((1, 2, 5)), jnp.array([[1, 2]]), {"w": jnp.ones(1)},
                g, replicate_nondiff_giou=True)
            return total
        assert float(jax.grad(f)(jnp.asarray(0.7))) == 0.0
        def f2(g):
            total, _ = losses.composite_loss(
                jnp.zeros((1, 2, 5)), jnp.array([[1, 2]]), {"w": jnp.ones(1)},
                g, replicate_nondiff_giou=False)
            return total
        assert float(jax.grad(f2)(jnp.asarray(0.7))) == 0.5


class TestSchedule:
    def test_matches_torch_cyclic_lr(self):
        torch = pytest.importorskip("torch")
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1e-5)
        sched = torch.optim.lr_scheduler.CyclicLR(
            opt, base_lr=1e-7, max_lr=1e-4, step_size_up=5,
            mode="triangular", cycle_momentum=False)
        ours = cyclic_triangular(1e-7, 1e-4, 5)
        for step in range(23):
            want = opt.param_groups[0]["lr"]
            got = float(ours(step))
            np.testing.assert_allclose(got, want, rtol=1e-6,
                                       err_msg=f"step {step}")
            opt.step()
            sched.step()


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = test_preset()
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(
            rng, (2, cfg.data.img_size, cfg.data.img_size, 3))
        y = np.full((2, cfg.data.max_len), PAD_ID, np.int32)
        seq = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
        y[:, :len(seq)] = seq
        y = jnp.asarray(y)
        state = create_train_state(model, cfg, rng, images, y[:, :-1])
        return cfg, model, state, images, y

    def test_step_decreases_ce(self, setup):
        cfg, model, state, images, y = setup
        train_step, eval_step = make_train_step(model, cfg)
        m0, _ = eval_step(state, images, y)
        for _ in range(4):
            state, metrics = train_step(state, images, y)
        m1, _ = eval_step(state, images, y)
        assert float(m1["ce_loss"]) < float(m0["ce_loss"])
        assert int(state.step) == 4
        for key in ("ce_loss", "giou_loss", "total_loss", "l1_norm",
                    "mean_max_iou"):
            assert key in metrics

    def test_metrics_finite(self, setup):
        cfg, model, state, images, y = setup
        train_step, _ = make_train_step(model, cfg)
        _, metrics = train_step(state, images, y)
        for k, v in metrics.items():
            if k == "mean_max_iou":
                continue  # may be nan when nothing decodes early in training
            assert np.isfinite(float(v)), k


class TestValidEpochBattery:
    def test_valid_epoch_reports_bleu_and_map(self):
        """valid_epoch with a tokenizer reports the reference's validation
        metric battery: BLEU + per-epoch mAP@0.3 + per-class AP
        (train_val_epoch.py:477-518,630-665)."""
        import dataclasses
        from mdcnet_tpu.data.pipeline import make_loaders
        from mdcnet_tpu.train.loop import Trainer
        from tests.test_pipeline import synthetic_records
        from tests.test_text import make_tokenizer

        cfg = test_preset()
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=4))
        rec = synthetic_records(48)
        tok = make_tokenizer(max_len=cfg.data.max_len)
        _, valid_loader, _ = make_loaders(rec, tok, cfg.data,
                                          synthetic_images=True)
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(
            model, cfg, rng,
            jnp.zeros((4, cfg.data.img_size, cfg.data.img_size, 3)),
            jnp.zeros((4, cfg.data.max_len - 1), jnp.int32))
        trainer = Trainer(model, cfg)
        out = trainer.valid_epoch(state, valid_loader, tokenizer=tok)
        for key in ("ce_loss", "giou_loss", "bleu", "map@0.3"):
            assert key in out, key
        assert 0.0 <= out["bleu"] <= 1.0
        assert any(k.startswith("map@0.3/class_") for k in out)


class TestDifferentiableGiou:
    def test_gradient_flows_through_box_head(self):
        from mdcnet_tpu.train.losses import differentiable_giou_loss
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 12, 332)).astype(np.float32))
        y = np.full((2, 12), PAD_ID, np.int32)
        y[:, :11] = [303, 270, 304, 263, 10, 20, 110, 120, 301, PAD_ID, PAD_ID]
        y = jnp.asarray(y)
        loss, grads = jax.value_and_grad(
            lambda lg: differentiable_giou_loss(lg, y, 224, 224, 224))(logits)
        assert np.isfinite(float(loss))
        # gradient is nonzero exactly at the coordinate positions (4..7)
        g = np.asarray(grads)
        assert np.abs(g[:, 4:8, :224]).sum() > 0
        assert np.abs(g[:, :4]).sum() == 0

    def test_label_anchor_skips_caption_class_word(self):
        """The caption contains the defect-class WORD under the same id as
        the label token (data_processing.py:17-33); the loss must anchor on
        the label slot after CAP_END, not the caption word.  Round-3
        regression: the wrong anchor froze every --diff-giou run at a
        constant ~1.33 GIoU."""
        from mdcnet_tpu.train.losses import differentiable_giou_loss
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 14, 332)).astype(np.float32))
        # [CAP_START, 'the', 'silk_spot'(=263!), 'left', CAP_END,
        #  label=263, x0, y0, x1, y1, EOS, PAD...]
        y = np.full((1, 14), PAD_ID, np.int32)
        y[0, :11] = [303, 270, 263, 271, 304, 263, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        loss, grads = jax.value_and_grad(
            lambda lg: differentiable_giou_loss(lg, y, 224, 224, 224))(logits)
        assert np.isfinite(float(loss))
        g = np.asarray(grads)
        # true coordinate positions 6..9 carry gradient
        assert np.abs(g[:, 6:10, :224]).sum() > 0
        # caption positions (incl. the class word at 2 and its following
        # words) carry none
        assert np.abs(g[:, :6]).sum() == 0

    def test_loss_bounded_for_inverted_expected_boxes(self):
        """Expected coordinates are independent softmax means; when the
        model is untrained x1 < x0 happens routinely and an unordered box
        makes GIoU unbounded (round-3 divergence: giou metric hit -74 and
        its gradient destroyed the run).  The loss must stay in [0, 2]."""
        from mdcnet_tpu.train.losses import differentiable_giou_loss
        y = np.full((4, 14), PAD_ID, np.int32)
        y[:, :11] = [303, 270, 263, 271, 304, 263, 10, 20, 110, 120, 301]
        rng = np.random.default_rng(3)
        # strongly peaked logits forcing inverted expected boxes
        logits = np.full((4, 14, 332), -20.0, np.float32)
        logits[:, 6, 200] = 20.0   # x0 -> ~200
        logits[:, 7, 180] = 20.0   # y0 -> ~180
        logits[:, 8, 5] = 20.0     # x1 -> ~5   (inverted)
        logits[:, 9, 3] = 20.0     # y1 -> ~3   (inverted)
        loss = differentiable_giou_loss(jnp.asarray(logits), jnp.asarray(y),
                                        224, 224, 224)
        assert 0.0 <= float(loss) <= 2.0

    def test_caption_less_sequence_still_anchors(self):
        """NEU-style label-first sequences have no CAP_START/END; the label
        search must then cover the whole row."""
        from mdcnet_tpu.train.losses import differentiable_giou_loss
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(1, 10, 332)).astype(np.float32))
        y = np.full((1, 10), PAD_ID, np.int32)
        y[0, :6] = [260, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        loss, grads = jax.value_and_grad(
            lambda lg: differentiable_giou_loss(lg, y, 224, 224, 224))(logits)
        assert np.isfinite(float(loss))
        g = np.asarray(grads)
        assert np.abs(g[:, 1:5, :224]).sum() > 0

    def test_train_step_with_fix_flag(self):
        import dataclasses
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model
        from mdcnet_tpu.train.state import create_train_state
        from mdcnet_tpu.train.step import make_train_step
        cfg = test_preset()
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, replicate_nondiff_giou=False))
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        images = jax.random.uniform(rng, (2, cfg.data.img_size,
                                          cfg.data.img_size, 3))
        y = np.full((2, cfg.data.max_len), PAD_ID, np.int32)
        y[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        state = create_train_state(model, cfg, rng, images, y[:, :-1])
        train_step, _ = make_train_step(model, cfg)
        state, metrics = train_step(state, images, y)
        assert np.isfinite(float(metrics["giou_loss"]))
        assert float(metrics["giou_loss"]) > 0


class TestGradAccum:
    def test_accum2_matches_single_batch(self):
        """With dropout off and the differentiable box loss, 2 accumulated
        micro-batches produce the same optimizer step as the full batch
        (mean-of-means == global mean for equal micro sizes)."""
        import dataclasses
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.models import build_model
        from mdcnet_tpu.train.state import create_train_state
        from mdcnet_tpu.train.step import make_train_step

        cfg = test_preset()
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train,
                                      replicate_nondiff_giou=False),
            model=dataclasses.replace(cfg.model, dec_pos_dropout=0.0,
                                      dec_layer_dropout=0.0,
                                      patch_dropout_rate=0.0))
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(3)
        images = jax.random.uniform(rng, (4, cfg.data.img_size,
                                          cfg.data.img_size, 3))
        y = np.full((4, cfg.data.max_len), PAD_ID, np.int32)
        y[:, :11] = [300, 303, 270, 271, 304, 263, 10, 20, 110, 120, 301]
        y = jnp.asarray(y)
        state = create_train_state(model, cfg, rng, images, y[:, :-1])

        step1, _ = make_train_step(model, cfg)
        s1, _ = step1(state, images, y)

        cfg2 = cfg.replace(train=dataclasses.replace(cfg.train,
                                                     grad_accum_steps=2))
        step2, _ = make_train_step(model, cfg2)
        s2, m2 = step2(state, images, y)
        assert np.isfinite(float(m2["total_loss"]))

        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(s1.params),
                jax.tree_util.tree_leaves_with_path(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=jax.tree_util.keystr(pa))


class TestTrainEpochSampledBattery:
    def test_train_epoch_reports_sampled_bleu_and_map(self):
        """train_metrics_every=1 folds sampled train-time BLEU + mAP@0.3
        into the training epoch metrics (sampled version of the reference's
        per-batch train battery, train_val_epoch.py:81-231)."""
        import dataclasses
        from mdcnet_tpu.data.pipeline import make_loaders
        from mdcnet_tpu.train.loop import Trainer
        from tests.test_pipeline import synthetic_records
        from tests.test_text import make_tokenizer

        cfg = test_preset()
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, batch_size=4),
            train=dataclasses.replace(cfg.train, train_metrics_every=1))
        rec = synthetic_records(24)
        tok = make_tokenizer(max_len=cfg.data.max_len)
        train_loader, _, _ = make_loaders(rec, tok, cfg.data,
                                          synthetic_images=True)
        model = build_model(cfg.model)
        rng = jax.random.PRNGKey(0)
        state = create_train_state(
            model, cfg, rng,
            jnp.zeros((4, cfg.data.img_size, cfg.data.img_size, 3)),
            jnp.zeros((4, cfg.data.max_len - 1), jnp.int32))
        trainer = Trainer(model, cfg)
        _, out = trainer.train_epoch(state, train_loader, tokenizer=tok)
        for key in ("ce_loss", "bleu", "map@0.3"):
            assert key in out, key
