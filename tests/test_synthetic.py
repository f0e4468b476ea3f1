"""Learnable synthetic defect images: pixels must determine the targets."""
import numpy as np

from mdcnet_tpu.config import LABEL_START
from mdcnet_tpu.data import synthetic as syn
from mdcnet_tpu.data.pipeline import SteelDefectDataset
from mdcnet_tpu.config import test_preset
from tests.test_pipeline import synthetic_records
from tests.test_text import make_tokenizer


class TestRenderer:
    def test_pattern_lands_inside_box(self):
        rng = np.random.default_rng(0)
        box = np.array([40.0, 60.0, 120.0, 140.0])
        img = syn.render_defect_image(258, box, 256, rng)
        assert img.shape == (256, 256, 3) and img.dtype == np.uint8
        inside = img[60:140, 40:120].astype(np.float32)
        outside = img[:40, :40].astype(np.float32)
        # class 258 is red-dominant; background is gray (channels equal)
        assert inside[..., 0].mean() - inside[..., 1].mean() > 40
        assert abs(outside[..., 0].mean() - outside[..., 1].mean()) < 5

    def test_classes_are_distinguishable(self):
        rng = np.random.default_rng(1)
        box = np.array([50.0, 50.0, 150.0, 150.0])
        means = []
        for label in range(LABEL_START, LABEL_START + 10):
            img = syn.render_defect_image(label, box, 256,
                                          np.random.default_rng(2))
            means.append(img[50:150, 50:150].mean(axis=(0, 1)))
        means = np.stack(means)
        # every class pair differs in mean patch color
        for i in range(10):
            for j in range(i + 1, 10):
                assert np.abs(means[i] - means[j]).max() > 10, (i, j)

    def test_deterministic_given_seed(self):
        box = np.array([10.0, 10.0, 60.0, 60.0])
        a = syn.render_defect_image(260, box, 128, np.random.default_rng(7))
        b = syn.render_defect_image(260, box, 128, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_scale_box_canvas_to_image(self):
        # GC10 canvas 2048x1000 -> 256: full-canvas box fills the image
        box = syn.scale_box_to_image(np.array([0, 0, 2048, 1000]), 256)
        np.testing.assert_allclose(box, [0, 0, 256, 256])
        # degenerate boxes get a minimum side
        tiny = syn.scale_box_to_image(np.array([100, 100, 101, 101]), 256)
        assert tiny[2] - tiny[0] >= 2.0 and tiny[3] - tiny[1] >= 2.0


class TestLearnableDataset:
    def test_tokens_agree_with_rendered_pixels(self):
        """The tokenized box must point at the rendered pattern."""
        cfg = test_preset().data
        rec = synthetic_records(10)
        tok = make_tokenizer(max_len=cfg.max_len)
        ds = SteelDefectDataset(rec, tok, cfg, synthetic_images="learnable")
        img, seq, box, label = ds.example(3)
        assert img.shape == (256, 256, 3)
        # decode the sequence and compare the box (resized-image space)
        labels, bboxes, _ = tok.decode(np.asarray(seq))
        assert labels == [label]
        got = np.asarray(bboxes[0], np.float32)
        np.testing.assert_allclose(got, box, atol=2.0)  # quantization error
        # the rendered pattern sits at box * native/img_size in the image
        scale = 256.0 / cfg.img_size
        x0, y0, x1, y1 = [int(round(v * scale)) for v in box]
        inside = img[y0:y1, x0:x1].astype(np.float32)
        r_minus_g = inside[..., 0].mean() - inside[..., 1].mean()
        b_minus_g = inside[..., 2].mean() - inside[..., 1].mean()
        assert abs(r_minus_g) + abs(b_minus_g) > 20  # colored, not gray

    def test_learnable_mode_threads_through_loaders(self):
        from mdcnet_tpu.data.pipeline import make_loaders
        cfg = test_preset().data
        rec = synthetic_records(30)
        tok = make_tokenizer(max_len=cfg.max_len)
        train, _, _ = make_loaders(rec, tok, cfg,
                                   synthetic_images="learnable")
        batch = next(iter(train))
        assert batch.images.dtype == np.uint8
        assert batch.images.std() > 0
