"""Native (C++) data-IO tier: bindings, statistics, and numpy equivalence."""
from __future__ import annotations

import numpy as np
import pytest

from mdcnet_tpu import native
from mdcnet_tpu.data import synthetic as syn

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


class TestScaleBoxes:
    def test_matches_python_reference(self):
        rng = np.random.default_rng(0)
        boxes = np.stack([
            np.sort(rng.uniform(0, 2048, 2)).repeat(1) for _ in range(16)])
        boxes = rng.uniform(0, 1, (16, 4)).astype(np.float32)
        boxes[:, 0] *= 2048; boxes[:, 2] = boxes[:, 0] + boxes[:, 2] * 500
        boxes[:, 1] *= 1000; boxes[:, 3] = boxes[:, 1] + boxes[:, 3] * 400
        got = native.scale_boxes(boxes, 2048.0, 1000.0, 256.0)
        want = np.stack([syn.scale_box_to_image(b, 256) for b in boxes])
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-3)


class TestResize:
    def test_matches_numpy_bilinear(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (100, 160, 3), np.uint8)
        got = native.resize_bilinear(img, 64, 64).astype(np.float32)

        # numpy reference with the same align_corners=False convention
        h, w = img.shape[:2]
        sy = np.clip((np.arange(64) + 0.5) * h / 64 - 0.5, 0, h - 1)
        sx = np.clip((np.arange(64) + 0.5) * w / 64 - 0.5, 0, w - 1)
        y0 = sy.astype(int); y1 = np.minimum(y0 + 1, h - 1)
        x0 = sx.astype(int); x1 = np.minimum(x0 + 1, w - 1)
        fy = (sy - y0)[:, None, None]
        fx = (sx - x0)[None, :, None]
        f = img.astype(np.float32)
        want = (f[y0][:, x0] * (1 - fy) * (1 - fx)
                + f[y0][:, x1] * (1 - fy) * fx
                + f[y1][:, x0] * fy * (1 - fx)
                + f[y1][:, x1] * fy * fx)
        np.testing.assert_allclose(got, want, atol=1.0)


class TestRenderDefects:
    def test_statistics_match_python_renderer(self):
        """Same visual statistics as the numpy renderer: background mean/std,
        patch dominated by the class color, stripes present."""
        size = 128
        box = np.array([30.0, 40.0, 90.0, 100.0], np.float32)
        for cls in (0, 3, 9):
            imgs = native.render_defects(
                np.array([cls], np.int32), box[None], np.array([7], np.uint64),
                size)
            img = imgs[0].astype(np.float32)
            ref = syn.render_defect_image(258 + cls, box, size,
                                          np.random.default_rng(7)
                                          ).astype(np.float32)
            # background statistics (outside the box)
            bg = img[:30]
            bg_ref = ref[:30]
            assert abs(bg.mean() - bg_ref.mean()) < 6.0
            assert abs(bg.std() - bg_ref.std()) < 6.0
            # patch chroma tracks the class color ordering
            patch = img[45:95, 35:85].mean(axis=(0, 1))
            patch_ref = ref[45:95, 35:85].mean(axis=(0, 1))
            assert np.argmax(patch) == np.argmax(patch_ref)
            np.testing.assert_allclose(patch, patch_ref, atol=20.0)

    def test_batch_faster_than_python(self):
        import time
        n, size = 32, 256
        labels = np.zeros((n,), np.int32)
        boxes = np.tile(np.array([20, 20, 200, 200], np.float32), (n, 1))
        seeds = np.arange(n, dtype=np.uint64)

        def t_native():
            t0 = time.perf_counter()
            native.render_defects(labels, boxes, seeds, size)
            return time.perf_counter() - t0

        def t_py():
            t0 = time.perf_counter()
            for i in range(n):
                syn.render_defect_image(258, boxes[i], size,
                                        np.random.default_rng(i))
            return time.perf_counter() - t0

        # warm both (dlopen/build on first native call), min-of-3: wall
        # timings on a contended 1-vCPU host are noisy
        t_native(), t_py()
        tn = min(t_native() for _ in range(3))
        tp = min(t_py() for _ in range(3))
        assert tn < tp, (tn, tp)


class TestPipelinePrefill:
    def test_prefill_render_cache(self):
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.data.pipeline import SteelDefectDataset
        from tests.test_pipeline import synthetic_records
        from tests.test_text import make_tokenizer

        cfg = test_preset()
        rec = synthetic_records(12)
        tok = make_tokenizer(max_len=cfg.data.max_len)
        ds = SteelDefectDataset(rec, tok, cfg.data,
                                synthetic_images="learnable")
        n = ds.prefill_render_cache()
        assert n == len(ds) > 0
        ex = ds.example(0)
        assert ex is not None
        img = ex[0]
        assert img.shape[2] == 3
        # second prefill is a no-op
        assert ds.prefill_render_cache() == 0
