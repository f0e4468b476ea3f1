"""Smoke tests for logging, profiling, debug, and drawing utilities."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.core.debug import checked_decode_groups, debug_nans, seed_everything
from mdcnet_tpu.utils.drawing import draw_bbox_with_caption, visualize
from mdcnet_tpu.utils.logging import CsvSink, MetricLogger, dated_csv_path
from mdcnet_tpu.utils.profiling import StepTimer, annotate, fence


class TestLogging:
    def test_csv_sink_header_once(self, tmp_path):
        path = str(tmp_path / "m.csv")
        sink = CsvSink(path)
        sink.log({"a": 1, "b": 2})
        sink.log({"a": 3, "b": 4})
        lines = open(path).read().strip().splitlines()
        assert lines[0] == "a,b"
        assert len(lines) == 3

    def test_metric_logger_csv(self, tmp_path):
        path = str(tmp_path / "log.csv")
        logger = MetricLogger(csv_path=path, quiet=True)
        logger.log({"loss": jnp.asarray(1.5)}, step=3)
        content = open(path).read()
        assert "1.5" in content and "3" in content

    def test_dated_path(self, tmp_path):
        p = dated_csv_path(str(tmp_path), "pred")
        assert p.endswith(".csv") and "pred_" in p


class TestProfiling:
    def test_step_timer_summary(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            t.stop(jnp.ones((4,)))
        s = t.summary()
        assert s["steps"] == 3 and s["mean_s"] > 0

    def test_fence_and_annotate(self):
        with annotate("test"):
            fence(jnp.ones((2, 2)))


class TestDebug:
    def test_seed_everything_returns_key(self):
        key = seed_everything(7)
        assert key.shape == (2,) or key.dtype  # PRNG key array

    def test_debug_nans_context_restores(self):
        before = jax.config.jax_debug_nans
        with debug_nans(True):
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == before

    def test_checked_decode_groups_passes_valid(self):
        seqs = jnp.asarray([[300, 303, 270, 304, 263, 1, 1, 9, 9, 301]],
                           jnp.int32)
        err, out = checked_decode_groups(seqs, max_groups=4)
        err.throw()  # no error expected
        assert int(out.count[0]) == 1


class TestDrawing:
    def test_draw_and_visualize(self):
        img = np.zeros((64, 64, 3), np.uint8)
        out = visualize(img, [[5, 5, 30, 30]], [263],
                        id2cls={263: "silk_spot"}, captions=["a defect"])
        arr = np.asarray(out)
        assert arr.shape == (64, 64, 3)
        assert arr.sum() > 0  # something was drawn

    def test_draw_single(self):
        from PIL import Image
        im = Image.new("RGB", (32, 32))
        draw_bbox_with_caption(im, [2, 2, 20, 20], "x")
        assert np.asarray(im).sum() > 0
