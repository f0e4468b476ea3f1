"""Annotation parsing and split determinism tests."""
import numpy as np
import pytest

from mdcnet_tpu.data.annotations import (boxes_of, filter_existing_images,
                                         num_rows, parse_annotation_lines,
                                         parse_neu_annotation_lines)
from mdcnet_tpu.data.splits import three_way_split

# Rows in the GC10 annotation format (dataset.py:31-86 line grammar)
LINES = [
    "file_name,ids,labels,xmin,ymin,xmax,ymax,captions",
    "img_a.jpg,silk_spot,263,995,71,1310,894,The defect silk_spot is located at the center of the image.",
    "img_b.jpg,water_spot,261,1169,317,1577,809,The defect water_spot is located at the right bottom of the image.",
    "img_c,oil_spot,262,1950,50,2022,112,The defect oil_spot is located at the right top of the image.",
    "malformed,line",                       # < 7 parts -> skipped
    "img_d.jpg,crease,266,1,2,3,4",         # no caption -> "No caption"
]


class TestTxtParsing:
    def test_parse_counts_and_fields(self):
        rec = parse_annotation_lines(LINES, image_folder="/data/images")
        assert num_rows(rec) == 4
        assert rec["label"].tolist() == [263, 261, 262, 266]
        assert rec["img_path"][0] == "/data/images/img_a.jpg"
        # .jpg appended when missing (trail_01.py:44)
        assert rec["img_path"][2] == "/data/images/img_c.jpg"
        assert rec["caption"][3] == "No caption"

    def test_boxes_of(self):
        rec = parse_annotation_lines(LINES)
        b = boxes_of(rec)
        assert b.shape == (4, 4)
        assert b[0].tolist() == [995, 71, 1310, 894]

    def test_caption_with_commas_is_rejoined(self):
        lines = ["header", "x.jpg,i,258,1,2,3,4,a caption, with a comma"]
        rec = parse_annotation_lines(lines)
        assert rec["caption"][0] == "a caption, with a comma"

    def test_filter_existing_images_drops_missing(self):
        rec = parse_annotation_lines(LINES, image_folder="/nonexistent")
        rec = filter_existing_images(rec)
        assert num_rows(rec) == 0

    def test_neu_legacy_parser(self):
        lines = ["crazing_1 crazing 10 20 30 40",
                 "patches_2 patches 1 2 3 4",
                 "unknown_cls bogus 1 2 3 4"]
        rec = parse_neu_annotation_lines(lines, "/img")
        assert rec["label"].tolist() == [0, 1]
        assert rec["img_path"][0] == "/img/crazing_1.jpg"


class TestSplits:
    def test_matches_sklearn_exactly(self):
        """Bit-identical to the reference's double train_test_split
        (data_processing.py:169-175)."""
        sklearn = pytest.importorskip("sklearn.model_selection")
        n = 997
        idx = np.arange(n)
        tv, te = sklearn.train_test_split(idx, test_size=0.01, random_state=42)
        tr, va = sklearn.train_test_split(tv, test_size=0.19 / 0.99,
                                          random_state=42)
        ours_tr, ours_va, ours_te = three_way_split(n)
        np.testing.assert_array_equal(ours_te, te)
        np.testing.assert_array_equal(ours_tr, tr)
        np.testing.assert_array_equal(ours_va, va)

    def test_partition_is_disjoint_and_complete_enough(self):
        tr, va, te = three_way_split(1000)
        all_idx = np.concatenate([tr, va, te])
        assert len(set(all_idx.tolist())) == len(all_idx)
        # sklearn floor/ceil rules may drop <1 row total
        assert len(all_idx) >= 999

    def test_deterministic(self):
        a = three_way_split(500)
        b = three_way_split(500)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
