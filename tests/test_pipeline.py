"""Data pipeline + augmentation + trainer smoke tests (synthetic images)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu.config import PAD_ID, test_preset
from mdcnet_tpu.data import annotations as ann
from mdcnet_tpu.data.augment import preprocess, normalize, scale_boxes
from mdcnet_tpu.data.pipeline import DataLoader, SteelDefectDataset, make_loaders
from tests.test_text import make_tokenizer


def synthetic_records(n=40):
    lines = ["header"]
    classes = list(range(258, 268))
    for i in range(n):
        cls = classes[i % 10]
        lines.append(f"img_{i:03d}.jpg,x,{cls},10,20,110,120,"
                     "The defect silk_spot is located at the center of the image.")
    return ann.parse_annotation_lines(lines, "/data")


@pytest.fixture(scope="module")
def cfg():
    return test_preset().data


class TestAugment:
    def test_normalize_range(self):
        img = jnp.full((1, 8, 8, 3), 255.0)
        out = normalize(img)
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]),
            (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
            rtol=1e-5)

    def test_eval_preprocess_deterministic(self):
        imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3),
                                                 dtype=np.uint8)
        a = preprocess(jnp.asarray(imgs), jax.random.PRNGKey(0), 32, train=False)
        b = preprocess(jnp.asarray(imgs), jax.random.PRNGKey(9), 32, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == (2, 32, 32, 3)

    def test_train_preprocess_stochastic_but_bounded(self):
        imgs = np.random.default_rng(0).integers(0, 255, (4, 64, 64, 3),
                                                 dtype=np.uint8)
        a = preprocess(jnp.asarray(imgs), jax.random.PRNGKey(0), 32, train=True)
        b = preprocess(jnp.asarray(imgs), jax.random.PRNGKey(1), 32, train=True)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(a)).all()

    def test_scale_boxes(self):
        boxes = jnp.asarray([[10.0, 20.0, 110.0, 120.0]])
        out = scale_boxes(boxes, (200, 100), 224)  # h=200, w=100
        np.testing.assert_allclose(
            np.asarray(out[0]), [10 * 2.24, 20 * 1.12, 110 * 2.24, 120 * 1.12])


class TestLoader:
    def test_batches_have_fixed_shapes(self, cfg):
        rec = synthetic_records(20)
        tok = make_tokenizer(max_len=cfg.max_len)
        ds = SteelDefectDataset(rec, tok, cfg, synthetic_images=True)
        loader = DataLoader(ds, batch_size=4)
        batches = list(loader)
        assert len(batches) == 5
        for b in batches:
            assert b.images.shape == (4, cfg.img_size, cfg.img_size, 3)
            assert b.images.dtype == np.uint8
            assert b.tokens.shape == (4, cfg.max_len)
            assert (b.tokens[:, 0] == 300).all()  # BOS first

    def test_shuffle_changes_order_but_not_content(self, cfg):
        rec = synthetic_records(16)
        tok = make_tokenizer(max_len=cfg.max_len)
        ds = SteelDefectDataset(rec, tok, cfg, synthetic_images=True)
        l1 = DataLoader(ds, batch_size=16, shuffle=True, seed=1)
        l2 = DataLoader(ds, batch_size=16, shuffle=True, seed=2)
        b1, b2 = next(iter(l1)), next(iter(l2))
        assert not np.array_equal(b1.labels, b2.labels)
        assert sorted(b1.labels.tolist()) == sorted(b2.labels.tolist())

    def test_make_loaders_split_sizes(self, cfg):
        rec = synthetic_records(100)
        tok = make_tokenizer(max_len=cfg.max_len)
        train, valid, test = make_loaders(rec, tok, cfg,
                                          synthetic_images=True)
        assert len(train.ds) == 80
        assert len(valid.ds) == 19
        assert len(test.ds) == 1


class TestTrainerSmoke:
    def test_two_epoch_fit_improves_ce(self, tmp_path):
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.train.loop import train_from_config
        from mdcnet_tpu.utils.logging import MetricLogger

        cfg = test_preset()
        cfg = cfg.replace(
            data=type(cfg.data)(**{**cfg.data.__dict__, "batch_size": 8}),
            train=type(cfg.train)(**{**cfg.train.__dict__,
                                     "checkpoint_dir": str(tmp_path),
                                     "epochs": 2}))
        rec = synthetic_records(40)
        tok = make_tokenizer(max_len=cfg.data.max_len)
        logger = MetricLogger(quiet=True)
        state = train_from_config(cfg, rec, tok, logger=logger,
                                  synthetic_images=True, epochs=2)
        # split of 40 rows -> 31 train rows -> 3 drop-last batches of 8
        assert int(state.step) == 2 * 3


class TestImageOnlyDataset:
    def test_batches_shapes_and_remainder(self):
        from mdcnet_tpu.data.pipeline import ImageOnlyDataset
        ds = ImageOnlyDataset([f"img_{i}.jpg" for i in range(5)],
                              img_size=32, synthetic_images=True)
        batches = list(ds.batches(2))
        assert [b[0].shape[0] for b in batches] == [2, 2, 1]
        assert all(b[0].dtype == np.uint8 for b in batches)

    def test_missing_files_skipped(self):
        from mdcnet_tpu.data.pipeline import ImageOnlyDataset
        ds = ImageOnlyDataset(["/nonexistent/a.jpg"], img_size=32)
        assert list(ds.batches(2)) == []


class TestRealImageBranch:
    """Exercise the real-file path end to end (VERDICT r03 item 6): PNGs on
    disk -> txt_file_to_records -> filter_existing_images -> load_image ->
    host resize -> device preprocess -> one train epoch -> generation.
    Mirrors the reference's cv2-file flow (data_processing.py:110-159)."""

    @pytest.fixture(scope="class")
    def image_dir(self, tmp_path_factory):
        from PIL import Image
        from mdcnet_tpu.data import synthetic as syn

        d = tmp_path_factory.mktemp("gc10_imgs")
        lines = ["header"]
        rng = np.random.default_rng(0)
        for i in range(12):
            cls = 258 + (i % 10)
            box = np.array([300.0, 200.0, 900.0, 600.0]) + i * 10
            name = f"real_{i:03d}.jpg"
            img = syn.render_defect_image(
                cls, syn.scale_box_to_image(box, 96), 96, rng)
            Image.fromarray(img).save(d / name)
            lines.append(
                f"{name[:-4]},x,{cls},{box[0]:.0f},{box[1]:.0f},"
                f"{box[2]:.0f},{box[3]:.0f},"
                "The defect silk_spot is located at the center of the image.")
        # one row pointing at a missing file: filter_existing_images drops it
        lines.append("missing_img,x,258,1,2,3,4,gone caption.")
        (d / "ann.txt").write_text("\n".join(lines))
        return d

    def test_records_filter_and_load(self, image_dir, cfg):
        rec = ann.txt_file_to_records(str(image_dir / "ann.txt"),
                                      str(image_dir))
        assert ann.num_rows(rec) == 13
        rec = ann.filter_existing_images(rec)
        assert ann.num_rows(rec) == 12
        tok = make_tokenizer(max_len=cfg.max_len)
        ds = SteelDefectDataset(rec, tok, cfg, synthetic_images=False)
        img, seq, box, label = ds.example(0)
        assert img.dtype == np.uint8 and img.shape == (96, 96, 3)
        # bbox rescaled into cfg.img_size space before tokenization
        assert box.max() <= cfg.img_size
        batch = next(iter(DataLoader(ds, batch_size=4)))
        assert batch.images.shape == (4, cfg.img_size, cfg.img_size, 3)

    def test_train_epoch_and_infer_on_real_files(self, image_dir, tmp_path):
        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.data.augment import preprocess
        from mdcnet_tpu.data.pipeline import ImageOnlyDataset
        from mdcnet_tpu.infer.generate import generate, postprocess
        from mdcnet_tpu.models import build_model
        from mdcnet_tpu.train.loop import train_from_config
        from mdcnet_tpu.utils.logging import MetricLogger

        cfg = test_preset()
        cfg = cfg.replace(
            data=type(cfg.data)(**{**cfg.data.__dict__, "batch_size": 4,
                                   "test_size": 0.1, "valid_size": 0.2}),
            train=type(cfg.train)(**{**cfg.train.__dict__,
                                     "checkpoint_dir": str(tmp_path),
                                     "epochs": 1}))
        rec = ann.filter_existing_images(
            ann.txt_file_to_records(str(image_dir / "ann.txt"),
                                    str(image_dir)))
        tok = make_tokenizer(max_len=cfg.data.max_len)
        state = train_from_config(cfg, rec, tok, logger=MetricLogger(quiet=True),
                                  synthetic_images=False, epochs=1)
        assert int(state.step) >= 1

        # inference on the same real files through ImageOnlyDataset
        model = build_model(cfg.model)
        paths = [str(image_dir / f"real_{i:03d}.jpg") for i in range(4)]
        images_u8, kept = next(iter(
            ImageOnlyDataset(paths, cfg.data.img_size).batches(4)))
        assert len(kept) == 4
        images = preprocess(jnp.asarray(images_u8), jax.random.PRNGKey(0),
                            cfg.data.img_size, train=False)
        res = generate(model, state.params, images, jax.random.PRNGKey(1),
                       steps=12, greedy=True)
        out = postprocess(np.asarray(res.tokens), np.asarray(res.confs), tok)
        assert len(out[0]) == 4  # one (possibly None) row per image


class TestZoomCrop:
    """Train-time zoom-crop augmentation (small-defect localization,
    config-gated — DataConfig.zoom_crop_prob)."""

    def test_crop_contains_box_and_rescales(self):
        import numpy as np
        from mdcnet_tpu.data.pipeline import zoom_crop

        rng = np.random.default_rng(0)
        img = np.arange(200 * 300 * 3, dtype=np.uint8).reshape(200, 300, 3)
        box = np.array([120.0, 80.0, 140.0, 95.0])
        for _ in range(50):
            crop, nb = zoom_crop(img, box, rng, min_scale=0.3)
            ch, cw = crop.shape[:2]
            assert 0 <= nb[0] < nb[2] <= cw and 0 <= nb[1] < nb[3] <= ch
            # pixel content is preserved: the crop is a view of img
            assert (nb[2] - nb[0]) == (box[2] - box[0])
            assert (nb[3] - nb[1]) == (box[3] - box[1])

    def test_position_phrase_grid(self):
        import numpy as np
        from mdcnet_tpu.data.pipeline import position_phrase, rewrite_position

        assert position_phrase(np.array([0, 0, 10, 10]), 100, 100) == "left top"
        assert position_phrase(np.array([45, 45, 55, 55]), 100, 100) == "center"
        assert position_phrase(np.array([90, 40, 100, 60]), 100, 100) == "right"
        cap = "The defect oil_spot is located at the left of the image."
        got = rewrite_position(cap, np.array([80, 80, 99, 99]), 100, 100)
        assert got == ("The defect oil_spot is located at the right bottom "
                       "of the image.")

    def test_dataset_applies_crop_only_in_train(self):
        import dataclasses

        import numpy as np

        from mdcnet_tpu.config import test_preset
        from mdcnet_tpu.data import annotations as ann
        from mdcnet_tpu.data.pipeline import SteelDefectDataset
        from mdcnet_tpu.text.tokenizer import SeqTokenizer
        from mdcnet_tpu.text.vocabulary import gc10_vocabulary

        lines = ["file_name,ids,labels,xmin,ymin,xmax,ymax,captions",
                 "img1.jpg,punching_hole,258,400,300,700,600,"
                 "The defect punching_hole is located at the center of the image."]
        recs = ann.parse_annotation_lines(lines, "/img")
        tok = SeqTokenizer(gc10_vocabulary(recs["caption"]), num_classes=10,
                           num_bins=224, width=224, height=224)
        cfg = dataclasses.replace(test_preset().data, zoom_crop_prob=1.0,
                                  zoom_crop_min_scale=0.3)
        ds_tr = SteelDefectDataset(recs, tok, cfg,
                                   synthetic_images="learnable", train=True)
        ds_ev = SteelDefectDataset(recs, tok, cfg,
                                   synthetic_images="learnable", train=False)
        img_e, seq_e, box_e, _ = ds_ev.example(0)
        boxes = set()
        from mdcnet_tpu.data.pipeline import collate
        for epoch in range(4):
            ds_tr.epoch = epoch
            ex = ds_tr.example(0)
            img_t, seq_t, box_t, _ = ex
            # crop is a sub-view; collate resizes it back to a fixed grid
            assert img_t.shape[0] <= img_e.shape[0]
            assert img_t.shape[1] <= img_e.shape[1]
            batch = collate([ex], cfg.max_len, cfg.img_size)
            assert batch.images.shape == (1, cfg.img_size, cfg.img_size, 3)
            boxes.add(tuple(np.round(box_t, 2)))
            assert seq_t[0] == seq_e[0]  # BOS intact
        # crops vary across epochs (box in resized space moves/grows)
        assert len(boxes) > 1
