"""Tokenizer/vocabulary unit tests.

Golden expectations derive from the reference sequence format
(data_processing.py:264-290) applied to GC10-style annotation rows.
"""
import numpy as np
import pytest

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, CAPTION_START_ID,
                               EOS_ID, PAD_ID, UNK_ID)
from mdcnet_tpu.text import SeqTokenizer, Vocabulary, gc10_vocabulary

CAPTIONS = [
    "The defect silk_spot is located at the center of the image.",
    "The defect water_spot is located at the right bottom of the image.",
    "The defect oil_spot is located at the right top of the image.",
    "The defect punching_hole is located at the left of the image.",
] * 5  # repeat so every word clears the frequency threshold of 5


def make_tokenizer(max_len=100):
    vocab = gc10_vocabulary(CAPTIONS)
    return SeqTokenizer(vocab, num_classes=10, num_bins=224, width=224,
                        height=224, max_len=max_len)


class TestVocabulary:
    def test_special_ids(self):
        v = Vocabulary(5)
        assert v.itos[302] == "<PAD>"
        assert v.itos[300] == "<SOS>"
        assert v.itos[301] == "<EOS>"
        assert v.itos[299] == "<UNK>"

    def test_tokenize_protects_compounds(self):
        toks = Vocabulary.tokenize(
            "The defect silk_spot is located at the center of the image.")
        assert "silk_spot" in toks
        assert toks[0] == "the"
        assert toks[-1] == "."

    def test_word_ids_start_at_270_in_first_seen_order(self):
        v = gc10_vocabulary(CAPTIONS)
        # reference assigns: the=270 defect=271 is=272 located=273 at=274
        # center=275 of=276 image=277 .=278 right=279 bottom=280 top=281 left=282
        assert v.stoi["the"] == 270
        assert v.stoi["defect"] == 271
        assert v.stoi["is"] == 272
        assert v.stoi["located"] == 273
        assert v.stoi["at"] == 274
        assert v.stoi["center"] == 275
        assert v.stoi["of"] == 276
        assert v.stoi["image"] == 277
        assert v.stoi["."] == 278
        assert v.stoi["right"] == 279
        assert v.stoi["bottom"] == 280
        assert v.stoi["top"] == 281
        assert v.stoi["left"] == 282

    def test_class_words_have_fixed_ids(self):
        v = gc10_vocabulary(CAPTIONS)
        assert v.stoi["silk_spot"] == 263
        assert v.stoi["punching_hole"] == 258
        assert v.stoi["waist_folding"] == 267

    def test_total_vocab_size_matches_reference(self):
        # trail_01.py:108-115: len(vocab)=27 (4 special + 10 classes + 13
        # words), + code vocab 305 => 332
        v = gc10_vocabulary(CAPTIONS)
        assert len(v) == 27
        tok = make_tokenizer()
        assert tok.total_vocab_size == 332

    def test_unknown_word_maps_to_unk(self):
        v = gc10_vocabulary(CAPTIONS)
        assert v.numericalize("zebra")[0] == UNK_ID


class TestSequenceBuild:
    def test_process_single_pair_structure(self):
        tok = make_tokenizer()
        seq = tok.process_single_pair(
            263, (50.0, 60.0, 150.0, 170.0),
            "The defect silk_spot is located at the center of the image.")
        assert seq[0] == BOS_ID
        assert seq[1] == CAPTION_START_ID
        eoc = seq.index(CAPTION_END_ID)
        assert seq[eoc + 1] == 263          # label after caption end
        assert seq[-1] == EOS_ID
        assert len(seq) == eoc + 7           # label + 4 coords + EOS
        # quantization: floor(x/224 * 223)
        assert seq[eoc + 2] == int(50.0 / 224 * 223)
        assert seq[eoc + 3] == int(60.0 / 224 * 223)
        assert seq[eoc + 4] == int(150.0 / 224 * 223)
        assert seq[eoc + 5] == int(170.0 / 224 * 223)

    def test_caption_words(self):
        tok = make_tokenizer()
        seq = tok.process_single_pair(
            263, (0.0, 0.0, 10.0, 10.0),
            "The defect silk_spot is located at the center of the image.")
        eoc = seq.index(CAPTION_END_ID)
        caption_ids = seq[2:eoc]
        assert caption_ids == [270, 271, 263, 272, 273, 274, 270, 275,
                               276, 270, 277, 278]

    def test_truncation_to_max_len(self):
        tok = make_tokenizer(max_len=8)
        seq = tok.process_single_pair(
            263, (0.0, 0.0, 10.0, 10.0),
            "The defect silk_spot is located at the center of the image.")
        assert len(seq) == 8

    def test_quantize_dequantize_roundtrip(self):
        tok = make_tokenizer()
        x = np.array([0.0, 0.25, 0.5, 1.0])
        q = tok.quantize(x)
        assert q.tolist() == [0, 55, 111, 223]
        d = tok.dequantize(q)
        np.testing.assert_allclose(d, q / 223.0)


class TestDecode:
    def roundtrip_seq(self, tok, label=263, bbox=(50.0, 60.0, 150.0, 170.0)):
        return tok.process_single_pair(
            label, bbox,
            "The defect silk_spot is located at the center of the image.")

    def test_decode_roundtrip(self):
        tok = make_tokenizer()
        seq = self.roundtrip_seq(tok)
        labels, boxes, caption = tok.decode(seq)
        assert labels == [263]
        assert caption == ("the defect silk_spot is located at the center "
                           "of the image .")
        # quantization error bounded by one bin
        np.testing.assert_allclose(
            boxes[0], [50.0, 60.0, 150.0, 170.0], atol=224 / 223 + 1e-6)

    def test_decode_ignores_pad_and_post_eos(self):
        tok = make_tokenizer()
        seq = self.roundtrip_seq(tok)
        padded = seq + [PAD_ID] * 7 + [263, 1, 1, 5, 5, EOS_ID]
        labels, boxes, caption = tok.decode(padded)
        assert labels == [263]
        assert len(boxes) == 1

    def test_decode_rejects_out_of_window_label(self):
        tok = make_tokenizer()
        # label 290 is outside [258, 267]
        seq = [BOS_ID, CAPTION_START_ID, 270, CAPTION_END_ID,
               290, 10, 10, 50, 50, EOS_ID]
        labels, boxes, _ = tok.decode(seq)
        assert labels == [] and boxes == []

    def test_decode_labels_first_in_window(self):
        tok = make_tokenizer()
        toks = np.array([[300, 303, 270, 304, 261, 5, 5, 9, 9, 301],
                         [300, 303, 270, 304, 299, 5, 5, 9, 9, 301]])
        out = tok.decode_labels(toks)
        assert out.tolist() == [261, PAD_ID]

    def test_decode_bboxes_cursor_walk(self):
        tok = make_tokenizer()
        # two valid groups after caption end
        seq = [BOS_ID, CAPTION_START_ID, 270, CAPTION_END_ID,
               263, 10, 20, 110, 120,
               261, 5, 6, 50, 60, EOS_ID]
        boxes = tok.decode_bboxes(np.array([seq]))
        assert boxes.shape == (1, 2, 4)
        np.testing.assert_allclose(boxes[0, 0],
                                   np.array([10, 20, 110, 120]) / 223 * 224)

    def test_decode_bboxes_invalid_geometry_rejected(self):
        tok = make_tokenizer()
        # x2 <= x1 -> rejected -> single zero box placeholder
        seq = [BOS_ID, CAPTION_START_ID, 270, CAPTION_END_ID,
               263, 110, 20, 10, 120, EOS_ID]
        boxes = tok.decode_bboxes(np.array([seq]))
        assert boxes.shape == (1, 1, 4)
        assert np.all(boxes == 0)

    def test_decode_bboxes_and_labels_with_scores(self):
        tok = make_tokenizer()
        seq = np.array([[BOS_ID, CAPTION_START_ID, 270, CAPTION_END_ID,
                         263, 10, 20, 110, 120, EOS_ID]])
        scores = np.full(seq.shape, 0.5, dtype=np.float32)
        boxes, labels, sc = tok.decode_bboxes_and_labels_with_scores(seq, scores)
        assert labels.tolist() == [[263]]
        assert boxes[0, 0].tolist() == [10, 20, 110, 120]  # bin units
        np.testing.assert_allclose(sc[0, 0], 0.5)

    def test_decode_captions_strips_wrappers(self):
        tok = make_tokenizer()
        seq = self.roundtrip_seq(tok)
        caption_ids = tok.decode_captions(np.array(seq))
        assert caption_ids.tolist() == [270, 271, 263, 272, 273, 274, 270,
                                        275, 276, 270, 277, 278]

    def test_tokens_to_text_new_skips_special(self):
        tok = make_tokenizer()
        text = tok.tokens_to_text_new([300, 270, 271, 299, 302])
        assert text == ["the defect"]
