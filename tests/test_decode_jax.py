"""Parity tests: vectorized jnp decode kernels vs the host reference decoder.

The on-device scan (mdcnet_tpu/text/decode_jax.py) must match the host
cursor-walk (mdcnet_tpu/text/tokenizer.py) token-for-token on random
sequences, including adversarial ones (labels with invalid coords, missing
CAP_END, no EOS, multiple groups).
"""
import numpy as np
import pytest

from mdcnet_tpu.config import (BOS_ID, CAPTION_END_ID, CAPTION_START_ID,
                               EOS_ID, PAD_ID)
from mdcnet_tpu.text import decode_jax
from tests.test_text import make_tokenizer


def random_sequences(rng, batch, length):
    """Mix of structured and fully random sequences."""
    seqs = []
    for b in range(batch):
        kind = b % 4
        if kind == 0:  # well-formed
            seq = [BOS_ID, CAPTION_START_ID, 270, 271, CAPTION_END_ID]
            for _ in range(rng.integers(0, 4)):
                x1, y1 = rng.integers(0, 200, 2)
                seq += [int(rng.integers(258, 268)), int(x1), int(y1),
                        int(x1 + rng.integers(1, 24)),
                        int(y1 + rng.integers(1, 24))]
            seq.append(EOS_ID)
        elif kind == 1:  # invalid coords mixed in
            seq = [BOS_ID, CAPTION_START_ID, CAPTION_END_ID,
                   263, 50, 50, 10, 10,     # x2 < x1 -> rejected
                   261, 5, 5, 60, 60, EOS_ID]
        elif kind == 2:  # no caption end marker
            seq = [BOS_ID, 263, 10, 10, 50, 50, EOS_ID]
        else:  # fully random garbage
            seq = rng.integers(0, 332, size=length - 1).tolist()
        seq = (seq + [PAD_ID] * length)[:length]
        seqs.append(seq)
    return np.array(seqs, dtype=np.int32)


class TestDecodeGroupsParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_host_decoder(self, seed):
        rng = np.random.default_rng(seed)
        tok = make_tokenizer()
        seqs = random_sequences(rng, batch=16, length=40)
        scores = rng.random(seqs.shape).astype(np.float32)

        host_boxes, host_labels, host_scores = (
            tok.decode_bboxes_and_labels_with_scores(seqs, scores))
        dev = decode_jax.decode_groups(seqs, scores, max_groups=8)

        for i in range(seqs.shape[0]):
            n = int(dev.count[i])
            # host pads labels with -1; count valid host groups
            host_n = int((host_labels[i] >= 0).sum())
            assert n == host_n, f"row {i}: {n} != {host_n}"
            np.testing.assert_array_equal(
                np.asarray(dev.labels[i][:n]), host_labels[i][:n])
            np.testing.assert_allclose(
                np.asarray(dev.boxes[i][:n]), host_boxes[i][:n], atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(dev.scores[i][:n]), host_scores[i][:n], atol=1e-6)

    def test_decode_bboxes_rescale_matches_host(self):
        rng = np.random.default_rng(7)
        tok = make_tokenizer()
        seqs = random_sequences(rng, batch=8, length=32)
        host = tok.decode_bboxes(seqs)
        dev_boxes, mask = decode_jax.decode_bboxes(seqs, num_bins=224,
                                                   width=224, height=224,
                                                   max_groups=8)
        for i in range(seqs.shape[0]):
            n = int(mask[i].sum())
            host_valid = host[i][np.any(host[i] != 0, axis=1)]
            np.testing.assert_allclose(np.asarray(dev_boxes[i][:n]),
                                       host_valid, atol=1e-4)


class TestVectorHelpers:
    def test_decode_labels_matches_host(self):
        tok = make_tokenizer()
        seqs = np.array([[300, 303, 270, 304, 261, 5, 5, 9, 9, 301],
                         [300, 303, 270, 304, 299, 5, 5, 9, 9, 301],
                         [258, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
        host = tok.decode_labels(seqs)
        dev = decode_jax.decode_labels(seqs)
        np.testing.assert_array_equal(np.asarray(dev), host)

    def test_caption_mask(self):
        seqs = np.array([[BOS_ID, CAPTION_START_ID, 270, 271, CAPTION_END_ID,
                          263, 1, 1, 9, 9]])
        mask = decode_jax.caption_mask(seqs)
        assert np.asarray(mask)[0].tolist() == [False, False, True, True,
                                                False, False, False, False,
                                                False, False]

    def test_eos_structure_gate(self):
        # EOS at index 6: (6-1) % 5 == 0 -> valid; EOS at 4 -> invalid
        seqs = np.array([[300, 263, 1, 1, 9, 9, EOS_ID, PAD_ID],
                         [300, 263, 1, 1, EOS_ID, PAD_ID, PAD_ID, PAD_ID]])
        idx = decode_jax.eos_structure_gate(seqs)
        assert np.asarray(idx).tolist() == [6, 0]
