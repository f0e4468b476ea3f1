"""The reference-API facade imports and basic behaviors."""
import jax.numpy as jnp
import numpy as np
import pytest

from mdcnet_tpu import compat


class TestCompatSurface:
    def test_all_reference_symbols_exist(self):
        for name in ["seed_everything", "AvgMeter", "concat_gt",
                     "calculate_bleu_scores", "generate_square_subsequent_mask",
                     "create_mask", "get_lr", "txt_file_to_df", "collate_fn",
                     "get_transform_train", "get_transform_valid",
                     "Vocabulary", "Tokenizer", "VOCDataset", "get_loaders",
                     "top_k_sampling", "extract_tokens",
                     "top_k_sampling_with_scores_2d", "bbox_iou",
                     "calculate_iou", "calculate_batch_iou",
                     "calculate_batch_max_iou",
                     "calculate_batch_max_iou_torchvision", "giou_pairwise",
                     "giou_loss_with_scores", "iou_loss_individual",
                     "Encoder", "Decoder", "EncoderDecoder", "AxialAttention",
                     "generate", "postprocess", "inference_single_image",
                     "top_k_top_p_filtering", "draw_bbox_with_caption",
                     "visualize", "append_df_to_csv", "check_environment"]:
            assert hasattr(compat, name), name

    def test_create_mask_shapes(self):
        tgt = np.array([[300, 270, 302, 302]])
        causal, pad = compat.create_mask(tgt)
        assert causal.shape == (4, 4)
        assert np.asarray(pad).tolist() == [[0.0, 0.0, 1.0, 1.0]]
        assert float(causal[0, 1]) < -1e8 and float(causal[1, 0]) == 0.0

    def test_concat_gt(self):
        row = {"label": 263, "xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4}
        assert compat.concat_gt(row) == [263, 1, 2, 3, 4]

    def test_collate_fn_pads(self):
        batch = [(np.zeros((2, 2, 3)), [[300, 301]]),
                 (np.zeros((2, 2, 3)), [[300, 270, 301]])]
        images, seqs = compat.collate_fn(batch, max_len=10)
        assert images.shape == (2, 2, 2, 3)
        assert seqs.shape == (2, 3)
        assert seqs[0].tolist() == [300, 301, 302]

    def test_giou_loss_with_scores_zero_rows(self):
        pred = np.zeros((2, 2, 4), np.float32)
        pred[0, 0] = [10, 10, 50, 50]
        gt = np.zeros((2, 1, 4), np.float32)
        gt[0, 0] = [10, 10, 50, 50]
        gt[1, 0] = [5, 5, 25, 25]
        loss, _ = compat.giou_loss_with_scores(pred, gt)
        # image0 perfect (loss 0), image1 no preds (penalty 1.0) -> mean 0.5
        np.testing.assert_allclose(float(loss), 0.5, atol=1e-5)

    def test_extract_tokens(self):
        probs = np.zeros((1, 2, 5))
        probs[0, 0, 3] = 1
        probs[0, 1, 1] = 1
        assert np.asarray(compat.extract_tokens(probs)).tolist() == [[3, 1]]
