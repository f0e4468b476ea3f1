"""Frozen configuration tree for the MDC-Net TPU framework.

The reference keeps one mutable static class ``CFG`` (``allied_files.py:15-36``)
that is mutated at import time by other modules (``trail_01.py:99-100``).  Here
the configuration is an immutable dataclass tree; tokenizer-derived constants
(BOS/PAD ids) are *derived*, never assigned at runtime.

Presets replicate each reference driver's geometry:
  - ``large_preset``  : dim 1024 / 8 heads / 8 layers  (``trail_01.py:158-160``)
  - ``neu_preset``    : dim  256 / 8 heads / 6 layers  (``inference_p.py:126-128``)
  - ``tiny_preset``   : dim   64 / 2 heads / 2 layers  (``inference_trail_after_good_map.py:134-136``)
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Token id constants (data_processing.py:17,235-247). These are fixed facts of
# the sequence format and never change at runtime.
# ---------------------------------------------------------------------------
UNK_ID = 299
BOS_ID = 300          # == <SOS>
EOS_ID = 301
PAD_ID = 302
CAPTION_START_ID = 303
CAPTION_END_ID = 304
CODE_VOCAB_SIZE = 305  # CAPTION_END + 1 (data_processing.py:247)

LABEL_START = 258      # first defect-class token id (data_processing.py:22-33)
LABEL_END = 267        # last defect-class token id (inclusive)
WORD_ID_START = 270    # first id assigned to regular caption words

# GC10-DET class-name -> token id (data_processing.py:22-33)
PREDEFINED_CLASS_IDS = {
    "oil_spot": 262,
    "inclusion": 264,
    "crescent_gap": 260,
    "water_spot": 261,
    "punching_hole": 258,
    "welding_line": 259,
    "silk_spot": 263,
    "rolled_pit": 265,
    "crease": 266,
    "waist_folding": 267,
}

# NEU-DET 6-class legacy mapping (xml_to_xls.py:13-51, inference_p.py:22)
NEU_CLASS_IDS = {
    "crazing": 0,
    "patches": 1,
    "pitted_surface": 2,
    "rolled-in_scale": 3,
    "scratches": 4,
    "inclusion": 5,
}


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference: allied_files.py:18-24)."""

    annotations_path: str = ""
    image_folder: str = ""
    img_size: int = 224
    num_bins: int = 224
    max_len: int = 100
    caption_length: int = 40
    batch_size: int = 64
    valid_size: float = 0.19
    test_size: float = 0.01
    split_seed: int = 42
    freq_threshold: int = 5
    num_classes: int = 10
    # Train-time augmentation probabilities (dataset.py:91-104)
    brightness_contrast_p: float = 0.2
    gaussian_blur_p: float = 0.5
    motion_blur_p: float = 0.5
    # Zoom-crop augmentation (OFF by default — divergence from reference
    # geometry, config-gated per VERDICT r03 item 4): with this probability
    # a train example is replaced by a random crop containing its box,
    # teaching sub-patch-size defect localization (per-class AP 0.07-0.12 on
    # the classes whose defects are <16 px at 224²).  The caption position
    # phrase is recomputed from the crop-space box via the canonical 3x3
    # grid (82% deterministic on GC10 — data/pipeline.py position_phrase).
    zoom_crop_prob: float = 0.0
    zoom_crop_min_scale: float = 0.35  # smallest crop side as a fraction of
    # the full image (the crop always fully contains the padded box)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model geometry.

    Encoder geometry defaults follow timm's deit3_medium_patch16_224
    (allied_files.py:27): patch 16, embed dim 512, depth 12, heads 8,
    LayerScale pre-norm blocks.  The decoder defaults follow the largest
    trained geometry (trail_01.py:158-160).
    """

    # encoder (ViT)
    patch_size: int = 16
    img_size: int = 224
    enc_dim: int = 512
    enc_depth: int = 12
    enc_heads: int = 8
    enc_mlp_ratio: float = 4.0
    enc_layerscale_init: float = 1e-6
    enc_out_dim: int = 1024        # bottleneck AdaptiveAvgPool1d target (model.py:19)
    enc_cls_token: bool = True     # streaming (context-parallel) config: False
    enc_gelu_approx: bool = False  # tanh GELU in encoder MLPs (serving knob)
    enc_fuse_qkv: bool = True   # pack q/k/v into one matmul in encoder
    # self-attention (numerically identical; fewer HBM reads + op launches)
    enc_scan_blocks: bool = True  # lax.scan over stacked block params
    # (66.7 vs 68.8 ms/batch at B=256 and 12x fewer block HLOs; set False
    # to unroll the stack — equality-tested in tests/test_encoder_parity.py)
    # (12x fewer HLO ops; same checkpoint tree — stacked in-forward)
    enc_int8: bool = False  # dynamic int8 projection matmuls in the encoder
    # (packed QKV, attn out, MLP fc1/fc2 on the MXU int8 path, ~1.5x the
    # bf16 rate — ops/int8.py).  Approximate serving knob: token agreement
    # on the trained checkpoint is measured by probe_serving_knobs.py;
    # training/parity paths keep it False.
    enc_int8_static: bool = False  # static-CALIBRATED int8 projections: no
    # dynamic amax pass (the round-4 ladder measured dynamic int8 a wash —
    # quant overhead ate the 1.48x MXU win).  Reads per-block (4,) amax
    # vectors from a "calib" variable collection injected alongside params
    # (ops/int8.calibrate_encoder / load_calib); falls back to the exact
    # path when the collection is absent.  Serving knob, approximate.
    enc_int8_calib: bool = False  # calibration mode: sow per-site activation
    # amax into "calib_stats" (run with enc_scan_blocks=False)
    enc_attn_impl: str = "xla"  # encoder self-attention implementation:
    # "xla" (f32 scores, parity default) | "bf16" (bf16 score matmul —
    # halves softmax HBM traffic, serving knob) | "flash" (stock Pallas TPU
    # flash kernel, L padded to 256 with masked pads; serving knob) —
    # benchmarks/probe_enc_attn.py measures the A/B
    # decoder
    vocab_size: int = 332          # len(word vocab)=27 + code vocab 305 (trail_01.py:114)
    dec_dim: int = 1024
    dec_heads: int = 8
    dec_layers: int = 8
    dec_ffn_dim: int = 2048        # torch TransformerDecoderLayer default
    dec_pos_dropout: float = 0.4   # model.py:33 (axial variant uses 0.05)
    dec_layer_dropout: float = 0.1  # torch TransformerDecoderLayer default
    max_len: int = 100
    num_patches: int = 196
    patch_dropout_rate: float = 0.02  # model.py:148
    axial: bool = False            # use the axial-attention decoder variant
    kv_quant: bool = False         # int8 KV caches for decode (perf mode)
    dec_fuse_prefill: bool = True  # one (D, 2*n_layers*D) matmul for all
    # cross-attention K/V prefill projections (numerically identical;
    # equality-tested in tests/test_model.py)
    # .npz asset produced by scripts/convert_pretrained.py; when set, the
    # encoder starts from these ImageNet-pretrained weights (the reference
    # uses timm pretrained=True, model.py:15-17)
    pretrained_path: str = ""
    # numerics
    dtype: str = "bfloat16"        # compute dtype on TPU
    param_dtype: str = "float32"

    @property
    def seq_len(self) -> int:
        """Decoder sequence length including the prepended BOS (max_len - 1)."""
        return self.max_len - 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (allied_files.py:24-35, trail_01.py:209-229)."""

    lr: float = 1e-5
    weight_decay: float = 1e-4
    epochs: int = 150
    patience: int = 40
    l1_lambda: float = 1e-7
    iou_loss_weight: float = 0.5
    # Cyclic triangular LR (trail_01.py:220-224)
    base_lr: float = 1e-7
    max_lr: float = 1e-4
    step_size_up: int = 14          # len(train_loader)//2 at batch 64 on GC10
    seed: int = 42
    # If True the GIoU term flows through sampled integer tokens exactly like
    # the reference (no gradient).  If False, use the differentiable
    # expected-coordinate box loss instead.
    replicate_nondiff_giou: bool = True
    # The reference double-prepends BOS (sequences start with BOS AND the
    # forward prepends one), so its teacher forcing trains a skip-one
    # predictor (docs/PARITY.md divergence 9).  True drops the duplicate
    # BOS so training matches the generation convention; False replicates
    # the reference exactly.
    aligned_targets: bool = True
    # Sampled train-time metric battery: every Nth train batch also runs
    # the eval decode for train BLEU + mAP (0 = off; reference computes
    # them every batch, train_val_epoch.py:81-231)
    train_metrics_every: int = 0
    # Gradient accumulation: optimizer applies every N micro-batches
    # (effective batch = N * batch_size); 1 = reference behavior
    grad_accum_steps: int = 1
    # Gaussian label smoothing over the ordinal coordinate-token window
    # (sigma in bins; 0 = reference one-hot CE).  One-hot CE treats a
    # 1-bin coordinate miss like a 200-bin miss; after full convergence it
    # leaves coordinate positions at 21 % token accuracy vs 93 %+ on
    # label/special positions (round-3 diagnosis).
    coord_label_smooth_sigma: float = 0.0
    # Global-norm gradient clipping (0 = off, the reference never clips).
    # Needed when the differentiable box loss is on: its expected-coordinate
    # gradients are ~10x the CE gradients and at the cyclic-LR peak they
    # destroy a converged model within one cycle (round-3 resume probe:
    # CE 0.16 -> 2.8 in 24 steps).
    grad_clip_norm: float = 0.0
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Generation configuration (allied_files.py:32, inference_p.py:69)."""

    generation_steps: int = 101
    top_k: int = 0
    top_p: float = 1.0
    temperature: float = 1.0
    greedy: bool = True
    conf_every: int = 4            # record top-1 confidence every 4th step


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data=DP batch axis, model=TP axis, context=SP axis."""

    data: int = 1
    model: int = 1
    context: int = 1

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.data, self.model, self.context)


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    infer: InferConfig = dataclasses.field(default_factory=InferConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def large_preset(**overrides) -> Config:
    """Largest trained geometry: dim 1024 / 8 heads / 8 layers (trail_01.py:158-160)."""
    cfg = Config(model=ModelConfig(enc_out_dim=1024, dec_dim=1024,
                                   dec_heads=8, dec_layers=8))
    return cfg.replace(**overrides) if overrides else cfg


def neu_preset(**overrides) -> Config:
    """NEU-DET detection-only geometry (inference_p.py:126-128)."""
    cfg = Config(
        data=DataConfig(num_classes=6),
        model=ModelConfig(enc_out_dim=256, dec_dim=256, dec_heads=8,
                          dec_layers=6, vocab_size=CODE_VOCAB_SIZE),
    )
    return cfg.replace(**overrides) if overrides else cfg


def tiny_preset(**overrides) -> Config:
    """Captioned inference geometry (inference_trail_after_good_map.py:134-136)."""
    cfg = Config(model=ModelConfig(enc_out_dim=64, dec_dim=64, dec_heads=2,
                                   dec_layers=2))
    return cfg.replace(**overrides) if overrides else cfg


def streaming_preset(**overrides) -> Config:
    """512² context-parallel streaming eval (BASELINE config 5): 1024 patch
    tokens sharded over the mesh context axis, no CLS token."""
    cfg = Config(
        data=DataConfig(img_size=512, num_bins=224),
        model=ModelConfig(img_size=512, num_patches=1024,
                          enc_cls_token=False, enc_out_dim=1024,
                          dec_dim=1024, dec_heads=8, dec_layers=8),
        mesh=MeshConfig(data=1, context=4),
    )
    return cfg.replace(**overrides) if overrides else cfg


def test_preset(**overrides) -> Config:
    """Small geometry for fast unit tests (not a reference preset)."""
    # (function, not a pytest test)
    cfg = Config(
        data=DataConfig(img_size=32, batch_size=4, max_len=24),
        model=ModelConfig(patch_size=16, img_size=32, enc_dim=32, enc_depth=2,
                          enc_heads=2, enc_out_dim=32, dec_dim=32, dec_heads=2,
                          dec_layers=2, dec_ffn_dim=64, max_len=24,
                          num_patches=4, dtype="float32"),
    )
    return cfg.replace(**overrides) if overrides else cfg


test_preset.__test__ = False  # not a pytest test despite the name
