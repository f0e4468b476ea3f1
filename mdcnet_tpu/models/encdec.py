"""Encoder–decoder composition with patch dropout.

Reference (model.py:147-181): during training a random ``max(1, 2%)`` of the
encoder's patch outputs are zeroed per sample via a Python loop of per-row
``randperm``.  Here the same distribution is produced fully vectorized: one
uniform score per patch per sample, the ``num_to_mask`` smallest are zeroed
(a uniform random subset, exactly randperm's marginal law), with no host
loop — the whole thing stays inside jit.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdcnet_tpu.models.decoder import CaptionDecoder
from mdcnet_tpu.models.vit import ViTEncoder

Dtype = Any


def patch_dropout_mask(rng: jax.Array, batch: int, num_patches: int,
                       rate: float) -> jnp.ndarray:
    """(B, N, 1) float mask zeroing a uniformly random ``max(1, int(N*rate))``
    patches per sample (model.py:157-172)."""
    num_to_mask = max(1, int(num_patches * rate))
    scores = jax.random.uniform(rng, (batch, num_patches))
    # threshold = num_to_mask-th smallest score per row
    kth = jnp.sort(scores, axis=1)[:, num_to_mask - 1]
    keep = scores > kth[:, None]
    return keep.astype(jnp.float32)[..., None]


class EncoderDecoder(nn.Module):
    """Full image->sequence model (reference EncoderDecoder, model.py:147-181)."""

    encoder: ViTEncoder
    decoder: CaptionDecoder
    patch_dropout_rate: float = 0.02

    def __call__(self, images: jnp.ndarray, tgt: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        encoder_out = self.encoder(images)
        if not deterministic and self.patch_dropout_rate > 0:
            rng = self.make_rng("patch_dropout")
            mask = patch_dropout_mask(rng, encoder_out.shape[0],
                                      encoder_out.shape[1],
                                      self.patch_dropout_rate)
            encoder_out = encoder_out * mask.astype(encoder_out.dtype)
        return self.decoder(encoder_out, tgt, deterministic=deterministic)

    def predict(self, images: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
        """No patch dropout at inference (model.py:177-181)."""
        return self.decoder.predict(self.encoder(images), tgt)

    def encode(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.encoder(images)


def build_model(cfg) -> EncoderDecoder:
    """Construct the model from a ModelConfig."""
    dtype = jnp.dtype(cfg.dtype)
    param_dtype = jnp.dtype(cfg.param_dtype)
    encoder = ViTEncoder(
        patch_size=cfg.patch_size, img_size=cfg.img_size,
        dim=cfg.enc_dim, depth=cfg.enc_depth,
        num_heads=cfg.enc_heads, mlp_ratio=cfg.enc_mlp_ratio,
        layerscale_init=cfg.enc_layerscale_init, out_dim=cfg.enc_out_dim,
        use_cls_token=cfg.enc_cls_token,
        gelu_approx=getattr(cfg, 'enc_gelu_approx', False),
        attn_impl=getattr(cfg, 'enc_attn_impl', 'xla'),
        fuse_qkv=getattr(cfg, 'enc_fuse_qkv', True),
        scan_blocks=getattr(cfg, 'enc_scan_blocks', False),
        int8_mm=getattr(cfg, 'enc_int8', False),
        int8_static=getattr(cfg, 'enc_int8_static', False),
        int8_calib=getattr(cfg, 'enc_int8_calib', False), dtype=dtype,
        param_dtype=param_dtype)
    if cfg.axial:
        from mdcnet_tpu.models.axial import AxialCaptionDecoder
        decoder = AxialCaptionDecoder(
            vocab_size=cfg.vocab_size, encoder_length=cfg.num_patches,
            dim=cfg.dec_dim, num_heads=cfg.dec_heads,
            num_layers=cfg.dec_layers, ffn_dim=cfg.dec_ffn_dim,
            max_len=cfg.max_len, dtype=dtype, param_dtype=param_dtype)
        patch_rate = 0.0   # axial wrapper has no patch dropout (axial_model.py:161-174)
    else:
        decoder = CaptionDecoder(
            vocab_size=cfg.vocab_size, encoder_length=cfg.num_patches,
            dim=cfg.dec_dim, num_heads=cfg.dec_heads,
            num_layers=cfg.dec_layers, ffn_dim=cfg.dec_ffn_dim,
            max_len=cfg.max_len, pos_dropout=cfg.dec_pos_dropout,
            layer_dropout=cfg.dec_layer_dropout,
            kv_quant=cfg.kv_quant,
            fuse_prefill=getattr(cfg, 'dec_fuse_prefill', True),
            dtype=dtype, param_dtype=param_dtype)
        patch_rate = cfg.patch_dropout_rate
    return EncoderDecoder(encoder=encoder, decoder=decoder,
                          patch_dropout_rate=patch_rate)


def adapt_params_resolution(params, new_patches: int):
    """Re-grid the two patch-sequence positional embeddings so a checkpoint
    trained at one image size fine-tunes at another (e.g. 224² -> 448² for
    small-defect localization): the encoder's ``pos_embed`` (1, N, D_enc)
    and the decoder's ``encoder_pos_embed`` (1, N, D_dec) are bilinearly
    resampled on the sqrt(N) x sqrt(N) patch grid — the same law
    ``ViTEncoder._pos`` applies at runtime (vit.py) and the reference's
    interpolation convention (model.py:64-68).  All other parameters are
    resolution-independent and pass through unchanged."""
    def regrid(pos):
        n_old = pos.shape[1]
        if n_old == new_patches:
            return pos
        s_old = int(round(n_old ** 0.5))
        s_new = int(round(new_patches ** 0.5))
        assert s_old * s_old == n_old and s_new * s_new == new_patches, \
            "positional embeddings must live on square patch grids"
        grid = pos.reshape(1, s_old, s_old, pos.shape[-1])
        grid = jax.image.resize(grid, (1, s_new, s_new, pos.shape[-1]),
                                method="bilinear")
        return grid.reshape(1, new_patches, pos.shape[-1]).astype(pos.dtype)

    p = params["params"] if "params" in params else params
    enc = dict(p["encoder"])
    enc["pos_embed"] = regrid(enc["pos_embed"])
    dec = dict(p["decoder"])
    dec["encoder_pos_embed"] = regrid(dec["encoder_pos_embed"])
    out = dict(p)
    out["encoder"], out["decoder"] = enc, dec
    return {"params": out} if "params" in params else out


def cast_decoder_params_bf16(params):
    """Serving cast: decoder float32 leaves -> bfloat16, EXCEPT the vocab
    head (``output``), which computes in float32 (decoder.py setup).

    Under the bf16 compute dtype every other decoder op already does
    ``w.astype(bfloat16)`` per use (flax promote_dtype), so pre-casting
    produces bit-identical outputs while halving the weight bytes the
    decode while_loop streams from HBM each iteration
    (benchmarks/probe_spec_inloop.py: greedy 6.78 -> 6.42 ms/iter).
    Encoder params are left untouched: the int8-static projection path
    quantizes from the f32 weights and pre-casting would perturb it."""
    import jax.numpy as jnp

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if (hasattr(tree, "dtype") and tree.dtype == jnp.float32
                and "output" not in path):
            return tree.astype(jnp.bfloat16)
        return tree

    p = params["params"] if "params" in params else params
    out = dict(p)
    out["decoder"] = walk(p["decoder"], ())
    return {"params": out} if "params" in params else out
