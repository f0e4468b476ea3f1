"""Context-parallel streaming encoder (BASELINE config 5: 512², multi-chip).

At 512² the encoder sees 1024 patch tokens.  This module runs the ViT block
stack with the token sequence sharded over the mesh ``context`` axis:

  embed   : patchify + pos embed, batch-sharded over ``data`` (token count
            per device stays full here — patchify is cheap; the quadratic
            attention work is what gets sharded)
  blocks  : shard_map over (data, context); block self-attention is ring
            attention (ppermute K/V around the ICI ring, online softmax)
  finish  : channel bottleneck, token-wise

Output equals the single-device encoder bit-for-fp32-tolerance
(tests/test_streaming.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mdcnet_tpu.models.vit import ViTEncoder


def context_parallel_encoder(encoder: ViTEncoder, mesh: Mesh) -> ViTEncoder:
    """A ring-attention twin of ``encoder`` (same params, no CLS token).

    The streaming config drops the CLS token: sequence sharding has no home
    for a broadcast token (use_cls_token=False geometry).
    """
    assert not encoder.use_cls_token, (
        "context-parallel encoding requires use_cls_token=False")
    fields = {f.name: getattr(encoder, f.name)
              for f in dataclasses.fields(encoder) if f.name not in
              ("parent", "name")}
    fields["ring_axis"] = "context"
    return ViTEncoder(**fields)


import functools


@functools.lru_cache(maxsize=16)
def _encode_fn(encoder: ViTEncoder, mesh: Mesh):
    """Build (and cache) the jitted context-parallel encode program for an
    (encoder, mesh) pair — rebuilding the jit closure per call would
    recompile every invocation."""
    if mesh.shape["context"] == 1:
        # no sequence sharding to do: plain single-program encode
        @jax.jit
        def encode_plain(p, imgs):
            return encoder.apply(p, imgs)
        return encode_plain

    ring_enc = context_parallel_encoder(encoder, mesh)
    spec = P("data", "context", None)

    def blocks_local(p, tokens):
        return ring_enc.apply(p, tokens, method="run_blocks")

    sharded_blocks = shard_map(blocks_local, mesh=mesh,
                               in_specs=(P(), spec), out_specs=spec,
                               check_vma=False)

    @jax.jit
    def encode(p, imgs):
        tokens = encoder.apply(p, imgs, method="embed")
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, spec))
        tokens = sharded_blocks(p, tokens)
        return encoder.apply(p, tokens, method="finish")

    return encode


def encode_context_parallel(encoder: ViTEncoder, params, images: jnp.ndarray,
                            mesh: Mesh) -> jnp.ndarray:
    """Full context-parallel encode: (B, H, W, 3) -> (B, N, out_dim).
    One jitted program: embed -> shard_map'd ring-attention block stack ->
    bottleneck (eager dispatch over a remote tunnel costs ~30 ms per op)."""
    with mesh:
        return _encode_fn(encoder, mesh)(params, images)


def make_context_parallel_apply(model, mesh: Mesh, remat: bool = True):
    """A drop-in replacement for ``model.apply`` whose encoder block stack
    runs ring attention with the token sequence sharded over the mesh
    ``context`` axis — fully differentiable, so the 512² config can TRAIN
    context-parallel (ppermute transposes to the reverse ring under autodiff;
    gradients equal the single-device step, tests/test_context_parallel.py).

    ``remat``: rematerialize the block stack on backward (the 12-block
    1024-token stack's activations otherwise dominate HBM at 512²).

    Signature: apply_fn(variables, images, tgt, deterministic=..., rngs=...)
    -> logits, matching the EncoderDecoder.__call__ surface used by
    make_train_step.
    """
    from mdcnet_tpu.models.encdec import patch_dropout_mask

    encoder = model.encoder
    ring_enc = context_parallel_encoder(encoder, mesh)
    spec = P("data", "context", None)

    def blocks_local(p, tokens):
        return ring_enc.apply(p, tokens, method="run_blocks")

    if remat:
        blocks_local = jax.checkpoint(blocks_local)
    sharded_blocks = shard_map(blocks_local, mesh=mesh,
                               in_specs=(P(), spec), out_specs=spec,
                               check_vma=False)

    def apply_fn(variables, images, tgt, deterministic: bool = True,
                 rngs=None):
        enc_p = {"params": variables["params"]["encoder"]}
        dec_p = {"params": variables["params"]["decoder"]}
        tokens = encoder.apply(enc_p, images, method="embed")
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, spec))
        tokens = sharded_blocks(enc_p, tokens)
        enc_out = encoder.apply(enc_p, tokens, method="finish")
        if not deterministic and model.patch_dropout_rate > 0:
            mask = patch_dropout_mask(rngs["patch_dropout"],
                                      enc_out.shape[0], enc_out.shape[1],
                                      model.patch_dropout_rate)
            enc_out = enc_out * mask.astype(enc_out.dtype)
        dec_rngs = ({"dropout": rngs["dropout"]}
                    if (rngs and "dropout" in rngs) else None)
        return model.decoder.apply(dec_p, enc_out, tgt,
                                   deterministic=deterministic,
                                   rngs=dec_rngs)

    return apply_fn


def streaming_eval_step(model, params, images: jnp.ndarray, mesh: Mesh,
                        rng: jax.Array, steps: int = 101, **gen_kw):
    """One streaming-eval step: context-parallel encode (e.g. 512² -> 1024
    tokens sharded over ``context``), then standard cached generation on the
    pooled memory.  The model must be built with ``num_patches`` matching the
    image size (config 5 geometry: num_patches=1024, use_cls_token=False)."""
    from mdcnet_tpu.infer.generate import generate_from_memory

    encoder_out = encode_context_parallel(
        model.encoder, {"params": params["params"]["encoder"]}, images, mesh)
    return generate_from_memory(model, params, encoder_out, rng, steps=steps,
                                **gen_kw)
