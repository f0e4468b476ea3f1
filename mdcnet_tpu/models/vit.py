"""ViT image encoder (DeiT3-style) with the reference's channel bottleneck.

The reference wraps a timm ``deit3_medium_patch16_224`` backbone, drops the
CLS token and applies ``nn.AdaptiveAvgPool1d(out_dim)`` over the *channel*
dimension as a bottleneck (model.py:14-23).  Geometry of deit3-medium:
patch 16, embed dim 512, depth 12, heads 8, pre-norm blocks with LayerScale
(init 1e-6), positional embedding on patch tokens only (no CLS pos embed).

TPU-first choices:
  - patchify is a single strided conv that XLA lowers to one big matmul on
    the MXU; all block matmuls run in bf16 with fp32 accumulation.
  - the adaptive channel pool is expressed as a precomputed static pooling
    matrix so the "bottleneck" is one (N, D) x (D, out) matmul instead of a
    gather/scatter — this also makes it differentiable and shardable.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mdcnet_tpu.models.layers import MultiHeadAttention

Dtype = Any


def adaptive_pool_matrix(in_dim: int, out_dim: int) -> np.ndarray:
    """(in_dim, out_dim) matrix reproducing torch AdaptiveAvgPool1d: output
    bin i averages input[floor(i*in/out) : ceil((i+1)*in/out)].  Works for
    both down- (1024->256) and up-sampling (512->1024) like the reference's
    varying ``out_dim`` (trail_01.py:158, inference_p.py:126)."""
    mat = np.zeros((in_dim, out_dim), dtype=np.float32)
    for i in range(out_dim):
        start = (i * in_dim) // out_dim
        end = -(-((i + 1) * in_dim) // out_dim)  # ceil
        mat[start:end, i] = 1.0 / (end - start)
    return mat


class ChannelAdaptivePool(nn.Module):
    """AdaptiveAvgPool1d over channels as one static matmul."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        if in_dim == self.out_dim:
            return x
        mat = jnp.asarray(adaptive_pool_matrix(in_dim, self.out_dim),
                          dtype=self.dtype)
        return jnp.einsum("...d,de->...e", x.astype(self.dtype), mat)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with LayerScale (DeiT3)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ls = lambda name: self.param(
            name, nn.initializers.constant(self.layerscale_init),
            (self.dim,), self.param_dtype)

        h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.num_heads, **kw, name="attn")(h, h, h)
        x = x + h * ls("gamma1")

        h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), **kw, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, **kw, name="mlp_fc2")(h)
        return x + h * ls("gamma2")


class ViTEncoder(nn.Module):
    """DeiT3-style ViT returning patch tokens only, bottlenecked to out_dim.

    Equivalent surface to the reference Encoder (model.py:14-23): output is
    (B, num_patches, out_dim); the CLS token is carried through the blocks
    (it influences nothing else once dropped, but keeps the compute graph
    faithful to the backbone) and removed before the bottleneck.
    """

    patch_size: int = 16
    dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-6
    out_dim: int = 1024
    use_cls_token: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) channels-last float."""
        b, h, w, _ = images.shape
        x = nn.Conv(self.dim, kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(images.astype(self.dtype))
        n_patches = (h // self.patch_size) * (w // self.patch_size)
        x = x.reshape(b, n_patches, self.dim)

        # DeiT3: pos embed on patch tokens only, CLS concatenated after.
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, n_patches, self.dim), self.param_dtype)
        x = x + pos.astype(self.dtype)
        if self.use_cls_token:
            cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                             (1, 1, self.dim), self.param_dtype)
            cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.dim))
            x = jnp.concatenate([cls, x], axis=1)

        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads, self.mlp_ratio,
                         self.layerscale_init, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)

        if self.use_cls_token:
            x = x[:, 1:]  # drop CLS (model.py:23 features[:, 1:])
        return ChannelAdaptivePool(self.out_dim, dtype=self.dtype,
                                   name="bottleneck")(x)
