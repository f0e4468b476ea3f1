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
  - the forward is split into ``embed`` (patchify + pos) and ``run_blocks``
    so the 512² streaming-eval path can shard_map the block stack over the
    mesh ``context`` axis with ring attention (``ring_axis``), never
    materializing the full 1024-token sequence per device.
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
    ring_axis: Optional[str] = None
    use_flash: bool = False
    attn_impl: str = "xla"  # see MultiHeadAttention.attn_impl
    fuse_qkv: bool = False  # q/k/v as one packed matmul (see layers.py)
    gelu_approx: bool = False  # tanh-approx GELU (serving knob; exact erf
    # matches timm/torch bit-for-bit and stays the parity default)
    int8_mm: bool = False  # dynamic int8 projection matmuls (ops/int8.py):
    # packed QKV, attention out, MLP fc1/fc2 run on the MXU's int8 path
    # (~1.5x the bf16 rate); approximate serving knob — end-to-end token
    # agreement measured by benchmarks/probe_serving_knobs.py
    int8_static: bool = False  # static-calibrated int8 projections: reads a
    # per-block (4,) activation-amax vector from the "calib" variable
    # collection (ops/int8.calibrate_encoder builds it; inject it alongside
    # the params at apply time).  No dynamic amax pass — the quantize fuses
    # into LayerNorm/GELU epilogues.  Requires fuse_qkv for the QKV site;
    # falls back to the exact path when the collection is absent.
    int8_calib: bool = False  # sow per-site activation amax (calibration)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _dense(self, mod: nn.Dense, x: jnp.ndarray, amax=None) -> jnp.ndarray:
        """Apply a Dense submodule, through int8_matmul (dynamic) or
        int8_matmul_static (``amax`` given) when a knob is on (param tree
        unchanged — the quantization reads the live params)."""
        if amax is not None and not self.is_initializing():
            from mdcnet_tpu.ops.int8 import int8_matmul_static
            p = mod.variables["params"]
            return int8_matmul_static(x, p["kernel"].astype(self.dtype),
                                      p["bias"].astype(self.dtype), amax)
        if self.int8_mm and not self.is_initializing():
            from mdcnet_tpu.ops.int8 import int8_matmul
            p = mod.variables["params"]
            return int8_matmul(x, p["kernel"].astype(self.dtype),
                               p["bias"].astype(self.dtype))
        return mod(x)

    def _sow_amax(self, name: str, x: jnp.ndarray) -> None:
        self.sow("calib_stats", name,
                 jnp.max(jnp.abs(x.astype(jnp.float32))),
                 init_fn=lambda: jnp.zeros((), jnp.float32),
                 reduce_fn=jnp.maximum)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ls = lambda name: self.param(
            name, nn.initializers.constant(self.layerscale_init),
            (self.dim,), self.param_dtype)
        # static-int8 calibration vector (qkv_in, out_in, fc1_in, fc2_in)
        amax = None
        if (self.int8_static and not self.is_initializing()
                and self.has_variable("calib", "amax")):
            amax = self.get_variable("calib", "amax").astype(jnp.float32)
        site = (lambda i: None) if amax is None else (lambda i: amax[i])

        h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm1")(x)
        h = MultiHeadAttention(self.dim, self.num_heads,
                               ring_axis=self.ring_axis,
                               use_flash=self.use_flash,
                               attn_impl=self.attn_impl,
                               fuse_qkv=self.fuse_qkv,
                               int8_mm=self.int8_mm,
                               int8_calib=self.int8_calib, **kw,
                               name="attn")(
            h, h, h, int8_amax=None if amax is None else (amax[0], amax[1]))
        # LayerScale gammas are param_dtype (f32); downcast the scaled
        # branch so the residual STREAM stays in compute dtype — without
        # this the bf16 flagship promotes the whole stream to f32 after
        # block 0, doubling residual HBM traffic across the stack
        x = x + (h * ls("gamma1")).astype(x.dtype)

        h = nn.LayerNorm(epsilon=1e-6, **kw, name="norm2")(x)
        fc1 = nn.Dense(int(self.dim * self.mlp_ratio), **kw, name="mlp_fc1")
        fc2 = nn.Dense(self.dim, **kw, name="mlp_fc2")
        if self.int8_calib:
            self._sow_amax("fc1_in", h)
        h = self._dense(fc1, h, amax=site(2))
        h = nn.gelu(h, approximate=self.gelu_approx)
        if self.int8_calib:
            self._sow_amax("fc2_in", h)
        h = self._dense(fc2, h, amax=site(3))
        return x + (h * ls("gamma2")).astype(x.dtype)


class ViTEncoder(nn.Module):
    """DeiT3-style ViT returning patch tokens only, bottlenecked to out_dim.

    Equivalent surface to the reference Encoder (model.py:14-23): output is
    (B, num_patches, out_dim); the CLS token is carried through the blocks
    (it influences nothing else once dropped, but keeps the compute graph
    faithful to the backbone) and removed before the bottleneck.

    ``ring_axis`` switches block self-attention to ring attention over a
    mesh axis for context-parallel encoding (CLS must be disabled — the
    streaming config uses ``use_cls_token=False``).
    """

    patch_size: int = 16
    img_size: int = 224
    dim: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    layerscale_init: float = 1e-6
    out_dim: int = 1024
    use_cls_token: bool = True
    ring_axis: Optional[str] = None
    use_flash: bool = False  # Pallas blockwise attention in the blocks
    attn_impl: str = "xla"   # "xla" | "bf16" | "flash" (layers.py)
    fuse_qkv: bool = False   # packed qkv matmul in block self-attention
    scan_blocks: bool = False  # run the stack as ONE lax.scan over stacked
    # per-block params: 12x fewer HLO ops (compile + launch overhead) with
    # the checkpoint param tree unchanged (stacking happens in-forward)
    gelu_approx: bool = False
    int8_mm: bool = False  # int8 projection matmuls (see ViTBlock.int8_mm)
    int8_static: bool = False  # static-calibrated int8 (ViTBlock.int8_static)
    int8_calib: bool = False   # calibration sow mode (use scan_blocks=False)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.patch_embed = nn.Conv(
            self.dim, kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), **kw)
        init = nn.initializers.truncated_normal(0.02)
        # pos embed sized for the configured image size; bilinearly
        # interpolated by embed() when inputs differ (512² config)
        n_default = (self.img_size // self.patch_size) ** 2
        self.pos_embed = self.param("pos_embed", init,
                                    (1, n_default, self.dim),
                                    self.param_dtype)
        if self.use_cls_token:
            self.cls_token = self.param("cls_token", init, (1, 1, self.dim),
                                        self.param_dtype)
        self.blocks = [ViTBlock(self.dim, self.num_heads, self.mlp_ratio,
                                self.layerscale_init,
                                ring_axis=self.ring_axis,
                                use_flash=self.use_flash,
                                attn_impl=self.attn_impl,
                                fuse_qkv=self.fuse_qkv,
                                gelu_approx=self.gelu_approx,
                                int8_mm=self.int8_mm,
                                int8_static=self.int8_static,
                                int8_calib=self.int8_calib, **kw,
                                name=f"block{i}")
                       for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, **kw)
        self.bottleneck = ChannelAdaptivePool(self.out_dim, dtype=self.dtype)

    def _pos(self, n_patches: int) -> jnp.ndarray:
        pos = self.pos_embed.astype(self.dtype)
        if pos.shape[1] == n_patches:
            return pos
        # bilinear grid interpolation for non-224 image sizes (512² config)
        side_old = int(pos.shape[1] ** 0.5)
        side_new = int(n_patches ** 0.5)
        grid = pos.reshape(1, side_old, side_old, self.dim)
        grid = jax.image.resize(grid, (1, side_new, side_new, self.dim),
                                method="bilinear")
        return grid.reshape(1, n_patches, self.dim)

    def embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """Patchify + positional embedding (+ CLS). images: (B, H, W, 3)."""
        b, h, w, _ = images.shape
        x = self.patch_embed(images.astype(self.dtype))
        n = (h // self.patch_size) * (w // self.patch_size)
        x = x.reshape(b, n, self.dim)
        x = x + self._pos(n)
        if self.use_cls_token:
            cls = jnp.broadcast_to(self.cls_token.astype(self.dtype),
                                   (b, 1, self.dim))
            x = jnp.concatenate([cls, x], axis=1)
        return x

    def run_blocks(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transformer stack + final norm (token-wise; shard_map-safe)."""
        if self.scan_blocks and not self.is_initializing():
            stack = lambda vs: jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *vs)
            stacked = stack([b.variables["params"] for b in self.blocks])
            blk = self.blocks[0]
            if self.int8_static and "calib" in self.blocks[0].variables:
                # ride the calibrated per-block amax vectors through the scan
                stacked_c = stack([b.variables["calib"]
                                   for b in self.blocks])

                def body_c(h, pc):
                    p, c = pc
                    return blk.apply({"params": p, "calib": c}, h), None

                x, _ = jax.lax.scan(body_c, x, (stacked, stacked_c))
                return self.norm(x)

            def body(h, p):
                return blk.apply({"params": p}, h), None

            x, _ = jax.lax.scan(body, x, stacked)
            return self.norm(x)
        for block in self.blocks:
            x = block(x)
        return self.norm(x)

    def finish(self, x: jnp.ndarray) -> jnp.ndarray:
        """Drop CLS (model.py:23) + channel bottleneck."""
        if self.use_cls_token:
            x = x[:, 1:]
        return self.bottleneck(x)

    def encode_raw(self, images: jnp.ndarray) -> jnp.ndarray:
        """Full stack WITHOUT the channel bottleneck: (B, N, dim).  Serving
        path: the static bottleneck pool folds into the decoder's cross-K/V
        projection (decoder.prepare_memory_folded), halving the prefill
        contraction (enc dim 512 vs out_dim 1024 at flagship)."""
        x = self.run_blocks(self.embed(images))
        if self.use_cls_token:
            x = x[:, 1:]
        return x

    def pool_matrix(self) -> Optional[jnp.ndarray]:
        """The static (dim, out_dim) bottleneck matrix (None if identity)."""
        if self.dim == self.out_dim:
            return None
        return jnp.asarray(adaptive_pool_matrix(self.dim, self.out_dim),
                           dtype=self.dtype)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.finish(self.run_blocks(self.embed(images)))
