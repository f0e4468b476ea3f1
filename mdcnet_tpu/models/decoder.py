"""Caption/sequence transformer decoder.

Behavioral contract with the reference (model.py:26-127):
  - ``__call__`` prepends a BOS column to the target (model.py:60-61), adds a
    learnable positional embedding that is *linearly interpolated* when the
    sequence length differs from ``max_len - 1`` (model.py:64-68), applies
    positional dropout, adds a learnable positional embedding to the encoder
    memory, runs a post-norm transformer decoder stack under a causal + pad
    mask, and projects to vocab logits of shape (B, L+1, V).
  - ``predict`` pads the prefix to ``max_len - 1`` with PAD, runs the same
    stack *without* BOS prepend, then splices a pseudo-logit row holding the
    raw BOS token id in front and drops the last position (model.py:92-127).

TPU-first mechanics: generation does NOT re-run this full forward per step.
``prepare_memory`` precomputes cross-attention K/V once per image and
``decode_step`` advances one token against per-layer KV caches
(O(L) total instead of the reference's O(L²) re-forwards) — outputs are
verified token-identical to the padded full forward in tests/test_model.py.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mdcnet_tpu.config import BOS_ID, PAD_ID
from mdcnet_tpu.models.layers import TorchDecoderLayer, dot_product_attention
from mdcnet_tpu.ops.masks import (NEG_INF, causal_mask, combine_masks,
                                  padding_bias)

Dtype = Any


def interpolate_pos_embed(pos: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear 1-D interpolation along the length axis, matching torch
    ``F.interpolate(mode='linear', align_corners=False)`` (model.py:64-68).
    pos: (1, L, D) -> (1, new_len, D)."""
    old_len = pos.shape[1]
    if old_len == new_len:
        return pos
    # align_corners=False: out coord i samples input at (i+0.5)*L/L' - 0.5
    coords = (jnp.arange(new_len) + 0.5) * (old_len / new_len) - 0.5
    coords = jnp.clip(coords, 0.0, old_len - 1)
    lo = jnp.floor(coords).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, old_len - 1)
    frac = (coords - lo)[None, :, None].astype(pos.dtype)
    return pos[:, lo] * (1.0 - frac) + pos[:, hi] * frac


class CaptionDecoder(nn.Module):
    vocab_size: int
    encoder_length: int
    dim: int
    num_heads: int
    num_layers: int
    ffn_dim: int = 2048
    max_len: int = 100
    pos_dropout: float = 0.4           # model.py:33 (axial variant: 0.05)
    layer_dropout: float = 0.1         # torch TransformerDecoderLayer default
    prepend_bos: bool = True           # axial variant skips the BOS prepend
    torch_float_padmask: bool = False  # reproduce utils.py:29 float-mask bug
    kv_quant: bool = False             # int8 KV caches (halves decode traffic)
    fuse_prefill: bool = True          # all layers' cross K/V projections as
    # ONE (D, 2*n_layers*D) matmul in prepare_memory (numerically identical
    # per output column; reads the memory activations once instead of
    # 2*n_layers times and gives the MXU a wide N)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.dim,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  embedding_init=nn.initializers.xavier_uniform())
        init = nn.initializers.truncated_normal(0.02)
        self.decoder_pos_embed = self.param(
            "decoder_pos_embed", init, (1, self.max_len - 1, self.dim),
            self.param_dtype)
        self.encoder_pos_embed = self.param(
            "encoder_pos_embed", init, (1, self.encoder_length, self.dim),
            self.param_dtype)
        self.pos_drop = nn.Dropout(self.pos_dropout)
        self.layers = [
            TorchDecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                              self.layer_dropout, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"layer{i}")
            for i in range(self.num_layers)]
        self.output = nn.Dense(self.vocab_size, dtype=jnp.float32,
                               param_dtype=self.param_dtype)

    # ------------------------------------------------------------------ #
    # teacher-forced forward (model.py:58-88)
    # ------------------------------------------------------------------ #
    def __call__(self, encoder_out: jnp.ndarray, tgt: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        if self.prepend_bos:
            bos = jnp.full((tgt.shape[0], 1), BOS_ID, dtype=tgt.dtype)
            tgt = jnp.concatenate([bos, tgt], axis=1)
        return self._run_stack(encoder_out, tgt, deterministic)

    def _embed_tgt(self, tgt: jnp.ndarray, pos: jnp.ndarray,
                   deterministic: bool) -> jnp.ndarray:
        """Target embedding hook; the axial variant overrides this to insert
        its attention block before the positional embedding."""
        return self.pos_drop(self.embedding(tgt) + pos,
                             deterministic=deterministic)

    def _run_stack(self, encoder_out: jnp.ndarray, tgt: jnp.ndarray,
                   deterministic: bool) -> jnp.ndarray:
        length = tgt.shape[1]
        pos = interpolate_pos_embed(
            self.decoder_pos_embed.astype(self.dtype), length)
        x = self._embed_tgt(tgt, pos, deterministic)

        memory = encoder_out.astype(self.dtype) + \
            self.encoder_pos_embed.astype(self.dtype)
        memory = self.pos_drop(memory, deterministic=deterministic)

        bias = combine_masks(
            causal_mask(length),
            padding_bias(tgt, PAD_ID,
                         torch_float_compat=self.torch_float_padmask))
        for layer in self.layers:
            x = layer(x, memory, bias, deterministic=deterministic)
        return self.output(x)

    # ------------------------------------------------------------------ #
    # reference predict semantics (model.py:92-127)
    # ------------------------------------------------------------------ #
    def predict(self, encoder_out: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
        """Pad prefix to max_len-1, full forward (no BOS prepend), then
        prepend a pseudo-logit row of raw BOS ids and drop the last step."""
        b, length = tgt.shape
        pad = jnp.full((b, self.max_len - 1 - length), PAD_ID, dtype=tgt.dtype)
        full = jnp.concatenate([tgt, pad], axis=1)
        logits = self._run_stack(encoder_out, full, deterministic=True)
        bos_row = jnp.full((b, 1, logits.shape[-1]), float(BOS_ID),
                           dtype=logits.dtype)
        return jnp.concatenate([bos_row, logits[:, :-1]], axis=1)

    # ------------------------------------------------------------------ #
    # KV-cached incremental decode (TPU-native generation path)
    # ------------------------------------------------------------------ #
    def prepare_memory(self, encoder_out: jnp.ndarray
                       ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Precompute per-layer cross-attention K/V from the encoder output
        (+ its positional embedding).  Run once per image."""
        from mdcnet_tpu.ops import kv_quant

        memory = encoder_out.astype(self.dtype) + \
            self.encoder_pos_embed.astype(self.dtype)
        if self.fuse_prefill and not self.is_initializing():
            pk = lambda m: m.variables["params"]
            projs = [m for layer in self.layers
                     for m in (layer.cross_attn.k_proj,
                               layer.cross_attn.v_proj)]
            w = jnp.concatenate([pk(m)["kernel"] for m in projs],
                                axis=1).astype(self.dtype)
            bias = jnp.concatenate([pk(m)["bias"] for m in projs]
                                   ).astype(self.dtype)
            kv = memory @ w + bias          # (B, L, 2*n_layers*D)
            parts = jnp.split(kv, len(projs), axis=-1)
            hs = self.layers[0].cross_attn.head_split
            kvs = [(hs(parts[2 * i]), hs(parts[2 * i + 1]))
                   for i in range(len(self.layers))]
        else:
            kvs = [layer.cross_attn.project_kv(memory)
                   for layer in self.layers]
        if self.kv_quant:
            # pad the memory length to the Mosaic DMA sublane granularity;
            # the kernel masks keys beyond the real length (mem_pos)
            pad = (-memory.shape[1]) % 8
            def quant_padded(x):
                if pad:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                return kv_quant.quantize(x)
            kvs = [(quant_padded(k), quant_padded(v)) for k, v in kvs]
        return kvs

    def prepare_memory_folded(self, enc_raw: jnp.ndarray,
                              pool_mat: Optional[jnp.ndarray]
                              ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Cross-attention K/V prefill with the encoder's static channel
        bottleneck folded in: instead of

            kv = (enc_raw @ pool + pos) @ W_kv + b          (contraction D)

        compute

            kv = enc_raw @ (pool @ W_kv) + (pos @ W_kv + b)  (contraction d)

        where d = encoder dim (512 at flagship) < D = decoder dim (1024) —
        the pool matrix has rank <= d, so the fold HALVES the prefill FLOPs
        and skips materializing the (B, N, D) bottleneck output entirely.
        Same math, different association (bf16 rounding differs — serving
        knob; closeness tested in tests/test_model.py).  ``pool_mat`` None
        means the bottleneck is the identity (enc dim == decoder dim)."""
        pk = lambda m: m.variables["params"]
        projs = [m for layer in self.layers
                 for m in (layer.cross_attn.k_proj, layer.cross_attn.v_proj)]
        w = jnp.concatenate([pk(m)["kernel"] for m in projs],
                            axis=1).astype(self.dtype)        # (D, 2LD)
        bias = jnp.concatenate([pk(m)["bias"] for m in projs]
                               ).astype(self.dtype)
        w_f = w if pool_mat is None else pool_mat.astype(self.dtype) @ w
        b_f = self.encoder_pos_embed.astype(self.dtype) @ w + bias
        kv = enc_raw.astype(self.dtype) @ w_f + b_f           # (B, N, 2LD)
        parts = jnp.split(kv, len(projs), axis=-1)
        hs = self.layers[0].cross_attn.head_split
        kvs = [(hs(parts[2 * i]), hs(parts[2 * i + 1]))
               for i in range(len(self.layers))]
        if self.kv_quant:
            from mdcnet_tpu.ops import kv_quant
            pad = (-enc_raw.shape[1]) % 8
            def quant_padded(x):
                if pad:
                    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                return kv_quant.quantize(x)
            kvs = [(quant_padded(k), quant_padded(v)) for k, v in kvs]
        return kvs

    def init_cache(self, batch: int, cache_len: int
                   ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        from mdcnet_tpu.ops import kv_quant

        head_dim = self.dim // self.num_heads
        if self.kv_quant:
            padded = cache_len + ((-cache_len) % 8)  # DMA sublane granularity
            mk = lambda: kv_quant.init_cache(batch, self.num_heads, padded,
                                             head_dim)
            return [(mk(), mk()) for _ in range(self.num_layers)]
        shape = (batch, self.num_heads, cache_len, head_dim)
        return [(jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))
                for _ in range(self.num_layers)]

    def decode_step(self, token: jnp.ndarray, pos: jnp.ndarray,
                    caches: List[Tuple[jnp.ndarray, jnp.ndarray]],
                    mem_kvs: List[Tuple[jnp.ndarray, jnp.ndarray]],
                    key_valid: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
        """Advance one position.  token: (B,) ids; pos: scalar int or (B,)
        per-row positions (continuous batching); key_valid: (B, cache_len)
        bool marking attendable cache slots (non-pad positions <= pos).
        Returns (logits (B, V), updated caches)."""
        if getattr(pos, "ndim", 0) == 1:
            pos_embed = jnp.take(
                self.decoder_pos_embed.astype(self.dtype)[0], pos,
                axis=0)[:, None, :]
        else:
            pos_embed = jax.lax.dynamic_slice(
                self.decoder_pos_embed.astype(self.dtype),
                (0, pos, 0), (1, 1, self.dim))
        x = self.embedding(token[:, None]) + pos_embed
        new_caches = []
        mem_pos = self.encoder_length - 1  # real memory length (quant pads)
        for layer, cache, mem_kv in zip(self.layers, caches, mem_kvs):
            x, cache = layer.decode_step(x, cache, mem_kv, pos, key_valid,
                                         mem_pos=mem_pos)
            new_caches.append(cache)
        return self.output(x)[:, 0], new_caches

    def decode_block_split(self, tokens: jnp.ndarray, pos: jnp.ndarray,
                           caches: List[Tuple[jnp.ndarray, jnp.ndarray]],
                           mem_kvs: List[Tuple[jnp.ndarray, jnp.ndarray]]
                           ) -> Tuple[jnp.ndarray,
                                      List[Tuple[jnp.ndarray, jnp.ndarray]]]:
        """Scatter-free twin of ``decode_block``: caches are READ-ONLY; the
        K new K/V rows are returned per layer for a single deferred
        ``commit_blocks`` call after verification decides the accepted
        count.  Output logits are mathematically identical to
        ``decode_block`` (the split softmax merge is exact)."""
        pe = self.decoder_pos_embed.astype(self.dtype)[0]
        k_blk = tokens.shape[1]
        cols = pos[:, None] + jnp.arange(k_blk)[None, :]
        pos_embed = jnp.take(pe, jnp.minimum(cols, pe.shape[0] - 1), axis=0)
        x = self.embedding(tokens) + pos_embed
        cache_alloc = caches[0][0].shape[2]
        cache_bias = jnp.where(
            jnp.arange(cache_alloc)[None, :] < pos[:, None], 0.0, NEG_INF
        ).astype(jnp.float32)[:, None, None, :]            # (B,1,1,L)
        i = jnp.arange(k_blk)
        blk_bias = jnp.where(i[None, :] <= i[:, None], 0.0, NEG_INF
                             ).astype(jnp.float32)[None, None]  # (1,1,K,K)
        blk_kvs = []
        for layer, cache, mem_kv in zip(self.layers, caches, mem_kvs):
            x, blk_kv = layer.decode_block_split(x, cache, mem_kv,
                                                 cache_bias, blk_bias)
            blk_kvs.append(blk_kv)
        return self.output(x), blk_kvs

    @staticmethod
    def commit_blocks(caches: List[Tuple[jnp.ndarray, jnp.ndarray]],
                      blk_kvs: List[Tuple[jnp.ndarray, jnp.ndarray]],
                      pos: jnp.ndarray, acc: jnp.ndarray,
                      impl: str = "scatter"
                      ) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Write the accepted prefix of each row's block K/V into the caches.

        pos: (B,) first block position per row; acc: (B,) accepted counts in
        [0, K].

        impl="scatter": advanced-index scatter; rejected lanes are routed to
        the last cache column, which ``decode_block_split``'s l < pos mask
        keeps unattendable forever (cols never exceed alloc-2 for real
        commits — generate_speculative clamps pos to steps <= alloc-K-1).

        impl="gather": scatter-free twin — a take_along_axis over the K-row
        block plus a windowed select over the cache (TPU lowers small
        scatters to serialized updates; the gather+select is one vectorized
        pass).  Bit-identical outputs (tests/test_speculative.py).

        impl="unique": always write ALL K rows at pos..pos+K-1 (ignoring
        acc).  Rejected rows are harmless: ``decode_block_split``'s cache
        bias only admits slots l < pos[b], and the NEXT block's write window
        pos+acc..pos+acc+K-1 covers every stale slot pos+acc..pos+K-1 before
        pos ever passes it (the same argument behind the ``+k_blk`` cache
        slack).  With no masked lanes every (row, col) index is distinct, so
        the scatter is declared ``unique_indices=True`` /
        ``promise_in_bounds`` — the duplicate-free form XLA:TPU can lower
        without ordered-update serialization (the masked form routes all
        rejected lanes of a row to one dump column, forcing the serialized
        lowering).  Bit-identical outputs (tests/test_speculative.py)."""
        k_blk = blk_kvs[0][0].shape[2]
        b = pos.shape[0]
        alloc = caches[0][0].shape[2]
        out = []
        if impl == "unique":
            rows = jnp.arange(b)[:, None]
            cols = pos[:, None] + jnp.arange(k_blk)[None, :]     # (B, K)
            for (k_cache, v_cache), (k_new, v_new) in zip(caches, blk_kvs):
                k_cache = k_cache.at[rows, :, cols].set(
                    k_new.transpose(0, 2, 1, 3).astype(k_cache.dtype),
                    unique_indices=True, mode="promise_in_bounds")
                v_cache = v_cache.at[rows, :, cols].set(
                    v_new.transpose(0, 2, 1, 3).astype(v_cache.dtype),
                    unique_indices=True, mode="promise_in_bounds")
                out.append((k_cache, v_cache))
            return out
        if impl == "gather":
            l_idx = jnp.arange(alloc)[None, :]               # (1, L)
            rel = l_idx - pos[:, None]                       # (B, L)
            in_win = (rel >= 0) & (rel < acc[:, None])       # (B, L)
            g_idx = jnp.clip(rel, 0, k_blk - 1)[:, None, :, None]  # (B,1,L,1)
            sel = in_win[:, None, :, None]
            for (k_cache, v_cache), (k_new, v_new) in zip(caches, blk_kvs):
                k_rows = jnp.take_along_axis(
                    k_new.astype(k_cache.dtype), g_idx, axis=2)
                v_rows = jnp.take_along_axis(
                    v_new.astype(v_cache.dtype), g_idx, axis=2)
                out.append((jnp.where(sel, k_rows, k_cache),
                            jnp.where(sel, v_rows, v_cache)))
            return out
        rows = jnp.arange(b)[:, None]
        j = jnp.arange(k_blk)[None, :]
        cols = jnp.where(j < acc[:, None], pos[:, None] + j, alloc - 1)
        for (k_cache, v_cache), (k_new, v_new) in zip(caches, blk_kvs):
            k_cache = k_cache.at[rows, :, cols].set(
                k_new.transpose(0, 2, 1, 3).astype(k_cache.dtype))
            v_cache = v_cache.at[rows, :, cols].set(
                v_new.transpose(0, 2, 1, 3).astype(v_cache.dtype))
            out.append((k_cache, v_cache))
        return out

    def decode_block(self, tokens: jnp.ndarray, pos: jnp.ndarray,
                     caches: List[Tuple[jnp.ndarray, jnp.ndarray]],
                     mem_kvs: List[Tuple[jnp.ndarray, jnp.ndarray]]
                     ) -> Tuple[jnp.ndarray, List[Tuple[jnp.ndarray, jnp.ndarray]]]:
        """K-token decode for speculative verification.  tokens: (B, K) —
        each row's last committed token followed by K-1 drafts; pos: (B,)
        per-row positions (the slot the first token is written to).
        Returns (logits (B, K, V), updated caches); logits[:, j] predicts
        the token at position pos + j + 1 given the draft prefix."""
        pe = self.decoder_pos_embed.astype(self.dtype)[0]   # (max_len-1, D)
        cols = pos[:, None] + jnp.arange(tokens.shape[1])[None, :]
        # clamp the pos-embed gather: draft slots past max_len-2 only produce
        # logits that are never committed (steps <= max_len-2 caps pos)
        pos_embed = jnp.take(pe, jnp.minimum(cols, pe.shape[0] - 1), axis=0)
        x = self.embedding(tokens) + pos_embed
        cache_alloc = caches[0][0].shape[2]
        key_valid = (jnp.arange(cache_alloc)[None, None, :]
                     <= cols[:, :, None])
        new_caches = []
        for layer, cache, mem_kv in zip(self.layers, caches, mem_kvs):
            x, cache = layer.decode_block(x, cache, mem_kv, pos, key_valid)
            new_caches.append(cache)
        return self.output(x), new_caches
