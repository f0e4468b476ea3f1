"""Dynamic int8 matmul for encoder projections (serving knob).

The v5e MXU runs int8 x int8 -> int32 at ~1.5x the bf16 rate through plain
XLA (measured 91.3 TOP/s vs 61.6 TFLOP/s on the MLP fc1 shape —
benchmarks/probe_enc_attn.py).  The encoder's projection matmuls (packed
QKV, attention out, MLP fc1/fc2) carry ~94% of the block FLOPs, so running
them int8 attacks the single largest term in the 66.7 ms/batch encoder
(docs/PERF.md round-3 table).

Scheme: symmetric dynamic quantization —
  - activations: per-row (token) scale ``amax/127`` computed on the fly;
  - weights: per-column scale, quantized from the live bf16/f32 params at
    trace time (the quantize is ~1M elementwise ops vs a 100+ GFLOP dot,
    and under ``scan_blocks`` it runs once per block per call like the
    matmul itself);
  - dot in int8 with int32 accumulation, rescaled by the outer product of
    the two scale vectors, bias added in float.

This is a *serving* knob: outputs are approximate (per-block relative
error ~1e-2).  Token-level agreement with the exact path is measured
end-to-end on the trained checkpoint by benchmarks/probe_serving_knobs.py
before it can become a bench default.  Training always uses the exact path
(the knob lives behind ``ModelConfig.enc_int8`` which presets leave False).

Reference counterpart: none — the reference encoder is the stock timm
backbone in f32 (model.py:14-23); this is TPU-native perf work.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row int8 quantization over the last axis.
    Returns (q int8, scale float32 with a trailing 1-dim)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols(w: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-column int8 quantization of a (K, N) weight."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul_static(x: jnp.ndarray, w: jnp.ndarray,
                       bias: Optional[jnp.ndarray],
                       x_amax: jnp.ndarray, eps: float = 1e-8
                       ) -> jnp.ndarray:
    """``x @ w (+ bias)`` with the activation quantized by a STATIC
    (calibrated) per-tensor amax instead of a dynamic per-row reduce.

    Why: the dynamic path was measured a wash end-to-end (docs/PERF.md
    round-4 ladder) — the amax reduce is an extra full pass over the
    activations that XLA cannot fuse into the producing op, and it
    serializes with the quantize.  With a static scale the round/clip/cast
    is one elementwise chain that fuses into the preceding op's epilogue
    (LayerNorm / GELU write int8 directly), and the int32->f32 rescale is a
    scalar multiply fused into the dot's output.  Out-of-range activations
    (beyond the calibrated amax) saturate at +-127 — that clipping is the
    accuracy cost; token-level agreement is measured end-to-end by
    benchmarks/probe_serving_knobs.py before this can be a serving default.

    x: (..., K) float; w: (K, N) float (per-column dynamic quant — a ~1M
    elementwise pass vs a 100+ GFLOP dot); x_amax: scalar calibrated
    max|x|; bias: (N,) float or None.
    """
    out_dtype = x.dtype
    sx = jnp.maximum(x_amax.astype(jnp.float32), eps) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    wq, sw = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def calibrate_encoder(model_cfg, params, image_batches) -> dict:
    """Run the encoder in calibration mode over ``image_batches`` and return
    the "calib" variables tree {"encoder": {"block{i}": {"amax": (4,)}}}
    consumed by the static-int8 path (``ModelConfig.enc_int8_static``).

    Site order in the (4,) vector: packed-QKV input, attention out-proj
    input, MLP fc1 input, MLP fc2 input — the four projection matmuls that
    carry ~94% of block FLOPs.  amax is maxed over every batch given."""
    import dataclasses

    from mdcnet_tpu.models import build_model

    calib_cfg = dataclasses.replace(model_cfg, enc_int8_calib=True,
                                    enc_int8_static=False, enc_int8=False,
                                    enc_scan_blocks=False)
    model = build_model(calib_cfg)
    tot = None
    for images in image_batches:
        _, st = model.apply(params, images, method="encode",
                            mutable=["calib_stats"])
        stats = st["calib_stats"]
        tot = stats if tot is None else jax.tree_util.tree_map(
            jnp.maximum, tot, stats)
    out = {}
    for name, blk in tot["encoder"].items():
        amax = jnp.stack([
            jnp.asarray(blk["attn"]["qkv_in"], jnp.float32).reshape(()),
            jnp.asarray(blk["attn"]["out_in"], jnp.float32).reshape(()),
            jnp.asarray(blk["fc1_in"], jnp.float32).reshape(()),
            jnp.asarray(blk["fc2_in"], jnp.float32).reshape(())])
        out[name] = {"amax": amax}
    return {"encoder": out}


def save_calib(calib: dict, path: str) -> None:
    """JSON-serialize a calibration tree (block name -> 4 amax floats)."""
    import json

    data = {name: [float(v) for v in blk["amax"]]
            for name, blk in calib["encoder"].items()}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def load_calib(path: str) -> dict:
    """Inverse of ``save_calib``."""
    import json

    with open(path) as f:
        data = json.load(f)
    return {"encoder": {name: {"amax": jnp.asarray(vals, jnp.float32)}
                        for name, vals in data.items()}}


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=None) -> jnp.ndarray:
    """``x @ w (+ bias)`` with both operands dynamically quantized to int8
    and the dot accumulated in int32 on the MXU.

    x: (..., K) float; w: (K, N) float; bias: (N,) float or None.
    Output dtype defaults to ``x.dtype``.
    """
    out_dtype = out_dtype or x.dtype
    xq, sx = quantize_rows(x)
    wq, sw = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
