"""Convert reference PyTorch checkpoints (.pth state_dict) to flax params.

The reference saves ``torch.save(model.state_dict())`` on improvement
(trail_01.py:196-197) and restores with load_state_dict for inference
(inference_trail_after_good_map.py:142).  This converter maps that flat
key space onto this framework's parameter pytree so reference-trained
weights run unchanged on TPU (the caption-parity harness depends on it).

Key mappings:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out)  [T]
  torch Conv2d weight (O, I, kh, kw)   -> flax Conv kernel (kh, kw, I, O)
  torch MultiheadAttention in_proj_*   -> split thirds -> q/k/v projections
  torch LayerNorm weight/bias          -> flax scale/bias
  timm ViT blocks.{i}.attn.qkv         -> split thirds -> q/k/v
  timm ls1/ls2 gamma                   -> gamma1/gamma2 LayerScale params

Works from a dict of numpy arrays, so no torch import is needed unless
reading a real .pth file.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def load_pth(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T,
            "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _split_qkv(weight: np.ndarray, bias: np.ndarray):
    """(3D, D) packed qkv -> three flax Dense param dicts."""
    wq, wk, wv = np.split(weight, 3, axis=0)
    bq, bk, bv = np.split(bias, 3, axis=0)
    return ({"kernel": wq.T, "bias": bq},
            {"kernel": wk.T, "bias": bk},
            {"kernel": wv.T, "bias": bv})


def convert_encoder(sd: Dict[str, np.ndarray], depth: int,
                    prefix: str = "encoder.model.") -> Dict:
    """timm deit3 ViT state_dict slice -> ViTEncoder params."""
    p = prefix
    out = {
        "patch_embed": {
            "kernel": sd[f"{p}patch_embed.proj.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{p}patch_embed.proj.bias"],
        },
        "pos_embed": sd[f"{p}pos_embed"],
        "cls_token": sd[f"{p}cls_token"],
        "norm": _ln(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}."
        q, k, v = _split_qkv(sd[f"{b}attn.qkv.weight"],
                             sd[f"{b}attn.qkv.bias"])
        out[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}norm1"),
            "attn": {"q_proj": q, "k_proj": k, "v_proj": v,
                     "out_proj": _dense(sd, f"{b}attn.proj")},
            "gamma1": sd[f"{b}ls1.gamma"],
            "norm2": _ln(sd, f"{b}norm2"),
            "mlp_fc1": _dense(sd, f"{b}mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}mlp.fc2"),
            "gamma2": sd[f"{b}ls2.gamma"],
        }
    return out


def convert_decoder(sd: Dict[str, np.ndarray], num_layers: int,
                    prefix: str = "decoder.") -> Dict:
    """Reference Decoder state_dict slice -> CaptionDecoder params.

    Reference layout (model.py:26-55): embedding, decoder_pos_embed,
    encoder_pos_embed, decoder.layers.{i}.{self_attn,multihead_attn,
    linear1,linear2,norm1,norm2,norm3}, output.
    """
    p = prefix
    out = {
        "embedding": {"embedding": sd[f"{p}embedding.weight"]},
        "decoder_pos_embed": sd[f"{p}decoder_pos_embed"],
        "encoder_pos_embed": sd[f"{p}encoder_pos_embed"],
        "output": _dense(sd, f"{p}output"),
    }
    for i in range(num_layers):
        l = f"{p}decoder.layers.{i}."
        sq, sk, sv = _split_qkv(sd[f"{l}self_attn.in_proj_weight"],
                                sd[f"{l}self_attn.in_proj_bias"])
        cq, ck, cv = _split_qkv(sd[f"{l}multihead_attn.in_proj_weight"],
                                sd[f"{l}multihead_attn.in_proj_bias"])
        out[f"layer{i}"] = {
            "self_attn": {"q_proj": sq, "k_proj": sk, "v_proj": sv,
                          "out_proj": _dense(sd, f"{l}self_attn.out_proj")},
            "cross_attn": {"q_proj": cq, "k_proj": ck, "v_proj": cv,
                           "out_proj": _dense(sd, f"{l}multihead_attn.out_proj")},
            "linear1": _dense(sd, f"{l}linear1"),
            "linear2": _dense(sd, f"{l}linear2"),
            "norm1": _ln(sd, f"{l}norm1"),
            "norm2": _ln(sd, f"{l}norm2"),
            "norm3": _ln(sd, f"{l}norm3"),
        }
    # axial variant extras (axial_model.py:25-26)
    if f"{p}axial_attention.to_qkv.weight" in sd:
        out["axial_attention"] = {
            "to_qkv": {"kernel": sd[f"{p}axial_attention.to_qkv.weight"].T},
            "to_out": _dense(sd, f"{p}axial_attention.to_out"),
        }
    return out


def convert_state_dict(sd: Dict[str, np.ndarray], enc_depth: int,
                       dec_layers: int) -> Dict:
    """Full reference EncoderDecoder state_dict -> {"params": ...} pytree."""
    import jax.numpy as jnp
    import jax
    params = {
        "encoder": convert_encoder(sd, enc_depth),
        "decoder": convert_decoder(sd, dec_layers),
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}
