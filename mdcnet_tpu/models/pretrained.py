"""Pretrained ViT backbone loading.

The reference encoder is ``timm.create_model('deit3_medium_patch16_224…',
pretrained=True)`` (/root/reference/model.py:15-17) — ImageNet-22k
pretraining is what makes the 2,293-image GC10 dataset trainable.  This
module is the TPU-side path for those weights:

  1. ``scripts/convert_pretrained.py`` converts a timm checkpoint (the
     ``.pth``/``.bin`` file timm downloads, or a full reference
     EncoderDecoder ``.pth``) into a framework-native ``.npz`` asset —
     a one-shot host step, no timm needed at run time.
  2. ``ModelConfig.pretrained_path`` points at that ``.npz``; the training
     entry grafts it over the freshly-initialised encoder params
     (create_train_state), so training starts from ImageNet features.

Key layouts accepted by :func:`convert_timm_state_dict`:
  raw timm backbone   ``patch_embed.proj.weight``, ``blocks.0.attn.qkv…``
  reference full model ``encoder.model.patch_embed.proj.weight`` …
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from mdcnet_tpu.models.torch_convert import convert_encoder


def detect_prefix(sd: Dict[str, np.ndarray]) -> str:
    """'' for a raw timm backbone dump, 'encoder.model.' for a full
    reference EncoderDecoder state_dict."""
    if any(k.startswith("encoder.model.") for k in sd):
        return "encoder.model."
    return ""


def infer_depth(sd: Dict[str, np.ndarray], prefix: str = "") -> int:
    """Number of transformer blocks present in the checkpoint."""
    depth = 0
    while f"{prefix}blocks.{depth}.attn.qkv.weight" in sd:
        depth += 1
    return depth


def convert_timm_state_dict(sd: Dict[str, np.ndarray],
                            depth: int = 0) -> Dict:
    """timm DeiT3 state_dict (numpy leaves) -> ViTEncoder param pytree."""
    prefix = detect_prefix(sd)
    depth = depth or infer_depth(sd, prefix)
    if depth == 0:
        raise ValueError("no transformer blocks found — is this a timm "
                         "DeiT3 state_dict?")
    return convert_encoder(sd, depth, prefix=prefix)


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_encoder_npz(encoder_params: Dict, path: str) -> None:
    """Write a converted encoder param pytree as a flat .npz asset."""
    np.savez(path, **_flatten(encoder_params))


def load_encoder_npz(path: str) -> Dict:
    """Read an encoder param pytree from a .npz asset."""
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def graft_pretrained_encoder(params: Dict, path: str) -> Dict:
    """Replace the encoder subtree of a full model param pytree with the
    pretrained weights from ``path`` (.npz asset).  Shapes are validated
    leaf-by-leaf; a geometry mismatch (wrong preset for the checkpoint)
    raises instead of silently training from garbage."""
    import jax
    import jax.numpy as jnp

    pre = load_encoder_npz(path)
    inner = params["params"] if "params" in params else params
    current = inner["encoder"]

    cur_flat = _flatten(jax.tree_util.tree_map(np.asarray, current))
    pre_flat = _flatten(pre)
    missing = sorted(set(cur_flat) - set(pre_flat))
    extra = sorted(set(pre_flat) - set(cur_flat))
    if missing or extra:
        raise ValueError(f"pretrained encoder key mismatch: missing={missing} "
                         f"extra={extra}")
    for k in cur_flat:
        if cur_flat[k].shape != pre_flat[k].shape:
            raise ValueError(
                f"pretrained encoder shape mismatch at {k}: "
                f"model {cur_flat[k].shape} vs checkpoint {pre_flat[k].shape}")

    new_encoder = jax.tree_util.tree_map(jnp.asarray, pre)
    new_inner = dict(inner)
    new_inner["encoder"] = new_encoder
    return {"params": new_inner} if "params" in params else new_inner
