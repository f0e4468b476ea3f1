#!/usr/bin/env python
"""One-shot converter: timm DeiT3 checkpoint -> framework-native .npz asset.

The reference trains from an ImageNet-pretrained backbone
(``timm.create_model(..., pretrained=True)``, /root/reference/model.py:15-17).
Run this once on a host that has the timm checkpoint file (no timm install
needed — only torch to deserialize), then point
``ModelConfig.pretrained_path`` (or ``mdcnet_tpu train --pretrained``) at the
produced ``.npz``:

  # from the file timm downloads (~/.cache/torch/hub/checkpoints/…)
  python scripts/convert_pretrained.py deit3_medium_patch16_224.pth enc.npz

  # or from a full reference EncoderDecoder checkpoint
  python scripts/convert_pretrained.py best_model_epoch_156.pth enc.npz

Accepts .pth/.bin (torch serialization), .safetensors, or .npz dumps.
"""
from __future__ import annotations

import argparse
import sys


def load_any(path: str):
    """Load a state dict as {key: np.ndarray} from common formats."""
    import numpy as np
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    # torch pickle (.pth / .bin / anything else)
    from mdcnet_tpu.models.torch_convert import load_pth
    return load_pth(path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="timm DeiT3 checkpoint "
                    "(.pth/.bin/.safetensors/.npz)")
    ap.add_argument("output", help="output .npz asset path")
    ap.add_argument("--depth", type=int, default=0,
                    help="number of blocks (default: inferred)")
    args = ap.parse_args(argv)

    from mdcnet_tpu.models.pretrained import (convert_timm_state_dict,
                                              infer_depth, detect_prefix,
                                              save_encoder_npz)
    sd = load_any(args.checkpoint)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "keys"):
        sd = sd["model"]  # timm checkpoints sometimes wrap under "model"
    prefix = detect_prefix(sd)
    depth = args.depth or infer_depth(sd, prefix)
    params = convert_timm_state_dict(sd, depth)
    save_encoder_npz(params, args.output)
    print(f"converted {depth}-block encoder "
          f"(prefix={prefix!r}) -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
