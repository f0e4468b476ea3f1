"""MDC-Net TPU: a TPU-native multimodal defect-captioning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``ashys2012/MDC-Net-Multimodal-Defect-Captioning-Network-For-Surface-Steel-Defects``:
a Pix2Seq-style ViT encoder + transformer decoder that emits captions, defect
classes, and quantized bounding boxes as one flat token sequence.
"""

from mdcnet_tpu import config
from mdcnet_tpu.config import (Config, DataConfig, InferConfig, MeshConfig,
                               ModelConfig, TrainConfig, large_preset,
                               neu_preset, test_preset, tiny_preset)

__version__ = "0.1.0"
