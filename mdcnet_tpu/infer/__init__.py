from mdcnet_tpu.infer.beam import BeamResult, beam_search
from mdcnet_tpu.infer.generate import GenerateResult, generate, postprocess
from mdcnet_tpu.infer.single import caption_single_image, inference_single_image

__all__ = ["generate", "postprocess", "GenerateResult", "beam_search",
           "BeamResult", "inference_single_image", "caption_single_image"]
