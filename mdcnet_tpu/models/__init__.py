from mdcnet_tpu.models.decoder import CaptionDecoder, interpolate_pos_embed
from mdcnet_tpu.models.encdec import EncoderDecoder, build_model
from mdcnet_tpu.models.vit import ViTEncoder

__all__ = ["CaptionDecoder", "EncoderDecoder", "ViTEncoder", "build_model",
           "interpolate_pos_embed"]
