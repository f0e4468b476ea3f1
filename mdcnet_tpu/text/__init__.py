from mdcnet_tpu.text.vocabulary import Vocabulary, gc10_vocabulary
from mdcnet_tpu.text.tokenizer import SeqTokenizer

__all__ = ["Vocabulary", "gc10_vocabulary", "SeqTokenizer"]
