"""Word-level vocabulary with the reference's exact hardcoded id map.

Reference: ``data_processing.py:15-90``.  The reference tokenizes with spacy's
``en_core_web_sm`` tokenizer after protecting compound defect names with
placeholders.  Captions in this domain are short English templates
("The defect silk_spot is located at the center of the image."), for which a
rule-based tokenizer is exactly equivalent; this framework therefore carries no
spacy dependency.

Id layout (must never change — the sequence format depends on it):
  <UNK>=299  <SOS>=300  <EOS>=301  <PAD>=302
  class words: punching_hole=258 ... waist_folding=267
  regular words: assigned from 270 upward in first-seen order, frequency >= 5
"""
from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List

from mdcnet_tpu.config import (BOS_ID, EOS_ID, PAD_ID, PREDEFINED_CLASS_IDS,
                               UNK_ID, WORD_ID_START)

# Compound defect names protected from being split by the tokenizer
# (data_processing.py:40).
_COMPOUND_WORDS = [
    "inclusion", "rolled-oil_spot", "crescent_gap", "water_spot", "water_spot",
    "punching_hole", "welding_line", "silk_spot", "rolled_pit", "crease",
    "waist_folding",
]

# spacy-equivalent tokenization for template captions: words split from
# punctuation.  Underscores and internal hyphens/apostrophes stay inside a
# word, matching spacy's tokenizer (it splits on whitespace and punctuation
# affixes, and '_' is in none of its affix rules).
_TOKEN_RE = re.compile(r"[A-Za-z_]+(?:['\-][A-Za-z_]+)*|\d+|[^\sA-Za-z\d]")


class Vocabulary:
    """Word <-> id mapping with predefined special and class ids."""

    def __init__(self, freq_threshold: int = 5):
        self.itos: Dict[int, str] = {PAD_ID: "<PAD>", BOS_ID: "<SOS>",
                                     EOS_ID: "<EOS>", UNK_ID: "<UNK>"}
        self.stoi: Dict[str, int] = {v: k for k, v in self.itos.items()}
        self.freq_threshold = freq_threshold
        self.predefined_indices = dict(PREDEFINED_CLASS_IDS)

    def __len__(self) -> int:
        return len(self.itos)

    @staticmethod
    def tokenize(text: str) -> List[str]:
        """Tokenize, protecting compound defect names (data_processing.py:38-55)."""
        placeholders = {}
        for compound in _COMPOUND_WORDS:
            placeholder = compound.replace("-", "_").replace("_", "")
            placeholders[placeholder] = compound
            text = text.replace(compound, placeholder)
        tokens = [t.lower() for t in _TOKEN_RE.findall(text)]
        return [placeholders.get(t, t) for t in tokens]

    def build_vocab(self, sentence_list: Iterable[str]) -> None:
        """Assign ids: class words at their fixed ids, regular words from 270
        upward in first-seen order with frequency >= threshold
        (data_processing.py:58-79)."""
        for word, idx in self.predefined_indices.items():
            self.stoi[word] = idx
            self.itos[idx] = word

        next_id = WORD_ID_START
        while next_id in self.itos:
            next_id += 1

        frequencies: Counter = Counter()
        for sentence in sentence_list:
            for word in self.tokenize(sentence):
                frequencies[word] += 1

        for word, count in frequencies.items():
            if count >= self.freq_threshold and word not in self.predefined_indices:
                self.stoi[word] = next_id
                self.itos[next_id] = word
                next_id += 1

    def numericalize(self, text: str) -> List[int]:
        return [self.stoi.get(tok, UNK_ID) for tok in self.tokenize(str(text))]

    def decode(self, ids: Iterable[int]) -> str:
        return " ".join(self.itos.get(int(i), "<UNK>") for i in ids)


def gc10_vocabulary(captions: Iterable[str], freq_threshold: int = 5) -> Vocabulary:
    """Build the GC10-DET vocabulary exactly as ``trail_01.py:95-96`` does."""
    vocab = Vocabulary(freq_threshold=freq_threshold)
    vocab.build_vocab(list(captions))
    return vocab
