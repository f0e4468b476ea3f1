"""Sentence BLEU with Chen–Cherry smoothing method 1.

Pure-Python reimplementation of the exact metric the reference uses:
nltk ``sentence_bleu(refs, hyp, smoothing_function=SmoothingFunction().method1)``
(utils.py:56-63, train_val_epoch.py:96-98).  Equivalence with nltk is
asserted in tests/test_evals.py.

Semantics replicated:
  - modified n-gram precision with per-ngram clipping, n = 1..4,
    uniform weights 0.25
  - denominator ``max(1, len(hyp) - n + 1)``
  - method1 smoothing: zero numerators are replaced by epsilon = 0.1
    (as ``0.1 / denominator``)
  - brevity penalty exp(1 - r/h) with r = closest reference length
  - 0.0 when every precision numerator is zero (nltk returns ~0 via its
    initial hyp-len check only for empty hypotheses; method1 otherwise keeps
    the product positive)
"""
from __future__ import annotations

import math
from collections import Counter
from typing import List, Sequence, Tuple


def _ngrams(seq: Sequence, n: int) -> Counter:
    return Counter(tuple(seq[i:i + n]) for i in range(len(seq) - n + 1))


def modified_precision(references: List[Sequence], hypothesis: Sequence,
                       n: int) -> Tuple[int, int]:
    """(clipped matches, total hyp ngrams) for order n."""
    hyp_counts = _ngrams(hypothesis, n)
    if not hyp_counts:
        return 0, max(1, len(hypothesis) - n + 1)
    max_ref = Counter()
    for ref in references:
        for ng, c in _ngrams(ref, n).items():
            if c > max_ref[ng]:
                max_ref[ng] = c
    clipped = sum(min(c, max_ref[ng]) for ng, c in hyp_counts.items())
    return clipped, max(1, sum(hyp_counts.values()))


def closest_ref_length(references: List[Sequence], hyp_len: int) -> int:
    return min((abs(len(r) - hyp_len), len(r)) for r in references)[1]


def brevity_penalty(ref_len: int, hyp_len: int) -> float:
    if hyp_len > ref_len:
        return 1.0
    if hyp_len == 0:
        return 0.0
    return math.exp(1.0 - ref_len / hyp_len)


def sentence_bleu(references: List[Sequence], hypothesis: Sequence,
                  weights: Sequence[float] = (0.25, 0.25, 0.25, 0.25),
                  smoothing_epsilon: float = 0.1) -> float:
    """BLEU of one hypothesis vs multiple references (token lists)."""
    hyp_len = len(hypothesis)
    if hyp_len == 0:
        return 0.0
    p_n = []
    for i, _ in enumerate(weights, start=1):
        num, den = modified_precision(references, hypothesis, i)
        p_n.append((num, den))
    if all(num == 0 for num, _ in p_n):
        return 0.0
    bp = brevity_penalty(closest_ref_length(references, hyp_len), hyp_len)
    s = 0.0
    for w, (num, den) in zip(weights, p_n):
        num_s = num if num > 0 else smoothing_epsilon  # method1
        s += w * math.log(num_s / den)
    return bp * math.exp(s)


def calculate_bleu_scores(ground_truths: List[Sequence],
                          predictions: List[Sequence]) -> List[float]:
    """Per-pair BLEU list (utils.py:56-63): each ground truth wrapped as a
    single reference."""
    return [sentence_bleu([ref], pred)
            for ref, pred in zip(ground_truths, predictions)]
