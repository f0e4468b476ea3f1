"""Deterministic 3-way dataset split matching the reference exactly.

The reference calls sklearn ``train_test_split`` twice with random_state=42
(data_processing.py:165-219): first carving out the test set (1%), then the
validation set (valid_size / (1 - test_size) of the remainder).  sklearn's
ShuffleSplit draws ``rng.permutation(n)`` from ``np.random.RandomState(seed)``
and takes ``permutation[:n_test]`` as test and
``permutation[n_test:n_test+n_train]`` as train — replicated here so splits
are bit-identical to the reference without importing sklearn on the hot path.
"""
from __future__ import annotations

from math import ceil, floor
from typing import Tuple

import numpy as np


def _shuffle_split(n: int, test_size: float, seed: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Indices (train, test) identical to sklearn train_test_split."""
    n_test = ceil(n * test_size)
    n_train = floor(n * (1.0 - test_size))
    rng = np.random.RandomState(seed)
    permutation = rng.permutation(n)
    test = permutation[:n_test]
    train = permutation[n_test:(n_test + n_train)]
    return train, test


def three_way_split(n: int, valid_size: float = 0.19, test_size: float = 0.01,
                    seed: int = 42) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(train_idx, valid_idx, test_idx) over ``range(n)``.

    Matches get_loaders (data_processing.py:169-175): test split first, then
    valid split with adjusted fraction over the remainder.
    """
    valid_size_adj = valid_size / (1.0 - test_size)
    train_valid, test = _shuffle_split(n, test_size, seed)
    sub_train, sub_valid = _shuffle_split(len(train_valid), valid_size_adj, seed)
    return train_valid[sub_train], train_valid[sub_valid], test
