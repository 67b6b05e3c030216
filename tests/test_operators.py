"""Operator-level unit tests (dedup/similarity/boilerplate internals) that
the gate catalog exercises only end-to-end."""
from __future__ import annotations

import random
import string

import pandas as pd
import pytest


def test_simhash_vectorized_matches_spec():
    """_simhash_batch (numpy path) is bit-identical to simhash64 (the
    readable spec), including empty strings and nulls."""
    from puddin_spark.operators.dedup import _simhash_batch, simhash64

    random.seed(7)
    texts: list[str | None] = ["", "one", "the quick brown fox", None]
    for _ in range(300):
        n = random.randint(0, 60)
        texts.append(
            " ".join(
                "".join(random.choices(string.ascii_lowercase, k=random.randint(1, 10)))
                for _ in range(n)
            )
        )
    vec = _simhash_batch(pd.Series(texts))
    for t, v in zip(texts, vec):
        if t is None:
            assert pd.isna(v)
        else:
            assert v == simhash64(t)


def test_simhash_cache_reuse_is_transparent():
    """Second batch with overlapping vocab (cache hits) gives same hashes."""
    from puddin_spark.operators.dedup import _simhash_batch

    a = _simhash_batch(pd.Series(["alpha beta gamma", "beta gamma delta"]))
    b = _simhash_batch(pd.Series(["alpha beta gamma", "beta gamma delta"]))
    assert list(a) == list(b)
