"""Distributed BPE tokenizer training (operators/bpe.py): merge-loop parity
with a sequential reference, encoder properties, and plan shape. The
round-1 pair statistics have a DuckDB oracle gate (bpe_pair_counts,
replayed by tests/test_queries.py)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from puddin_spark.operators import bpe

EOW = bpe.EOW


# --- sequential reference (independent of the Spark code) ---


def _py_words(docs):
    freq = {}
    for d in docs:
        for w in d.lower().split():
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def _py_train(freq: dict[str, int], num_merges: int):
    symtab = {
        w: [c if i < len(w) - 1 else c + EOW for i, c in enumerate(w)]
        for w in freq
    }
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in symtab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + freq[w]
        if not pairs:
            break
        # argmax, tie-break (cnt desc, a asc, b asc)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in symtab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return merges


def _py_encode(word: str, merges) -> list[str]:
    ranks = {p: i for i, p in enumerate(merges)}
    syms = [c if i < len(word) - 1 else c + EOW for i, c in enumerate(word)]
    while len(syms) >= 2:
        cand = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest widest",
    "widest widest the cat sat on the mat",
    "the the the ties tie tied",  # tie-heavy region for the tie-break
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )


def test_word_table_matches_reference(spark, docs):
    got = {r.word: r.freq for r in bpe.word_table(docs).collect()}
    assert got == _py_words(CORPUS)


def test_merges_match_sequential_reference(spark, docs):
    got = bpe.train_bpe_from_corpus(docs, 12)
    want = _py_train(_py_words(CORPUS), 12)
    assert got == want


def test_training_stops_when_pairs_exhaust(spark):
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id bigint, text string")
    merges = bpe.train_bpe_from_corpus(tiny, 50)
    # 'ab' has exactly one learnable pair; the loop must stop, not pad
    assert merges == [("a", f"b{EOW}")]


def test_encoder_matches_reference_and_roundtrips(spark, docs):
    merges = bpe.train_bpe_from_corpus(docs, 12)
    probe = CORPUS + ["unseen gibberishzz low", ""]
    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(probe)], "doc_id bigint, text string"
    )
    enc = bpe.bpe_encode_udf(merges)
    got = {
        r.doc_id: r.pieces
        for r in pdf.select("doc_id", enc(F.col("text")).alias("pieces")).collect()
    }
    for i, text in enumerate(probe):
        want = []
        for w in text.lower().split():
            want.extend(_py_encode(w, merges))
        assert got[i] == want, (i, text)
        # lossless: pieces re-concatenate to the original tokens
        rejoined = "".join(got[i]).replace(EOW, " ").strip()
        assert rejoined == " ".join(text.lower().split())


def test_encoder_tokenizes_like_word_table_on_nbsp(spark, docs):
    """ADVICE r5 (medium): the encoder must tokenize with Java \\s+
    semantics (ASCII whitespace only) exactly like word_table/tokens_col —
    a U+00A0 NBSP joins its neighbors into ONE word (Python str.split()
    would cut it into two, diverging from the trained merge statistics)."""
    merges = bpe.train_bpe_from_corpus(docs, 12)
    text = "low lower andnewest"  # NBSP and \x0b
    pdf = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    enc = bpe.bpe_encode_udf(merges)
    got = pdf.select("doc_id", enc(F.col("text")).alias("pieces")).collect()[0].pieces
    # the words the TRAINING tokenization produces for this text
    spark_words = [
        r.word
        for r in bpe.word_table(pdf).select("word").orderBy("word").collect()
    ]
    assert "low lower" in spark_words  # NBSP does NOT split (Java \s)
    assert "and" in spark_words and "newest" in spark_words  # \x0b DOES
    want = []
    import re as _re

    for w in _re.split(r"[ \t\n\x0b\f\r]+", text.lower()):
        if w:
            want.extend(_py_encode(w, merges))
    assert got == want


def test_training_plan_no_python(spark, docs):
    """Training's Spark jobs (word table, pair counts) are pure codegen —
    Python appears only in the encoder UDF."""
    for df in (bpe.word_table(docs), bpe.bpe_pair_counts(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan
        assert "HashAggregate" in plan


def test_merges_table_roundtrip(spark, docs, tmp_path):
    merges = bpe.train_bpe_from_corpus(docs, 6)
    path = str(tmp_path / "merges")
    bpe.merges_table(spark, merges).write.parquet(path)
    back = [
        (r.a, r.b)
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
    assert back == merges


def test_collected_path_equals_distributed(spark, docs):
    """train_bpe_collected (the long-schedule fast path) produces the
    identical merge list to the per-round-Spark loop."""
    w = bpe.word_table(docs)
    assert bpe.train_bpe_collected(w, 12) == bpe.train_bpe(w, 12)


def test_collected_path_vocab_guard(spark, docs):
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe.train_bpe_collected(bpe.word_table(docs), 5, max_vocab_rows=3)
