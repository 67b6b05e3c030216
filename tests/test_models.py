"""Unit tests for the model-scoring layer (langid profiles, char-LM
perplexity, PII scrub) — pure Python, no Spark."""
from __future__ import annotations

from puddin_spark import rules
from puddin_spark.models import CharLMModel, LangIdModel


def test_langid_separates_languages():
    m = LangIdModel()
    lang, score = m.predict_one("the old man walked to the market with the dog")
    assert lang == "en" and score > 0.3
    assert m.predict_one("der alte mann ging zum markt mit dem hund und der frau")[0] == "de"
    assert m.predict_one("le vieil homme est alle au marche avec le chien")[0] == "fr"
    assert m.predict_one("el viejo hombre fue al mercado con el perro")[0] == "es"
    assert m.predict_one("")[0] == "und"


def test_charlm_perplexity_orders_gibberish():
    lm = CharLMModel(3).train(
        ["the cat sat on the mat and the dog ran to the park all day long"]
    )
    good = lm.perplexity("the cat ran to the mat")
    bad = lm.perplexity("zqxv jkwp ffzz qqq xjvw")
    assert good < bad
    # round-trip serialization preserves scores
    lm2 = CharLMModel.from_json(lm.to_json())
    assert lm2.perplexity("the cat ran to the mat") == good


def test_pii_scrub_masks_each_kind():
    t = (
        "mail a.b+c@ex-ample.org ssn 123-45-6789 card 4111-1111-1111-1111 "
        "tel 555-867-5309 ip 10.0.0.1 and what the hell"
    )
    out = rules.scrub_pii(t)
    for tok in ("[EMAIL]", "[SSN]", "[CC]", "[PHONE]", "[IP]", "[TOX]"):
        assert tok in out, f"{tok} not masked: {out}"
    for leak in ("@", "123-45", "4111", "867", "10.0.0.1", "hell"):
        assert leak not in out, f"leaked {leak}: {out}"


def test_pii_off_preserves_parity_scrub():
    # flag-off path: reference parity scrub unchanged by the PII module
    raw = "Plain text with an email nobody@example.com stays when flag off."
    assert rules.scrub(raw) == raw  # scrub() itself never masks PII


def test_boilerplate_line_removal(spark):
    from puddin_spark.operators.boilerplate import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "real content one\nSubscribe to our newsletter\nmore text"),
            (2, "other article\nsubscribe   to our NEWSLETTER\nends here"),
            (3, "third doc\nSubscribe to our newsletter\nunique tail"),
            (4, "clean document\nnothing shared at all"),
        ],
        "doc_id int, text string",
    )
    out = {r.id: r.clean_text for r in remove_boilerplate_lines(docs, min_docs=2).collect()}
    # the footer vanishes everywhere (normalization: case + whitespace)
    assert out[1] == "real content one\nmore text"
    assert out[2] == "other article\nends here"
    assert out[3] == "third doc\nunique tail"
    assert out[4] == "clean document\nnothing shared at all"


def test_repetition_ratio(spark):
    from pyspark.sql import functions as F
    from puddin_spark.operators.boilerplate import repetition_ratio_col

    d = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "all words here are different ones")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.r for r in d.select("doc_id", repetition_ratio_col("text").alias("r")).collect()}
    assert rows[1] > 0.5 and rows[2] == 0.0


def test_golden_model_fixtures_match_fresh_replay():
    """Drift guard for the model-gate hard oracles: the committed golden
    parquet (tools/freeze_model_golden.py) must equal a fresh plain-Python
    replay of the model arithmetic. If models.py changes semantics, this
    fails before the driver gate does — re-freeze deliberately."""
    import sys
    from pathlib import Path

    import pyarrow.parquet as pq

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    from freeze_model_golden import FIXTURE_DIR, compute_golden

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        sf = Path(sf_dir).name
        fresh_lang, fresh_ppl = compute_golden(sf_dir)
        frozen_lang = pq.read_table(FIXTURE_DIR / f"golden_model_langid_{sf}.parquet")
        frozen_ppl = pq.read_table(
            FIXTURE_DIR / f"golden_model_perplexity_{sf}.parquet"
        )
        assert frozen_lang.equals(fresh_lang), f"langid golden drifted at {sf}"
        assert frozen_ppl.equals(fresh_ppl), f"perplexity golden drifted at {sf}"


def test_doc_embedding_model_contrast_and_determinism():
    """Pure-Python contract of the embedding stand-in (no Spark): stable
    across instances, unit-norm, permutation-invariant (bag of words),
    random docs far below the 0.99 near-dup bar, scaled copies identical."""
    import math
    import random

    from puddin_spark.models import EMBEDDING_DIM, DocEmbeddingModel

    m1, m2 = DocEmbeddingModel(), DocEmbeddingModel()
    doc = "the quick brown fox jumps over the lazy dog again and again"
    v1, v2 = m1.encode_one(doc), m2.encode_one(doc)
    assert v1 == v2 and len(v1) == EMBEDDING_DIM
    assert abs(math.sqrt(sum(x * x for x in v1)) - 1.0) < 1e-9

    # permutation invariance: word-order reversal is the SAME vector
    rev = " ".join(reversed(doc.split()))
    assert m1.encode_one(rev) == v1
    # doubling the text preserves direction exactly
    assert m1.encode_one(doc + " " + doc) == v1

    # signed hashing centers random-doc cosines near 0
    random.seed(3)
    vocab = [f"w{random.randint(0, 5000)}" for _ in range(2000)]
    docs = [" ".join(random.choice(vocab) for _ in range(120)) for _ in range(20)]
    vecs = [m1.encode_one(d) for d in docs]
    cosines = [
        sum(a * b for a, b in zip(vecs[i], vecs[j]))
        for i in range(len(vecs))
        for j in range(i + 1, len(vecs))
    ]
    assert max(abs(c) for c in cosines) < 0.9  # far below the 0.99 bar

    # empty / whitespace-only input -> zero vector, not NaN
    assert m1.encode_one("") == [0.0] * EMBEDDING_DIM
    assert m1.encode_one("   ") == [0.0] * EMBEDDING_DIM
