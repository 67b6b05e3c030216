"""Corpus statistics: the reference's statify subsystem (statify_puddin.py,
SURVEY.md section 3.3) as one sentence-grain DataFrame + ROLLUP.

The reference iterates conllu files sentence-by-sentence in one process,
aggregating doc -> slice -> group -> corpus in pandas. Here: sentence rows
carry their metrics as built-in expressions and a single ROLLUP produces
every level of the hierarchy in one shuffle (Catalyst handles partial/final
aggregation; A5 in SURVEY.md section 2.6)."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentence_metrics(sentences: DataFrame, text_col: str = "sent_text") -> DataFrame:
    """Attach per-sentence word/char metrics (JVM-only expressions).
    Mirrors read_sentence (statify_puddin.py:256-278) minus the punct
    deprel exclusion (no dependency parse in scope)."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    return sentences.withColumn(
        "n_words", F.expr(f"size({toks})")
    ).withColumn("n_chars", F.length(text_col)).withColumn(
        "mean_word_len",
        F.round(
            F.expr(f"cast(aggregate({toks}, 0, (a, w) -> a + length(w)) as double)")
            / F.greatest(F.expr(f"size({toks})"), F.lit(1)),
            6,
        ),
    )


def hierarchical_stats(
    sent_metrics: DataFrame, levels: list[str]
) -> DataFrame:
    """ROLLUP over the hierarchy columns: one row per (prefix of levels) per
    value combination, plus the grand total (get_upper_level_stats,
    statify_puddin.py:418-462, collapsed into one shuffle)."""
    return (
        sent_metrics.rollup(*levels)
        .agg(
            F.count("*").alias("n_sents"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.round(F.avg("n_words"), 4).alias("avg_words_per_sent"),
            F.max("n_words").alias("max_words"),
            F.round(F.avg("mean_word_len"), 4).alias("avg_word_len"),
        )
        .select(
            *[F.coalesce(F.col(c).cast("string"), F.lit("ALL")).alias(c) for c in levels],
            "n_sents",
            "total_words",
            "avg_words_per_sent",
            "max_words",
            "avg_word_len",
        )
    )
