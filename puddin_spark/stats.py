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


def describe_numeric(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    *,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """The pandas-describe() surface (count/mean/std/min/p25/p50/p75/max;
    statify_puddin.py:281-311) per group.

    approx=False uses exact linear-interpolation `percentile` — what the
    DuckDB-paired gate grades (== quantile_cont), but it collects every
    group's values on one reducer, which at 10^12 rows per group is the
    memory wall. approx=True swaps in `percentile_approx` (a bounded-size
    quantile sketch that merges map-side): error <= 1/accuracy in rank
    terms, constant memory per group — the 100 TB path. Column names are
    identical so downstream code is agnostic.
    """
    by = by or []
    q = "percentile_approx" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    return df.groupBy(*by).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value_col), 4).alias(f"mean_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.round(F.stddev_samp(value_col), 4).alias(f"sd_{value_col}"),
        F.round(F.expr(f"{q}({value_col}, 0.25{acc})"), 4).alias(f"p25_{value_col}"),
        F.round(F.expr(f"{q}({value_col}, 0.5{acc})"), 4).alias(f"median_{value_col}"),
        F.round(F.expr(f"{q}({value_col}, 0.75{acc})"), 4).alias(f"p75_{value_col}"),
    )
