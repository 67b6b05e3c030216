"""Keep/drop agreement metrics vs a reference-labels table.

The north rule's acceptance metric is "keep/drop F1 >= 0.99 vs reference
labels" (BASELINE.json `metric`; reference behavior: parse_pile.py's
final-df vs exclusions split). This module computes that metric as ONE
distributed aggregation — join on the document key, sum a 2x2 confusion
matrix map-side, derive precision/recall/F1 from the four counts on the
driver. No per-row collect; the joined table never materializes.

Scale shape: the join shuffles only (key, bool) pairs; with a small
labelled holdout the labels side is broadcast and the verdict corpus
streams through unshuffled.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def keepdrop_confusion(
    pred: DataFrame,
    truth: DataFrame,
    key: str = "url",
    pred_col: str = "keep",
    truth_col: str = "keep",
    broadcast_truth: bool = True,
) -> DataFrame:
    """One-row DataFrame: tp/fp/fn/tn counts + precision/recall/f1.

    `pred` rows absent from `truth` (and vice versa) are counted in
    n_pred_only / n_truth_only so a high F1 can't silently hide a
    coverage gap — the caller sees exactly how many labelled documents
    were compared.

    `key` must be unique within each input (verdict tables are — the
    completeness invariant pins one row per url); duplicate keys would
    double-count matches and skew n_truth_only.
    """
    p = pred.select(F.col(key).alias("_k"), F.col(pred_col).cast("boolean").alias("_p"))
    t = truth.select(F.col(key).alias("_k"), F.col(truth_col).cast("boolean").alias("_t"))
    # a full-outer join cannot broadcast (Spark rejects the hint), so the
    # truth-only count is derived arithmetically instead: one broadcastable
    # left-outer join gives the matched 2x2 + pred-only, and
    # n_truth_only = |truth| - |matched|. The big verdict corpus streams
    # through unshuffled.
    tj = F.broadcast(t) if broadcast_truth else t
    j = p.join(tj, "_k", "left_outer")
    agg = j.agg(
        F.sum((F.col("_p") & F.col("_t")).cast("long")).alias("tp"),
        F.sum((F.col("_p") & ~F.col("_t")).cast("long")).alias("fp"),
        F.sum((~F.col("_p") & F.col("_t")).cast("long")).alias("fn"),
        F.sum((~F.col("_p") & ~F.col("_t")).cast("long")).alias("tn"),
        F.sum(F.col("_t").isNull().cast("long")).alias("n_pred_only"),
    )
    for c in ("tp", "fp", "fn", "tn", "n_pred_only"):
        agg = agg.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    agg = agg.crossJoin(
        t.agg(
            F.count("*").alias("_n_truth"),
            F.sum(F.col("_t").isNull().cast("long")).alias("n_null_truth"),
        )
    ).withColumn(
        "n_truth_only",
        F.col("_n_truth") - (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
    )
    prec_den = F.col("tp") + F.col("fp")
    rec_den = F.col("tp") + F.col("fn")
    prec = F.when(prec_den > 0, F.col("tp") / prec_den).otherwise(F.lit(1.0))
    rec = F.when(rec_den > 0, F.col("tp") / rec_den).otherwise(F.lit(1.0))
    return agg.select(
        "tp", "fp", "fn", "tn", "n_pred_only", "n_truth_only", "n_null_truth",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def keepdrop_f1(
    pred: DataFrame,
    truth: DataFrame,
    key: str = "url",
    pred_col: str = "keep",
    truth_col: str = "keep",
) -> dict:
    """Driver-side convenience: the confusion row as a plain dict.

    Fails loudly when the unique-key / non-null-label precondition was
    violated (duplicate keys make n_truth_only negative; null truth labels
    surface in n_null_truth) instead of reporting silently skewed metrics.
    """
    row = keepdrop_confusion(pred, truth, key, pred_col, truth_col).first()
    d = row.asDict()
    if d["n_truth_only"] < 0:
        raise ValueError(
            f"n_truth_only={d['n_truth_only']} < 0: duplicate '{key}' keys in "
            "pred matched the same truth rows more than once — keepdrop metrics "
            "require one row per key in each input"
        )
    if d["n_null_truth"]:
        raise ValueError(
            f"{d['n_null_truth']} truth rows have a null '{truth_col}' label — "
            "matched-but-unlabelled rows would be double-counted as truth_only"
        )
    return d
