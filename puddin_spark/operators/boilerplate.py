"""Boilerplate / exact-duplicate line removal (north_star: "puddin's
internal-noise reduction rules (boilerplate/exact-duplicate line removal...)").

The CCNet/C4-style filter: a LINE that recurs across many documents (nav
menus, cookie banners, "subscribe" footers) is boilerplate; drop the line,
keep the document. Built from built-in expressions end to end:

  explode lines -> count distinct docs per normalized-line digest ->
  anti-join boilerplate digests -> reassemble documents in line order.

Scale shape: the heavy shuffle keys on the 32-hex line digest (never the
line text at the aggregate stage); the digest frequency table is typically
small (boilerplate is by definition concentrated) and broadcasts into the
anti-join; reassembly groups by doc id.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_line(col: str):
    """Normalization for matching: trimmed, lowercased, whitespace-collapsed."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def boilerplate_line_keys(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_docs: int = 2
) -> DataFrame:
    """Digests of lines occurring in >= min_docs distinct documents."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.trim("line") != "")
    return (
        lines.select("id", F.md5(_norm_line("line")).alias("line_key"))
        .groupBy("line_key")
        .agg(F.countDistinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line_key", "n_docs")
    )


def remove_boilerplate_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_docs: int = 2
) -> DataFrame:
    """(id, clean_text, n_lines_kept) with cross-document duplicate lines
    removed; line order inside each document is preserved; empty lines are
    dropped. Every input document has exactly one output row — a document
    whose EVERY line is boilerplate comes back with clean_text = '' and
    n_lines_kept = 0 (the left join below; thin id-only shuffle)."""
    keys = boilerplate_line_keys(df, id_col, text_col, min_docs)
    lines = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .filter(F.trim("line") != "")
        .withColumn("line_key", F.md5(_norm_line("line")))
    )
    kept = lines.join(keys.select("line_key"), "line_key", "left_anti")
    agged = kept.groupBy("id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(agged, "id", "left_outer").select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_lines_kept", F.lit(0).cast("long")).alias("n_lines_kept"),
    )


def repetition_ratio_col(text_col: str, n: int = 2):
    """Within-document repetition: 1 - distinct/total word n-grams (the
    MassiveText-style repetition gate; 0 = no repetition)."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    grams = (
        f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice({toks}, i, {n})))"
    )
    return F.round(
        1
        - F.expr(f"cast(size(array_distinct({grams})) as double)")
        / F.expr(f"greatest(size({grams}), 1)"),
        6,
    )
