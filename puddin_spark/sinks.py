"""Sinks: CoNLL-U-style text output and lineage export.

S6 in SURVEY.md section 2.1: the reference streams one CoNLL-U file per
9,999-doc slice (parse_pile.py:1412-1455). Spark-native: the sentence table
is rendered to the comment-skeleton strings (pipeline.conllu_skeleton),
repartitioned by a slice key, sorted within partitions by (doc_id, sent_num)
so document blocks stay contiguous, and written with df.write.text — one
text file per slice partition, no driver collect.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from puddin_spark.pipeline import conllu_skeleton


def write_conllu(
    sentences: DataFrame,
    out_dir: str,
    *,
    num_slices: int = 32,
) -> None:
    """sentence table (doc_id, sent_num, sent_text) -> text files.

    Slice assignment is hash(doc_id) — the url-hash partitioning of the
    north rule; every document's sentences land in one file, in order.
    """
    write_conllu_rendered(conllu_skeleton(sentences), out_dir, num_slices=num_slices)


def write_conllu_rendered(
    sk: DataFrame, out_dir: str, *, num_slices: int = 32
) -> None:
    """Write an already-rendered skeleton table (doc_id, sent_num, conllu) —
    the shared tail of write_conllu and the annotated-with-failures path
    (pipeline.conllu_with_failures)."""
    (
        # partition on the full 64-bit hash of doc_id: high-cardinality, so
        # murmur%n distributes uniformly (pre-bucketing with pmod(...,n) and
        # re-hashing n distinct values is balls-in-bins: ~1/e empty files).
        # Hashing — rather than doc_id itself — also keeps this an explicit
        # REPARTITION_BY_NUM that Catalyst can't elide into the upstream
        # window exchange (which AQE may coalesce to fewer files).
        sk.repartition(num_slices, F.xxhash64("doc_id"))
        .sortWithinPartitions("doc_id", "sent_num")
        .select(F.concat(F.col("conllu"), F.lit("\n")).alias("value"))
        .write.mode("overwrite")
        .text(out_dir)
    )


def conllu_block_violations(block: str) -> list[str]:
    """Well-formedness checks for ONE CoNLL-U sentence block (the reference
    repaired malformed blocks and proved the result by pyconll round-trip,
    fix_pile_textbreaks.py:54-62; this is the output-validity analog for
    this engine's sink). Returns violation labels, [] when well-formed:

    - comments_after_tokens: a '#' line below a token line
    - missing_sent_id / missing_text: required comments absent
    - bad_column_count: token line without exactly 10 tab-separated fields
    - ids_not_contiguous: token IDs not exactly 1..n in order
    - bad_head: HEAD not an int in [0, n] (or '_' in skeleton mode)
    - self_head / no_root / multi_root: head cycle-of-one or root-count
      violations (annotated blocks only)
    """
    out: list[str] = []
    comments, tokens = [], []
    seen_token = False
    for line in block.split("\n"):
        if not line.strip():
            continue
        if line.startswith("#"):
            comments.append(line)
            if seen_token:
                out.append("comments_after_tokens")
        else:
            seen_token = True
            tokens.append(line)
    if not any(c.startswith("# sent_id = ") for c in comments):
        out.append("missing_sent_id")
    if not any(c.startswith("# text = ") for c in comments):
        out.append("missing_text")
    ids, heads = [], []
    for t in tokens:
        cols = t.split("\t")
        if len(cols) != 10:
            out.append("bad_column_count")
            continue
        try:
            ids.append(int(cols[0]))
        except ValueError:
            out.append("ids_not_contiguous")
            continue
        heads.append(cols[6])
    if ids and ids != list(range(1, len(ids) + 1)):
        out.append("ids_not_contiguous")
    n = len(ids)
    annotated = any(h != "_" for h in heads)
    roots = 0
    for ix, h in zip(ids, heads):
        if h == "_":
            continue
        try:
            hv = int(h)
        except ValueError:
            out.append("bad_head")
            continue
        if not (0 <= hv <= n):
            out.append("bad_head")
        elif hv == ix:
            out.append("self_head")
        elif hv == 0:
            roots += 1
    if annotated and roots == 0:
        out.append("no_root")
    if annotated and roots > 1:
        out.append("multi_root")
    return sorted(set(out))


def validate_conllu_output(spark, out_dir: str) -> DataFrame:
    """Distributed well-formedness scan of a write_conllu output directory:
    one task per file (wholetext read), blocks split on blank lines, each
    checked by conllu_block_violations. Returns (file, block_ix, violation)
    rows — empty means every block in every file is well-formed.

    Memory bound: wholetext holds ONE file per task (sentence blocks can't
    be reassembled across arbitrary line-split boundaries), so per-executor
    memory must cover the largest slice file — size num_slices in
    write_conllu accordingly (the reference's slices were ~377 MB). For a
    cheaper line-parallel completeness check use reconcile_conllu_output."""
    import pandas as pd

    files = spark.read.text(out_dir + "/*.txt", wholetext=True).selectExpr(
        "value", "_metadata.file_name as file"
    )

    def scan(batches):
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["file"], pdf["value"]):
                for ix, block in enumerate(content.split("\n\n")):
                    if not block.strip():
                        continue
                    for v in conllu_block_violations(block):
                        rows.append((fname, ix, v))
            yield pd.DataFrame(
                rows, columns=["file", "block_ix", "violation"]
            )

    return files.mapInPandas(
        scan, schema="file string, block_ix int, violation string"
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    *,
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table write — the co-located-join
    layout: two tables written with the SAME bucket count and keys equi-join
    with ZERO exchange (and zero per-task sort when sort_cols cover the join
    key), because Spark trusts the on-disk hash distribution. This is the
    pre-shuffle you buy once at write time and reuse on every downstream
    join/aggregation over the key — at 10^12 rows, the difference between
    re-shuffling the corpus per query and never shuffling it again.

    Requires a session catalog (in-memory catalog works for local runs; a
    metastore on a cluster). Plan proof: tests/test_plans.py asserts the
    bucketed self-join plan contains no Exchange.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def reconcile_conllu_output(
    spark, verdicts: DataFrame, out_dir: str
) -> DataFrame:
    """Completeness reconciliation between the conllu sink and the verdict
    table — the analog of the reference's empty-conllu cleanup + doc-id
    confirmation (remove_empties.py, confirm_doc_ids.py): every kept doc
    must appear exactly once as a `# newdoc id` block, and no dropped or
    unknown doc may appear. Returns (doc_id, status) rows with status in
    {missing_from_output, not_kept_but_present, duplicated_in_output};
    empty result = the output is exactly the kept set. Distributed: the
    output scan is a line filter + substring (no wholetext), both
    comparisons are anti/semi joins on doc_id."""
    emitted = (
        spark.read.text(out_dir + "/*.txt")
        .filter(F.col("value").startswith("# newdoc id = "))
        .select(
            F.expr("substring(value, 15)").alias("doc_id")
        )
    )
    kept = verdicts.filter("keep").select("doc_id")
    counts = emitted.groupBy("doc_id").count()
    missing = kept.join(emitted, "doc_id", "left_anti").select(
        "doc_id", F.lit("missing_from_output").alias("status")
    )
    extra = (
        counts.join(kept, "doc_id", "left_anti")
        .select("doc_id", F.lit("not_kept_but_present").alias("status"))
    )
    dupes = counts.filter("count > 1").select(
        "doc_id", F.lit("duplicated_in_output").alias("status")
    )
    return missing.unionByName(extra).unionByName(dupes)


def write_lineage_csv(lineage: DataFrame, out_dir: str) -> None:
    """Lineage sidecar as CSV (the reference's slice-info/meta-index CSVs,
    parse_pile.py:1239-1240,1325-1338). Map column flattened for CSV."""
    cols = [c for c in lineage.columns if c != "rule_hit_counts"]
    (
        lineage.select(
            *cols,
            F.to_json(F.col("rule_hit_counts")).alias("rule_hit_counts"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )
