"""Mojibake repair: fix UTF-8 text that was mis-decoded as Latin-1/cp1252
somewhere in a web pipeline (the ftfy problem: 'cafÃ©' for 'café',
'â€œquotedâ€' for curly quotes). Real crawls are full of it; the
reference corpus (Pile CC) was already repaired upstream, so this is the
graft-axis operator a from-crawl pipeline needs BEFORE the unidecode
transliteration step (translit.py maps é -> e, but Ã© would become A(c)).

Approach: a fixed, ordered table of the common double-encoded sequences
compiled into one nested `replace(...)` expression — pure JVM codegen, no
Python, no shuffle, and the SAME pair table generates the DuckDB twin
(`duckdb_fix_sql`), so the oracle can never drift from the Spark path.
Three-byte sequences (cp1252 punctuation: â€œ, â€™, â€“) are replaced
BEFORE the two-byte Latin-1 letters so their shared prefixes never
half-fix. This is deliberately NOT a full ftfy port (no encoding
inference, no heuristic scoring of alternatives) — it is the
deterministic 95% that vectorizes; a real ftfy, if ever installed, would
slot in as a pandas-UDF seam like models.py's.

`mojibake_marker_count` counts the telltale lead bytes (Ã, â€, Â) before
repair — a cheap quality signal for routing documents to the repair pass
(and for monitoring how corrupted a crawl segment is).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (broken, fixed), applied in order. Longer/3-byte sequences first:
# 'â€œ' must fix before any 2-byte rule touches 'â'. Every entry is
# quote-free so it can inline into a single-quoted SQL literal in both
# engines.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    # cp1252 punctuation (3-byte mojibake)
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("â‚¬", "€"),  # â‚¬ -> €
    # Latin-1 letters (2-byte mojibake: Ã + low byte)
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ãª", "ê"),  # Ãª -> ê
    ("Ã¢", "â"),  # Ã¢ -> â
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã´", "ô"),  # Ã´ -> ô
    ("Ã»", "û"),  # Ã» -> û
    ("Ã¹", "ù"),  # Ã¹ -> ù
    ("Ã®", "î"),  # Ã® -> î
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã¡", "á"),  # Ã¡ -> á
    # guillemets + stray  before NBSP-ish punctuation
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â ", " "),       # Â + NBSP -> space
]

# the telltale lead sequences; counted BEFORE repair ('â‚¬' spelled out:
# the generic 'â.' would false-positive on genuine circumflex words)
_MARKER_RE = "Ã.|â€.|â‚¬|Â."


def _nested_replace(expr: str, pairs: list[tuple[str, str]]) -> str:
    """Compile the pair table into replace(replace(..., b, f), ...) —
    identical SQL text for Spark and DuckDB (both define
    replace(str, search, replacement) with plain-substring search)."""
    for broken, fixed in pairs:
        assert "'" not in broken and "'" not in fixed
        expr = f"replace({expr}, '{broken}', '{fixed}')"
    return expr


def fix_mojibake_expr(text_col: str) -> str:
    """Spark SQL expression repairing `text_col` (also valid DuckDB)."""
    return _nested_replace(text_col, MOJIBAKE_PAIRS)


def duckdb_fix_sql(text_expr: str) -> str:
    """DuckDB twin — same generator, same pair table, same order."""
    return _nested_replace(text_expr, MOJIBAKE_PAIRS)


def mojibake_marker_count_col(text_col: str) -> Column:
    """Occurrences of the telltale lead sequences before repair."""
    return F.expr(
        f"size(regexp_extract_all({text_col}, '{_MARKER_RE}', 0))"
    )


def with_mojibake_fixed(
    df: DataFrame, text_col: str = "text", fixed_col: str = "fixed_text"
) -> DataFrame:
    """Attach `fixed_col` (repaired text) and `mojibake_markers` (count
    of suspicious sequences in the ORIGINAL text). One pure-codegen
    projection — no shuffle, no Python."""
    return df.withColumn(
        "mojibake_markers", mojibake_marker_count_col(text_col).cast("int")
    ).withColumn(fixed_col, F.expr(fix_mojibake_expr(text_col)))
