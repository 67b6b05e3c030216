"""HTML -> text extraction for the web-page input table.

The input_hint schema carries `html:binary` next to `text:string`; a
Common-Crawl-style ingest needs a text extractor for rows where the WET
text is absent or stale. This is the trafilatura-shaped slot re-expressed
as PURE JVM expressions: a fixed chain of `regexp_replace`/`replace`
built-ins (whole-stage codegen, zero Python in the hot path — the same
design rule as textstats). The chain is deliberately specified so every
step is expressible in both Java regex and RE2 (no backreferences, no
lookaround), which keeps it DuckDB-oracle-pairable cross-engine.

Extraction spec (frozen; the `html_extract` gate is its oracle twin):
  1. drop <script>...</script> and <style>...</style> blocks (tag-attr
     tolerant, case-insensitive, dot-matches-newline, non-greedy)
  2. drop <!-- comments -->, then the whole <head>...</head> block
     (title/meta are chrome, not content)
  3. block-level breaks BEFORE tag stripping: </p> and </h1..6> -> two
     newlines; <br> and </div>/</li>/</tr> boundaries -> one newline
  4. strip every remaining tag <...>
  5. decode the six ubiquitous entities (&lt; &gt; &quot; &#39; &nbsp;
     then &amp; LAST so '&amp;lt;' decodes to '&lt;', not '<')
  6. whitespace normalization: collapse runs of spaces/tabs, trim spaces
     around newlines, cap blank runs at one empty line, trim the ends

Reference scope note: puddin ingests Pile jsonl (already-extracted text;
parse_pile.py has no html stage) — this operator covers the north-star
input table, not a reference script.
"""
from __future__ import annotations

from pyspark.sql import Column, functions as F

# (pattern, replacement) applied in order via regexp_replace.
# Start tags use <name(\s[^>]*)?> so <head> can't swallow <header>,
# <b> can't swallow <br>, etc.
_TAG_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script(\s[^>]*)?>.*?</script\s*>", ""),
    (r"(?is)<style(\s[^>]*)?>.*?</style\s*>", ""),
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<head(\s[^>]*)?>.*?</head\s*>", ""),
    (r"(?i)</(p|h[1-6])\s*>", "\n\n"),
    (r"(?i)<br(\s[^>]*)?/?>", "\n"),
    (r"(?i)</(div|li|tr)\s*>", "\n"),
    (r"<[^>]*>", ""),
)

# literal entity decodes, in order (&amp; last)
_ENTITY_STEPS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_WS_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
    # \A/\z anchors (not ^/$): identical end-of-text semantics in Java
    # regex and RE2 — $ before-final-newline is a Java-only quirk
    (r"\A\n+", ""),
    (r"\n+\z", ""),
)


def extract_text_from_html(col: Column | str, from_binary: bool = False) -> Column:
    """Column expression: html markup -> normalized plain text.

    `from_binary=True` decodes the input_hint's `html:binary` column as
    UTF-8 first. The whole chain stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    if from_binary:
        c = c.cast("string")
    for pat, repl in _TAG_STEPS:
        c = F.regexp_replace(c, pat, repl)
    for lit, repl in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(repl))
    for pat, repl in _WS_STEPS:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(c)


def with_html_fallback(pages) -> "DataFrame":  # noqa: F821 (doc type)
    """Replace null/empty `text` with the extraction of `html` where
    present (input_hint schema). Must run BEFORE any digest computed over
    `text` — resume's sha2 anti-join included — or every WET-missing row
    shares the empty-string digest and collides."""
    return pages.withColumn(
        "text",
        F.when(
            (F.col("text").isNull() | (F.length("text") == 0))
            & F.col("html").isNotNull(),
            extract_text_from_html("html", from_binary=True),
        ).otherwise(F.col("text")),
    )


def duckdb_extract_sql(expr: str) -> str:
    """The same chain as DuckDB SQL over `expr` — the oracle twin used by
    the html_extract gate (regexes are RE2-safe by construction)."""
    s = expr
    # inline (?is) flags stay inside the pattern — RE2 honors them, which
    # sidesteps any divergence in DuckDB's option-letter semantics; only
    # 'g' (replace all, Spark's default) goes through the options arg
    for pat, repl in _TAG_STEPS:
        repl_sql = "'" + repl.replace("\n", r"\n") + "'"
        s = f"regexp_replace({s}, '{pat}', e{repl_sql}, 'g')"
    for lit, repl in _ENTITY_STEPS:
        lit_sql = lit.replace("'", "''")
        repl_sql = repl.replace("'", "''")
        s = f"replace({s}, '{lit_sql}', '{repl_sql}')"
    for pat, repl in _WS_STEPS:
        repl_sql = "'" + repl.replace("\n", r"\n") + "'"
        s = f"regexp_replace({s}, '{pat}', e{repl_sql}, 'g')"
    return f"trim({s})"
