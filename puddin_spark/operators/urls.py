"""URL normalization and domain filtering for web-page corpora.

A Common-Crawl-style ingest keyed on `url:string` (input_hint schema)
needs: a canonical form (so near-identical fetches dedup), the host and
registered domain (for per-site stats, skew diagnosis, and blocklists),
and a domain-blocklist gate. All of it is pure JVM expression work —
regexp/concat/lower built-ins inside whole-stage codegen, RE2-safe by
construction (no backreferences, no lookaround, \\z not $) so every
column has a mechanical DuckDB oracle twin.

Canonicalization spec (frozen; the url_canonicalize gate is its oracle):
  1. strip the fragment (#...)
  2. drop tracking query params: utm_*, gclid, fbclid — non-first params
     (&p=...), then a first param with a successor (?p=...& -> ?), then a
     lone first param (?p=...\\z)
  3. dangling '?' or '&' left at the end is removed
  4. lowercase the scheme://authority prefix (path/query case preserved)

Host/domain spec:
  host   = authority of scheme://... minus userinfo@ and :port, lowered
  domain = last two host labels, or last three when the ending matches a
           small embedded two-level public-suffix subset (co.uk, com.au,
           ...). The full public-suffix list is an external artifact this
           container doesn't ship; the subset is the documented seam.

Reference scope note: puddin's Pile ingest has no url column (ids are
synthesized); these operators serve the north-star web table.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_TRACK = r"(utm_[^&#]*|gclid=[^&#]*|fbclid=[^&#]*)"

# (pattern, replacement) — applied in order, identical in both engines
_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)#.*\z", ""),          # 1. fragment
    (r"&" + _TRACK, ""),          # 2a. non-first tracking params
    (r"\?" + _TRACK + r"&", "?"),  # 2b. first param with successor
    (r"\?" + _TRACK + r"\z", ""),  # 2c. lone first param
    (r"[?&]\z", ""),              # 3. dangling separator
)

_AUTH_PREFIX = r"\A[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"

# two-level public suffixes recognized by the embedded subset (seam for a
# real public-suffix list)
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)


def canonical_url(col: Column | str) -> Column:
    """Frozen canonical form of a url (spec in the module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _CANON_STEPS:
        c = F.regexp_replace(c, pat, repl)
    # lowercase scheme://authority, keep the rest byte-for-byte
    prefix = F.lower(F.regexp_extract(c, f"({_AUTH_PREFIX})", 1))
    rest = F.regexp_replace(c, _AUTH_PREFIX, "")
    return F.when(prefix == "", c).otherwise(F.concat(prefix, rest))


def url_host(col: Column | str) -> Column:
    """Lowercased host: authority minus userinfo@ and :port; '' when the
    value has no scheme://authority shape."""
    c = F.col(col) if isinstance(col, str) else col
    auth = F.regexp_extract(c, r"\A[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    no_user = F.regexp_replace(auth, r"\A[^@]*@", "")
    no_port = F.regexp_replace(no_user, r":[0-9]+\z", "")
    return F.lower(no_port)


def url_domain(host: Column | str) -> Column:
    """Registered domain from a host (embedded two-level-suffix subset)."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    is_two_level = last2.isin(*TWO_LEVEL_SUFFIXES)
    return (
        F.when(n <= 2, h)
        .when(is_two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def filter_by_domain_blocklist(
    pages: DataFrame, blocked_domains: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted.

    The equi-anti-join on `url_domain` (not a LIKE scan) keeps the join
    broadcastable and covers every subdomain of a blocked domain in one
    key comparison — the 10^12-row side streams, the blocklist broadcasts.
    `blocked_domains` must have a `domain` column of registered domains.
    """
    d = pages.withColumn("_dom", url_domain(url_host(url_col)))
    b = F.broadcast(blocked_domains.select(F.lower("domain").alias("_dom")))
    return d.join(b, "_dom", "left_anti").drop("_dom")


def duckdb_canonical_sql(expr: str) -> str:
    """DuckDB twin of canonical_url over `expr` (oracle generation)."""
    s = expr
    for pat, repl in _CANON_STEPS:
        s = f"regexp_replace({s}, '{pat}', '{repl}', 'g')"
    prefix = f"lower(regexp_extract({s}, '({_AUTH_PREFIX})', 1))"
    rest = f"regexp_replace({s}, '{_AUTH_PREFIX}', '', 'g')"
    return (
        f"case when {prefix} = '' then {s} else {prefix} || {rest} end"
    )


def duckdb_host_sql(expr: str) -> str:
    """DuckDB twin of url_host over `expr`."""
    auth = (
        "regexp_extract("
        f"{expr}, '\\A[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)"
    )
    no_user = f"regexp_replace({auth}, '\\A[^@]*@', '', 'g')"
    no_port = f"regexp_replace({no_user}, ':[0-9]+\\z', '', 'g')"
    return f"lower({no_port})"


def duckdb_domain_sql(host_expr: str) -> str:
    """DuckDB twin of url_domain over an already-computed host expr."""
    suffixes = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    parts = f"string_split({host_expr}, '.')"
    last2 = f"array_to_string(list_slice({parts}, -2, -1), '.')"
    last3 = f"array_to_string(list_slice({parts}, -3, -1), '.')"
    return (
        f"case when len({parts}) <= 2 then {host_expr} "
        f"when {last2} in ({suffixes}) and len({parts}) >= 3 then {last3} "
        f"else {last2} end"
    )
