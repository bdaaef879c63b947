"""PII scrubbing — regex redaction of emails / phones / IPs / ID numbers.

A corpus heading into training needs personally identifiable strings
stripped (the C4 / RefinedWeb cleaning recipes both carry a regex-scrub
stage). This is a pure map-side projection: `regexp_replace` +
`regexp_count` column expressions, whole-stage codegen, no shuffle, no
UDF — scrubbing 100 TB is exactly one scan.

Patterns use the regex subset that behaves identically in Java (Spark) and
RE2 (DuckDB): character classes, bounded repetition, alternation — no
lookaround, no backreferences — so every pattern is oracle-checkable.

The reference engine has no text pipeline at all (it stores vectors +
opaque metadata dicts, /root/reference/vervectordb/__init__.py:247-262); this is
part of the corpus-curation surface layered on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: name -> (pattern, replacement token). Order matters: the most specific
#: shapes run first (email, dotted IPs, dashed SSNs) so the broad phone
#: pattern — whose separator class deliberately excludes '.' — can't
#: swallow them. Dot-separated phone forms are a known miss; add a
#: dedicated pattern rather than widening this one.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (r"\+?[0-9][0-9() -]{6,}[0-9]", "<PHONE>"),
}


def redact_expr(text_col: Column | str,
                patterns: dict[str, tuple[str, str]] | None = None) -> Column:
    """Text with every PII match replaced by its token, patterns applied
    in declaration order (one nested regexp_replace chain, single pass
    per pattern)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for pat, token in (patterns or PII_PATTERNS).values():
        c = F.regexp_replace(c, pat, token)
    return c


def match_count_expr(text_col: Column | str, pattern: str) -> Column:
    """Number of matches of one pattern (long)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(pattern)).cast("long")


def redact(df: DataFrame, text_col: str = "text",
           patterns: dict[str, tuple[str, str]] | None = None,
           out_col: str | None = None) -> DataFrame:
    """Replace `text_col` (or write `out_col`) with the redacted text and
    add one `n_<name>` match-count column per pattern — the audit trail a
    compliance pass needs without a second scan."""
    pats = patterns or PII_PATTERNS
    out = df
    cur: Column = F.col(text_col)
    # each count is taken on the text AFTER the earlier (more specific)
    # patterns were masked, so an SSN is never double-counted as a phone
    for name, (pat, tok) in pats.items():
        out = out.withColumn(f"n_{name}", match_count_expr(cur, pat))
        cur = F.regexp_replace(cur, pat, tok)
    return out.withColumn(out_col or text_col, cur)
