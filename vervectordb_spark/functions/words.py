"""The ONE word-extraction contract shared by every corpus-vocabulary
operator (BPE training/segmentation, unigram surprisal) and its DuckDB
oracle twin — lowercase, split on the PINNED whitespace class, drop
empties, keep words matching the scope pattern. Defined once so the Spark
side and the SQL fragment can never drift apart (they are built from the
same constants).

THE WHITESPACE CONTRACT
-----------------------
Tokens are separated by exactly the six ASCII whitespace characters of
the Java regex ``\\s`` class — space, tab, LF, VT(0x0B), FF, CR —
spelled out EXPLICITLY in every dialect instead of as ``\\s`` because the
three regex engines in play disagree about shorthand:

* Java regex (Spark exprs): ``\\s``       = [ \\t\\n\\x0B\\f\\r]
* RE2 (DuckDB oracles):     ``\\s``       = [ \\t\\n\\f\\r]   (NO \\x0B!)
* Python re (test models):  ``\\s``       = full Unicode whitespace,
  incl. \\x1c-\\x1f, \\x85, \\xa0 … unless re.ASCII
* Python str.split():       Unicode whitespace (same trap)

``WS_REGEX`` below parses identically in Java regex, RE2, and Python
``re`` — use it (or ``WS_EXPR`` inside Spark-SQL string literals, or the
same spelled-out class inside DuckDB SQL text) everywhere; use
``ws_tokens_py`` as the ONLY Python-side tokenizer model in tests and
driver-side helpers. A contract-lint pytest (tests/test_ws_contract.py)
greps the package for any stray ``\\s`` whitespace shorthand."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the six members of Java's \s, as raw characters (driver-side sets etc.)
WS_CHARS = " \t\n\x0b\f\r"

#: ONE regex source string valid (and identical in meaning) in Java regex,
#: RE2, and Python re: "one or more pinned-whitespace characters".
WS_REGEX = "[ \\t\\n\\x0B\\f\\r]+"

#: WS_REGEX for embedding inside a Spark-SQL string literal (F.expr /
#: spark.sql parse backslash escapes once, so double them).
WS_EXPR = WS_REGEX.replace("\\", "\\\\")

#: "one non-token character class" complement used by punctuation /
#: BPE-ish token counting — again spelled out for tri-dialect identity.
NONWORD_CCLASS = "A-Za-z0-9 \\t\\n\\x0B\\f\\r"

_WS_RE = re.compile(WS_REGEX)


def ws_tokens_py(text: str | None) -> list[str]:
    """THE Python-side tokenizer model: lowercase, split on the pinned
    whitespace class, drop empties. Byte-for-byte the same token stream
    as the JVM `split(lower(text), WS_REGEX)` and the DuckDB
    `regexp_split_to_array(lower(text), '<spelled-out class>')` twins —
    including on \\x0B..\\x1f control characters where \\s shorthands
    disagree (see module docstring)."""
    if not text:
        return []
    return [t for t in _WS_RE.split(text.lower()) if t]


#: oracle-scope filter: ascii-lowercase-only words keep the per-codepoint
#: split trivially identical across engines; operators accept any pattern
#: (None = keep every non-empty word).
ASCII_WORDS = "^[a-z]+$"


def words(df: DataFrame, text_col: str = "text",
          id_col: str | None = None,
          word_pattern: str | None = ASCII_WORDS) -> DataFrame:
    """(id?, word) exploded word stream — map-side only. NOT widened
    (functions/partitioning): the split+explode is too light per row for
    the round-robin exchange to pay for itself — paired-run measured
    +0.3 s on unigram_surprisal when it was (OPTIMIZATION_r11.md)."""
    cols = ([id_col] if id_col else []) + [
        F.explode(F.split(F.lower(F.col(text_col)), WS_REGEX)).alias("word")
    ]
    out = df.select(*cols).filter(F.col("word") != "")
    if word_pattern is not None:
        out = out.filter(F.col("word").rlike(word_pattern))
    return out


def words_sql(src: str = "documents", text_col: str = "text",
              id_col: str | None = None) -> str:
    """DuckDB twin of words() at the ASCII_WORDS scope: a FROM-able
    subquery string yielding (id?, word)."""
    sel = (f"{id_col}, " if id_col else "") + (
        f"unnest(regexp_split_to_array(lower({text_col}), '{WS_REGEX}'))"
        " AS word"
    )
    return (f"(SELECT * FROM (SELECT {sel} FROM {src}) "
            f"WHERE word <> '' AND regexp_matches(word, '{ASCII_WORDS}'))")
