"""The ONE word-extraction contract shared by every corpus-vocabulary
operator (BPE training/segmentation, unigram surprisal) and its DuckDB
oracle twin — lowercase, split on \\s+, drop empties, keep words matching
the scope pattern. Defined once so the Spark side and the SQL fragment
can never drift apart (they are built from the same constants)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: oracle-scope filter: ascii-lowercase-only words keep the per-codepoint
#: split trivially identical across engines; operators accept any pattern
#: (None = keep every non-empty word).
ASCII_WORDS = "^[a-z]+$"


def words(df: DataFrame, text_col: str = "text",
          id_col: str | None = None,
          word_pattern: str | None = ASCII_WORDS) -> DataFrame:
    """(id?, word) exploded word stream — map-side only."""
    cols = ([id_col] if id_col else []) + [
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
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
        f"unnest(regexp_split_to_array(lower({text_col}), '\\s+')) AS word"
    )
    return (f"(SELECT * FROM (SELECT {sel} FROM {src}) "
            f"WHERE word <> '' AND regexp_matches(word, '{ASCII_WORDS}'))")
