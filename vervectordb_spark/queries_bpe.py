"""BPE vocabulary-training query registration (operators/bpe.py).

Oracle pattern: training is fully deterministic (count desc / pair asc
argmax, greedy left-to-right merges), so DuckDB replays ALL of it — word
counts, per-step pair counts, argmax, and merge application — and the
query gates each learned merge (pair AND its count) plus the final
total-symbol count, which proves the merge fold was applied to every
word (not just the argmax bookkeeping).

DuckDB replay notes:
  - duckdb 1.0's list_reduce mis-evaluates lambdas that capture
    correlated columns (the merge pair), so the oracle does NOT replay
    the Spark-side F.aggregate fold directly. Instead each word's symbol
    sequence is carried as a '<sym><sym>...' token string and the greedy
    non-overlapping merge is EXACTLY replace(s, '<a><b>', '<ab>'):
    replace scans left-to-right without rescanning replaced output,
    token boundaries ('<' prefix, '>' suffix) make prefix/suffix false
    matches impossible, and adjacent matches never share characters.
    Equivalence to the fold is pinned by tests/test_bpe.py against an
    independent scalar reference.
  - pair enumeration uses list_transform over range(1, len) — plain
    (non-reduce) lambdas are sound in duckdb 1.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

_STEPS = 3

_SPLIT = "regexp_split_to_array(trim(s, '<>'), '><')"
_PAIRS = """
  SELECT pr.lft AS lft, pr.rgt AS rgt, SUM(n)::BIGINT AS cnt FROM (
    SELECT n, unnest(list_transform(range(1, len(syms)),
                     i -> {{'lft': syms[i], 'rgt': syms[i + 1]}})) AS pr
    FROM (SELECT n, {split} AS syms FROM s{prev}) WHERE len(syms) >= 2
  ) GROUP BY 1, 2
"""


def _bpe_oracle(steps: int) -> str:
    parts = [
        """w0 AS (
  SELECT word, COUNT(*)::BIGINT AS n
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> '' AND regexp_matches(word, '^[a-z]+$')
  GROUP BY word
)""",
        "s0 AS (SELECT n, '<' || array_to_string("
        "regexp_split_to_array(word, ''), '><') || '>' AS s FROM w0)",
    ]
    finals = []
    for k in range(1, steps + 1):
        parts.append(f"p{k} AS ({_PAIRS.format(prev=k - 1, split=_SPLIT)})")
        parts.append(f"m{k} AS (SELECT lft, rgt, cnt FROM p{k} "
                     f"ORDER BY cnt DESC, lft, rgt LIMIT 1)")
        parts.append(
            f"s{k} AS (SELECT n, replace(s, '<' || m.lft || '><' || m.rgt "
            f"|| '>', '<' || m.lft || m.rgt || '>') AS s FROM s{k - 1}, m{k} m)"
        )
        finals.append(f"SELECT {k} AS step, lft, rgt, cnt FROM m{k}")
    finals.append(f"SELECT 0 AS step, '' AS lft, '' AS rgt, "
                  f"SUM(len({_SPLIT}))::BIGINT AS cnt FROM s{steps}")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL ".join(finals))


@query("bpe_train_merges", oracle=_bpe_oracle(_STEPS))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 3 BPE merges on the documents corpus (operators/bpe.train_bpe)
    and emit (step, lft, rgt, cnt) per learned merge plus a step-0 row
    carrying the total symbol count of the merged vocabulary. ONE
    corpus-sized word-count job; every merge round runs on the
    distinct-word table only (corpus-size-independent iterations — the
    100 TB posture), with lineage cut per round."""
    from vervectordb_spark.operators.bpe import train_bpe

    docs = load_table(spark, sf_dir, "documents")
    merges, vocab = train_bpe(docs, n_merges=_STEPS)
    total = vocab.agg(F.sum(F.size("symbols")).cast("bigint")).collect()[0][0]
    rows = [(m.step, m.left, m.right, m.count) for m in merges]
    rows.append((0, "", "", int(total)))
    return spark.createDataFrame(
        rows, schema="step int, lft string, rgt string, cnt bigint"
    )
