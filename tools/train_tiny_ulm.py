"""Train the vendored unigram-LM tokenizer artifact (offline, one-time).

Runs the DISTRIBUTED hard-EM trainer (operators/ulm.train_unigram_lm) on
the sf0.01 fixture corpus and commits the resulting piece inventory —
(piece, cnt, score) with integer-quantized log2-prob scores — as
models/tiny_ulm/. The committed scores are the single source both the
Spark Viterbi kernel and the DuckDB recursive-CTE oracle replay read
(queries_ulm.py), so encode is hash-gated end to end.

Usage: python3 tools/train_tiny_ulm.py [corpus_dir] [out_dir]
Deterministic: integer Viterbi, seeded nothing (pure counts).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vervectordb_spark.operators import ulm
    from vervectordb_spark.schema import load_table
    from vervectordb_spark.session import get_spark

    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(__file__), "..", "models", "tiny_ulm")

    spark = get_spark("train-tiny-ulm")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, corpus_dir, "documents")
    pieces = ulm.train_unigram_lm(docs).collect()
    rows = sorted((r["piece"], int(r["cnt"]), int(r["score"]))
                  for r in pieces)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        "piece": pa.array([r[0] for r in rows], pa.string()),
        "cnt": pa.array([r[1] for r in rows], pa.int64()),
        "score": pa.array([r[2] for r in rows], pa.int64()),
    }), os.path.join(out_dir, "pieces.parquet"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "arch": "unigram-lm (Kudo 2018), hard-EM",
            "pieces": len(rows),
            "max_piece_len": ulm.MAX_PIECE_LEN,
            "score_quant": f"round(log2(p) * 2^{ulm.SCORE_SHIFT})",
            "seed_size": ulm.DEFAULT_SEED_SIZE,
            "em_iters": ulm.DEFAULT_EM_ITERS,
            "corpus": corpus_dir,
        }, f, indent=2)
    print(f"wrote {len(rows)} pieces to {out_dir}")


if __name__ == "__main__":
    main()
