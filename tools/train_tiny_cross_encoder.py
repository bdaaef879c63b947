"""Train the vendored tiny cross-encoder rerank model (offline, one-time).

The rerank tier above RRF fusion (operators/hybrid.rerank_cross_encoder)
kept a sentence-transformers slot env-guarded because no model stack
ships in this container. This script makes a REAL trained pair scorer
exercisable offline: a logistic regression over JOINT (query, document)
interaction features —

  f1  cosine between the query's and document's vendored-SGNS-checkpoint
      embeddings (the dense signal)
  f2  distinct-term overlap |q ∩ d| / |q|       (the lexical set signal)
  f3  term-frequency density Σtf / (1 + |d|)    (the lexical count signal)
  f4  brevity prior |d| / (|d| + 100)

— trained on (query drawn as a contiguous fragment of a document →
that document is the positive, 4 random documents are negatives).

Serving ranks by the LINEAR LOGIT (monotone in the sigmoid), whose
fixed-order multiply-adds are engine-identical IEEE arithmetic — which
is what lets the rerank tier be hash-gated against a DuckDB replay
(queries_hybrid.hybrid_ce_rerank) instead of rows-only. Weights are
quantized to multiples of 2^-20 and shipped as integers over a
power-of-two denominator: `n / 1048576.0` is EXACT in both engines (a
decimal float literal would round differently through DuckDB's DECIMAL
parse — the queries.py float-contract lesson).

Usage: python3 tools/train_tiny_cross_encoder.py [corpus.parquet] [out]
Deterministic (fixed seed, fixed iteration order).
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

SEED = 2024
N_QUERIES = 2500
NEGATIVES = 4
EPOCHS = 400
LR = 0.5
QUANT_SHIFT = 20


def plain_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", (text or "").lower()) if t]


def main() -> None:
    import duckdb

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from vervectordb_spark.operators.embed import (
        checkpoint_embed_text, load_checkpoint, mixed_tokens_py)

    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.01/documents.parquet"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(__file__), "..",
                     "models", "tiny_cross_encoder")
    rows = duckdb.sql(
        f"SELECT doc_id, coalesce(text, '') FROM '{corpus}' "
        "ORDER BY doc_id").fetchall()
    ids = [r[0] for r in rows]
    texts = {r[0]: r[1] for r in rows}
    toks = {d: plain_tokens(t) for d, t in texts.items()}
    tok_sets = {d: set(t) for d, t in toks.items()}
    from collections import Counter

    tok_cnt = {d: Counter(t) for d, t in toks.items()}

    # document embeddings via the EXACT serving arithmetic
    words, mat, dim = load_checkpoint()
    w2i = {w: i for i, w in enumerate(words)}

    def embed(tokens: list[str]) -> np.ndarray:
        idxs = [w2i[t] for t in tokens if t in w2i]
        if not idxs:
            return np.zeros(dim, dtype=np.float32)
        s = mat[idxs].sum(axis=0)
        n2 = int((s * s).sum())
        if n2 == 0:
            return np.zeros(dim, dtype=np.float32)
        return (s / np.sqrt(float(n2))).astype(np.float32)

    emb = {d: embed(mixed_tokens_py(texts[d])) for d in ids}

    rng = np.random.default_rng(SEED)
    X, y = [], []
    for _ in range(N_QUERIES):
        j = ids[int(rng.integers(len(ids)))]
        t = toks[j]
        if len(t) < 8:
            continue
        qlen = int(rng.integers(3, 7))
        start = int(rng.integers(0, len(t) - qlen))
        qterms = t[start:start + qlen]
        uq = list(dict.fromkeys(qterms))
        qv = checkpoint_embed_text(" ".join(qterms))

        def feats(d: int) -> list[float]:
            dt = toks[d]
            f1 = float(qv.astype(np.float64) @ emb[d].astype(np.float64))
            f2 = len(set(uq) & tok_sets[d]) / len(uq)
            f3 = sum(tok_cnt[d][term] for term in uq) / (1 + len(dt))
            f4 = len(dt) / (len(dt) + 100)
            return [f1, f2, f3, f4]

        X.append(feats(j))
        y.append(1.0)
        for _ in range(NEGATIVES):
            n = ids[int(rng.integers(len(ids)))]
            if n == j:
                continue
            X.append(feats(n))
            y.append(0.0)
    X = np.array(X)
    y = np.array(y)
    print(f"training pairs: {len(y)} ({int(y.sum())} positive)")

    w = np.zeros(X.shape[1])
    b = 0.0
    for epoch in range(EPOCHS):
        z = np.clip(X @ w + b, -30, 30)
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g) / len(y)
        b -= LR * float(g.mean())
    pred = (X @ w + b) > 0
    acc = float((pred == (y > 0.5)).mean())
    order = np.argsort(-(X @ w + b))
    print(f"train accuracy {acc:.3f}  w={w.round(3).tolist()}  b={b:.3f}")

    q = 1 << QUANT_SHIFT
    w_n = [int(round(x * q)) for x in w]
    b_n = int(round(b * q))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "weights.json"), "w") as f:
        json.dump({
            "arch": "pairwise-logistic-cross-encoder",
            "features": ["ckpt_cosine", "term_overlap", "tf_density",
                         "brevity"],
            "w_num": w_n, "b_num": b_n, "denom_shift": QUANT_SHIFT,
            "seed": SEED, "epochs": EPOCHS, "train_acc": round(acc, 4),
            "corpus": corpus,
            "embedding_checkpoint": "models/tiny_sgns_16d",
        }, f, indent=2)
    print(f"wrote weights to {out_dir}")


if __name__ == "__main__":
    main()
