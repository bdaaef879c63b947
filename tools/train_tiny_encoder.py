"""Train the vendored tiny word-embedding encoder (offline, one-time).

The reference DECLARES a real-model embedding path it never calls
(sentence-transformers + GTE download: /root/reference/pyproject.toml:7-13,
/root/reference/scripts/model_download.sh:1). Our `operators/embed.py`
carries that slot env-guarded; this script makes the real-model tier
actually exercisable offline: a skip-gram negative-sampling word2vec
(Mikolov et al. 2013) trained with plain NumPy on the sf0.01 documents
fixture, quantized to int8, committed as a parquet checkpoint under
models/tiny_sgns_16d/.

Why int8: document embedding = L2-normalized SUM of token vectors, and
both the quantization scale and the 1/n of a mean CANCEL under L2
normalization — so serving sums exact int64 (order-free, no float
associativity), which is what lets the checkpoint path be hash-gated
against a DuckDB oracle replay (queries_embed.text_embed_checkpoint)
instead of rows-only.

Tokenization matches operators/embed.mixed_tokens_expr exactly (CJK
ideographs spaced to single-char tokens, lowercase, \\s+ split) so the
training vocabulary is the serving vocabulary.

Usage: python3 tools/train_tiny_encoder.py [corpus.parquet] [out_dir]
Deterministic: fixed seed, fixed iteration order — reruns are
bit-identical.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

DIM = 16
WINDOW = 2
NEGATIVES = 4
EPOCHS = 8
LR0 = 0.05
MIN_COUNT = 2
MAX_VOCAB = 4096
SEED = 1337

_CJK = re.compile(r"([一-鿿])")


def tokenize(text: str) -> list[str]:
    """== operators/embed.mixed_tokens_expr (CJK spacing, lower, \\s+)."""
    if not text:
        return []
    return [t for t in _CJK.sub(r" \1 ", text).lower().split() if t]


def main() -> None:
    import duckdb

    corpus = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/testdata/sf0.01/documents.parquet"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(__file__), "..",
                     "models", "tiny_sgns_16d")
    texts = [r[0] or "" for r in duckdb.sql(
        f"SELECT text FROM '{corpus}' ORDER BY doc_id").fetchall()]
    docs = [tokenize(t) for t in texts]

    # vocab: count-ordered, deterministic tie-break on the word string
    counts: dict[str, int] = {}
    for toks in docs:
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    vocab = sorted(
        (w for w, c in counts.items() if c >= MIN_COUNT),
        key=lambda w: (-counts[w], w))[:MAX_VOCAB]
    w2i = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    print(f"corpus: {sum(map(len, docs))} tokens, vocab {V}")

    # unigram^0.75 negative-sampling table (the SGNS standard)
    freq = np.array([counts[w] for w in vocab], dtype=np.float64) ** 0.75
    neg_cdf = np.cumsum(freq / freq.sum())

    rng = np.random.default_rng(SEED)
    W_in = (rng.random((V, DIM)) - 0.5) / DIM   # input vectors (the model)
    W_out = np.zeros((V, DIM))                  # output (context) vectors

    ids_docs = [[w2i[t] for t in toks if t in w2i] for toks in docs]
    n_pairs = sum(
        max(0, len(d)) for d in ids_docs)
    step = 0
    total_steps = EPOCHS * sum(len(d) for d in ids_docs)
    for epoch in range(EPOCHS):
        loss_acc, loss_n = 0.0, 0
        for d in ids_docs:
            L = len(d)
            for pos in range(L):
                lr = LR0 * max(1e-4, 1.0 - step / total_steps)
                step += 1
                c = d[pos]
                lo = max(0, pos - WINDOW)
                hi = min(L, pos + WINDOW + 1)
                ctx = [d[j] for j in range(lo, hi) if j != pos]
                if not ctx:
                    continue
                negs = np.searchsorted(
                    neg_cdf, rng.random(NEGATIVES * len(ctx)))
                targets = np.concatenate(
                    [np.array(ctx, dtype=np.int64), negs])
                labels = np.concatenate(
                    [np.ones(len(ctx)), np.zeros(len(negs))])
                vin = W_in[c]
                outs = W_out[targets]                      # (T, DIM)
                logits = np.clip(outs @ vin, -30.0, 30.0)
                scores = 1.0 / (1.0 + np.exp(-logits))      # sigmoid
                g = (scores - labels) * lr                  # (T,)
                loss_acc += float(np.sum(np.abs(scores - labels)))
                loss_n += len(labels)
                W_in[c] -= g @ outs
                # np.add.at for repeated targets in one window
                np.subtract.at(W_out, targets, g[:, None] * vin[None, :])
        print(f"epoch {epoch}: mean|err| {loss_acc / max(1, loss_n):.4f}")

    # Post-process: all-but-the-top (Mu & Viswanath 2018) — random-ish
    # co-occurrence corpora drive SGNS toward a rank-1 common direction;
    # centering + removing the top principal component restores the
    # discriminative spread every downstream cosine relies on.
    W = W_in - W_in.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(W, full_matrices=False)
    W = W - (W @ vt[0])[:, None] * vt[0][None, :]
    # per-row unit quantization: the int8 rows ARE the model (serving
    # sums them exactly in int64; the 127 scale and the sum's implicit
    # 1/n both cancel under the final L2 normalization)
    norms = np.linalg.norm(W, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Q = np.clip(np.rint(127.0 * W / norms), -127, 127).astype(np.int8)
    scale = 127.0
    # drop all-zero rows (un-trained words would embed as nothing anyway)
    keep = np.any(Q != 0, axis=1)
    vocab_k = [w for w, k in zip(vocab, keep) if k]
    Q = Q[keep]

    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "word": pa.array(vocab_k, pa.string()),
        "vec": pa.array([q.tolist() for q in Q], pa.list_(pa.int8())),
    })
    pq.write_table(tbl, os.path.join(out_dir, "word_vectors.parquet"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "arch": "sgns-word2vec", "dim": DIM, "window": WINDOW,
            "negatives": NEGATIVES, "epochs": EPOCHS, "seed": SEED,
            "min_count": MIN_COUNT, "vocab": len(vocab_k),
            "quant": "int8-unit-rows", "scale": scale,
            "post": "center+top-pc-removal (all-but-the-top)",
            "corpus": corpus,
            "pooling": "l2_normalized_int_sum",
            "tokenizer": "mixed_tokens_expr",
        }, f, indent=2)
    print(f"wrote {len(vocab_k)}x{DIM} int8 checkpoint to {out_dir}")


if __name__ == "__main__":
    main()
