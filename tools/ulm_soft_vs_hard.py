#!/usr/bin/env python
"""Measure the hard-EM vs soft-EM delta for the ULM tokenizer
(VERDICT r10 task #7, option b).

The engine's trainer (operators/ulm.train_unigram_lm) uses HARD-EM
(Viterbi E-step) — the standard practical simplification of Kudo 2018's
lattice-weighted (forward-backward) EM. This tool quantifies what that
simplification changes on the fixture corpus: it runs BOTH trainers from
the identical seed inventory (the soft trainer as an independent
pure-Python forward-backward reference), quantizes both final score
tables with the engine's integer rule, and reports

  * piece-inventory Jaccard between the surviving inventories,
  * corpus-weighted fraction of distinct words whose final Viterbi
    segmentation is IDENTICAL under the two score tables,
  * mean pieces/word (token fertility) under each.

Numbers are recorded as SCALE.md finding #17; the committed model
(models/tiny_ulm) and the gated queries stay hard-EM.
"""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def soft_em(words: dict[str, int], seed_counts: dict[str, int],
            iters: int, max_len: int) -> dict[str, float]:
    """Lattice-weighted EM: expected piece counts via forward-backward
    over every cover of every distinct word (count-weighted)."""
    counts = {p: float(c) for p, c in seed_counts.items()}
    for _ in range(iters):
        total = sum(counts.values())
        prob = {p: c / total for p, c in counts.items() if c > 0}
        expected: dict[str, float] = defaultdict(float)
        for w, wc in words.items():
            n = len(w)
            A = [0.0] * (n + 1)
            A[0] = 1.0
            for j in range(1, n + 1):
                s = 0.0
                for i in range(max(0, j - max_len), j):
                    pw = prob.get(w[i:j])
                    if pw and A[i]:
                        s += A[i] * pw
                A[j] = s
            if A[n] == 0.0:
                continue
            B = [0.0] * (n + 1)
            B[n] = 1.0
            for i in range(n - 1, -1, -1):
                s = 0.0
                for j in range(i + 1, min(n, i + max_len) + 1):
                    pw = prob.get(w[i:j])
                    if pw and B[j]:
                        s += pw * B[j]
                B[i] = s
            z = A[n]
            for i in range(n):
                for j in range(i + 1, min(n, i + max_len) + 1):
                    pw = prob.get(w[i:j])
                    if pw and A[i] and B[j]:
                        expected[w[i:j]] += wc * A[i] * pw * B[j] / z
        # M-step, mirroring the hard path's coverability floor: single
        # characters survive with at least count 1
        new_counts: dict[str, float] = {}
        for p, c in expected.items():
            if c > 1e-12:
                new_counts[p] = c
        for p in counts:
            if len(p) == 1:
                new_counts[p] = max(new_counts.get(p, 0.0), 1.0)
        counts = new_counts
    return counts


def quantize(counts: dict[str, float], shift: int) -> dict[str, int]:
    total = sum(counts.values())
    return {p: round(math.log2(c / total) * (1 << shift))
            for p, c in counts.items() if c > 0}


def main() -> None:
    from vervectordb_spark.operators import ulm
    from vervectordb_spark.schema import load_table
    from vervectordb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ulm-soft-vs-hard")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # distinct words + counts (the trainer's working set)
    vocab_df = ulm.word_counts(docs).withColumnRenamed("n", "cnt")
    words = {r["word"]: int(r["cnt"]) for r in vocab_df.collect()}

    # identical seed inventory for both trainers
    seed_df = ulm.seed_pieces(vocab_df)
    seed = {r["piece"]: int(r["cnt"]) for r in seed_df.collect()}

    # hard-EM: the engine's distributed trainer (committed-model path)
    hard_rows = ulm.train_unigram_lm(docs).collect()
    hard_scores = {r["piece"]: int(r["score"]) for r in hard_rows}

    # soft-EM: independent forward-backward reference, same seed/iters
    soft_counts = soft_em(words, seed, ulm.DEFAULT_EM_ITERS,
                          ulm.MAX_PIECE_LEN)
    soft_scores = quantize(soft_counts, ulm.SCORE_SHIFT)

    hp, sp = set(hard_scores), set(soft_scores)
    jac = len(hp & sp) / len(hp | sp)

    same = tot = 0
    fert_h = fert_s = Counter()
    for w, c in words.items():
        seg_h = ulm.viterbi_segment(w, hard_scores)
        seg_s = ulm.viterbi_segment(w, soft_scores)
        tot += c
        if seg_h == seg_s:
            same += c
        if seg_h:
            fert_h["pieces"] += c * len(seg_h)
            fert_h["words"] += c
        if seg_s:
            fert_s["pieces"] += c * len(seg_s)
            fert_s["words"] += c

    print(f"distinct_words={len(words)} corpus_tokens={tot}")
    print(f"inventory: hard={len(hp)} soft={len(sp)} jaccard={jac:.4f}")
    print(f"segmentation_agreement_weighted={same / tot:.4f}")
    print(f"fertility hard={fert_h['pieces'] / fert_h['words']:.4f} "
          f"soft={fert_s['pieces'] / fert_s['words']:.4f}")


if __name__ == "__main__":
    main()
