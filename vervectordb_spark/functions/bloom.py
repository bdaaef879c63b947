"""Broadcast Bloom-filter semi-join pruning — the 100 TB join reducer.

A selective dim-side predicate usually kills most fact rows, but a plain
`fact JOIN dim` still SHUFFLES the whole fact table before the join drops
them. The classic fix is a semi-join reduction: build a compact membership
sketch of the surviving dim keys, broadcast it, and filter the fact table
MAP-SIDE before any exchange — at 100 TB that converts "shuffle 100 TB,
keep 1%" into "shuffle 1 TB".

Spark ships this as runtime filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled` injects a BloomFilterAggregate + might_contain around
shuffle joins). This module is the EXPLICIT, inspectable version of the
same idea — deterministic, inspectable, and available on any join shape
(the optimizer rule only fires on shuffle joins that pass its cost
heuristics). Probes default to native seeded `xxhash64` over the raw key
(fast path); the repo's portable md5-60 + affine family
(functions/hashing.py) is available as `hash_family="md5"` for the rare
case where the probe arithmetic itself must replay on another engine:

  build:  one distributed pass — k positions per key, position → (word,
          bit), `bit_or` partial-aggregated per 64-bit word, the ≤
          num_bits/64 non-zero words collected (a 2^17-bit filter is 2 048
          longs = 16 KB — driver/broadcast cost is O(num_bits), a
          CONSTANT, never O(keys)).
  prune:  a map-side filter: k hash probes per fact row, all inside
          whole-stage codegen (array-literal `element_at` + shiftleft —
          no UDF, no shuffle, no driver loop).

No false negatives ever (every inserted key probes 1-bits only); false
positives at rate ≈ (1 − e^{−k·n/m})^k pass the pruned filter and are
eliminated by the exact join that follows — so `bloom_prune` + exact join
is RESULT-IDENTICAL to the plain join (the oracle for `bloom_prune_join`
is therefore the plain-join SQL).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from math import ceil, exp, log
from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vervectordb_spark.functions.hashing import affine_hash, md5_long

__all__ = [
    "BloomFilter",
    "bloom_build",
    "bloom_prune",
    "bloom_size_for",
    "DEFAULT_NUM_BITS",
    "DEFAULT_NUM_HASHES",
]

#: 2^17 bits = 16 KB — ~1% fpp at 13k keys, ~4.5% at 26k. Size with
#: bloom_size_for() when the key count is known.
DEFAULT_NUM_BITS = 1 << 17
DEFAULT_NUM_HASHES = 4


@dataclass(frozen=True)
class BloomFilter:
    """Immutable built filter: `words[i]` holds bits [64·i, 64·i+63].

    hash_family: "xxhash" (default) probes with k seeded native
    `xxhash64` calls on the RAW key value — integer-only codegen, no
    string cast, ~7× cheaper per row than md5 (measured: the md5 family's
    conv(substring(md5(cast))) is re-evaluated per conjunct because
    common-subexpression elimination cannot hoist across short-circuit
    AND branches). "md5" uses the repo's portable md5-60 + affine family
    — only needed when the probe arithmetic itself must replay on
    another engine (the pruned-join RESULT never needs this: it is
    identical to the plain join by the superset + exact-join law).
    Build and probe must use the same family AND the same key type
    (xxhash64 hashes the native type, so long 7 != string "7")."""

    words: tuple[int, ...]
    num_bits: int
    num_hashes: int
    n_inserted: int  # rows hashed in (with multiplicity — pre-distinct)
    hash_family: str = "xxhash"

    def fpp_estimate(self) -> float:
        """(1 − e^{−k·n/m})^k with n = rows inserted (an upper bound when
        keys repeat — repeated keys set no new bits)."""
        k, n, m = self.num_hashes, self.n_inserted, self.num_bits
        return (1.0 - exp(-k * n / m)) ** k

    def might_contain(self, key: str) -> bool:
        """Driver-side probe (tests / spot checks) — same arithmetic as
        the distributed prune path. md5 family only (xxhash64 has no
        in-container Python twin; probe xxhash filters with a tiny
        bloom_prune job instead)."""
        if self.hash_family != "md5":
            raise ValueError(
                "driver-side might_contain requires hash_family='md5'"
            )
        import hashlib

        from vervectordb_spark.functions.hashing import AFFINE_MOD, affine_params

        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        for i in range(self.num_hashes):
            a, b = affine_params(i)
            p = (a * (h % AFFINE_MOD) + b) % AFFINE_MOD % self.num_bits
            if not (self.words[p >> 6] >> (p & 63)) & 1:
                return False
        return True


def bloom_size_for(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) for a target false-positive rate:
    m = −n·ln(p)/ln(2)², k = (m/n)·ln(2); m rounded up to whole words."""
    m = ceil(-n_keys * log(fpp) / (log(2) ** 2))
    m = max(((m + 63) // 64) * 64, 64)  # n_keys=0 must not size a 0-bit filter
    k = max(1, round(m / max(n_keys, 1) * log(2)))
    return m, k


def _positions(
    key: Column, num_bits: int, num_hashes: int, hash_family: str
) -> list[Column]:
    """k probe positions in [0, num_bits)."""
    if hash_family == "xxhash":
        # k independent hashes via a seed column prepended to the raw key
        # — all-native long arithmetic, whole-stage codegen, no string.
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    if hash_family == "md5":
        h = md5_long(key.cast("string"))
        return [affine_hash(h, i) % F.lit(num_bits) for i in range(num_hashes)]
    raise ValueError(f"unknown hash_family {hash_family!r}")


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    hash_family: Literal["xxhash", "md5"] = "xxhash",
) -> BloomFilter:
    """Build a BloomFilter over df[key_col] in ONE distributed job.

    explode(k positions/row) → (word = p>>6, mask = 1<<(p&63)) →
    groupBy(word).bit_or(mask) — the bit_or partial-aggregates map-side,
    so the shuffle carries at most num_bits/64 rows per input partition
    no matter how many keys flow in. The collect is ≤ num_bits/64 rows
    (bounded by the CONSTANT filter size, not the data)."""
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(
            f"num_bits must be a positive multiple of 64, got {num_bits}"
        )
    pos = F.array(*_positions(F.col(key_col), num_bits, num_hashes, hash_family))
    # NULL keys join nothing — exclude them explicitly (xxhash64 would
    # otherwise hash just the seed and insert a phantom position).
    ex = df.filter(F.col(key_col).isNotNull()).select(F.explode(pos).alias("_p"))
    agg = (
        ex.select(
            F.expr("shiftright(_p, 6)").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST((_p & 63) AS INT))"
            ).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"), F.count("*").alias("_n"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    total = 0
    for r in agg:
        words[r["_w"]] = r["_bits"]
        total += r["_n"]
    return BloomFilter(
        words=tuple(words),
        num_bits=num_bits,
        num_hashes=num_hashes,
        n_inserted=total // num_hashes,
        hash_family=hash_family,
    )


def bloom_prune(df: DataFrame, key_col: str, bf: BloomFilter) -> DataFrame:
    """Map-side Bloom pre-filter: keep rows whose key probes all-1 bits.

    Superset guarantee: every row whose key was inserted at build time
    survives (no false negatives); expected extra rows = fpp_estimate() of
    the non-matching rows. The predicate is pure JVM column arithmetic —
    whole-stage codegen, zero Python, zero shuffle — applied in the scan
    stage before any exchange.

    The word array rides a BROADCAST 1-row DataFrame (BroadcastNestedLoop
    join against one row), NOT a column literal: projection collapse
    inlines a literal alias into every AND conjunct, so a k-hash probe
    over an m-bit filter would serialize k copies of m/64 longs into the
    task binary — measured 7.2 MiB tasks at a 1.4 M-bit filter. As a
    broadcast attribute the array ships once via the broadcast exchange
    (the same transport Spark's own runtime bloom filter uses) and each
    conjunct reads the shared reference."""
    spark = df.sparkSession
    words_df = spark.createDataFrame(
        [(list(bf.words),)], "_bloom_words: array<long>"
    )
    out = df.crossJoin(F.broadcast(words_df))
    probes = _positions(F.col(key_col), bf.num_bits, bf.num_hashes, bf.hash_family)
    conds = []
    for i, p in enumerate(probes):
        out = out.withColumn(f"_bp{i}", p)
        conds.append(
            F.expr(
                f"(element_at(_bloom_words, CAST(shiftright(_bp{i}, 6) AS INT)"
                f" + 1) & shiftleft(CAST(1 AS BIGINT), CAST((_bp{i} & 63)"
                " AS INT))) <> 0"
            )
        )
    # NULL keys can never equi-join; drop them here like the join would
    # (with xxhash64 a NULL key would otherwise probe the seed's bits).
    pred = reduce(lambda a, b: a & b, conds, F.col(key_col).isNotNull())
    drop = ["_bloom_words"] + [f"_bp{i}" for i in range(bf.num_hashes)]
    return out.filter(pred).drop(*drop)
