"""Bloom-filter semi-join pruning (functions/bloom.py).

The oracle gate (bloom_prune_join) certifies result-identity with the
plain join; these pin the filter laws the oracle can't see: zero false
negatives, actual pruning power near the designed fpp, sizing math, and
driver-probe == distributed-probe arithmetic."""

import pytest
from pyspark.sql import functions as F

from vervectordb_spark.functions.bloom import (
    BloomFilter,
    bloom_build,
    bloom_prune,
    bloom_size_for,
)


@pytest.fixture(scope="module")
def built(spark):
    dim = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    bf = bloom_build(dim, "k", num_bits=1 << 15, num_hashes=4)
    return dim, bf


def test_no_false_negatives(spark, built):
    """Every inserted key must survive pruning — the correctness law."""
    dim, bf = built
    survivors = bloom_prune(dim, "k", bf)
    assert survivors.count() == 2000


def test_prunes_most_non_members(spark, built):
    """Non-member keys pass at ~fpp, not en masse: of 10k keys never
    inserted, well under 5% may leak (designed fpp ≈ 0.8% here)."""
    dim, bf = built
    non_members = spark.range(0, 10000).select((F.col("id") * 3 + 1).alias("k"))
    leaked = bloom_prune(non_members, "k", bf).count()
    assert leaked < 500, f"fpp too high: {leaked}/10000"


def test_prune_then_join_equals_plain_join(spark, built):
    dim, bf = built
    fact = spark.range(0, 30000).select(
        (F.col("id") % 9000).alias("k"), F.col("id").alias("v")
    )
    plain = fact.join(dim, on="k")
    pruned = bloom_prune(fact, "k", bf).join(dim, on="k")
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0


def test_driver_probe_matches_distributed_md5_family(spark):
    """BloomFilter.might_contain (pure-Python md5/affine) and bloom_prune
    (Spark exprs) implement the same arithmetic — md5 family only; the
    default xxhash family raises on driver probes (no Python twin)."""
    dim = spark.range(0, 2000).select((F.col("id") * 3).alias("k"))
    bf = bloom_build(dim, "k", num_bits=1 << 15, num_hashes=4,
                     hash_family="md5")
    sample = spark.range(0, 200).select(F.col("id").alias("k"))
    spark_keep = {r["k"] for r in bloom_prune(sample, "k", bf).collect()}
    py_keep = {k for k in range(200) if bf.might_contain(str(k))}
    assert spark_keep == py_keep
    xx = bloom_build(dim, "k", num_bits=1 << 15, num_hashes=4)
    with pytest.raises(ValueError, match="md5"):
        xx.might_contain("3")


def test_md5_and_xxhash_families_agree_on_semantics(spark, built):
    """Same superset law for both families: identical pruned-join results
    even though the bit patterns differ."""
    dim, bf_xx = built
    bf_md5 = bloom_build(dim, "k", num_bits=1 << 15, num_hashes=4,
                         hash_family="md5")
    fact = spark.range(0, 20000).select(
        (F.col("id") % 7000).alias("k"), F.col("id").alias("v")
    )
    a = bloom_prune(fact, "k", bf_xx).join(dim, on="k")
    b = bloom_prune(fact, "k", bf_md5).join(dim, on="k")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_size_for_math():
    m, k = bloom_size_for(13000, 0.01)
    assert m % 64 == 0
    assert 9 * 13000 <= m <= 11 * 13000  # ~9.6 bits/key at 1%
    assert k in (6, 7)
    # and the resulting filter's own estimate agrees with the target
    bf = BloomFilter(words=(0,) * (m // 64), num_bits=m, num_hashes=k,
                     n_inserted=13000)
    assert bf.fpp_estimate() < 0.015


def test_rejects_unaligned_bits(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", num_bits=1000)


def test_null_keys_never_survive(spark, built):
    """NULL fact keys can't match any join key; the md5 probe is NULL so
    the predicate is not-true and the row is dropped — same as the join."""
    dim, bf = built
    fact = spark.createDataFrame([(None,), (3,)], "k long")
    got = [r["k"] for r in bloom_prune(fact, "k", bf).collect()]
    assert got == [3]
