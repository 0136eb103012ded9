"""Bloom-prefilter join semantics (operators/bloom.py): the filter may
keep extra rows (false positives) but must NEVER drop a true match,
and the prefiltered exact join must equal the plain join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiflow_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefiltered_join,
)
from sentiflow_spark.tables import load

BITS = 1 << 14
HASHES = 3


def test_bloom_no_false_negatives_and_prunes(spark, sf_dir):
    # selective dim: ~2% of customers → most orders should be pruned
    dim = load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 50 == 0
    ).select("c_custkey")
    fact = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")

    words = bloom_build(dim, "c_custkey", num_bits=BITS, num_hashes=HASHES)
    kept = bloom_might_contain(
        fact, "o_custkey", words, num_bits=BITS, num_hashes=HASHES
    )
    true_matches = fact.join(dim, fact.o_custkey == dim.c_custkey, "left_semi")

    n_fact, n_kept, n_true = fact.count(), kept.count(), true_matches.count()
    # superset of true matches (no false negatives — the hard guarantee)
    assert true_matches.join(kept, "o_orderkey", "left_anti").count() == 0
    assert n_true <= n_kept
    # actually prunes: false-positive rate bounded far below pass-through
    assert n_kept < n_fact * 0.5


def test_bloom_prefiltered_join_is_exact(spark, sf_dir):
    dim = load(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 50 == 0
    ).select("c_custkey", "c_nationkey")
    fact = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")

    via_bloom = bloom_prefiltered_join(
        fact, dim, "o_custkey", "c_custkey", num_bits=BITS, num_hashes=HASHES
    ).select("o_orderkey", "c_nationkey")
    plain = fact.join(dim, fact.o_custkey == dim.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    assert via_bloom.exceptAll(plain).count() == 0
    assert plain.exceptAll(via_bloom).count() == 0


def test_bloom_build_bitmap_is_dense_word_array(spark, sf_dir):
    dim = load(spark, sf_dir, "region")
    words = bloom_build(dim, "r_regionkey", num_bits=BITS, num_hashes=HASHES)
    assert len(words) == BITS // 64
    set_bits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    # 5 keys x 3 hashes = at most 15 set bits, at least 1
    assert 1 <= set_bits <= 15
