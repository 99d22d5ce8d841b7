"""Sketch operators: HLL rollup, Bloom pruning, approx quantiles."""

import pyspark.sql.functions as F
import pytest

from obsplus_spark.operators.sketches import (
    approx_quantiles,
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
    hll_estimate,
    hll_partials,
    hll_rollup,
)


def test_bloom_no_false_negatives(spark):
    small = spark.range(0, 500, 7).withColumnRenamed("id", "k")
    big = spark.range(0, 2000).withColumnRenamed("id", "k")
    bloom = bloom_build(small, "k", num_bits=1 << 14, num_hashes=5)
    kept = (
        big.join(
            F.broadcast(bloom),
            bloom_might_contain("k", "bloom", 1 << 14, 5),
            "left_semi",
        )
        .select("k")
        .collect()
    )
    kept_set = {r.k for r in kept}
    expected = set(range(0, 500, 7))
    # every true member survives the bloom pass (no false negatives)
    assert expected <= kept_set


def test_bloom_semi_join_exact(spark):
    small = spark.range(0, 300, 11).withColumnRenamed("id", "k")
    big = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = bloom_semi_join(big, small, "k", "k", num_bits=1 << 12, num_hashes=4)
    got = sorted(r.k for r in out.collect())
    assert got == sorted(set(range(0, 300, 11)))
    # columns are exactly big's — the bitset never leaks into the output
    assert out.columns == ["k", "v"]


def test_bloom_empty_small_side(spark):
    small = spark.range(10).filter("id < 0").withColumnRenamed("id", "k")
    big = spark.range(100).withColumnRenamed("id", "k")
    out = bloom_semi_join(big, small, "k", "k", num_bits=1 << 10)
    assert out.count() == 0


def test_bloom_dense_array_width(spark):
    small = spark.range(5).withColumnRenamed("id", "k")
    row = bloom_build(small, "k", num_bits=1 << 10, num_hashes=3).collect()[0]
    assert len(row.bloom) == (1 << 10) // 64


def test_hll_rollup_matches_direct(spark):
    df = spark.range(5000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 10).alias("b"),
        (F.col("id") % 700).alias("u"),
    )
    daily = hll_partials(df, ["g", "b"], "u", lg_k=14)
    merged = hll_rollup(daily, ["g"]).select("g", hll_estimate("hll").alias("est"))
    exact = df.groupBy("g").agg(F.countDistinct("u").alias("n"))
    joined = exact.join(merged, "g").collect()
    assert len(joined) == 4
    for r in joined:
        # merged-sketch estimate within 5% of truth at this cardinality
        assert abs(r.est - r.n) <= 0.05 * r.n


def test_approx_quantiles_band(spark):
    df = spark.range(10000).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    out = approx_quantiles(df, ["g"], "v", [0.5, 0.9], accuracy=10000)
    rows = {r.g: r.quantiles for r in out.collect()}
    for g in (0, 1):
        p50, p90 = rows[g]
        assert abs(p50 - 5000) < 200
        assert abs(p90 - 9000) < 200


def test_cms_join_size_upper_bound_and_exact_when_wide(spark):
    """The inner-product estimate is ≥ the true join size always, and
    equals it when the width is collision-free for the key set."""
    from obsplus_spark.operators.sketches import cms_counters, cms_join_size

    a_rows = [("u1",)] * 5 + [("u2",)] * 3 + [("u3",)] * 1
    b_rows = [("u1",)] * 2 + [("u2",)] * 4 + [("u4",)] * 7
    a = spark.createDataFrame(a_rows, ["k"])
    b = spark.createDataFrame(b_rows, ["k"])
    exact = 5 * 2 + 3 * 4  # u1 + u2; u3/u4 unmatched
    # wide sketch: 4 keys into 4096 buckets — collision-free in every
    # row with near-certainty, so the bound is tight
    est_wide = cms_join_size(
        cms_counters(a, "k", depth=4, width=4096),
        cms_counters(b, "k", depth=4, width=4096),
    ).collect()[0]["est_join_size"]
    assert est_wide == exact
    # pathologically narrow sketch: collisions inflate, never deflate
    est_narrow = cms_join_size(
        cms_counters(a, "k", depth=2, width=2),
        cms_counters(b, "k", depth=2, width=2),
    ).collect()[0]["est_join_size"]
    assert est_narrow >= exact


def test_cms_join_size_self_join_f2(spark):
    """With a sketch joined to itself the bound covers the F2 moment
    (Σ cnt²) — the self-join-size / skew signal."""
    from obsplus_spark.operators.sketches import cms_counters, cms_join_size

    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    sk = cms_counters(df, "k", depth=4, width=2048)
    est = cms_join_size(sk, sk).collect()[0]["est_join_size"]
    assert est == 4 * 4 + 2 * 2 + 1


def test_cms_join_size_disjoint_is_zero(spark):
    """Sketches with no shared keys (and near-certainly no shared
    buckets) must bound the join at 0 — a depth row with zero bucket
    overlap is the tightest bound, not a missing row."""
    from obsplus_spark.operators.sketches import cms_counters, cms_join_size

    a = cms_counters(
        spark.createDataFrame([("only-in-a",)], ["k"]), "k",
        depth=4, width=4096,
    )
    b = cms_counters(
        spark.createDataFrame([("only-in-b",)], ["k"]), "k",
        depth=4, width=4096,
    )
    assert cms_join_size(a, b).collect()[0]["est_join_size"] == 0
