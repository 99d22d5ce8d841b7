"""Z-order layout: interleave correctness + clustering effectiveness."""

import pyspark.sql.functions as F
import pytest

from obsplus_spark.plans.layout import (
    clustering_stats,
    write_zordered,
    zorder_key,
    zorder_repartition,
)


def _morton2(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_reference_morton(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x long, y long"
    )
    out = zorder_key(df, ["x", "y"], bits=3).collect()
    # uniform binning over 0..7 with 8 bins is the identity map, so the
    # key must equal the textbook Morton code of (x, y)
    for r in out:
        assert r._zkey == _morton2(r.x, r.y, 3), (r.x, r.y, r._zkey)


def test_zorder_clusters_both_dims(spark):
    n = 20_000
    df = spark.range(n).select(
        (F.col("id") % 141).cast("double").alias("a"),
        ((F.col("id") * 7919) % 139).cast("double").alias("b"),
    )
    files = 16

    def avg_span(frame):
        stats = clustering_stats(frame, ["a", "b"]).collect()
        sa = sum(r.a_max - r.a_min for r in stats) / len(stats)
        sb = sum(r.b_max - r.b_min for r in stats) / len(stats)
        return sa / 141 + sb / 139  # normalized combined span

    plain = df.repartition(files)
    zed = zorder_repartition(df, ["a", "b"], num_files=files, bits=8)
    # z-ordered partitions are tight in BOTH dimensions; random
    # round-robin partitions span nearly the full range of each
    assert avg_span(zed) < 0.5 * avg_span(plain)


def test_quantile_binning_under_skew(spark):
    # heavy-tailed column: uniform bins collapse most rows into one bin,
    # quantile bins keep partitions genuinely tight
    df = spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("a"),
        F.when(F.col("id") % 100 < 99, (F.col("id") % 50).cast("double"))
        .otherwise((F.col("id") % 1000) * 1000.0)
        .alias("b"),
    )
    zq = zorder_repartition(df, ["a", "b"], num_files=8, bits=8, binning="quantile")
    stats = clustering_stats(zq, ["a"]).collect()
    avg_a = sum(r.a_max - r.a_min for r in stats) / len(stats)
    assert avg_a < 70  # still clustered on `a` despite b's outliers


def test_write_zordered_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 31).cast("double").alias("a"),
        (F.col("id") % 37).cast("double").alias("b"),
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["a", "b"], num_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"k", "a", "b"}
    # same content
    assert back.agg(F.sum("k")).collect()[0][0] == 999 * 1000 // 2


def test_zorder_null_values_bin_to_sentinel(spark):
    """Regression (r6 review): NULL in one z-order column must not NULL
    the whole Morton key — the row keeps clustering on its non-null
    columns (NULL bins to the 0 sentinel)."""
    from obsplus_spark.plans.layout import zorder_key

    rows = [(None, 5.0, 1), (1.0, 5.0, 2), (100.0, 5.0, 3)]
    df = spark.createDataFrame(rows, "a double, b double, id long")
    out = zorder_key(df, ["a", "b"], bits=4)
    vals = {r["id"]: r["_zkey"] for r in out.collect()}
    assert vals[1] is not None
    # null a -> bin 0 -> same key as the minimum a value's row
    assert vals[1] == vals[2]


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed the same way join with ZERO exchanges — the
    co-located-join invariant the 100-TB bank-join story rests on."""
    from obsplus_spark.plans.layout import colocated_join, write_bucketed

    left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
    right = spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS w")
    # at test size the planner would auto-broadcast the right side and
    # skip the bucket layout entirely; disable it to get the plan two
    # 50-TB sides would get
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "bkt_l", ["k"], n_buckets=8,
                       sort_cols=["k"], path=str(tmp_path / "l"))
        write_bucketed(right, "bkt_r", ["k"], n_buckets=8,
                       sort_cols=["k"], path=str(tmp_path / "r"))
        joined = colocated_join(spark, "bkt_l", "bkt_r", ["k"])
        plan = _executed(joined)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
        # aggregation on the bucket key is exchange-free too
        agg = spark.table("bkt_l").groupBy("k").count()
        assert "Exchange" not in _executed(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_l")
        spark.sql("DROP TABLE IF EXISTS bkt_r")


def test_bucketed_join_mismatched_buckets_shuffles(spark, tmp_path):
    """Different bucket counts break co-location: the smaller side (or
    both) must re-exchange — documents the SAME-spec requirement."""
    from obsplus_spark.plans.layout import colocated_join, write_bucketed

    df = spark.range(0, 100).selectExpr("id AS k", "id AS v")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(df, "bkt_a", ["k"], n_buckets=4,
                       path=str(tmp_path / "a"))
        write_bucketed(df, "bkt_b", ["k"], n_buckets=6,
                       path=str(tmp_path / "b"))
        plan = _executed(colocated_join(spark, "bkt_a", "bkt_b", ["k"]))
        # a SHUFFLE exchange specifically — a BroadcastExchange would
        # also match bare "Exchange" and make this test vacuous
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_write_bucketed_validates(spark):
    from obsplus_spark.plans.layout import write_bucketed

    df = spark.range(3).selectExpr("id AS k")
    with pytest.raises(ValueError, match="non-empty"):
        write_bucketed(df, "t", [], 4)
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(df, "t", ["k"], 0)
