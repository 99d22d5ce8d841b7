"""Join operators: interval-overlap (plain == bucketed), as-of, top-k, bulk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from obsplus_spark.operators.joins import (
    asof_join,
    bulk_request_join,
    interval_overlap_join,
    topk_per_group,
)


@pytest.fixture(scope="module")
def intervals(spark):
    left = spark.createDataFrame(
        [("k1", 0, 100), ("k1", 250, 300), ("k2", 0, 50), ("k1", 95, 105)],
        "key string, starttime long, endtime long",
    )
    right = spark.createDataFrame(
        [("k1", 90, 110), ("k1", 100, 200), ("k1", 299, 400), ("k2", 50, 60), ("k3", 0, 10)],
        "key string, starttime long, endtime long",
    )
    return left, right


def _pairs(df):
    return sorted(
        (r["l.starttime"], r["r.starttime"])
        for r in df.select(
            F.col("l.starttime").alias("l.starttime"),
            F.col("r.starttime").alias("r.starttime"),
        ).collect()
    )


def test_interval_join_plain(intervals):
    left, right = intervals
    out = interval_overlap_join(left, right, on=["key"])
    # k1 [0,100] × [90,110]; k1 [95,105] × [90,110] and [100,200];
    # k1 [250,300] × [299,400]; k2 [0,50] × nothing ([50,60] strict)
    assert _pairs(out) == [(0, 90), (95, 90), (95, 100), (250, 299)]


@pytest.mark.parametrize("bucket", [7, 100, 1000])
def test_interval_join_bucketed_matches_plain(intervals, bucket):
    """The scale path (time-bucket equi-join) must be result-identical to
    the plain non-equi join, for bucket sizes smaller/equal/larger than
    the intervals — and emit each pair exactly once."""
    left, right = intervals
    plain = _pairs(interval_overlap_join(left, right, on=["key"]))
    bucketed = _pairs(
        interval_overlap_join(left, right, on=["key"], bucket=bucket)
    )
    assert bucketed == plain


def test_interval_join_no_keys(spark):
    left = spark.createDataFrame([(0, 10)], "starttime long, endtime long")
    right = spark.createDataFrame(
        [(5, 6), (10, 20)], "starttime long, endtime long"
    )
    out = interval_overlap_join(left, right, broadcast_left=True)
    assert out.count() == 1  # [10,20) does not overlap [0,10) — strict


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0), ("B", 3, 20.0)],
        "sym string, ts long, px double",
    )
    trades = spark.createDataFrame(
        [("A", 4, 1), ("A", 5, 2), ("A", 100, 3), ("B", 1, 4), ("C", 7, 5)],
        "sym string, ts long, trade_id int",
    )
    out = asof_join(
        trades, quotes, on=["sym"], right_values=["px"]
    ).collect()
    got = {r.trade_id: (r.px_right, r.ts_matched) for r in out}
    assert got[1] == (10.0, 1)   # last quote ≤ 4
    assert got[2] == (11.0, 5)   # equal timestamp matches (inclusive)
    assert got[3] == (12.0, 9)
    assert got[4] == (None, None)  # B trade before any B quote
    assert got[5] == (None, None)  # no C quotes at all


def test_asof_join_strict_and_tolerance(spark):
    quotes = spark.createDataFrame(
        [("A", 5, 11.0)], "sym string, ts long, px double"
    )
    trades = spark.createDataFrame(
        [("A", 5, 1), ("A", 50, 2)], "sym string, ts long, trade_id int"
    )
    strict = asof_join(
        trades, quotes, on=["sym"], right_values=["px"], strict=True
    ).collect()
    assert {r.trade_id: r.px_right for r in strict} == {1: None, 2: 11.0}
    tol = asof_join(
        trades, quotes, on=["sym"], right_values=["px"], tolerance=10
    ).collect()
    assert {r.trade_id: r.px_right for r in tol} == {1: 11.0, 2: None}


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    n_r, n_l = 300, 200
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n_r),
            "ts": rng.randint(0, 10_000, n_r),
            "v": rng.rand(n_r),
        }
    ).drop_duplicates(["k", "ts"])
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 6, n_l),
            "ts": rng.randint(0, 10_000, n_l),
            "lid": np.arange(n_l),
        }
    )
    expected = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).set_index("lid")["v"]

    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        right_values=["v"],
    ).collect()
    for r in out:
        exp = expected.loc[r.lid]
        if pd.isna(exp):
            assert r.v_right is None
        else:
            assert abs(r.v_right - exp) < 1e-12


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    out = topk_per_group(df, ["k"], [F.col("v").desc()], k=2, keep_rank=True)
    got = sorted((r.k, r.v, r.rn) for r in out.collect())
    assert got == [("a", 3, 1), ("a", 2, 2), ("b", 9, 1)] or got == [
        ("a", 2, 2),
        ("a", 3, 1),
        ("b", 9, 1),
    ]


def test_bulk_request_join_exact_and_glob(spark, waveform_index):
    requests = spark.createDataFrame(
        [
            ("UU", "A", "", "HHZ", 0, 50),       # exact → adjacency fast path
            ("UU", "*", "", "HH?", 500, 2000),   # glob → regex path
            ("XX", "Y", "", "ZZZ", 0, 10**9),    # no such seed
        ],
        "network string, station string, location string, channel string, "
        "starttime long, endtime long",
    )
    out = bulk_request_join(waveform_index, requests).collect()
    seeds = {(r.network, r.station, r.channel, r.starttime) for r in out}
    assert ("UU", "A", "HHZ", 0) in seeds            # exact hit
    assert ("UU", "A", "HHZ", 500) in seeds          # glob hit (HHZ)
    assert ("UU", "B", "HHN", 900) in seeds          # glob hit (HHN, overlap)
    assert all(r.network != "XX" for r in out)


def test_salted_aggregate_equals_plain(spark):
    """Salting is internal: results must equal the plain groupBy even on a
    pathologically hot key."""
    from obsplus_spark.operators.joins import salted_aggregate

    rows = [("hot", i) for i in range(500)] + [("cold", 1), ("cold", 7)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = salted_aggregate(
        df,
        keys=["k"],
        aggs={
            "n": (F.count, F.sum, "v"),
            "mn": (F.min, F.min, "v"),
            "mx": (F.max, F.max, "v"),
        },
        salt=8,
    )
    got = {r.k: (r.n, r.mn, r.mx) for r in out.collect()}
    assert got == {"hot": (500, 0, 499), "cold": (2, 1, 7)}


def test_asof_join_null_payload_atomic(spark):
    """ADVICE r1: the matched right row wins atomically — a NULL in the
    most-recent right row must surface as NULL, not an older row's value."""
    from obsplus_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 100, "L1")], "k string, ts long, lbl string")
    right = spark.createDataFrame(
        [("k", 10, "old-val"), ("k", 50, None)],  # newest right row has NULL
        "k string, ts long, val string",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()[0]
    assert out.ts_matched == 50          # matched the newest row...
    assert out.val_right is None         # ...and carried ITS null, atomically


def test_interval_overlap_join_bucket_requires_inner(spark):
    from obsplus_spark.operators.joins import interval_overlap_join

    df = spark.createDataFrame([("k", 0, 10)], "k string, starttime long, endtime long")
    with pytest.raises(ValueError, match="inner"):
        interval_overlap_join(df, df, on=["k"], bucket=100, how="left")


def test_bulk_request_filter_matches_join(spark):
    """The literal-list predicate path and the DataFrame join path must
    select the same index rows."""
    from obsplus_spark.operators.joins import bulk_request_filter, bulk_request_join

    index = spark.createDataFrame(
        [
            ("UU", "STA1", "", "HHZ", 0, 100),
            ("UU", "STA2", "", "HHZ", 0, 100),
            ("XX", "STA1", "", "EHZ", 50, 150),
            ("UU", "STA9", "", "HHZ", 500, 600),  # out of window
        ],
        "network string, station string, location string, channel string, "
        "starttime long, endtime long",
    )
    reqs = [
        ("UU", "STA1", "", "HHZ", 0, 100),   # exact
        ("*", "STA1", "", "?HZ", 40, 160),   # glob
    ]
    via_filter = {tuple(r) for r in bulk_request_filter(index, reqs).collect()}
    req_df = spark.createDataFrame(
        reqs,
        "network string, station string, location string, channel string, "
        "starttime long, endtime long",
    )
    via_join = {tuple(r) for r in bulk_request_join(index, req_df).collect()}
    assert via_filter == via_join
    assert {r[1] for r in via_filter} == {"STA1"}


def test_salted_aggregate_count_skips_nulls(spark):
    """Regression (r6 review): F.count in the partial phase must keep
    SQL count(col) semantics (non-null only) — the old lit(1) rewrite
    counted rows."""
    import pyspark.sql.functions as F

    from obsplus_spark.operators.joins import salted_aggregate

    df = spark.createDataFrame(
        [("k", 1.0), ("k", None), ("k", 3.0)], "k string, x double"
    )
    got = salted_aggregate(
        df, ["k"], {"n": (F.count, F.sum, "x")}, salt=4
    ).collect()[0]
    want = df.groupBy("k").agg(F.count("x").alias("n")).collect()[0]
    assert got["n"] == want["n"] == 2
