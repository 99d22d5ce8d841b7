"""Property-based tests: Spark operators vs pure-Python reference models.

The reference repo has no property tests (SURVEY §5); these close that gap
for the operators with the subtlest semantics — gaps-and-islands under
overlapping intervals, and the bucketed interval join. Each property runs
a handful of examples (Spark jobs are ~0.5 s each); shrinking still works.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from obsplus_spark.operators.gaps import gaps_df, segments_df
from obsplus_spark.operators.joins import interval_overlap_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=300),
        st.integers(min_value=1, max_value=80),
    ).map(lambda t: (t[0], t[0] + t[1])),
    min_size=1,
    max_size=25,
)


def ref_gaps(rows: list[tuple[int, int]], min_gap: int) -> list[tuple[int, int]]:
    """Reference model: the wavebank.py:427-485 algorithm, verbatim."""
    rows = sorted(rows)
    out = []
    cum_end = rows[0][1]
    for (s0, e0), (s1, _e1) in zip(rows, rows[1:]):
        if cum_end + min_gap < s1:
            out.append((cum_end, s1))
        cum_end = max(cum_end, _e1)
    return out


def ref_islands(rows: list[tuple[int, int]], min_gap: int) -> list[tuple[int, int]]:
    rows = sorted(rows)
    out = []
    cur_s, cur_e = rows[0]
    for s, e in rows[1:]:
        if cur_e + min_gap < s:
            out.append((cur_s, cur_e))
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    out.append((cur_s, cur_e))
    return out


@given(rows=intervals_strategy, min_gap=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_gaps_matches_reference_model(spark, rows, min_gap):
    df = spark.createDataFrame(
        [("k",) + r for r in rows], "key string, starttime long, endtime long"
    )
    got = sorted(
        (r.gap_start, r.gap_end)
        for r in gaps_df(
            df, keys=["key"], min_gap=min_gap, sampling_period_col=None
        ).collect()
    )
    assert got == ref_gaps(rows, min_gap)


@given(rows=intervals_strategy, min_gap=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_segments_matches_reference_model(spark, rows, min_gap):
    df = spark.createDataFrame(
        [("k",) + r for r in rows], "key string, starttime long, endtime long"
    )
    got = sorted(
        (r.seg_start, r.seg_end)
        for r in segments_df(
            df, keys=["key"], min_gap=min_gap, sampling_period_col=None
        ).collect()
    )
    assert got == ref_islands(rows, min_gap)


@given(
    left=intervals_strategy,
    right=intervals_strategy,
    bucket=st.integers(min_value=1, max_value=200),
)
@settings(**SETTINGS)
def test_bucketed_interval_join_matches_bruteforce(spark, left, right, bucket):
    ldf = spark.createDataFrame(
        [(i,) + r for i, r in enumerate(left)],
        "lid long, starttime long, endtime long",
    )
    rdf = spark.createDataFrame(
        [(j,) + r for j, r in enumerate(right)],
        "rid long, starttime long, endtime long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(ldf, rdf, bucket=bucket)
        .selectExpr("l.lid AS lid", "r.rid AS rid")
        .collect()
    )
    expected = sorted(
        (i, j)
        for i, (ls, le) in enumerate(left)
        for j, (rs, re_) in enumerate(right)
        if ls < re_ and le > rs
    )
    assert got == expected


def ref_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


pairs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=25,
)


@given(pairs=pairs_strategy)
@settings(**SETTINGS)
def test_dedup_clusters_matches_union_find(spark, pairs):
    from obsplus_spark.operators.dedup import dedup_clusters

    df = spark.createDataFrame(pairs, "id1 long, id2 long")
    got = {
        r.id: r.cluster_id
        for r in dedup_clusters(df, max_iterations=31).collect()
    }
    assert got == ref_components(pairs)
