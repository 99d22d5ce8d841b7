"""Predicate compiler semantics (reference utils/pd.py:336-449, utils/bank.py:326-409)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from obsplus_spark.functions.strings import (
    any_glob_match,
    glob_match,
    glob_to_regex,
    is_exact,
    zero_pad_code,
)
from obsplus_spark.plans.predicates import (
    compile_filters,
    dateline_longitude_predicate,
    fdsn_event_filter,
    interval_overlap,
    range_predicates,
)
from obsplus_spark.schemas import LARGEDT_NS, SMALLDT_NS


@pytest.fixture(scope="module")
def strings_df(spark):
    return spark.createDataFrame(
        [("HHZ",), ("HHN",), ("BHZ",), ("EHZ",), ("H.Z",), ("",)], ["channel"]
    )


def _vals(df, pred):
    return sorted(r.channel for r in df.filter(pred).collect())


def test_glob_star_qmark_class(strings_df):
    assert _vals(strings_df, glob_match("channel", "HH?")) == ["HHN", "HHZ"]
    assert _vals(strings_df, glob_match("channel", "*Z")) == ["BHZ", "EHZ", "H.Z", "HHZ"]
    assert _vals(strings_df, glob_match("channel", "[HB]HZ")) == ["BHZ", "HHZ"]
    # regex metachars in the glob are literal
    assert _vals(strings_df, glob_match("channel", "H.Z")) == ["H.Z"]


def test_glob_exact_fast_path():
    assert is_exact("HHZ") and not is_exact("HH?")
    # exact patterns must not go through regex at all
    assert glob_to_regex("a[b]c") != "a[b]c"


def test_glob_case_insensitive(strings_df):
    assert _vals(strings_df, glob_match("channel", "hh?", case_insensitive=True)) == [
        "HHN",
        "HHZ",
    ]


def test_any_glob_mixes_exact_and_wild(strings_df):
    pred = any_glob_match("channel", ["BHZ", "HH*"])
    assert _vals(strings_df, pred) == ["BHZ", "HHN", "HHZ"]


def test_compile_filters_dispatch(spark):
    df = spark.createDataFrame(
        [("UU", "TMU", 1.0), ("WY", "YNR", 2.0), ("UU", "NOQ", 3.0)],
        ["network", "station", "mag"],
    )
    # str → glob; collection → isin; scalar → ==
    pred = compile_filters(network="U*", station=["TMU", "NOQ"])
    assert {r.station for r in df.filter(pred).collect()} == {"TMU", "NOQ"}
    assert compile_filters() is None
    pred2 = compile_filters(mag=2.0)
    assert [r.station for r in df.filter(pred2).collect()] == ["YNR"]


def test_range_predicates_validation():
    with pytest.raises(ValueError):
        range_predicates(["magnitude"], weird=1)
    with pytest.raises(ValueError):
        range_predicates(["magnitude"], minlatitude=1)  # unknown column
    assert len(range_predicates(["magnitude"], minmagnitude=1, maxmagnitude=2)) == 2


def test_interval_overlap_is_overlap_not_containment(spark):
    df = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 30), (-5, 2)], ["starttime", "endtime"]
    )
    got = sorted(
        (r.starttime, r.endtime)
        for r in df.filter(interval_overlap(1, 9)).collect()
    )
    # rows merely *overlapping* [1,9] qualify (reference overlap semantics)
    assert got == [(-5, 2), (0, 10), (5, 15)]
    # open-ended: everything
    assert df.filter(interval_overlap(None, None)).count() == 4
    # buffer widens the window: [11, 23] overlaps (5,15) and (20,30)
    assert df.filter(interval_overlap(16, 18, buffer_ns=5)).count() == 2


def test_dateline_predicate(spark):
    df = spark.createDataFrame(
        [(179.0,), (-179.0,), (0.0,), (185.0,)], ["longitude"]
    )
    # crossing box 170 → -170 keeps ±179 and 185 (wraps to -175)
    got = sorted(
        r.longitude
        for r in df.filter(dateline_longitude_predicate(170, -170)).collect()
    )
    assert got == [-179.0, 179.0, 185.0]
    # normal box
    got2 = sorted(
        r.longitude
        for r in df.filter(dateline_longitude_predicate(-10, 10)).collect()
    )
    assert got2 == [0.0]


def test_fdsn_event_filter_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (100, 40.0, -111.0, 5.0, 2.5, "e1", 150),
            (200, 41.0, -112.0, 6.0, 3.5, "e2", 250),
            (300, 42.0, -113.0, 7.0, 4.5, "e3", 350),
            (None, 43.0, -114.0, 8.0, 5.5, "e4", 450),
        ],
        "time long, latitude double, longitude double, depth double, "
        "magnitude double, event_id string, updated long",
    )
    out = fdsn_event_filter(df, starttime=150, minmagnitude=3.0)
    assert {r.event_id for r in out.collect()} == {"e2", "e3"}
    # endtime-only query excludes null times (NaT guard)
    out2 = fdsn_event_filter(df, endtime=250)
    assert {r.event_id for r in out2.collect()} == {"e1", "e2"}
    out3 = fdsn_event_filter(df, eventid=["e1", "e4"])
    assert {r.event_id for r in out3.collect()} == {"e1", "e4"}
    assert fdsn_event_filter(df, minmagnitude=0, limit=2).count() == 2


def test_zero_pad_code(spark):
    df = spark.createDataFrame([("1",), ("01",), ("UU",)], ["code"])
    got = [r[0] for r in df.select(zero_pad_code("code")).collect()]
    assert got == ["01", "01", "UU"]


def test_sentinels():
    assert SMALLDT_NS < 0 < LARGEDT_NS


def test_glob_to_regex_expr_matches_python_twin(spark):
    """The in-plan SQL glob→regex translation must agree with the
    Python/fnmatch path on every construct seed codes use."""
    from obsplus_spark.functions.strings import glob_to_regex_expr

    patterns = ["*", "BH?", "[!EN]*", "UU", "a.b", "L[01]", "B*Z", "?H[AE]",
                # wildcards INSIDE a class stay literal; unpaired/empty
                # brackets demote to literals; Java class metachars
                # ('[', '&&') escape; ranges and negated ranges work
                "L[?]", "[a*]b", "x[", "ab[cd", "a[]b", "[[]x", "a+b",
                "(x)", "a|b", "[a-c]z", "[!a-c]z", "N[&]o"]
    values = ["BHZ", "BHN", "EHZ", "UU", "a.b", "axb", "L0", "L1", "EN",
              "BAZ", "BZ", "CHA", "XHE", "L?", "L.", "ab", "a*", "xb",
              "x[", "ab[cd", "a]b", "[x", "a+b", "(x)", "a|b", "az",
              "bz", "dz", "N&o", "&o"]
    import fnmatch

    rows = [(p, v) for p in patterns for v in values]
    df = spark.createDataFrame(rows, "pat string, val string")
    got = {
        (r.pat, r.val): r.m
        for r in df.selectExpr(
            "pat", "val", f"regexp_like(val, {glob_to_regex_expr('pat')}) AS m"
        ).collect()
    }
    for p, v in rows:
        assert got[(p, v)] == fnmatch.fnmatchcase(v, p), (p, v)


def test_full_globe_longitude_range_matches_everything(spark):
    """Regression (r6 review): minlongitude=-180, maxlongitude=180 (the
    'no longitude filter' query) wrapped both bounds to 180 and matched
    NOTHING."""
    from obsplus_spark.plans.predicates import fdsn_event_filter

    df = spark.createDataFrame(
        [(1, -179.0), (2, 0.0), (3, 179.9)], "event_id long, longitude double"
    )
    out = fdsn_event_filter(df, minlongitude=-180.0, maxlongitude=180.0)
    assert out.count() == 3
