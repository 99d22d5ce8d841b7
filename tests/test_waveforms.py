"""Sample-level waveform operators."""

from __future__ import annotations

import math

import pytest

from obsplus_spark.operators.waveforms import (
    common_coverage,
    merge_traces,
    trim_traces,
)

SCHEMA = (
    "network string, station string, location string, channel string, "
    "starttime long, endtime long, sampling_period long, samples array<double>"
)


@pytest.fixture(scope="module")
def traces(spark):
    rows = [
        # UU.A..HHZ sp=10: [0,50) then adjacent [50,80) then gap then [200,230)
        ("UU", "A", "", "HHZ", 0, 50, 10, [0.0, 1.0, 2.0, 3.0, 4.0]),
        ("UU", "A", "", "HHZ", 50, 80, 10, [5.0, 6.0, 7.0]),
        ("UU", "A", "", "HHZ", 200, 230, 10, [20.0, 21.0, 22.0]),
        # overlap case: second row overwrites sample at t=40
        ("UU", "B", "", "HHZ", 0, 50, 10, [0.0, 0.0, 0.0, 0.0, 0.0]),
        ("UU", "B", "", "HHZ", 40, 60, 10, [9.0, 9.0]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_merge_traces_adjacent_and_gap(traces):
    out = merge_traces(traces.filter("station = 'A'")).collect()
    by_start = {r.starttime: r for r in out}
    # [0,80) merged from two adjacent segments; [200,230) separate
    assert set(by_start) == {0, 200}
    m = by_start[0]
    assert m.endtime == 80 and m.n_samples == 8
    assert m.samples == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]


def test_merge_traces_overlap_later_wins(traces):
    out = merge_traces(traces.filter("station = 'B'")).collect()
    assert len(out) == 1
    m = out[0]
    assert m.starttime == 0 and m.endtime == 60 and m.n_samples == 6
    # t=40 overwritten by the later row; t=50 from the later row
    assert m.samples == [0.0, 0.0, 0.0, 0.0, 9.0, 9.0]


def test_trim_traces(traces):
    out = trim_traces(traces.filter("station = 'A'"), 20, 60).collect()
    got = {(r.starttime, tuple(r.samples), r.trim_start, r.trim_end) for r in out}
    # row [0,50): keep samples at t=20,30,40 → [2,3,4]
    assert (0, (2.0, 3.0, 4.0), 20, 50) in got
    # row [50,80): keep t=50 → [5]
    assert (50, (5.0,), 50, 60) in got
    # row [200,230): no overlap → dropped
    assert all(r.starttime != 200 for r in out)


def test_common_coverage_sweep(spark):
    segs = spark.createDataFrame(
        [
            ("s1", 0, 100),
            ("s1", 200, 300),
            ("s2", 50, 250),
            ("s3", 0, 400),
        ],
        "seed_id string, seg_start long, seg_end long",
    )
    out = sorted(
        (r.window_start, r.window_end) for r in common_coverage(segs).collect()
    )
    # all three seeds covered only in [50,100) and [200,250)
    assert out == [(50, 100), (200, 250)]


def test_common_coverage_single_seed(spark):
    segs = spark.createDataFrame(
        [("s1", 0, 10)], "seed_id string, seg_start long, seg_end long"
    )
    out = [(r.window_start, r.window_end) for r in common_coverage(segs).collect()]
    assert out == [(0, 10)]
