"""Fetcher: cross-domain event-window extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from obsplus_spark.structures.fetcher import Fetcher

NS = 1_000_000_000


@pytest.fixture(scope="module")
def domains(spark):
    events = spark.createDataFrame(
        [("e1", 1000 * NS), ("e2", 5000 * NS), ("e3", None)],
        "event_id string, time long",
    )
    stations = spark.createDataFrame(
        [
            # STA1 active the whole time
            ("UU", "STA1", "", "HHZ", 0, None),
            # STA2 epoch ends before e2's window → pruned for e2
            ("UU", "STA2", "", "HHZ", 0, 2000 * NS),
        ],
        "network string, station string, location string, channel string, "
        "start_date long, end_date long",
    )
    index = spark.createDataFrame(
        [
            ("UU", "STA1", "", "HHZ", 900 * NS, 1200 * NS, "f1"),
            ("UU", "STA1", "", "HHZ", 4000 * NS, 6000 * NS, "f2"),
            ("UU", "STA2", "", "HHZ", 0, 10_000 * NS, "f3"),
        ],
        "network string, station string, location string, channel string, "
        "starttime long, endtime long, path string",
    )
    picks = spark.createDataFrame(
        [
            ("e1", "pk1", 1100 * NS, "P", "STA1"),
            ("e1", "pk2", 1050 * NS, "P", "STA1"),  # earlier → first pick
            ("e1", "pk3", 1200 * NS, "S", "STA1"),
        ],
        "event_id string, resource_id string, time long, phase_hint string, "
        "station string",
    )
    return events, stations, index, picks


def test_origin_windows_and_pruning(domains):
    events, stations, index, picks = domains
    f = Fetcher(events, stations, index, picks)
    wins = f.event_windows(100 * NS, 200 * NS).collect()
    keys = {(r.event_id, r.station) for r in wins}
    # e3 (null time) never appears; STA2 pruned for e2 (epoch ended)
    assert ("e1", "STA1") in keys and ("e1", "STA2") in keys
    assert ("e2", "STA1") in keys and ("e2", "STA2") not in keys
    assert all(r.event_id != "e3" for r in wins)


@pytest.mark.parametrize("bucket", [None, 1000 * NS])
def test_yield_event_waveforms(domains, bucket):
    events, stations, index, picks = domains
    f = Fetcher(events, stations, index, picks)
    out = f.yield_event_waveforms(100 * NS, 200 * NS, bucket=bucket).collect()
    got = {(r.event_id, r.path) for r in out}
    # e1 window [900,1200] → f1 (STA1) and f3 (STA2)
    # e2 window [4900,5200] → f2 (STA1); STA2 pruned
    assert got == {("e1", "f1"), ("e1", "f3"), ("e2", "f2")}


def test_phase_reference_first_pick(domains):
    events, stations, index, picks = domains
    f = Fetcher(events, stations, index, picks)
    wins = f.event_windows(50 * NS, 50 * NS, reference="p").collect()
    # first P pick at STA1 = 1050; the window centers there
    sta1 = [r for r in wins if r.station == "STA1" and r.event_id == "e1"]
    assert len(sta1) == 1
    assert sta1[0].starttime == 1000 * NS and sta1[0].endtime == 1100 * NS


def test_unknown_reference_raises(domains):
    events, stations, index, picks = domains
    f = Fetcher(events, stations, index, picks)
    with pytest.raises(ValueError):
        f.event_windows(1, 1, reference="bogus")
