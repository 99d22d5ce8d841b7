"""Gaps-and-islands correctness (reference wavebank.py:427-577 semantics)."""

from __future__ import annotations

from obsplus_spark.operators.availability import availability, uptime
from obsplus_spark.operators.gaps import gaps_df, segments_df, sessionize

NSLC = ["network", "station", "location", "channel"]


def _key(r):
    return (r.network, r.station, r.location, r.channel, r.sampling_period)


def test_gaps_running_max_and_min_gap(waveform_index):
    """min_gap = 1.5×sp: adjacent segments (diff == sp) are NOT gaps; the
    overlap-swallowed row must not produce a bogus gap (running max)."""
    out = gaps_df(waveform_index).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(_key(r), []).append((r.gap_start, r.gap_end))
    # UU.A HHZ sp=10: 100→110 is NOT a gap (10 < 1.5*10 is false: gap needs
    # cum_end + 15 < next → 100+15 < 110 is false). 200→500 is. The
    # overlapping trio 500-700 yields no internal gap.
    assert by_key[("UU", "A", "", "HHZ", 10)] == [(200, 500)]
    # sp=20 group: 50→200 (50+30 < 200)
    assert by_key[("UU", "A", "", "HHZ", 20)] == [(50, 200)]
    # UU.B: contiguous, overlapping — no gaps at all
    assert ("UU", "B", "", "HHN", 10) not in by_key


def test_gaps_duplicate_rows_no_false_positive(waveform_index):
    """Exact duplicate rows must not create zero-length gaps."""
    out = gaps_df(waveform_index).collect()
    assert all(r.gap_duration > 0 for r in out)


def test_segments_islands(waveform_index):
    out = segments_df(waveform_index).collect()
    segs = {}
    for r in out:
        segs.setdefault(_key(r), []).append((r.seg_start, r.seg_end, r.n_rows))
    a10 = sorted(segs[("UU", "A", "", "HHZ", 10)])
    # islands: [0,200] (2 rows: adjacent within min_gap), [500,700] (4 rows)
    assert a10 == [(0, 200, 2), (500, 700, 4)]
    assert sorted(segs[("UU", "B", "", "HHN", 10)]) == [(0, 2000, 2)]


def test_sessionize_ids_monotonic(waveform_index):
    out = sessionize(
        waveform_index, sampling_period_col="sampling_period"
    ).collect()
    for r in out:
        assert r.session_id >= 1


def test_availability_and_uptime(waveform_index):
    av = {
        (r.network, r.station, r.location, r.channel): (r.starttime, r.endtime)
        for r in availability(waveform_index).collect()
    }
    assert av[("UU", "A", "", "HHZ")] == (0, 700)
    up = uptime(waveform_index, sampling_period_col="sampling_period").collect()
    rows = {
        (r.network, r.station, r.location, r.channel): (r.duration, r.gap_duration)
        for r in up
    }
    # UU.A: span 700; gaps 300 (sp=10 group) + 150 (sp=20 group)
    assert rows[("UU", "A", "", "HHZ")] == (700, 450)
    # UU.B: no gaps → coalesced 0
    assert rows[("UU", "B", "", "HHN")] == (2000, 0)
    for r in up:
        assert 0.0 < r.availability <= 1.0


def test_gaps_empty_input(spark):
    empty = spark.createDataFrame(
        [],
        "network string, station string, location string, channel string, "
        "starttime long, endtime long, sampling_period long",
    )
    assert gaps_df(empty).count() == 0


def test_segments_pre_merge_exact_at_ns_epoch_scale(spark):
    """Regression (r6 review): the pre-merge bucket id must use integer
    division — double division of ~1.7e18 ns starts rounds near bucket
    boundaries and can fuse intervals the direct path keeps apart."""
    from obsplus_spark.operators.gaps import segments_df

    base = 1_700_000_000_000_000_000  # ns epoch, above 2^53
    gap = 1_000_000_000
    rows = [
        ("A", base + 1, base + 2),
        # starts exactly gap + 200 ns after the FIRST interval's end:
        # must remain a separate segment
        ("A", base + 2 + gap + 200, base + 2 + gap + 300),
    ]
    df = spark.createDataFrame(rows, "k string, starttime long, endtime long")
    direct = segments_df(
        df, keys=["k"], min_gap=gap, sampling_period_col=None
    ).collect()
    pre = segments_df(
        df, keys=["k"], min_gap=gap, sampling_period_col=None, pre_merge=True
    ).collect()
    assert len(direct) == len(pre) == 2
    assert sorted((r.seg_start, r.seg_end) for r in direct) == sorted(
        (r.seg_start, r.seg_end) for r in pre
    )
