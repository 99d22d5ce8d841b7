from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from obsplus_spark import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def waveform_index(spark):
    """Synthetic waveform-index fixture (FIXTURES.md §1): per seed_id runs
    with exactly-adjacent segments, real gaps, overlapping segments,
    duplicates, and multiple sampling periods. Times are small ints for
    hand-checkability (units: ns)."""
    rows = [
        # network, station, location, channel, starttime, endtime, sampling_period
        # UU.A..HHZ sp=10: adjacent (end+sp == next start), then gap, then overlap
        ("UU", "A", "", "HHZ", 0, 100, 10),
        ("UU", "A", "", "HHZ", 110, 200, 10),   # adjacent: 100+10=110 → no gap
        ("UU", "A", "", "HHZ", 500, 600, 10),   # gap 200→500
        ("UU", "A", "", "HHZ", 550, 580, 10),   # fully swallowed (overlap)
        ("UU", "A", "", "HHZ", 590, 700, 10),   # overlaps previous end 600
        ("UU", "A", "", "HHZ", 590, 700, 10),   # exact duplicate row
        # UU.A..HHZ sp=20: separate group (different sampling period)
        ("UU", "A", "", "HHZ", 0, 50, 20),
        ("UU", "A", "", "HHZ", 200, 300, 20),   # gap 50→200
        # UU.B..HHN: fully contiguous
        ("UU", "B", "", "HHN", 0, 1000, 10),
        ("UU", "B", "", "HHN", 900, 2000, 10),
    ]
    return spark.createDataFrame(
        rows,
        "network string, station string, location string, channel string, "
        "starttime long, endtime long, sampling_period long",
    )
