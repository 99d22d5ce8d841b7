"""Station queries + inventory tree round-trip."""

from __future__ import annotations

import pytest

from obsplus_spark.operators.stations import (
    df_to_inventory,
    get_stations,
    inventory_to_df,
)

NS = 1_000_000_000
STATION_COLS = (
    "network string, station string, location string, channel string, "
    "latitude double, longitude double, elevation double, depth double, "
    "sample_rate double, start_date long, end_date long"
)


@pytest.fixture(scope="module")
def stations(spark):
    rows = [
        ("UU", "TMU", "", "HHZ", 40.0, -111.0, 1500.0, 0.0, 100.0, 0, 1000 * NS),
        ("UU", "TMU", "", "HHN", 40.0, -111.0, 1500.0, 0.0, 100.0, 0, 1000 * NS),
        # second epoch, open-ended
        ("UU", "TMU", "", "HHZ", 40.0, -111.0, 1500.0, 0.0, 100.0, 1000 * NS, None),
        ("WY", "YNR", "01", "BHZ", 44.0, -110.0, 2000.0, 0.0, 40.0, 500 * NS, 2000 * NS),
    ]
    return spark.createDataFrame(rows, STATION_COLS)


def test_case_insensitive_glob(stations):
    out = get_stations(stations, network="uu", channel="hh?")
    assert out.count() == 3


def test_date_operators(stations):
    # active at/after t=1500: first TMU epoch (ended 1000) drops
    active = get_stations(stations, starttime=1500 * NS)
    assert {(r.station, r.start_date) for r in active.collect()} == {
        ("TMU", 1000 * NS),
        ("YNR", 500 * NS),
    }
    # startbefore strict
    sb = get_stations(stations, startbefore=500 * NS)
    assert all(r.start_date < 500 * NS for r in sb.collect())
    # endafter: open epochs count as +inf
    ea = get_stations(stations, endafter=5000 * NS)
    assert {r.start_date for r in ea.collect()} == {1000 * NS}


def test_latlon_range(stations):
    out = get_stations(stations, minlatitude=42.0)
    assert {r.station for r in out.collect()} == {"YNR"}


def test_inventory_roundtrip(stations):
    inv = df_to_inventory(stations)
    assert inv.count() == 2  # two networks
    flat = inventory_to_df(inv)
    a = sorted(
        (r.network, r.station, r.location, r.channel, r.start_date)
        for r in stations.collect()
    )
    b = sorted(
        (r.network, r.station, r.location, r.channel, r.start_date)
        for r in flat.collect()
    )
    assert a == b
    # seed_id materialized on the way out
    assert {r.seed_id for r in flat.collect()} >= {"UU.TMU..HHZ", "WY.YNR.01.BHZ"}


def test_stations_from_stream(spark):
    """stations/pd.py:111-128: NSLC groupBy, min start / max end epochs."""
    from obsplus_spark.operators.stations import stations_from_stream

    rows = [
        ("UU", "S1", "", "HHZ", 100, 200),
        ("UU", "S1", "", "HHZ", 150, 400),
        ("UU", "S2", "01", "ENZ", 50, 80),
    ]
    df = spark.createDataFrame(
        rows,
        "network string, station string, location string, channel string, "
        "starttime long, endtime long",
    )
    out = {r.seed_id: r for r in stations_from_stream(df).collect()}
    assert len(out) == 2
    assert out["UU.S1..HHZ"].start_date == 100
    assert out["UU.S1..HHZ"].end_date == 400
    assert out["UU.S2.01.ENZ"].start_date == 50
    assert out["UU.S2.01.ENZ"].latitude is None
