"""Schema enforcement (reference utils/pd.py:152-235, misc.py:326-376)."""

from __future__ import annotations

from pyspark.sql import types as T

from obsplus_spark.schemas import (
    EVENT_SCHEMA,
    WAVEFORM_INDEX_SCHEMA,
    cast_dtypes,
    normalize_nslc,
    order_columns,
    split_seed_id,
    with_seed_id,
)


def test_order_columns_fills_missing_and_drops_extras(spark):
    df = spark.createDataFrame(
        [("e1", 1.5, "junk")], "event_id string, magnitude double, extra string"
    )
    out = order_columns(df, EVENT_SCHEMA)
    assert [f.name for f in out.schema.fields] == [f.name for f in EVENT_SCHEMA.fields]
    row = out.first()
    assert row.event_id == "e1" and row.magnitude == 1.5 and row.latitude is None
    assert "extra" not in out.columns


def test_cast_dtypes(spark):
    df = spark.createDataFrame([("1", "2.5")], "starttime string, endtime string")
    out = cast_dtypes(df, WAVEFORM_INDEX_SCHEMA)
    assert isinstance(out.schema["starttime"].dataType, T.LongType)


def test_normalize_nslc(spark):
    df = spark.createDataFrame(
        [("UU", "None", "--", None), ("WY", "nan", "01", "HHZ")],
        "network string, station string, location string, channel string",
    )
    rows = normalize_nslc(df).collect()
    assert (rows[0].station, rows[0].location, rows[0].channel) == ("", "", "")
    assert (rows[1].station, rows[1].location, rows[1].channel) == ("", "01", "HHZ")


def test_seed_id_roundtrip(spark):
    df = spark.createDataFrame(
        [("UU", "TMU", "01", "HHZ"), ("WY", "YNR", "", "BHN")],
        "network string, station string, location string, channel string",
    )
    seeded = with_seed_id(df)
    assert {r.seed_id for r in seeded.collect()} == {"UU.TMU.01.HHZ", "WY.YNR..BHN"}
    back = split_seed_id(seeded.select("seed_id"))
    assert {(r.network, r.station, r.location, r.channel) for r in back.collect()} == {
        ("UU", "TMU", "01", "HHZ"),
        ("WY", "YNR", "", "BHN"),
    }
