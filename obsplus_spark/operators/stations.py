"""Station layer: FDSN get_stations filters + inventory tree rebuild.

- :func:`get_stations` — the reference's kwarg→operator table
  (``stations/get_stations.py:28-134``): date-boundary operators
  (``startbefore``/``startafter``/``starttime``/``endtime``/``endbefore``/
  ``endafter``), lat/lon ranges, and **case-insensitive** NSLC globs (the
  one place the reference is case-insensitive, ``get_stations.py:22-24``).
- :func:`df_to_inventory` — the inverse extractor
  (``utils/stations.py:49-326``): channel rows → nested
  Network→Station→Channel tree, as two ``collect_list(struct)`` rollups.
- :func:`inventory_to_df` — the flattening direction (explode twice).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from obsplus_spark.functions.strings import glob_match
from obsplus_spark.schemas import LARGEDT_NS, SMALLDT_NS

_CHANNEL_FIELDS = [
    "location",
    "channel",
    "latitude",
    "longitude",
    "elevation",
    "depth",
    "sample_rate",
    "start_date",
    "end_date",
]


def get_stations(
    df: DataFrame,
    *,
    network: str | None = None,
    station: str | None = None,
    location: str | None = None,
    channel: str | None = None,
    starttime: int | None = None,
    endtime: int | None = None,
    startbefore: int | None = None,
    startafter: int | None = None,
    endbefore: int | None = None,
    endafter: int | None = None,
    minlatitude: float | None = None,
    maxlatitude: float | None = None,
    minlongitude: float | None = None,
    maxlongitude: float | None = None,
) -> DataFrame:
    """FDSN station query over channel-level rows.

    Date semantics follow the reference's operator map exactly
    (``get_stations.py:28-60``): ``starttime`` keeps epochs **active at or
    after** it (``end_date >= starttime``, open epochs always active);
    ``endtime`` keeps epochs started by then (``start_date <= endtime``);
    the ``*before``/``*after`` kwargs compare the respective boundary
    strictly. Globs are case-insensitive.
    """
    preds: list[Column] = []
    for col, pat in (
        ("network", network),
        ("station", station),
        ("location", location),
        ("channel", channel),
    ):
        if pat is not None:
            preds.append(glob_match(col, pat, case_insensitive=True))

    open_end = F.coalesce(F.col("end_date"), F.lit(LARGEDT_NS))
    open_start = F.coalesce(F.col("start_date"), F.lit(SMALLDT_NS))
    if starttime is not None:
        preds.append(open_end >= int(starttime))
    if endtime is not None:
        preds.append(open_start <= int(endtime))
    if startbefore is not None:
        preds.append(open_start < int(startbefore))
    if startafter is not None:
        preds.append(open_start > int(startafter))
    if endbefore is not None:
        preds.append(open_end < int(endbefore))
    if endafter is not None:
        preds.append(open_end > int(endafter))
    for p in (
        (F.col("latitude") > minlatitude) if minlatitude is not None else None,
        (F.col("latitude") < maxlatitude) if maxlatitude is not None else None,
        (F.col("longitude") > minlongitude) if minlongitude is not None else None,
        (F.col("longitude") < maxlongitude) if maxlongitude is not None else None,
    ):
        if p is not None:
            preds.append(p)

    out = df
    for p in preds:
        out = out.filter(p)
    return out


def df_to_inventory(df: DataFrame) -> DataFrame:
    """Channel rows → nested inventory tree (Network→Station→Channel).

    Mirror of ``utils/stations.py:49-326``: group channels under stations
    (with station-level attributes = first channel's), stations under
    networks. Arrays are sorted for determinism. Two shuffles total, both
    on low-cardinality keys.
    """
    chan_struct = F.struct(*[F.col(c) for c in _CHANNEL_FIELDS])
    stations = (
        df.groupBy("network", "station")
        .agg(
            F.min("latitude").alias("latitude"),
            F.min("longitude").alias("longitude"),
            F.min("start_date").alias("start_date"),
            F.max(F.coalesce(F.col("end_date"), F.lit(LARGEDT_NS))).alias(
                "end_date"
            ),
            F.sort_array(F.collect_list(chan_struct)).alias("channels"),
        )
    )
    sta_struct = F.struct(
        F.col("station").alias("code"),
        "latitude",
        "longitude",
        "start_date",
        "end_date",
        "channels",
    )
    return (
        stations.groupBy("network")
        .agg(F.sort_array(F.collect_list(sta_struct)).alias("stations"))
        .select(F.col("network").alias("code"), "stations")
    )


def inventory_to_df(inv: DataFrame) -> DataFrame:
    """Nested inventory tree → channel rows (stations/pd.py flattening)."""
    st = inv.select(
        F.col("code").alias("network"), F.explode("stations").alias("s")
    )
    ch = st.select(
        "network",
        F.col("s.code").alias("station"),
        F.explode(F.col("s.channels")).alias("c"),
    )
    out = ch.select(
        "network",
        "station",
        *[F.col(f"c.{f}").alias(f) for f in _CHANNEL_FIELDS],
    )
    return out.withColumn(
        "seed_id", F.concat_ws(".", "network", "station", "location", "channel")
    )


def stations_from_stream(df: DataFrame) -> DataFrame:
    """Fabricate a station table from waveform/trace index rows
    (``stations/pd.py:111-128 _stream_to_station_df``): group by NSLC,
    station epoch = [min(starttime), max(endtime)] over the traces seen.

    One groupBy on the NSLC key — map-side combine makes this a single
    low-cardinality shuffle regardless of trace count (station count is
    bounded by the physical network, so the agg output is tiny even when
    the index covers 10^10 trace rows).

    Expects the waveform-index column layout (``network station location
    channel starttime endtime``); emits STATION_DTYPES-style epoch columns
    (``start_date``/``end_date`` — the reference's rename at
    stations/pd.py:104-105), NULL placeholder coordinates (a stream
    carries no geography) and the assembled ``seed_id``.
    """
    return (
        df.groupBy("network", "station", "location", "channel")
        .agg(
            F.min("starttime").alias("start_date"),
            F.max("endtime").alias("end_date"),
        )
        .select(
            "network",
            "station",
            "location",
            "channel",
            F.concat_ws(
                ".", "network", "station", "location", "channel"
            ).alias("seed_id"),
            F.lit(None).cast("double").alias("latitude"),
            F.lit(None).cast("double").alias("longitude"),
            F.lit(None).cast("double").alias("elevation"),
            "start_date",
            "end_date",
        )
    )
