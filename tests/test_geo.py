"""Geodesy + two-phase radius search."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from obsplus_spark.functions.geo import (
    M_PER_DEG,
    haversine_m,
    haversine_sql,
    wrap_longitude,
)
from obsplus_spark.operators.geo_search import radius_search, spatial_join


def test_haversine_known_values(spark):
    df = spark.createDataFrame([(0.0, 0.0, 0.0, 1.0)], "a double, b double, c double, d double")
    got = df.select(
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).first().m
    # one degree of longitude at the equator ≈ one degree of great circle
    assert abs(got - M_PER_DEG) < 1.0
    # antipodal: half circumference
    df2 = spark.createDataFrame([(0.0, 0.0, 0.0, 180.0)], "a double, b double, c double, d double")
    got2 = df2.select(
        haversine_m(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("m")
    ).first().m
    assert abs(got2 - 180 * M_PER_DEG) < 1.0


def test_haversine_sql_matches_column_expr(spark):
    """The SQL oracle fragment and the Column expr must agree bit-tight."""
    pts = [(37.0, -122.0, 40.7, -74.0), (-33.9, 151.2, 51.5, -0.1)]
    df = spark.createDataFrame(pts, "lat1 double, lon1 double, lat2 double, lon2 double")
    a = df.select(haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("m")).collect()
    b = df.selectExpr(haversine_sql("lat1", "lon1", "lat2", "lon2") + " AS m").collect()
    for x, y in zip(a, b):
        assert abs(x.m - y.m) < 1e-6


def test_wrap_longitude(spark):
    df = spark.createDataFrame(
        [(185.0,), (-185.0,), (360.0,), (179.0,), (-179.0,)], ["lon"]
    )
    got = [r[0] for r in df.select(wrap_longitude(F.col("lon"))).collect()]
    assert got == [-175.0, 175.0, 0.0, 179.0, -179.0]


def test_radius_search_two_phase_equals_bruteforce(spark):
    """bbox-prefilter + exact refine must equal the brute-force band filter."""
    pts = [(float(i % 37 - 18) * 2.3, float(i % 53 - 26) * 3.1, i) for i in range(400)]
    df = spark.createDataFrame(pts, "latitude double, longitude double, id int")
    lat0, lon0, rmin, rmax = 10.0, 20.0, 3.0, 25.0

    got = {
        r.id
        for r in radius_search(
            df, lat0, lon0, minradius=rmin, maxradius=rmax, radius_unit="deg"
        ).collect()
    }

    brute = {
        r.id
        for r in df.withColumn(
            "d", haversine_m(F.lit(lat0), F.lit(lon0), F.col("latitude"), F.col("longitude"))
        )
        .filter((F.col("d") > rmin * M_PER_DEG) & (F.col("d") < rmax * M_PER_DEG))
        .collect()
    }
    assert got == brute and len(got) > 0


def test_spatial_join_banded_equals_cross(spark):
    """Latitude-band join (scale path) must equal the broadcast cross join."""
    a = spark.createDataFrame(
        [(float(i), float(i * 3 % 50), i) for i in range(30)],
        "latitude double, longitude double, aid int",
    )
    b = spark.createDataFrame(
        [(float(j * 1.7 % 40), float(j * 7 % 60), j) for j in range(40)],
        "latitude double, longitude double, bid int",
    )
    maxd = 500_000.0
    cross = spatial_join(a, b).filter(F.col("distance_m") <= maxd)
    banded = spatial_join(a, b, max_distance_m=maxd)
    got_c = sorted((r.aid, r.bid) for r in cross.select("aid", "bid").collect())
    got_b = sorted((r.aid, r.bid) for r in banded.select("aid", "bid").collect())
    assert got_b == got_c and len(got_c) > 0


def _brute_radius_ids(df, lat0, lon0, rmin, rmax):
    return {
        r.id
        for r in df.withColumn(
            "d",
            haversine_m(
                F.lit(lat0), F.lit(lon0), F.col("latitude"), F.col("longitude")
            ),
        )
        .filter((F.col("d") > rmin * M_PER_DEG) & (F.col("d") < rmax * M_PER_DEG))
        .collect()
    }


def test_radius_search_high_latitude_matches_bruteforce(spark):
    """Regression (r6 review): at high latitudes the bbox must widen by
    the POLEWARD band edge's cosine — the old equatorward choice pruned
    true in-radius points (e.g. center lat 70, a point ~5 deg away at
    Δλ ≈ 14.8 deg fell outside the 13.7-deg box)."""
    pts = [
        (70.0 + (i % 21 - 10) * 0.8, (i % 73 - 36) * 1.0, i)
        for i in range(600)
    ]
    df = spark.createDataFrame(pts, "latitude double, longitude double, id int")
    got = {
        r.id
        for r in radius_search(
            df, 70.0, 0.0, minradius=0.0, maxradius=5.0, radius_unit="deg"
        ).collect()
    }
    assert got == _brute_radius_ids(df, 70.0, 0.0, 0.0, 5.0) and got


def test_radius_search_antimeridian_matches_bruteforce(spark):
    """Regression (r6 review): a search circle crossing ±180 must keep
    points on the far side of the dateline (wrapped OR predicate)."""
    pts = [
        (float(i % 31 - 15), 175.0 + (i % 21),  i) for i in range(300)
    ]
    # wrap into [-180, 180]
    pts = [(la, lo - 360.0 if lo > 180.0 else lo, i) for la, lo, i in pts]
    df = spark.createDataFrame(pts, "latitude double, longitude double, id int")
    got = {
        r.id
        for r in radius_search(
            df, 0.0, 179.0, minradius=0.0, maxradius=6.0, radius_unit="deg"
        ).collect()
    }
    want = _brute_radius_ids(df, 0.0, 179.0, 0.0, 6.0)
    assert got == want and got
    # and the kept set genuinely spans the dateline
    lons = {r.longitude for r in df.collect() if r.id in got}
    assert any(lo > 170 for lo in lons) and any(lo < -170 for lo in lons)


def test_spatial_join_hoisted_cos_bit_identical(spark):
    """r12 optimization contract: the cross-join path hoists
    cos(radians(lat)) to the input sides; the hoisted product must be
    BIT-identical to the fused haversine_m expression (same doubles,
    same multiplication order), or oracle hashes would drift."""
    from pyspark.sql import functions as F

    from obsplus_spark.functions.geo import haversine_m
    from obsplus_spark.operators.geo_search import spatial_join

    left = spark.createDataFrame(
        [(i, -37.0 + i * 3.17, 144.0 - i * 7.3) for i in range(13)],
        "lid int, latitude double, longitude double",
    )
    right = spark.createDataFrame(
        [(j, 51.5 - j * 5.11, -0.1 + j * 11.9) for j in range(11)],
        "rid int, latitude double, longitude double",
    )
    got = spatial_join(left, right).select("lid", "rid", "distance_m")
    fused = (
        left.alias("l")
        .crossJoin(right.alias("r"))
        .select(
            F.col("l.lid"),
            F.col("r.rid"),
            haversine_m(
                F.col("l.latitude"),
                F.col("l.longitude"),
                F.col("r.latitude"),
                F.col("r.longitude"),
            ).alias("distance_m"),
        )
    )
    g = {(r.lid, r.rid): r.distance_m for r in got.collect()}
    f = {(r.lid, r.rid): r.distance_m for r in fused.collect()}
    assert len(g) == 13 * 11
    # exact equality, not approx: the plans must produce the same bits
    assert g == f
