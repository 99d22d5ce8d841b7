"""Degenerate-events regression net for the sessions/time-series family
— the third leg of the sweep trilogy (zero-norm cosine, degenerate
text): production event streams grow NULL users (logged-out hits), NULL
timestamps (client clock bugs), NULL values and NULL/empty event types,
and the engine and its DuckDB twin must agree on every one of them
BEFORE a driver fixture does. Extends sf0.001 events with five such
rows and re-runs the sessions-family queries() against oracle_sql().
"""

from __future__ import annotations

import math
import shutil

import pytest

SRC = "/root/testdata/sf0.001"

SESSIONS_QUERIES = [
    "sessionize",
    "funnel",
    "rate_zscores",
    "action_trigrams",
    "cohort_retention",
    "winsorize",
    "mad_outliers",
    "rolling_metrics",
    "trend_lines",
    "column_corr",
    "first_event_per_user",
    "median_per_group",
    "time_chunks",
    "json_props",
    "rank_transform",
    "action_transitions",
    "resample",
    "ks_drift",
    "calibration",
    "threshold_sweep",
    "rolling_active",
    "seq_holdout",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(
        out, key=lambda t: tuple((x is None, str(x)) for x in t)
    )


@pytest.fixture(scope="module")
def degenerate_events_sf_dir(tmp_path_factory):
    """sf0.001 with five degenerate event rows appended (fresh max
    ids): NULL user, NULL ts, NULL value, NULL type, empty-string
    type."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_degen_events")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copyfile(f"{SRC}/{t}.parquet", str(d / f"{t}.parquet"))
    con = duckdb.connect()
    (maxid,) = con.execute(
        f"SELECT max(event_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    b = int(maxid)
    ts = "TIMESTAMP '2024-01-02 03:04:05.678901'"
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL SELECT {b + 1}, {ts}, NULL, 'click', 1.5, '{{"k": 1}}'
          UNION ALL SELECT {b + 2}, NULL, 7, 'click', 2.5, '{{"k": 2}}'
          UNION ALL SELECT {b + 3}, {ts}, 7, 'click', NULL, '{{"k": 3}}'
          UNION ALL SELECT {b + 4}, {ts}, 8, NULL, 3.5, '{{"k": 4}}'
          UNION ALL SELECT {b + 5}, {ts}, 9, '', 4.5, NULL
        ) TO '{d / "events.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", SESSIONS_QUERIES)
def test_sessions_query_matches_oracle_with_degenerate_events(
    spark, degenerate_events_sf_dir, name
):
    import duckdb

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = fn(spark, degenerate_events_sf_dir)
    srows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{degenerate_events_sf_dir}/{t}.parquet')"
            )
        res = con.execute(sql)
        ocols = [dsc[0] for dsc in res.description]
        orows = _normalize(res.fetchall(), ocols)
    finally:
        con.close()

    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    for i, (a, b) in enumerate(zip(srows, orows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) <= 1e-6 + 1e-6 * abs(y), (name, i, a, b)
            else:
                assert x == y, (name, i, a, b)
