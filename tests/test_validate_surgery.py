"""Validation rules + catalog surgery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from obsplus_spark.operators.surgery import (
    dedup_channels,
    merge_new_picks,
    prune_rejected,
    bump_version,
)
from obsplus_spark.operators.validate import validate

PICK_COLS = (
    "event_id string, resource_id string, time long, phase_hint string, "
    "evaluation_status string, network string, station string, "
    "location string, channel string"
)


@pytest.fixture(scope="module")
def picks(spark):
    rows = [
        # e1/STA1: duplicate P (two non-rejected P at same NSL)
        ("e1", "p1", 100, "P", "reviewed", "UU", "STA1", "", "HHZ"),
        ("e1", "p2", 105, "P", "reviewed", "UU", "STA1", "", "HHN"),
        # e1/STA2: S before P → violation
        ("e1", "p3", 200, "P", "reviewed", "UU", "STA2", "", "HHZ"),
        ("e1", "p4", 150, "S", "reviewed", "UU", "STA2", "", "HHZ"),
        # e2: clean station; rejected duplicate doesn't count
        ("e2", "p5", 300, "P", "reviewed", "UU", "STA1", "", "HHZ"),
        ("e2", "p6", 301, "P", "rejected", "UU", "STA1", "", "HHZ"),
        ("e2", "p7", 350, "S", "reviewed", "UU", "STA1", "", "HHZ"),
        # e3: P far from median → outlier with limit 50
        ("e3", "p8", 1000, "P", "reviewed", "UU", "STA1", "", "HHZ"),
        ("e3", "p9", 1010, "P", "reviewed", "UU", "STA2", "", "HHZ"),
        ("e3", "p10", 5000, "P", "reviewed", "UU", "STA3", "", "HHZ"),
    ]
    return spark.createDataFrame(rows, PICK_COLS)


def test_validate_report(spark, picks):
    arrivals = spark.createDataFrame(
        [("e1", "a1", "p1"), ("e1", "a2", "p_missing")],
        "event_id string, resource_id string, pick_id string",
    )
    report = validate(picks, arrivals, p_outlier_limit_ns=50).collect()
    rules = {}
    for r in report:
        rules.setdefault(r.rule, []).append(r)
    assert len(rules["duplicate_picks"]) == 1  # e1 STA1 double-P
    assert len(rules["s_before_p"]) == 1       # e1 STA2
    assert len(rules["orphan_arrival"]) == 1   # p_missing
    # e1 median P = 105 → p3 at 200 is an outlier; e3 median = 1010 → p10
    import json

    outlier_ids = {
        json.loads(r.detail)["resource_id"] for r in rules["p_outlier"]
    }
    assert outlier_ids == {"p3", "p10"}


def test_validate_clean_is_empty(spark):
    clean = spark.createDataFrame(
        [("e1", "p1", 100, "P", "reviewed", "UU", "S1", "", "HHZ"),
         ("e1", "p2", 150, "S", "reviewed", "UU", "S1", "", "HHZ")],
        PICK_COLS,
    )
    assert validate(clean).count() == 0


def test_merge_new_picks(spark):
    target = spark.createDataFrame(
        [("e1", "p1", 100, "P", "reviewed", "UU", "S1", "", "HHZ")], PICK_COLS
    )
    incoming = spark.createDataFrame(
        [
            # same station/channel/phase → NOT appended (already present)
            ("e1", "p1b", 101, "P", "reviewed", "UU", "S1", "", "HHZ"),
            # new phase at same station → appended
            ("e1", "p2", 150, "S", "reviewed", "UU", "S1", "", "HHZ"),
        ],
        PICK_COLS,
    )
    out = merge_new_picks(target, incoming)
    assert {r.resource_id for r in out.collect()} == {"p1", "p2"}


def test_prune_rejected_transitive(spark):
    nodes = spark.createDataFrame(
        [
            ("root", "reviewed"),
            ("origin1", "rejected"),
            ("arrival1", "reviewed"),   # child of rejected origin → pruned
            ("origin2", "reviewed"),
            ("arrival2", "reviewed"),
        ],
        "resource_id string, evaluation_status string",
    )
    edges = spark.createDataFrame(
        [
            ("root", "origin1"),
            ("origin1", "arrival1"),
            ("root", "origin2"),
            ("origin2", "arrival2"),
        ],
        "parent string, child string",
    )
    out = {r.resource_id for r in prune_rejected(nodes, edges).collect()}
    assert out == {"root", "origin2", "arrival2"}


def test_bump_version(spark):
    df = spark.createDataFrame([("1",), (None,), ("41",)], ["version"])
    got = sorted(r.version for r in bump_version(df).collect())
    assert got == ["1", "2", "42"]


def test_dedup_channels(spark):
    df = spark.createDataFrame(
        [
            ("UU", "S1", "", "HHZ", 0, 10),
            ("UU", "S1", "", "HHZ", 0, 10),   # exact dup epoch
            ("UU", "S1", "", "HHZ", 10, 20),  # new epoch kept
        ],
        "network string, station string, location string, channel string, "
        "start_date long, end_date long",
    )
    assert dedup_channels(df).count() == 2
