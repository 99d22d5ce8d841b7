"""Nested event-tree layer: explode views, preferred chain, JSON round-trip."""

from __future__ import annotations

import pytest

from obsplus_spark.operators.event_tree import (
    NESTED_EVENT_SCHEMA,
    events_to_df,
    first_pick_origins,
    json_to_tree,
    last_magnitude_per_type,
    magnitudes_to_df,
    origin_quality,
    picks_to_df,
    tree_to_json,
)


def _pick(rid, t, phase, status="reviewed", sta="STA1"):
    return (rid, t, phase, status, "UU", sta, "", "HHZ")


@pytest.fixture(scope="module")
def tree(spark):
    rows = [
        # e1: preferred origin is the FIRST one; preferred magnitude missing
        # → falls back to last magnitude in list
        (
            "e1",
            "quarry blast",
            "o1",
            "mX",  # not present → fallback to last
            1000,
            [("o1", 100, 40.0, -111.0, 5.0), ("o2", 200, 41.0, -112.0, 6.0)],
            [("m1", 2.0, "ML", "o1"), ("m2", 2.5, "MW", "o2"), ("m3", 2.2, "ML", "o1")],
            [
                _pick("p1", 110, "P"),
                _pick("p2", 120, "S"),
                _pick("p3", 130, "P", status="rejected"),
                _pick("p4", 140, "P", sta="STA2"),
            ],
        ),
        # e2: no preferred ids at all → last origin, last magnitude
        (
            "e2",
            "",
            None,
            None,
            2000,
            [("o3", 300, 42.0, -113.0, 7.0)],
            [("m4", 3.0, "MD", "o3")],
            [_pick("p5", 310, "P")],
        ),
        # e3: empty lists → all nulls
        ("e3", "", None, None, 3000, [], [], []),
    ]
    return spark.createDataFrame(rows, NESTED_EVENT_SCHEMA)


def test_preferred_chain(tree):
    out = {r.event_id: r for r in events_to_df(tree).collect()}
    # e1: preferred origin o1 honored (not last)
    assert out["e1"].time == 100 and out["e1"].latitude == 40.0
    # e1: preferred magnitude id missing → LAST magnitude m3 (2.2), not max
    assert out["e1"].magnitude == 2.2 and out["e1"].magnitude_type == "ML"
    # e2: no preferred → last-in-list
    assert out["e2"].time == 300 and out["e2"].magnitude == 3.0
    # e3: empty → nulls
    assert out["e3"].time is None and out["e3"].magnitude is None


def test_origin_quality_counts(tree):
    q = {r.event_id: r for r in origin_quality(tree).collect()}
    # e1: P picks p1, p4 (p3 rejected); one S pick; stations STA1, STA2
    assert q["e1"].p_pick_count == 2
    assert q["e1"].s_pick_count == 1
    assert q["e1"].station_count == 2


def test_picks_explode_view(tree):
    p = picks_to_df(tree).collect()
    by_ev = {}
    for r in p:
        by_ev.setdefault(r.event_id, []).append(r)
    assert len(by_ev["e1"]) == 4
    # denormalized parent origin time flows to each pick row
    assert all(r.event_time == 100 for r in by_ev["e1"])
    assert by_ev["e1"][0].seed_id.startswith("UU.STA")
    # explode_outer keeps empty-list events as one null row
    assert len(by_ev["e3"]) == 1 and by_ev["e3"][0].resource_id is None


def test_last_magnitude_per_type(tree):
    out = {r.event_id: r for r in last_magnitude_per_type(tree).collect()}
    # e1 has two MLs (2.0 then 2.2) → last one wins
    assert out["e1"].local_magnitude == 2.2
    assert out["e1"].moment_magnitude == 2.5
    assert out["e1"].duration_magnitude is None
    assert out["e2"].duration_magnitude == 3.0


def test_first_pick_origins(tree):
    out = {r.event_id: r.first_pick_time for r in first_pick_origins(tree).collect()}
    assert out["e1"] == 110 and out["e2"] == 310
    assert "e3" not in out


def test_json_roundtrip(tree):
    js = tree_to_json(tree)
    back = json_to_tree(js)
    a = sorted(tree.collect(), key=lambda r: r.event_id)
    b = sorted(back.collect(), key=lambda r: r.event_id)
    assert a == b


def test_magnitudes_view(tree):
    m = magnitudes_to_df(tree).filter("event_id = 'e1'").collect()
    assert [r.mag for r in m] == [2.0, 2.5, 2.2]
