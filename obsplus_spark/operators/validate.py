"""Validation suite — rules as violation-DataFrames (Deequ-style).

The reference registers imperative validator callables per namespace/class
(``utils/validate.py:88-219``) that raise or collect reports. The Spark
re-expression: **a rule is a function DataFrame → violations DataFrame**
(zero rows = clean), and a report is the union of rule outputs — fully
declarative, runs as one job, scales with the data.

Rules mirrored from ``events/validate.py``:
- duplicate picks per (phase_hint, NSL[C]) group (:29-129)
- single-P/S per station and S-after-P ordering (:132-167)
- P-pick time outliers vs the event median (:170-184)
- referential integrity: every arrival.pick_id exists in picks (:64-79)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Rule = Callable[[DataFrame], DataFrame]


def _violation(df: DataFrame, rule: str, detail_cols: list[str]) -> DataFrame:
    return df.select(
        F.lit(rule).alias("rule"),
        F.col("event_id"),
        F.to_json(F.struct(*detail_cols)).alias("detail"),
    )


def duplicate_picks(picks: DataFrame, include_channel: bool = False) -> DataFrame:
    """Groups holding >1 non-rejected pick of one phase at one NSL(C)
    (events/validate.py:103-129)."""
    keys = ["event_id", "phase_hint", "network", "station", "location"]
    if include_channel:
        keys.append("channel")
    status = F.col("evaluation_status")
    dup = (
        picks.filter(status.isNull() | (status != "rejected"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return _violation(dup, "duplicate_picks", [k for k in keys if k != "event_id"] + ["n"])


def s_before_p(picks: DataFrame) -> DataFrame:
    """Stations where the S pick is not after the P pick
    (events/validate.py:132-167: 'S ≥ P')."""
    # null-safe like duplicate_picks: missing status counts as not-rejected
    status = F.col("evaluation_status")
    ok = picks.filter(status.isNull() | (status != "rejected"))
    agg = (
        ok.groupBy("event_id", "network", "station")
        .agg(
            F.min(F.when(F.col("phase_hint") == "P", F.col("time"))).alias("p_time"),
            F.min(F.when(F.col("phase_hint") == "S", F.col("time"))).alias("s_time"),
        )
        .filter(
            F.col("p_time").isNotNull()
            & F.col("s_time").isNotNull()
            & (F.col("s_time") < F.col("p_time"))
        )
    )
    return _violation(agg, "s_before_p", ["network", "station", "p_time", "s_time"])


def p_outliers(picks: DataFrame, limit_ns: int) -> DataFrame:
    """P picks further than ``limit_ns`` from the event's median P time
    (events/validate.py:170-184)."""
    p = picks.filter(F.col("phase_hint") == "P")
    med = p.groupBy("event_id").agg(F.median("time").alias("med_time"))
    out = (
        p.join(med, "event_id")
        .filter(F.abs(F.col("time") - F.col("med_time")) > limit_ns)
    )
    return _violation(out, "p_outlier", ["resource_id", "time", "med_time"])


def arrivals_reference_picks(arrivals: DataFrame, picks: DataFrame) -> DataFrame:
    """Arrivals whose pick_id has no matching pick (events/validate.py:64-79)
    — referential integrity as an anti join."""
    orphan = arrivals.join(
        picks.select(F.col("resource_id").alias("pick_id")).distinct(),
        "pick_id",
        "left_anti",
    )
    return _violation(orphan, "orphan_arrival", ["pick_id"])


def validate(picks: DataFrame, arrivals: DataFrame | None = None,
             p_outlier_limit_ns: int | None = None) -> DataFrame:
    """Run the rule set, union the violation reports
    (utils/validate.py:181-219 report form)."""
    reports = [duplicate_picks(picks), s_before_p(picks)]
    if p_outlier_limit_ns is not None:
        reports.append(p_outliers(picks, p_outlier_limit_ns))
    if arrivals is not None:
        reports.append(arrivals_reference_picks(arrivals, picks))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
