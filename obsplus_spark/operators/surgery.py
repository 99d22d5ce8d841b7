"""Catalog-surgery operators (reference §2.11) as relational programs.

The reference mutates object trees in place (``events/merge.py``,
``utils/events.py``). Here every operation is a DataFrame → DataFrame
transform over the flattened tables:

- :func:`merge_new_picks` — append only picks new to the target, keyed on
  the station-channel-phase hash (``merge.py:83-118``, hash ``:272-288``).
- :func:`prune_rejected` — drop rejected/orphaned rows transitively
  (``utils/events.py:74-148 prune_events`` — a reachability pass over a
  (parent, child) edge table, done as iterative anti-joins).
- :func:`bump_version` — creation-version bump (``utils/events.py:225-255``).
- :func:`dedup_channels` — duplicated channel rows (Fetcher duplicate-
  channel tolerance, ``tests/test_structures/test_fetcher.py:879``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pick_merge_key(df: DataFrame) -> DataFrame:
    """The station-channel-phase identity hash (merge.py:272-288)."""
    return df.withColumn(
        "_merge_key",
        F.md5(
            F.concat_ws(
                "|", "network", "station", "location", "channel", "phase_hint"
            )
        ),
    )


def merge_new_picks(target: DataFrame, incoming: DataFrame) -> DataFrame:
    """target ∪ (incoming ∖ target) on the merge key — the reference's
    'only new picks' append (merge.py:83-88,114-118) as an anti join."""
    t = pick_merge_key(target)
    i = pick_merge_key(incoming)
    new_only = i.join(t.select("_merge_key").distinct(), "_merge_key", "left_anti")
    return t.unionByName(new_only).drop("_merge_key")


def prune_rejected(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "resource_id",
    status_col: str = "evaluation_status",
    max_iterations: int = 10,
) -> DataFrame:
    """Remove rejected nodes and everything reachable only through them.

    ``edges`` is (parent, child). A child is dropped when its parent is
    dropped; iterate to a fixed point (bounded — event trees are shallow,
    the reference's walk is equivalent). Each round persists its frontier
    and pays **one** count action (the persisted frontier is already
    materialized by it), then unpersists the previous round — lineage and
    executor memory stay bounded at one round's working set.
    """
    not_rejected = F.col(status_col).isNull() | (F.col(status_col) != "rejected")
    roots = nodes.select(id_col).join(
        edges.select(F.col("child").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    ).persist()
    alive = nodes.filter(not_rejected).select(id_col).distinct().persist()
    n_alive = alive.count()
    for _ in range(max_iterations):
        # a node stays only if it is not a child of a dropped parent
        reachable_children = edges.join(
            alive.withColumnRenamed(id_col, "parent"), "parent", "inner"
        ).select(F.col("child").alias(id_col))
        new_alive = (
            roots.unionByName(reachable_children)
            .distinct()
            .join(alive, id_col, "left_semi")
        ).persist()
        n_new = new_alive.count()  # also materializes the persist
        prev, alive = alive, new_alive
        prev.unpersist(blocking=False)
        if n_new == n_alive:
            break
        n_alive = n_new
    # the final frontier stays persisted — it backs the returned plan (a
    # small id set, already materialized); Spark LRU-evicts, or callers
    # release it via spark.catalog.clearCache()
    out = nodes.join(alive, id_col, "left_semi")
    roots.unpersist(blocking=False)
    return out


def bump_version(df: DataFrame, version_col: str = "version") -> DataFrame:
    """Increment integer-string versions, stamp creation time placeholder
    (utils/events.py:225-255 bump_creation_version)."""
    v = F.coalesce(F.col(version_col).cast("long"), F.lit(0))
    return df.withColumn(version_col, (v + 1).cast("string"))


def dedup_channels(stations: DataFrame) -> DataFrame:
    """Drop exactly-duplicated channel epochs (keep one row per
    (seed, start_date, end_date))."""
    return stations.dropDuplicates(
        ["network", "station", "location", "channel", "start_date", "end_date"]
    )


def strip_events(
    df: DataFrame,
    keep_columns: list[str],
    reject_status: str = "rejected",
    status_col: str = "evaluation_status",
) -> DataFrame:
    """Reduce rows to a minimal column set and drop rejected rows
    (utils/events.py:151-222 strip_events: strip derived/rejected content
    so the catalog re-processes cleanly)."""
    out = df
    if status_col in df.columns:
        out = out.filter(
            F.col(status_col).isNull() | (F.col(status_col) != reject_status)
        )
    return out.select(*[c for c in keep_columns if c in out.columns])


def attach_new_origin(
    events: DataFrame,
    new_origins: DataFrame,
    preferred: bool = True,
) -> DataFrame:
    """Attach a fabricated origin per event and (optionally) mark it
    preferred (utils/events.py:258-317 make_origins + merge.py:135-194
    attach_new_origin): append the origin struct to the event's list and
    point preferred_origin_id at it."""
    o = new_origins.select(
        "event_id",
        F.struct(
            F.col("resource_id"),
            F.col("time"),
            F.col("latitude"),
            F.col("longitude"),
            F.col("depth"),
        ).alias("_new_origin"),
        F.col("resource_id").alias("_new_oid"),
    )
    joined = events.join(o, "event_id", "left")
    with_origin = joined.withColumn(
        "origins",
        F.when(
            F.col("_new_origin").isNotNull(),
            F.concat(
                F.coalesce(F.col("origins"), F.array()),
                F.array(F.col("_new_origin")),
            ),
        ).otherwise(F.col("origins")),
    )
    if preferred:
        with_origin = with_origin.withColumn(
            "preferred_origin_id",
            F.coalesce(F.col("_new_oid"), F.col("preferred_origin_id")),
        )
    return with_origin.drop("_new_origin", "_new_oid")


def duplicate_resource_ids(df: DataFrame, id_col: str = "resource_id") -> DataFrame:
    """Resource-id uniqueness check (utils/events.py:36-71 duplicate_events
    guard): ids appearing more than once."""
    return (
        df.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
