"""Event-stream analytics: sessionization and funnel progression.

The batch twins of the streaming session-window machinery
(``streaming/incremental.py``): gap-based sessions and ordered-stage
funnels over an (entity, timestamp) event log — the engagement /
conversion shapes an events table answers at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sessionize(
    events: DataFrame,
    gap_ns: int,
    user_col: str = "user_id",
    ts_col: str = "t_ns",
) -> DataFrame:
    """Gap-based sessionization: per entity, events closer than
    ``gap_ns`` chain into one session; emit per-entity session stats.

    Scale shape: ONE shuffle — the classic gaps-and-islands program
    (lag → break flag → running sum) runs in a single user-partitioned
    window pass, and both downstream aggregates (per-session, then
    per-user) reuse that partitioning (``HashPartitioning(user)``
    satisfies the ``(user, session)`` clustering requirement, so
    Catalyst inserts no further exchange). Tie timestamps chain into the
    same session regardless of intra-tie order (gap 0 ≤ any threshold),
    so the stats are deterministic without a tiebreaker column.

    Output: (user, n_sessions, n_events, longest_session_events,
    longest_session_ns).
    """
    from obsplus_spark.util import ensure_parallelism, sql_over

    return sql_over(
        {"e": ensure_parallelism(events)},
        f"""
        WITH o AS (
          SELECT {user_col}, {ts_col},
                 CASE WHEN lag({ts_col}) OVER w IS NULL
                        OR {ts_col} - lag({ts_col}) OVER w > {int(gap_ns)}
                      THEN 1 ELSE 0 END AS _brk
          FROM {{e}}
          WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col})
        ),
        s AS (
          SELECT {user_col}, {ts_col},
                 sum(_brk) OVER (PARTITION BY {user_col} ORDER BY {ts_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS _sid
          FROM o
        ),
        per AS (
          SELECT {user_col}, _sid,
                 CAST(count(1) AS BIGINT) AS _n,
                 max({ts_col}) - min({ts_col}) AS _dur
          FROM s GROUP BY {user_col}, _sid
        )
        SELECT {user_col},
               CAST(count(1) AS BIGINT) AS n_sessions,
               CAST(sum(_n) AS BIGINT) AS n_events,
               CAST(max(_n) AS BIGINT) AS longest_session_events,
               CAST(max(_dur) AS BIGINT) AS longest_session_ns
        FROM per GROUP BY {user_col}
        """,
    )


def funnel_counts(
    events: DataFrame,
    stages: "list[str]",
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "t_ns",
) -> DataFrame:
    """Ordered-funnel progression: how many entities reached stage k —
    an event of type ``stages[k]`` STRICTLY after their stage-k−1 event
    (earliest-possible progression: each stage anchors at its minimum
    qualifying timestamp, the standard open-funnel definition).

    Scale shape: stage 1 is one conditional-min hash aggregate; each
    later stage is one user-keyed join (against the previous stage's
    per-user row — |users|-sized, broadcast-eligible by AQE) plus one
    conditional-min aggregate; the final count table is
    dimension-sized. No window, no self-join of the event log against
    itself at event granularity.

    Output: (stage 1-based, event_type, n_users), one row per stage.
    """
    from obsplus_spark.util import ensure_parallelism, sql_over

    if not stages:
        raise ValueError("stages must be non-empty")
    lits = [str(s).replace("'", "''") for s in stages]
    parts = [
        f"""
        u1 AS (
          SELECT {user_col},
                 min(CASE WHEN {type_col} = '{lits[0]}' THEN {ts_col} END)
                   AS t
          FROM {{e}} GROUP BY {user_col}
        )"""
    ]
    for i in range(1, len(stages)):
        parts.append(
            f"""
        u{i + 1} AS (
          SELECT e.{user_col}, min(e.{ts_col}) AS t
          FROM {{e}} e JOIN u{i} p ON e.{user_col} = p.{user_col}
           AND e.{type_col} = '{lits[i]}' AND e.{ts_col} > p.t
          GROUP BY e.{user_col}
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS stage,"
        f" '{lits[i]}' AS event_type,"
        f" CAST(count(t) AS BIGINT) AS n_users FROM u{i + 1}"
        for i in range(len(stages))
    )
    return sql_over(
        {"e": ensure_parallelism(events)},
        f"WITH {','.join(parts)} {selects}",
    )
