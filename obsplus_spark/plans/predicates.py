"""The kwargs → Column predicate compiler.

This is the engine's query front door — the Spark re-expression of the
reference's three predicate builders:

- ``filter_df`` (``utils/pd.py:385-431``): str → glob, scalar → ``==``,
  collection → ``isin`` (globs inside collections OR together), AND-combined.
- ``filter_index`` / ``_filter_starttime_endtime`` (``utils/pd.py:336-443``):
  NSLC glob filters + **interval overlap** (not containment) on
  [starttime, endtime].
- ``_make_wheres`` (``utils/bank.py:326-409``): ``min*``/``max*`` kwargs →
  ``>``/``<`` range predicates, ``updatedafter``, ``eventid`` → eq/IN,
  endtime-only queries add a NaT-excluding lower bound, and the dateline
  rewrite (minlongitude > maxlongitude → OR of two ranges).

Everything compiles to ``pyspark.sql.Column`` trees at plan-build time, so
Catalyst sees plain predicates it can push into the parquet scan. No Python
runs per row.
"""

from __future__ import annotations

from collections.abc import Collection
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from obsplus_spark.functions.strings import any_glob_match, glob_match, is_exact
from obsplus_spark.schemas import LARGEDT_NS, SMALLDT_NS

#: kwargs the range compiler recognizes as "attribute range" prefixes
_RANGE_PREFIXES = ("min", "max")


def _value_predicate(
    col: str, value, case_insensitive: bool = False
) -> Column:
    """One kwarg → one predicate, with the reference's type dispatch."""
    c = F.col(col)
    if isinstance(value, str):
        return glob_match(c, value, case_insensitive)
    if isinstance(value, Collection) and not isinstance(value, (bytes,)):
        vals = list(value)
        if all(isinstance(v, str) for v in vals) and any(not is_exact(v) for v in vals):
            return any_glob_match(c, vals, case_insensitive)
        return c.isin(vals)
    return c == value


def compile_filters(
    case_insensitive: bool = False, **kwargs
) -> Column | None:
    """AND-combine kwarg predicates (reference ``filter_df`` semantics).

    ``None`` values are skipped (kwarg not given). Returns ``None`` when
    nothing to filter — callers pass the result to ``df.filter`` only if
    non-null.
    """
    preds = [
        _value_predicate(k, v, case_insensitive)
        for k, v in kwargs.items()
        if v is not None
    ]
    if not preds:
        return None
    return reduce(and_, preds)


def range_predicates(available_columns: Collection[str], **kwargs) -> list[Column]:
    """``min<attr>``/``max<attr>`` kwargs → range predicates.

    Mirror of ``utils/bank.py:326-347``: ``minmagnitude=2`` → ``magnitude
    > 2``; ``maxdepth=10`` → ``depth < 10`` (strict, as the reference's SQL
    uses ``>``/``<``). Unknown attributes raise — the reference validates
    kwargs before building the plan (``get_events.py:33-47``).
    """
    preds: list[Column] = []
    for key, value in kwargs.items():
        if value is None:
            continue
        prefix, attr = key[:3], key[3:]
        if prefix not in _RANGE_PREFIXES or not attr:
            raise ValueError(f"unsupported range kwarg: {key!r}")
        if attr not in available_columns:
            raise ValueError(f"unknown attribute {attr!r} in kwarg {key!r}")
        c = F.col(attr)
        preds.append(c > value if prefix == "min" else c < value)
    return preds


def interval_overlap(
    query_start: int | None,
    query_end: int | None,
    start_col: str = "starttime",
    end_col: str = "endtime",
    buffer_ns: int = 0,
) -> Column:
    """[start, end] interval **overlap** predicate with edge buffer.

    Mirror of ``utils/bank.py:288-303 _get_kernel_query`` +
    ``utils/pd.py:434-443``: a row overlaps [t1, t2] iff
    ``start < t2 + buf AND end > t1 - buf``. Open ends use the ±inf
    sentinels (``utils/bank.py:198-210``). Both halves are simple column
    comparisons, so parquet row-group min/max skipping applies — the same
    role the reference's HDF5 kernel `where` string played.
    """
    t1 = SMALLDT_NS if query_start is None else int(query_start)
    t2 = LARGEDT_NS if query_end is None else int(query_end)
    lo = t1 - buffer_ns if t1 > SMALLDT_NS + buffer_ns else SMALLDT_NS
    hi = t2 + buffer_ns if t2 < LARGEDT_NS - buffer_ns else LARGEDT_NS
    if buffer_ns == 0:
        # reference is inclusive (``~((end < t1) | (start > t2))`` keeps
        # boundary-touching rows); strict bounds are correct only when a
        # buffer already widens the window past the edge
        return (F.col(start_col) <= F.lit(hi)) & (F.col(end_col) >= F.lit(lo))
    return (F.col(start_col) < F.lit(hi)) & (F.col(end_col) > F.lit(lo))


def dateline_longitude_predicate(
    minlongitude: float, maxlongitude: float, col: str = "longitude"
) -> Column:
    """Longitude range with dateline-crossing rewrite.

    Mirror of ``utils/bank.py:349-363`` / ``get_events.py:148-162``: after
    wrapping into [-180, 180], ``minlon > maxlon`` means the box crosses
    the antimeridian → ``lon > min OR lon < max``; otherwise the plain
    conjunctive range.
    """
    from obsplus_spark.functions.geo import wrap_longitude

    def _wrap(v: float) -> float:
        m = v % 360.0
        return m - 360.0 if m > 180.0 else m

    if maxlongitude - minlongitude >= 360.0:
        # the raw range spans the whole circle (the common
        # minlongitude=-180, maxlongitude=180 "no longitude filter"
        # query): wrapping would collapse both bounds to the same value
        # and the strict range would silently match NOTHING
        return F.lit(True)
    lo, hi = _wrap(minlongitude), _wrap(maxlongitude)
    c = wrap_longitude(F.col(col))
    if lo > hi:  # crosses the dateline
        return (c > lo) | (c < hi)
    return (c > lo) & (c < hi)


def fdsn_event_filter(
    df: DataFrame,
    *,
    starttime: int | None = None,
    endtime: int | None = None,
    minlatitude: float | None = None,
    maxlatitude: float | None = None,
    minlongitude: float | None = None,
    maxlongitude: float | None = None,
    minmagnitude: float | None = None,
    maxmagnitude: float | None = None,
    mindepth: float | None = None,
    maxdepth: float | None = None,
    eventid: str | Collection[str] | None = None,
    updatedafter: int | None = None,
    limit: int | None = None,
    time_col: str = "time",
) -> DataFrame:
    """FDSN ``get_events``-style query over an event-summary table.

    The Spark re-expression of ``EventBank.read_index``
    (``eventbank.py:225-261``) + ``_get_ids`` (``get_events.py:103-145``):
    every kwarg becomes a pushdown-able Column predicate; ``limit`` caps
    rows. Events are point times, so ``starttime``/``endtime`` bound the
    single ``time`` column (not interval overlap).
    """
    preds: list[Column] = []
    if starttime is not None:
        preds.append(F.col(time_col) > F.lit(int(starttime)))
    if endtime is not None:
        preds.append(F.col(time_col) < F.lit(int(endtime)))
        if starttime is None:
            # reference adds a NaT-excluding lower bound on endtime-only
            # queries (utils/bank.py:343-347)
            preds.append(F.col(time_col) > F.lit(SMALLDT_NS))
    if minlongitude is not None and maxlongitude is not None:
        preds.append(
            dateline_longitude_predicate(minlongitude, maxlongitude)
        )
    else:
        if minlongitude is not None:
            preds.append(F.col("longitude") > minlongitude)
        if maxlongitude is not None:
            preds.append(F.col("longitude") < maxlongitude)
    ranges = {
        "minlatitude": minlatitude,
        "maxlatitude": maxlatitude,
        "minmagnitude": minmagnitude,
        "maxmagnitude": maxmagnitude,
        "mindepth": mindepth,
        "maxdepth": maxdepth,
    }
    preds.extend(range_predicates(df.columns, **ranges))
    if eventid is not None:
        if isinstance(eventid, str):
            preds.append(F.col("event_id") == eventid)
        else:
            preds.append(F.col("event_id").isin(list(eventid)))
    if updatedafter is not None:
        preds.append(F.col("updated") > F.lit(int(updatedafter)))

    out = df
    if preds:
        out = out.filter(reduce(and_, preds))
    if limit is not None:
        out = out.limit(int(limit))
    return out
