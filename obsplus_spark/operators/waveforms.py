"""Waveform sample operators: merge/trim/common-coverage.

The reference stores samples as numpy arrays on Trace objects; here a trace
segment is a **row**: NSLC + ``starttime``/``endtime``/``sampling_period``
(ns longs) + ``samples array<double>`` (SURVEY.md §1.4). Operators:

- :func:`merge_traces` — the reference's crown-jewel imperative op
  (``utils/waveforms.py:221-289``): group overlapping/adjacent segments
  (sessionization, §2.5), then overlay samples onto a unified time axis.
  Grouping is pure window SQL; only the per-group numpy overlay runs in
  ``applyInPandas`` (Arrow-batched, partitioned by merge group — the one
  place imperative code is genuinely needed).
- :func:`trim_traces` — slice samples to a window (``Stream.trim``
  semantics in ``_prep_output_stream``, ``wavebank.py:783-798``) as pure
  ``slice``/arithmetic expressions — no Python.
- :func:`common_coverage` — windows where *all* requested seeds have data
  (``stream2contiguous``, ``utils/waveforms.py:305-372``) as a sweep-line
  window program: +1/-1 boundary events, running sum == n_seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from obsplus_spark.operators.gaps import sessionize

NSLC = ["network", "station", "location", "channel"]


def merge_traces(
    df: DataFrame,
    keys: list[str] | None = None,
    method_dtype: str = "double",
) -> DataFrame:
    """Merge overlapping/adjacent trace segments per (NSLC, sampling_period).

    Two phases, mirroring ``utils/waveforms.py:221-289``:
    1. merge-group assignment — :func:`sessionize` with
       ``min_gap = sampling_period`` (next start within one sample period
       of the running-max end joins the group, ``:241-254``);
    2. per-group sample overlay — allocate the unified axis
       ``[min(start), max(end))`` at the group's sampling period and copy
       each segment in sorted order (later rows win on overlap, matching
       the reference's overlay ``:279-288``).

    Phase 2 is ``applyInPandas`` over ``(keys, sampling_period,
    session_id)`` — bounded state per group, shuffle keyed on the group,
    no driver involvement.
    """
    import numpy as np
    import pandas as pd

    keys = list(keys or NSLC)
    part = keys + ["sampling_period"]
    sess = sessionize(
        df,
        keys,
        min_gap=None,
        sampling_period_col="sampling_period",
    )

    out_schema = ", ".join(
        [f"{k} string" for k in keys]
        + [
            "sampling_period long",
            "starttime long",
            "endtime long",
            "n_samples long",
            f"samples array<{method_dtype}>",
        ]
    )

    def _overlay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["starttime", "endtime"])
        sp = int(pdf["sampling_period"].iloc[0])
        t0 = int(pdf["starttime"].min())
        t1 = int(pdf["endtime"].max())
        n = max(int(round((t1 - t0) / sp)), 0)
        buf = np.full(n, np.nan)
        for _, row in pdf.iterrows():
            s = row["samples"]
            if s is None:
                continue
            i0 = int(round((int(row["starttime"]) - t0) / sp))
            buf[i0 : i0 + len(s)] = s[: max(n - i0, 0)]
        head = {k: pdf[k].iloc[0] for k in keys}
        return pd.DataFrame(
            [
                {
                    **head,
                    "sampling_period": sp,
                    "starttime": t0,
                    "endtime": t1,
                    "n_samples": n,
                    "samples": buf.tolist(),
                }
            ]
        )

    return sess.groupBy(*part, "session_id").applyInPandas(_overlay, out_schema)


def trim_traces(
    df: DataFrame,
    starttime: int,
    endtime: int,
    samples_col: str = "samples",
) -> DataFrame:
    """Slice each segment's samples to [starttime, endtime) — pure exprs.

    Sample i covers ``starttime + i*sp``; the kept index range is
    ``[ceil((t1-start)/sp), floor((t2-start)/sp))`` clamped to the row.
    Rows with no overlap drop (the reference trims then discards empties).
    """
    sp = F.col("sampling_period")
    n = F.size(F.col(samples_col))
    first = F.greatest(F.ceil((F.lit(starttime) - F.col("starttime")) / sp), F.lit(0))
    last = F.least(F.ceil((F.lit(endtime) - F.col("starttime")) / sp), n.cast("long"))
    # guard the null-samples case explicitly: least/greatest IGNORE null
    # operands, so without this a null-samples row sails through the filter
    keep = (F.col(samples_col).isNotNull() & (last > first)).alias("_keep")
    return (
        df.withColumn("_first", first.cast("long"))
        .withColumn("_last", last.cast("long"))
        .filter(keep)
        .select(
            *[c for c in df.columns if c != samples_col],
            F.slice(
                F.col(samples_col),
                (F.col("_first") + 1).cast("int"),
                (F.col("_last") - F.col("_first")).cast("int"),
            ).alias(samples_col),
            (F.col("starttime") + F.col("_first") * sp).alias("trim_start"),
            (F.col("starttime") + F.col("_last") * sp).alias("trim_end"),
        )
    )


def common_coverage(
    segments: DataFrame,
    seed_col: str = "seed_id",
    start_col: str = "seg_start",
    end_col: str = "seg_end",
) -> DataFrame:
    """Windows where every distinct seed has coverage — sweep-line program.

    The reference iterates python-side over gap groups
    (``stream2contiguous``/``_get_new_stream``); here: segment boundaries
    become (+1 at start, −1 at end) events, a running sum over the global
    time order counts covering seeds, and stretches where the count equals
    the number of distinct seeds are the all-channels windows. One global
    sort — acceptable because boundaries (not samples) are sorted; for
    per-key variants pass pre-filtered input.
    """
    n_seeds = segments.select(seed_col).distinct().count()
    starts = segments.select(
        F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = segments.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
    events = starts.unionByName(ends)
    # at equal t, ends sort before starts → half-open [start, end) semantics
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    swept = (
        events.withColumn("covering", F.sum("delta").over(w))
        .withColumn("next_t", F.lead("t").over(Window.orderBy("t", "delta")))
    )
    return (
        swept.filter(
            (F.col("covering") == n_seeds)
            & F.col("next_t").isNotNull()
            & (F.col("next_t") > F.col("t"))
        )
        .select(
            F.col("t").alias("window_start"), F.col("next_t").alias("window_end")
        )
    )
