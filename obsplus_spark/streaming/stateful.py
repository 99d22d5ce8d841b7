"""Custom stateful streaming: gap detection over an unbounded segment stream.

The reference's gap detector (``wavebank.py:427-485``) is a batch window
program (see ``operators/gaps.py``). On an unbounded stream of trace
segments the same semantics need **custom state**: per seed, remember the
running max end time across micro-batches and emit a gap whenever a new
segment starts beyond it — exactly the running-max trick, carried in
``applyInPandasWithState`` (the engine's one custom stateful operator,
SURVEY §2.9).

State per key is two longs (running max end, last sampling period) —
bounded regardless of stream length; timeouts are left to the caller's
watermark policy (segments are assumed key-ordered within a batch, which
``update_index`` batches guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output rows: one per detected gap
GAP_SCHEMA = (
    "network string, station string, location string, channel string, "
    "gap_start long, gap_end long, gap_duration long"
)
STATE_SCHEMA = "max_end long, min_gap long"


def _detect_gaps(key, pdf_iter, state: GroupState):
    """Per-key stateful kernel: running-max end across micro-batches."""
    import pandas as pd

    network, station, location, channel = key
    if state.exists:
        max_end, min_gap = state.get
    else:
        max_end, min_gap = None, 0

    gaps = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["starttime", "endtime"])
        for _, row in pdf.iterrows():
            start, end = int(row["starttime"]), int(row["endtime"])
            sp = int(row["sampling_period"])
            min_gap = int(1.5 * sp)  # reference default (wavebank.py:446)
            if max_end is not None and max_end + min_gap < start:
                gaps.append(
                    {
                        "network": network,
                        "station": station,
                        "location": location,
                        "channel": channel,
                        "gap_start": max_end,
                        "gap_end": start,
                        "gap_duration": start - max_end,
                    }
                )
            max_end = end if max_end is None else max(max_end, end)

    state.update((max_end, min_gap))
    yield pd.DataFrame(
        gaps,
        columns=[
            "network", "station", "location", "channel",
            "gap_start", "gap_end", "gap_duration",
        ],
    )


def streaming_gap_detector(segments: DataFrame) -> DataFrame:
    """Unbounded gap detection keyed by NSLC.

    Works on a streaming DataFrame of index rows (append output mode).
    Gap semantics match :func:`obsplus_spark.operators.gaps.gaps_df` for
    in-order arrivals; cross-batch continuity is what the state buys over
    re-running the batch operator per micro-batch.
    """
    return segments.groupBy(
        "network", "station", "location", "channel"
    ).applyInPandasWithState(
        _detect_gaps,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
