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


#: sentinel "no carry-in yet": large enough that prev + min_gap < start is
#: always false (matching the loop semantics: no comparison before the
#: first-ever row), far from int64 overflow when a min_gap is added
_NO_CARRY = 2**62


def _detect_gaps(key, pdf_iter, state: GroupState):
    """Per-key stateful kernel: running-max end across micro-batches.

    Vectorized: the per-row running max is ``np.maximum.accumulate`` over
    the sorted batch shifted by one (seeded with the carried state), and
    gap detection is one boolean mask — no Python-level row iteration.
    """
    import numpy as np
    import pandas as pd

    network, station, location, channel = key
    if state.exists:
        max_end, min_gap = state.get
    else:
        max_end, min_gap = None, 0

    cols = [
        "network", "station", "location", "channel",
        "gap_start", "gap_end", "gap_duration",
    ]
    out = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["starttime", "endtime"])
        starts = pdf["starttime"].to_numpy(np.int64)
        ends = pdf["endtime"].to_numpy(np.int64)
        # reference default threshold 1.5 × sampling period, per row
        # (wavebank.py:446); floor matches the loop's int() truncation
        min_gaps = (1.5 * pdf["sampling_period"].to_numpy(np.int64)).astype(np.int64)
        # running max of end seen BEFORE each row, seeded with the carry-in
        prev = np.empty_like(ends)
        prev[0] = _NO_CARRY if max_end is None else max_end
        prev[1:] = np.maximum.accumulate(ends[:-1])
        if max_end is not None:
            np.maximum(prev, max_end, out=prev)
        mask = prev + min_gaps < starts
        if mask.any():
            g_start = prev[mask]
            g_end = starts[mask]
            out.append(
                pd.DataFrame(
                    {
                        "network": network,
                        "station": station,
                        "location": location,
                        "channel": channel,
                        "gap_start": g_start,
                        "gap_end": g_end,
                        "gap_duration": g_end - g_start,
                    },
                    columns=cols,
                )
            )
        batch_max = int(ends.max())
        max_end = batch_max if max_end is None else max(max_end, batch_max)
        min_gap = int(min_gaps[-1])

    state.update((max_end, min_gap))
    yield (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame({c: [] for c in cols})
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
