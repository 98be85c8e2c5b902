"""Stateful thread reconstruction — the streaming twin of the batch
``lag()`` parent-link derivation (operators/ingest.py), and the Spark
re-expression of the reference's Reddit post⋈comments thread assembly
(CoGroupByKey + per-thread loop, IndexerPipeline.java:489-613).

Keyed ``applyInPandasWithState`` on ``conv_id`` with event-time timeouts:

- incoming turns are buffered in keyed state until the event-time
  watermark passes their ``ts`` (so out-of-order turns inside the
  allowed lateness are emitted in stable ``turn_idx`` order — the
  BASELINE.json invariant);
- each emitted turn carries ``parent_ts`` resolved from the
  conversation's seen-turns map (parent = turn_idx - 1), exactly what
  the batch ``lag`` computes;
- turns arriving *behind* the watermark are emitted with
  ``status='late'`` (the sink filters and counts them — the reference
  has no late-data story at all, SURVEY.md §2.12 R3);
- per-conversation state is bounded: the seen-turns map keeps the most
  recent ``SEEN_CAP`` turn timestamps and the pending buffer at most
  ``PENDING_CAP`` turns (hot-conversation protection at 10^12-turn
  scale; overflow turns are emitted immediately with
  ``status='overflow'`` rather than growing state).

Group logic is pandas-vectorized (masks + Series.map), no per-row Python;
state is plain Spark SQL arrays, no pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_CAP = 4096
PENDING_CAP = 65536

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("parent_ts", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("p_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("p_role", T.ArrayType(T.StringType())),
        T.StructField("p_text", T.ArrayType(T.StringType())),
        T.StructField("p_tool", T.ArrayType(T.StringType())),
        T.StructField("p_ts", T.ArrayType(T.LongType())),  # micros
        T.StructField("s_turn_idx", T.ArrayType(T.IntegerType())),
        T.StructField("s_ts", T.ArrayType(T.LongType())),  # micros
    ]
)

_PCOLS = ["turn_idx", "role", "text", "tool", "ts_us"]


def assemble_threads_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        (p_idx, p_role, p_text, p_tool, p_ts, s_idx, s_ts) = state.get
        pending = pd.DataFrame(
            {"turn_idx": p_idx, "role": p_role, "text": p_text, "tool": p_tool, "ts_us": p_ts}
        )
        seen = pd.Series(list(s_ts), index=list(s_idx), dtype="int64")
    else:
        pending = pd.DataFrame(columns=_PCOLS)
        seen = pd.Series(dtype="int64")

    wm_us = state.getCurrentWatermarkMs() * 1000
    late: pd.DataFrame | None = None

    if not state.hasTimedOut:
        parts = []
        for pdf in pdfs:
            if len(pdf):
                p = pdf[["turn_idx", "role", "text", "tool"]].copy()
                p["ts_us"] = pdf["ts"].astype("int64") // 1000
                parts.append(p)
        if parts:
            new = pd.concat(parts, ignore_index=True)
            # update the seen map with the newest ts per turn_idx
            upd = new.groupby("turn_idx")["ts_us"].max()
            seen = upd.combine_first(seen).astype("int64")
            late_mask = (wm_us > 0) & (new["ts_us"] < wm_us)
            late = new[late_mask]
            pending = pd.concat([pending, new[~late_mask]], ignore_index=True)

    # emit everything the watermark has passed, in stable turn_idx order
    pending = pending.sort_values(["turn_idx", "ts_us"], kind="stable")
    ripe_mask = pending["ts_us"].astype("int64") <= wm_us
    if (~ripe_mask).sum() > PENDING_CAP:
        # hot-conversation overflow: force-emit the oldest overflow turns
        overflow_n = int((~ripe_mask).sum()) - PENDING_CAP
        overflow_idx = pending.index[~ripe_mask][:overflow_n]
        ripe_mask.loc[overflow_idx] = True
        pending = pending.assign(
            _overflow=pending.index.isin(overflow_idx)
        )
    else:
        pending = pending.assign(_overflow=False)

    ripe = pending[ripe_mask]
    still = pending[~ripe_mask].drop(columns="_overflow")

    frames = []
    if late is not None and len(late):
        lf = late.copy()
        lf["status"] = "late"
        frames.append(lf)
    if len(ripe):
        rf = ripe.copy()
        rf["status"] = rf["_overflow"].map({True: "overflow", False: "ok"})
        frames.append(rf.drop(columns="_overflow"))

    # bound the seen map (keep highest turn idxs — parents of future turns)
    if len(seen) > SEEN_CAP:
        seen = seen.sort_index().iloc[-SEEN_CAP:]

    if len(still) or len(seen):
        state.update(
            (
                still["turn_idx"].astype("int32").tolist(),
                still["role"].tolist(),
                still["text"].tolist(),
                still["tool"].tolist(),
                still["ts_us"].astype("int64").tolist(),
                [int(i) for i in seen.index],
                [int(v) for v in seen.values],
            )
        )
        if len(still):
            # wake when the watermark passes the earliest pending turn
            state.setTimeoutTimestamp(int(still["ts_us"].min()) // 1000 + 1)
        else:
            # keep the seen-map for a session gap, then drop it
            state.setTimeoutTimestamp(max(wm_us // 1000, 1) + 30 * 60 * 1000)
    else:
        state.remove()

    if frames:
        out = pd.concat(frames, ignore_index=True)
        out["conv_id"] = conv_id
        out["parent_us"] = (out["turn_idx"] - 1).map(seen)
        out["ts"] = pd.to_datetime(out["ts_us"], unit="us")
        out["parent_ts"] = pd.to_datetime(out["parent_us"], unit="us")
        yield out[
            ["conv_id", "turn_idx", "role", "text", "tool", "ts", "parent_ts", "status"]
        ]


def assemble_threads(stream: DataFrame) -> DataFrame:
    """Streaming transcripts (with watermark already applied) ->
    watermark-ordered turns with parent_ts + status."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        assemble_threads_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
