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

Performance note: ``applyInPandasWithState`` invokes the function once
per GROUP. Conversation groups are tiny (~10 turns), so at scale the
stage cost is (number of active conversations) × (per-call constant),
not row volume. The group logic is therefore plain Python over lists
and dicts — for a 10-row group that is ~10× cheaper than the same
logic as pandas ops (each pandas call carries ~50-100µs of dispatch
overhead; 15 of them per group once measured 0.8ms/group ≈ 70% of
total stream time). Row data still crosses the JVM/Python boundary as
Arrow record batches, and groups that emit nothing this batch build no
DataFrame at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_CAP = 4096
PENDING_CAP = 65536

# int64 pattern of numpy NaT — viewing it as datetime64[us] yields NaT
# (missing parent_ts without a float round-trip)
_NAT_US = np.int64(np.iinfo(np.int64).min)

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
    # rows are (turn_idx, role, text, tool, ts_us) tuples
    if state.exists:
        (p_idx, p_role, p_text, p_tool, p_ts, s_idx, s_ts) = state.get
        pending = list(zip(p_idx, p_role, p_text, p_tool, p_ts))
        seen = dict(zip(s_idx, s_ts))
    else:
        pending = []
        seen = {}

    wm_us = state.getCurrentWatermarkMs() * 1000
    late_rows: list[tuple] = []

    if not state.hasTimedOut:
        # redelivery fence: a turn VERSION is identified by (turn_idx, ts).
        # An at-least-once source may deliver the same version twice — in
        # one batch, across batches while the original is still pending,
        # or after the original was emitted. The first two are caught by
        # the pending-key set; the last by the seen map (seen[turn_idx]
        # records the newest ts ever observed for the turn, so an exact
        # re-arrival matches it — and an emitted turn's ts is always in
        # seen, since emission requires having observed it). Deduping HERE
        # — per conversation, in the already-grouped state stage, zero
        # extra shuffle — is what lets the sink merges run with
        # assume_unique/assume_new (tables/mergetable.py) instead of
        # re-deduplicating three wide fan-out frames per micro-batch.
        # (A redelivery after emission is *usually* behind the watermark
        # and routed 'late' anyway; the seen check also closes the ts ==
        # watermark edge where it would have been emitted twice.)
        pkeys = {(r[0], r[4]) for r in pending}
        for pdf in pdfs:
            if not len(pdf):
                continue
            idx = pdf["turn_idx"].tolist()
            role = pdf["role"].tolist()
            text = pdf["text"].tolist()
            tool = pdf["tool"].tolist()
            ts_us = (pdf["ts"].to_numpy("datetime64[us]").astype("int64")).tolist()
            # this batch's newest ts per turn_idx REPLACES the seen entry
            # (matches the original combine_first orientation)
            newmax: dict[int, int] = {}
            for i in range(len(idx)):
                ti, t = int(idx[i]), ts_us[i]
                if (ti, t) in pkeys or seen.get(ti) == t:
                    continue  # duplicate delivery of a known version
                pkeys.add((ti, t))
                if newmax.get(ti, -1) < t:
                    newmax[ti] = t
                row = (ti, role[i], text[i], tool[i], t)
                if wm_us > 0 and t < wm_us:
                    late_rows.append(row)
                else:
                    pending.append(row)
            seen.update(newmax)

    # emit everything the watermark has passed, in stable turn_idx order
    # (list.sort is stable: arrival order breaks (turn_idx, ts) ties,
    # exactly like the former sort_values(kind="stable"))
    pending.sort(key=lambda r: (r[0], r[4]))
    ripe = [r for r in pending if r[4] <= wm_us]
    still = [r for r in pending if r[4] > wm_us]
    n_overflow = len(still) - PENDING_CAP
    overflow: list[tuple] = []
    if n_overflow > 0:
        # hot-conversation overflow: force-emit the oldest overflow turns
        overflow, still = still[:n_overflow], still[n_overflow:]

    # bound the seen map (keep highest turn idxs — parents of future turns)
    if len(seen) > SEEN_CAP:
        seen = dict(sorted(seen.items())[-SEEN_CAP:])

    if len(still) or (len(seen) and not state.hasTimedOut):
        state.update(
            (
                [int(r[0]) for r in still],
                [r[1] for r in still],
                [r[2] for r in still],
                [r[3] for r in still],
                [int(r[4]) for r in still],
                [int(i) for i in seen],
                [int(v) for v in seen.values()],
            )
        )
        if len(still):
            # wake when the watermark passes the earliest pending turn
            state.setTimeoutTimestamp(min(r[4] for r in still) // 1000 + 1)
        else:
            # keep the seen-map for a session gap, then drop it
            state.setTimeoutTimestamp(max(wm_us // 1000, 1) + 30 * 60 * 1000)
    else:
        # either nothing tracked at all, or the session-gap timeout fired
        # with no pending turns: the conversation is over — REMOVE the
        # state. (Re-arming on timeout would retain every conversation
        # ever seen and grow the store O(history) — the exact unbounded
        # state the north rule forbids at 10^12-turn scale. A turn
        # arriving after removal is behind the watermark by construction,
        # so it is emitted with status='late' regardless of state.)
        state.remove()

    n_late, n_ripe = len(late_rows), len(ripe) + len(overflow)
    if n_late or n_ripe:
        # overflow and ripe rows interleave back into (turn_idx, ts) order
        # (both sublists are already sorted and cannot tie across lists:
        # ripe ts <= wm < overflow ts — so this reproduces the single
        # stable sort of the pending frame exactly); late rows lead, in
        # arrival order
        tagged = sorted(
            [(r, "overflow") for r in overflow] + [(r, "ok") for r in ripe],
            key=lambda p: (p[0][0], p[0][4]),
        )
        rows = late_rows + [p[0] for p in tagged]
        status = ["late"] * n_late + [p[1] for p in tagged]
        ts_col = np.fromiter((r[4] for r in rows), dtype="int64", count=len(rows))
        parent_col = np.fromiter(
            (seen.get(r[0] - 1, _NAT_US) for r in rows), dtype="int64", count=len(rows)
        )
        yield pd.DataFrame(
            {
                "conv_id": [conv_id] * len(rows),
                "turn_idx": np.fromiter(
                    (r[0] for r in rows), dtype="int64", count=len(rows)
                ),
                "role": [r[1] for r in rows],
                "text": [r[2] for r in rows],
                "tool": [r[3] for r in rows],
                "ts": ts_col.view("datetime64[us]"),
                "parent_ts": parent_col.view("datetime64[us]"),
                "status": status,
            }
        )


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
