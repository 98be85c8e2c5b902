"""Direct unit tests of streaming/threads.assemble_threads_fn through a
fake GroupState: the at-most-once redelivery fence the assume_new sink
merges rely on. These drive the exact watermark edges a real stream
cannot pin deterministically (ts == watermark, overflow above the
watermark) — the scenarios where a per-turn newest-ts MAP (the previous
fence) re-admits an already-emitted version once a second version of the
same turn replaces its entry, committing a duplicate WebResourceHash.
"""

from __future__ import annotations

import pandas as pd

from dataflow_opinion_analysis_spark.streaming.threads import assemble_threads_fn


class FakeState:
    """Mimics pyspark GroupState for direct calls: tuple state, a
    settable watermark (ms), update/remove/timeout bookkeeping."""

    def __init__(self, wm_ms=0):
        self._state = None
        self._wm_ms = wm_ms
        self.hasTimedOut = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        return self._state

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def update(self, v):
        self._state = v

    def remove(self):
        self._state = None

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms


def _batch(rows):
    # rows: (turn_idx, ts_us) -> the pdf shape the fn reads
    return pd.DataFrame(
        {
            "turn_idx": [r[0] for r in rows],
            "role": ["user"] * len(rows),
            "text": [f"t{r[0]}" for r in rows],
            "tool": [""] * len(rows),
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
        }
    )


def _run(state, rows):
    out = list(assemble_threads_fn(("c1",), iter([_batch(rows)]), state))
    if not out:
        return pd.DataFrame(columns=["turn_idx", "ts", "status", "ts_us"])
    df = pd.concat(out, ignore_index=True)
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    return df


US = 1_000_000  # 1s in micros


def test_redelivery_at_watermark_edge_not_emitted_twice():
    """Version (0, t1) emitted 'ok' with watermark == t1 exactly; a newer
    version (0, t2) then arrives; (0, t1) is redelivered while the
    watermark still sits at t1. The map-based fence re-admitted and
    re-emitted it; the version-set fence must not."""
    t1, t2 = 100 * US, 150 * US
    st = FakeState(wm_ms=t1 // 1000)  # watermark == t1
    out1 = _run(st, [(0, t1)])
    assert list(out1.status) == ["ok"] and list(out1.ts_us) == [t1]

    # newer version of the same turn (above watermark -> pending)
    out2 = _run(st, [(0, t2)])
    assert len(out2) == 0

    # redelivery of the emitted version, watermark unchanged
    out3 = _run(st, [(0, t1)])
    dup = out3[(out3.ts_us == t1) & (out3.status != "late")]
    assert len(dup) == 0, "emitted version re-admitted and re-emitted 'ok'"


def test_overflow_emitted_version_not_reemitted():
    """An 'overflow'-forced emission sits ABOVE the watermark; its
    redelivery must not re-enter pending and emit again. Runs at the
    DEFAULT constants: overflow implies > PENDING_CAP above-watermark
    pairs, far over SEEN_CAP, so this also pins that eviction keeps the
    overflow-EMITTED pairs (they are the oldest — a recency clamp
    evicts exactly them)."""
    from dataflow_opinion_analysis_spark.streaming.threads import (
        PENDING_CAP,
        SEEN_CAP,
    )

    assert SEEN_CAP < PENDING_CAP  # the regime that made recency wrong
    base = 1_000 * US
    st = FakeState(wm_ms=0)
    rows = [(i, base + i * US) for i in range(PENDING_CAP + 3)]
    out1 = _run(st, rows)
    over = out1[out1.status == "overflow"]
    assert len(over) == 3  # the oldest 3 forced out
    forced = [(int(r.turn_idx), int(r.ts_us)) for r in over.itertuples()]

    # redeliver the forced-out versions: still above watermark, but seen
    out2 = _run(st, [(ti, t) for ti, t in forced])
    assert len(out2) == 0, "overflow-emitted versions re-admitted"


def test_same_batch_two_versions_overflow_then_redelivery():
    """Two versions of one turn in the same batch, the older forced out
    via overflow: only the newest survives in a per-turn map, so a map
    fence forgets the emitted older version — the set fence must not.
    Default constants (eviction active)."""
    from dataflow_opinion_analysis_spark.streaming.threads import PENDING_CAP

    base = 1_000 * US
    st = FakeState(wm_ms=0)
    rows = [(i, base + i * US) for i in range(PENDING_CAP + 1)]
    rows.append((0, base - US))  # second, older version of turn 0
    out1 = _run(st, rows)
    assert len(out1[out1.status == "overflow"]) == 2
    # redeliver the older version of turn 0 (emitted via overflow)
    out2 = _run(st, [(0, base - US)])
    assert len(out2) == 0


def test_session_gap_retains_above_watermark_fence(monkeypatch):
    """The session-gap timeout must not remove fence pairs still at/above
    the watermark: an overflow-emitted future-ts version redelivered
    after the gap would otherwise re-enter and emit 'ok' again. State is
    retained (pending empty, fence pairs only) until the watermark passes
    them, then removed."""
    from dataflow_opinion_analysis_spark.streaming import threads

    monkeypatch.setattr(threads, "PENDING_CAP", 0)
    wm = 1_000 * US
    st = FakeState(wm_ms=wm // 1000)
    # both rows sit ABOVE the watermark and are force-emitted 'overflow'
    # (cap 0) — pending is empty while their fence pairs are still live
    rows = [(0, wm + 5 * US), (1, wm + 6 * US)]
    out1 = _run(st, rows)
    assert list(out1.status) == ["overflow", "overflow"]
    assert st.exists

    # session-gap timeout fires while those ts are above the watermark:
    # state must be RETAINED, not removed
    st.hasTimedOut = True
    list(assemble_threads_fn(("c1",), iter([]), st))
    assert st.exists, "session gap removed a live above-watermark fence"
    st.hasTimedOut = False
    # redelivery of an overflow-emitted version is still fenced
    out2 = _run(st, [(0, wm + 5 * US)])
    assert len(out2) == 0

    # once the watermark passes every fence pair, the next gap removes
    st._wm_ms = (wm + 60 * US) // 1000
    st.hasTimedOut = True
    list(assemble_threads_fn(("c1",), iter([]), st))
    assert not st.exists


def test_eviction_keeps_fence_pairs_above_watermark(monkeypatch):
    """SEEN_CAP eviction must drop below-watermark pairs (redelivery is
    'late', harmless) while protecting at/above-watermark pairs — the
    ones whose loss re-opens duplicate emission."""
    from dataflow_opinion_analysis_spark.streaming import threads

    monkeypatch.setattr(threads, "PENDING_CAP", 4)
    monkeypatch.setattr(threads, "SEEN_CAP", 6)
    wm = 1_000 * US
    st = FakeState(wm_ms=wm // 1000)
    # 5 late versions (below wm) + 5 above-wm rows: 4 stay pending, the
    # oldest above-wm row is forced out via overflow; 10 pairs > cap 6
    rows = [(i, i * US) for i in range(5)]
    rows += [(10 + i, wm + (i + 1) * US) for i in range(5)]
    out1 = _run(st, rows)
    forced = out1[out1.status == "overflow"]
    assert len(forced) == 1
    ti, t = int(forced.iloc[0].turn_idx), int(forced.iloc[0].ts_us)
    # the overflow-emitted pair survived eviction: redelivery is fenced
    out2 = _run(st, [(ti, t)])
    assert len(out2) == 0


def test_fence_survives_seen_only_state():
    """After everything pending drains, the seen set alone persists (for
    the session gap) and still fences redeliveries."""
    t1 = 100 * US
    st = FakeState(wm_ms=t1 // 1000)
    _run(st, [(0, t1)])  # emitted ok, state = seen only
    assert st.exists
    out = _run(st, [(0, t1)])
    assert len(out) == 0


def test_distinct_versions_both_emit_and_parent_is_newest():
    """The fence must not drop genuinely distinct versions, and the
    parent link resolves to the NEWEST observed version of turn-1 even
    when the older version arrived second."""
    t1, t2, t3 = 100 * US, 90 * US, 200 * US
    st = FakeState(wm_ms=0)
    _run(st, [(0, t1)])
    _run(st, [(0, t2)])  # older version, arrives later
    # drain: watermark far ahead; both versions of turn 0 plus turn 1 emit
    st._wm_ms = 10_000_000
    out = _run(st, [(1, t3)])
    v0 = out[out.turn_idx == 0]
    assert sorted(v0.ts_us) == [t2, t1] and set(v0.status) == {"ok"}
    p1 = out[out.turn_idx == 1]
    assert len(p1) == 1
    parent = p1.iloc[0]["parent_ts"]
    assert pd.Timestamp(parent).value // 1000 == t1  # newest, not last-arrived
