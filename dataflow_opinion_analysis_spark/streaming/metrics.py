"""Throughput / watermark-lag metrics for streaming queries
(BASELINE.md target metrics; the reference has no metrics story at all).

Attach a listener to the session and every micro-batch's progress is
appended to a JSONL file + kept in memory: processedRowsPerSecond,
input rows, batch duration, event-time watermark, and watermark lag
(wall clock - watermark). ``summary()`` aggregates the run.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql.streaming import StreamingQueryListener


def _parse_ts(s: str | None) -> _dt.datetime | None:
    if not s:
        return None
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return None


class ThroughputListener(StreamingQueryListener):
    def __init__(self, out_path: str | None = None):
        self.out_path = out_path
        self.rows: list[dict] = []
        if out_path:
            os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        wm = _parse_ts((p.eventTime or {}).get("watermark"))
        now = _dt.datetime.now(_dt.timezone.utc)
        rec = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "watermark": (p.eventTime or {}).get("watermark"),
            "watermark_lag_sec": (now - wm).total_seconds() if wm else None,
            "state_rows": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            )
            if p.stateOperators
            else 0,
        }
        self.rows.append(rec)
        if self.out_path:
            with open(self.out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def summary(self) -> dict:
        data = [r for r in self.rows if r["num_input_rows"]]
        if not data:
            return {"batches": 0}
        total_rows = sum(r["num_input_rows"] for r in data)
        total_ms = sum(r["batch_duration_ms"] or 0 for r in data)
        lags = [r["watermark_lag_sec"] for r in data if r["watermark_lag_sec"] is not None]
        return {
            "batches": len(data),
            "total_rows": total_rows,
            "wall_sec_in_batches": round(total_ms / 1000.0, 2),
            "rows_per_sec": round(total_rows / (total_ms / 1000.0), 1) if total_ms else None,
            "max_state_rows": max(r["state_rows"] for r in data),
            "final_watermark": data[-1]["watermark"],
            "median_watermark_lag_sec": sorted(lags)[len(lags) // 2] if lags else None,
        }


def attach(spark, out_path: str | None = None) -> ThroughputListener:
    lst = ThroughputListener(out_path)
    spark.streams.addListener(lst)
    return lst
