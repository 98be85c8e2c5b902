"""Stream == batch for the three north-rule streaming window shapes
(streaming/windows.py): sliding event-time windows, the stream-stream
interval join, and keyed CEP sequence detection. Input is the sf0.001
events table replayed as time-chunked files (rows shuffled inside each
chunk, so every micro-batch is out-of-order within the watermark); the
batch twin runs the same builder / the events_ops SQL over the static
table."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.operators import events_ops
from dataflow_opinion_analysis_spark.streaming import windows as sw
from tests.conftest import normalize

N_CHUNKS = 5
_MTIME_BASE = 1_600_000_000


def _chunked_events(spark, dest: str, n_chunks: int = N_CHUNKS):
    """Replay sf0.001 events into `dest` as n time-ordered part files
    (file mtimes pinned so readStream processes them in event-time
    order; rows inside each file are shuffled)."""
    # watermarks require TIMESTAMP (LTZ); the testdata parquet is NTZ
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    pdf = src.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n = len(pdf)
    seen: set[str] = set()
    for i in range(n_chunks):
        ch = pdf.iloc[i * n // n_chunks : (i + 1) * n // n_chunks]
        ch = ch.sample(frac=1, random_state=i)
        spark.createDataFrame(ch, src.schema).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        _pin_new_mtimes(dest, seen, _MTIME_BASE + i)
    return src.schema


def _pin_new_mtimes(dest: str, seen: set[str], t: int) -> None:
    for f in os.listdir(dest):
        p = os.path.join(dest, f)
        if f.endswith(".parquet") and p not in seen:
            os.utime(p, times=(t, t))
            seen.add(p)


def _append_sentinels(spark, dest: str, ts: str) -> None:
    """Far-future single events (negative user_ids) that advance the
    global watermark so state drains; they can never form a pattern or
    a join pair, so batch and stream may both read them."""
    t = datetime.datetime.fromisoformat(ts)
    rows = [
        (-101, t, -1, "view", 0.0, None),
        (-102, t + datetime.timedelta(seconds=1), -2, "purchase", 0.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("append").parquet(dest)


def _read_stream(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _drain(spark, sdf, name: str, mode: str, src_dir: str, sentinels: bool):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    if sentinels:
        # two flushes: the first advances the watermark past all real
        # data, the second lets every EventTimeTimeout fire
        _append_sentinels(spark, src_dir, "2030-01-01 00:00:00")
        q.processAllAvailable()
        _append_sentinels(spark, src_dir, "2030-01-01 01:00:00")
        q.processAllAvailable()
    q.stop()
    return spark.table(name)


def _assert_equal(stream_df, batch_df):
    a = normalize(stream_df.toPandas())
    b = normalize(batch_df.toPandas())
    assert len(a) == len(b), f"{len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_sliding_agg_stream_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev_slide")
    schema = _chunked_events(spark, d)
    out = _drain(
        spark,
        sw.sliding_agg_stream(_read_stream(spark, d, schema)),
        "slide_mem",
        "complete",
        d,
        sentinels=False,
    )
    batch = sw.sliding_agg_stream(spark.read.parquet(d))
    _assert_equal(out, batch)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev_join")
    schema = _chunked_events(spark, d)
    out = _drain(
        spark,
        sw.interval_join_stream(_read_stream(spark, d, schema)),
        "ijoin_mem",
        "append",
        d,
        sentinels=True,
    )
    batch = sw.interval_join_stream(spark.read.parquet(d))
    _assert_equal(out, batch)
    # and against the events_ops SQL semantics (sf_dir layout: the
    # chunk dir doubles as <sf>/events.parquet)
    sf = str(tmp_path / "sf_join")
    os.makedirs(sf)
    os.symlink(d, os.path.join(sf, "events.parquet"))
    _assert_equal(out, events_ops.events_interval_join(spark, sf))


def test_cep_pattern_stream_matches_batch(spark, tmp_path):
    d = str(tmp_path / "ev_cep")
    schema = _chunked_events(spark, d)
    out = _drain(
        spark,
        sw.cep_pattern_stream(_read_stream(spark, d, schema)),
        "cep_mem",
        "append",
        d,
        sentinels=True,
    )
    assert out.count() > 0, "CEP fixture produced no matches — weak test"
    sf = str(tmp_path / "sf_cep")
    os.makedirs(sf)
    os.symlink(d, os.path.join(sf, "events.parquet"))
    _assert_equal(out, events_ops.events_cep_pattern(spark, sf))


def test_cep_stream_dedupes_redelivered_file(spark, tmp_path):
    """An at-least-once source redelivers a whole chunk: the keyed-state
    event_id fence plus the sub-watermark straggler drop must keep the
    emitted matches identical to the clean replay."""
    d = str(tmp_path / "ev_cep_re")
    schema = _chunked_events(spark, d)
    sdf = sw.cep_pattern_stream(_read_stream(spark, d, schema))
    q = (
        sdf.writeStream.format("memory")
        .queryName("cep_re_mem")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # redeliver the oldest chunk verbatim (new file, same rows)
    first = sorted(
        (os.path.getmtime(os.path.join(d, f)), f)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )[0][1]
    dup = spark.read.parquet(os.path.join(d, first))
    dup.coalesce(1).write.mode("append").parquet(d)
    q.processAllAvailable()
    _append_sentinels(spark, d, "2030-01-01 00:00:00")
    q.processAllAvailable()
    _append_sentinels(spark, d, "2030-01-01 01:00:00")
    q.processAllAvailable()
    q.stop()
    out = spark.table("cep_re_mem")

    sf = str(tmp_path / "sf_cep_re")
    os.makedirs(sf)
    # batch ground truth: the ORIGINAL rows only (drop the dup file's
    # rows via distinct on event_id — they are verbatim copies)
    spark.read.parquet(d).dropDuplicates(["event_id"]).write.parquet(
        os.path.join(sf, "events.parquet")
    )
    _assert_equal(out, events_ops.events_cep_pattern(spark, sf))


def test_windowed_agg_table_continuous_aggregate(spark, tmp_path):
    """The continuous-materialized-aggregate composition: append-mode
    sliding aggregate -> exactly-once MergeTable keyed by (window_start,
    event_type). The durable table must equal the batch aggregate for
    every finalized window, and a full replay into the SAME table (fresh
    checkpoint) must change nothing."""
    d = str(tmp_path / "ev_cagg")
    schema = _chunked_events(spark, d)

    def run(ckpt):
        q, table = sw.run_windowed_agg_table(
            spark, d, schema, str(tmp_path / "store"), str(tmp_path / ckpt)
        )
        q.processAllAvailable()
        _append_sentinels(spark, d, "2030-01-01 00:00:00")
        q.processAllAvailable()
        _append_sentinels(spark, d, "2030-01-01 01:00:00")
        q.processAllAvailable()
        q.stop()
        return table

    table = run("ck1")
    cutoff = "2029-01-01"
    got = table.read().filter(F.col("window_start") < cutoff)
    want = sw.sliding_agg_stream(spark.read.parquet(d)).filter(
        F.col("window_start") < cutoff
    )
    _assert_equal(got, want)
    n1 = table.read().count()

    # replay: same input, same store, fresh checkpoint -> no change
    table2 = run("ck2")
    assert table2.read().count() == n1
    _assert_equal(
        table2.read().filter(F.col("window_start") < cutoff), want)
