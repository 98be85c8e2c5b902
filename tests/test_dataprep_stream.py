"""Streaming dataprep: micro-batches over a documents directory must
reproduce the one-shot composed pipeline row-for-row (stream ==
incremental == batch), survive a stop/restart on the same checkpoint +
stores, and no-op on replay. Ordering contract: files arrive in doc_id
order (same assumption as the incremental consumer's waves)."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
    build_dataprep,
)
from dataflow_opinion_analysis_spark.streaming.dataprep_stream import (
    run_dataprep_stream,
)
from tests.conftest import SF_DIR

COLS = ["doc_id", "lang", "n_tokens", "start_offset",
        "first_chunk", "last_chunk", "n_chunks", "scrubbed_hash"]


def _write_waves(input_dir: str, lo: int, hi: int, n_files: int) -> None:
    """Split documents[lo, hi) into ``n_files`` id-ordered parquet files
    with ascending mtimes (the file source picks oldest first)."""
    os.makedirs(input_dir, exist_ok=True)
    t = pq.read_table(f"{SF_DIR}/documents.parquet").sort_by("doc_id")
    ids = t.column("doc_id").to_pylist()
    rows = [i for i, d in enumerate(ids) if lo <= d < hi]
    t = t.take(rows)
    per = (len(t) + n_files - 1) // n_files
    base = time.time() - 1000
    for k in range(n_files):
        part = t.slice(k * per, per)
        p = os.path.join(input_dir, f"wave-{lo + k:04d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (base + k, base + k))


def test_stream_equals_full_batch_and_resumes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    # phase 1: first half of the corpus, two micro-batches
    _write_waves(input_dir, 0, 250, 2)
    q, prep = run_dataprep_stream(
        spark, input_dir, store, ckpt, max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()
    half = build_dataprep(
        spark, docs.filter(F.col("doc_id") < 250), materialize=False
    ).packed.select(COLS)
    got = prep.packed.read().select(COLS)
    assert got.exceptAll(half).count() == 0
    assert half.exceptAll(got).count() == 0

    # phase 2: restart on the same checkpoint + stores, second half lands
    _write_waves(input_dir, 250, 10**9, 2)
    q2, prep2 = run_dataprep_stream(
        spark, input_dir, store, ckpt, max_files_per_trigger=1
    )
    q2.processAllAvailable()
    q2.stop()
    full = build_dataprep(spark, docs, materialize=False).packed.select(COLS)
    got2 = prep2.packed.read().select(COLS)
    assert got2.count() == full.count()
    assert got2.exceptAll(full).count() == 0
    assert full.exceptAll(got2).count() == 0

    # cursor advanced to the docs head; nothing pending
    cur = prep2.cursor()
    assert cur["docs_version"] == prep2.docs.current_snapshot()["version"]
    assert cur["total_tokens"] > 0


def test_fresh_checkpoint_replay_is_idempotent(spark, tmp_path):
    """Wiping the CHECKPOINT but keeping the stores (the disaster-recovery
    path) re-delivers every file under restarted batch ids: the docs
    merge fences them and refresh sees empty deltas — stores unchanged."""
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    _write_waves(input_dir, 0, 250, 2)
    q, prep = run_dataprep_stream(
        spark, input_dir, store, str(tmp_path / "ckpt1"),
        max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    before = {t: getattr(prep, t).read().count()
              for t in ("docs", "norm_hashes", "bands", "packed")}
    assert before["packed"] > 0

    q2, prep2 = run_dataprep_stream(
        spark, input_dir, store, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    q2.processAllAvailable()
    q2.stop()
    after = {t: getattr(prep2, t).read().count()
             for t in ("docs", "norm_hashes", "bands", "packed")}
    assert before == after
