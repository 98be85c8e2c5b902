"""Incremental dataprep: two id-ordered ingest waves + refreshes must
reproduce the one-shot composed pipeline row-for-row; refreshes are
cursor-tracked, idempotent under replay, and no-ops on empty deltas.
(Oracle-side equivalence — incremental vs the full DuckDB chain — is
the `dataprep_incremental` gate.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.operators.dataprep_incremental import (
    IncrementalDataPrep,
)
from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
    build_dataprep,
)
from tests.conftest import SF_DIR

COLS = ["doc_id", "lang", "n_tokens", "start_offset",
        "first_chunk", "last_chunk", "n_chunks", "scrubbed_hash"]


def test_two_waves_equal_full_run(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prep = IncrementalDataPrep(spark, str(tmp_path / "store"))
    r0 = prep.refresh(wave_id=99)
    assert r0 == {"new_docs": 0, "packed": 0, "cursor": prep.cursor()}

    prep.ingest(docs.filter(F.col("doc_id") < 250), wave_id=0)
    r1 = prep.refresh(wave_id=0)
    assert r1["new_docs"] == 250 and r1["packed"] > 0
    prep.ingest(docs.filter(F.col("doc_id") >= 250), wave_id=1)
    r2 = prep.refresh(wave_id=1)
    assert r2["new_docs"] == 250 and r2["packed"] > 0

    incr = prep.packed.read().select(COLS)
    full = build_dataprep(spark, docs).packed.select(COLS)
    assert incr.count() == full.count()
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0

    # cursor advanced; a refresh with nothing new is a no-op
    cur = prep.cursor()
    assert cur["docs_version"] == prep.docs.current_snapshot()["version"]
    assert cur["total_tokens"] > 0
    r3 = prep.refresh(wave_id=2)
    assert r3["new_docs"] == 0 and prep.packed.read().count() == incr.count()


def test_replayed_wave_is_idempotent(spark, tmp_path):
    """Crash-after-stores-before-cursor: replaying the SAME wave id
    re-derives identical rows and every MergeTable MERGE short-circuits
    or anti-joins them away — table contents unchanged."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prep = IncrementalDataPrep(spark, str(tmp_path / "store"))
    prep.ingest(docs.filter(F.col("doc_id") < 250), wave_id=0)
    prep.refresh(wave_id=0)
    before = {t: getattr(prep, t).read().count()
              for t in ("norm_hashes", "bands", "packed")}
    good_cursor = prep.cursor()
    # simulate the crash: cursor rolled back, stores already committed
    prep._save_cursor({"docs_version": 0, "total_tokens": 0})
    r = prep.refresh(wave_id=0)
    assert r["packed"] == 0  # packed merge fenced by the replayed wave id
    after = {t: getattr(prep, t).read().count()
             for t in ("norm_hashes", "bands", "packed")}
    assert before == after
    # the replay must RECONSTRUCT the wave (the store now contains its own
    # claims — an anti-join against it would re-derive an EMPTY wave,
    # silently dropping the rows and resetting the token cursor): the
    # cursor must land back on the pre-crash offsets exactly
    assert prep.cursor() == good_cursor

    # and the NEXT wave must still line up with the one-shot pipeline
    prep.ingest(docs.filter(F.col("doc_id") >= 250), wave_id=1)
    prep.refresh(wave_id=1)
    incr = prep.packed.read().select(COLS)
    full = build_dataprep(spark, docs).packed.select(COLS)
    assert incr.count() == full.count()
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0
