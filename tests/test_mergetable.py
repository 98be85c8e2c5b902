"""Exactly-once MERGE sink semantics (FIXTURES.md §5.6)."""

from __future__ import annotations

import pyspark.sql.functions as F

from dataflow_opinion_analysis_spark.tables.mergetable import MergeTable


def _mk(spark, tmp_path):
    return MergeTable(
        spark,
        str(tmp_path / "t"),
        key_cols=["conv_id", "turn_idx"],
        schema="conv_id string, turn_idx int, v string, date_id int",
        partition_col="date_id",
    )


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, v string, date_id int"
    )


def test_merge_insert_and_replay_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b1 = _df(spark, [("c1", 0, "a", 20240101), ("c1", 1, "b", 20240101)])
    assert t.merge(b1, batch_id=0) == 2
    # replay same batch id -> no-op
    assert t.merge(b1, batch_id=0) == 0
    assert t.read().count() == 2

    # new batch with one duplicate key and one new key -> only new inserted
    b2 = _df(spark, [("c1", 1, "DUP", 20240101), ("c2", 0, "c", 20240102)])
    assert t.merge(b2, batch_id=1) == 1
    out = t.read()
    assert out.count() == 3
    # duplicate key kept the FIRST write's value (insert-if-absent)
    assert out.filter((F.col("conv_id") == "c1") & (F.col("turn_idx") == 1)).collect()[0].v == "b"


def test_merge_partial_retry_with_new_batch_id_still_no_dupes(spark, tmp_path):
    """Even if a retry arrives under a different batch id (worst case),
    the key anti-join prevents duplicates."""
    t = _mk(spark, tmp_path)
    b = _df(spark, [("c1", 0, "a", 20240101)])
    t.merge(b, batch_id=0)
    assert t.merge(b, batch_id=99) == 0
    assert t.read().count() == 1


def test_partition_pruning_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_df(spark, [("c1", 0, "a", 20240101)]), 0)
    t.merge(_df(spark, [("c2", 0, "b", 20240301)]), 1)
    # file-skipping: only the January file overlaps
    assert len(t.files(20240101, 20240131)) == 1
    assert len(t.files()) == 2
    assert t.read(20240101, 20240131).count() == 1


def test_lineage_recorded(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_df(spark, [("c1", 0, "a", 20240101)]), 7)
    lin = t.current_snapshot()["lineage"]
    assert lin[-1]["batch_id"] == 7 and lin[-1]["rows"] == 1
