"""Streaming vector-index writer: micro-batched IVF+PQ code assignment
against a frozen on-disk model must (1) converge to the one-shot batch
assignment, (2) survive a stop/restart on the same checkpoint + store,
and (3) reload the model artifact rather than refit (train-once /
serve-forever)."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest

from dataflow_opinion_analysis_spark.operators import similarity
from dataflow_opinion_analysis_spark.streaming import vector_index
from tests.conftest import SF_DIR


def _write_waves(input_dir: str, lo: int, hi: int, n_files: int) -> None:
    os.makedirs(input_dir, exist_ok=True)
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").sort_by("vec_id")
    ids = t.column("vec_id").to_pylist()
    rows = [i for i, d in enumerate(ids) if lo <= d < hi]
    t = t.take(rows)
    per = (len(t) + n_files - 1) // n_files
    base = time.time() - 1000
    for k in range(n_files):
        part = t.slice(k * per, per)
        p = os.path.join(input_dir, f"wave-{lo + k:04d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (base + k, base + k))


def _batch_expected(spark):
    """The one-shot composition: IVF assignment ⋈ PQ codes."""
    assigns = similarity.similarity_ivf_assignments(spark, SF_DIR)
    codes = similarity.embedding_quantize_pq(spark, SF_DIR).select(
        "vec_id", "codes_str"
    )
    return {
        (int(r["vec_id"]), int(r["cent_id"]), r["codes_str"])
        for r in assigns.join(codes, "vec_id").collect()
    }


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    n_total = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows

    # phase 1: first half, two micro-batches
    _write_waves(input_dir, 0, n_total // 2, 2)
    q, table = vector_index.run_vector_index_stream(
        spark, input_dir, store, ckpt, fit_dir=SF_DIR, max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()
    assert table.read().count() == n_total // 2
    assert os.path.exists(os.path.join(store, vector_index.MODEL_FILE))

    # phase 2: RESTART on the same checkpoint/store, second half arrives
    _write_waves(input_dir, n_total // 2, n_total, 1)
    q, table = vector_index.run_vector_index_stream(
        spark, input_dir, store, ckpt, fit_dir=SF_DIR, max_files_per_trigger=1
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (int(r["vec_id"]), int(r["cent_id"]), r["codes_str"])
        for r in table.read().collect()
    }
    assert got == _batch_expected(spark)


def test_model_artifact_wins_over_refit(spark, tmp_path, monkeypatch):
    """Once model.json exists, a new run must LOAD it — never refit: the
    fit functions are poisoned and the writer must still work."""
    store = str(tmp_path / "store")
    model = vector_index.fit_or_load_model(spark, store, SF_DIR)

    def _boom(*a, **k):
        raise AssertionError("refit attempted despite frozen model.json")

    monkeypatch.setattr(similarity, "ivf_fit_centroids", _boom)
    monkeypatch.setattr(similarity, "pq_fit_codebooks", _boom)
    loaded = vector_index.fit_or_load_model(spark, store, SF_DIR)
    assert loaded == {
        "cents": [(c, list(v)) for c, v in model["cents"]],
        "books": [(m, c, list(v)) for m, c, v in model["books"]],
    }

    input_dir = str(tmp_path / "in")
    _write_waves(input_dir, 0, 50, 1)
    q, table = vector_index.run_vector_index_stream(
        spark, input_dir, store, str(tmp_path / "ckpt"),
        fit_dir=SF_DIR, max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    assert table.read().count() == 50


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-sent rows (same vec_id in a later batch) keep their original
    codes and never duplicate keys."""
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    _write_waves(input_dir, 0, 100, 1)
    q, table = vector_index.run_vector_index_stream(
        spark, input_dir, store, str(tmp_path / "ckpt"),
        fit_dir=SF_DIR, max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    before = sorted(
        (int(r["vec_id"]), r["codes_str"]) for r in table.read().collect()
    )
    # upstream misbehaves: the same rows arrive again as a NEW file
    # (new filename => new source offset => genuinely reprocessed batch)
    p2 = os.path.join(input_dir, "wave-dupe.parquet")
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").sort_by("vec_id")
    pq.write_table(t.slice(0, 100), p2)
    q, table = vector_index.run_vector_index_stream(
        spark, input_dir, store, str(tmp_path / "ckpt"),
        fit_dir=SF_DIR, max_files_per_trigger=1,
    )
    q.processAllAvailable()
    q.stop()
    after = sorted(
        (int(r["vec_id"]), r["codes_str"]) for r in table.read().collect()
    )
    assert after == before
