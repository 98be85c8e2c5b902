"""CLI end-to-end paths: strict-scoring dead-lettering from the stream
subcommand, the composed SocialStats JDBC -> wrsocialcount -> statscalc
chain, and fingerprint-store compaction (VERDICT r3 items 5-7)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark import cli

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


@pytest.fixture(autouse=True)
def _keep_session(monkeypatch):
    """cli commands stop their session on exit; inside pytest the session
    is the shared fixture, so stopping is patched out."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)


def _flush(spark, path, ts="2030-01-01 00:00:00", turn_idx=0):
    spark.createDataFrame(
        [("conv-flush", turn_idx, "user", "flush sentinel", None,
          datetime.datetime.fromisoformat(ts))],
        TRANSCRIPT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def test_cli_stream_strict_scoring_dead_letters(spark, tmp_path):
    """`cli stream --strict-scoring --cross-batch-near-dedupe --drain`
    drives a poison doc into the exactly-once dead-letter table — the
    production operator's spark-submit path for K2/F5."""
    from dataflow_opinion_analysis_spark.functions.scorer import POISON_PATTERN
    from dataflow_opinion_analysis_spark.streaming.pipeline import IndexerSinks

    path = str(tmp_path / "t")
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(4):
        txt = f"turn {i} shows delight and wonder step{i}"
        if i == 2:
            txt = f"corrupt {POISON_PATTERN} payload step{i}"
        rows.append(("c1", i, ["user", "assistant"][i % 2], txt, None,
                     (base + pd.Timedelta(minutes=i)).to_pydatetime()))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(path)
    _flush(spark, path)
    _flush(spark, path, "2030-01-01 01:00:00", turn_idx=1)

    out = str(tmp_path / "out")
    rc = cli.main([
        "stream", "--input", path, "--output", out,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--watermark", "5 minutes", "--max-files-per-trigger", "10",
        "--strict-scoring", "--cross-batch-near-dedupe", "--drain",
    ])
    assert rc == 0
    sinks = IndexerSinks.create(spark, out)
    dl = sinks.dead_letter.read().toPandas()
    assert list(dl["turn_idx"]) == [2]
    assert sinks.document.read().filter(
        F.col("Text").contains(POISON_PATTERN)).count() == 0
    # the cross-batch fingerprint store was active and populated
    assert sinks.fingerprints.read().count() > 0


def test_cli_socialstats_end_to_end(spark, tmp_path):
    """Derby -> `cli socialstats` -> `cli statscalc --social-counts`:
    the injected Facebook count reaches statstoryrank via the same
    WebResourceHash derivation the indexer used
    (SocialStatsPipeline.java:54-157 composed)."""
    from dataflow_opinion_analysis_spark import datagen

    tpath = str(tmp_path / "transcripts")
    datagen.write_transcripts_parquet(tpath, n_convs=30, avg_turns=6, seed=11, n_files=2)
    wh = str(tmp_path / "wh")
    assert cli.main(["index", "--input", tpath, "--output", wh]) == 0

    # pick the newest-published document's main webresource as the target
    wr = spark.read.parquet(f"{wh}/webresource")
    doc = spark.read.parquet(f"{wh}/document")
    target = (
        doc.join(wr, doc.MainWebResourceHash == wr.WebResourceHash)
        .select(doc.DocumentHash, wr.WebResourceHash, wr.Url,
                wr.PublicationTime.alias("pub_time"))
        .orderBy(F.desc("pub_time"), "DocumentHash")
        .first()
    )

    # Derby source: pages + social_stats (reference schema, `cnt` for the
    # reserved word `count`)
    url = f"jdbc:derby:{tmp_path}/socialdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    pages = spark.createDataFrame(
        [(1, target.Url, target.pub_time)],
        "id int, url string, pub_at timestamp",
    ).select(F.col("id").alias("ID"), F.col("url").alias("URL"),
             F.col("pub_at").alias("PUB_AT"))
    pages.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("dbtable", "PAGES") \
        .option("createTableColumnTypes", "URL VARCHAR(1000)") \
        .mode("overwrite").save()
    counts = spark.createDataFrame(
        [(1, 2, 999999, target.pub_time + datetime.timedelta(hours=1)),
         (1, 1, 777, target.pub_time + datetime.timedelta(hours=1))],
        "page_id int, provider_id int, cnt int, created_at timestamp",
    ).select(F.col("page_id").alias("PAGE_ID"), F.col("provider_id").alias("PROVIDER_ID"),
             F.col("cnt").alias("CNT"), F.col("created_at").alias("CREATED_AT"))
    counts.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("dbtable", "SOCIAL_STATS").mode("overwrite").save()

    assert cli.main([
        "socialstats", "--jdbc-url", url, "--driver", driver, "--output", wh,
    ]) == 0

    sc = spark.read.parquet(f"{wh}/wrsocialcount").toPandas()
    assert len(sc) == 1
    # the hash derivation matches the indexer's webresource row exactly
    assert sc.loc[0, "WebResourceHash"] == target.WebResourceHash
    assert int(sc.loc[0, "FbCount"]) == 999999
    assert int(sc.loc[0, "TwCount"]) == 777

    # re-running with the stored table in place is a no-op (max-time join)
    assert cli.main([
        "socialstats", "--jdbc-url", url, "--driver", driver, "--output", wh,
    ]) == 0
    assert spark.read.parquet(f"{wh}/wrsocialcount").count() == 1

    assert cli.main([
        "statscalc", "--warehouse", wh,
        "--social-counts", f"{wh}/wrsocialcount",
    ]) == 0
    rank = spark.read.parquet(f"{wh}/statstoryrank").toPandas()
    mine = rank[rank["DocumentHash"] == target.DocumentHash]
    assert len(mine) == 1, "boosted story missing from statstoryrank"
    assert int(mine["cntFb"].iloc[0]) == 999999
    # the injected count dominates every organic story
    others = rank[rank["DocumentHash"] != target.DocumentHash]["cntFb"].fillna(0)
    assert (others < 999999).all()
    assert int(mine["rankWeekly"].iloc[0]) == 1


def test_cli_compact_fingerprints_shrinks_store_verdicts_unchanged(spark, tmp_path):
    """`cli compact-fingerprints` rewrites the store keeping the newest N
    per soft key; a replayed probe batch gets the identical verdict
    because the read path already applies the same recency cap."""
    import pandas as _pd

    from dataflow_opinion_analysis_spark.streaming.dedupe_state import (
        SIG_VERSION,
        batch_signatures,
        fingerprint_dedupe_batch,
    )
    from dataflow_opinion_analysis_spark.streaming.pipeline import IndexerSinks

    out = str(tmp_path / "out")
    sinks = IndexerSinks.create(spark, out)
    fp_schema = (
        "soft_title string, len_bucket int, document_hash string, "
        "sig array<bigint>, sig_version int, store_batch_id long"
    )
    texts = [
        f"fingerprint store entry number {i} about wholly distinct subject {i*7}"
        for i in range(6)
    ]
    sigs = batch_signatures(_pd.Series(texts))
    for i in range(6):
        sinks.fingerprints.merge(
            spark.createDataFrame(
                [("No Title", 0, f"h{i}", [int(x) for x in sigs[i]], SIG_VERSION, i)],
                fp_schema,
            ),
            batch_id=i,
        )
    assert sinks.fingerprints.read().count() == 6

    probe = spark.createDataFrame(
        [("p1", "c1", 1, None, texts[5])],
        "expected_document_hash string, conv_id string, turn_idx int, "
        "title string, text string",
    )
    before = fingerprint_dedupe_batch(probe, sinks.fingerprints, batch_id=100).toPandas()
    # the probe itself was admitted by that call — drop its row before
    # comparing (keep the compaction focused on the 6 crafted entries)
    sinks.fingerprints.replace(
        sinks.fingerprints.read().filter(F.col("document_hash") != "p1"),
        note="test-reset",
    )

    rc = cli.main(["compact-fingerprints", "--output", out, "--keep", "3"])
    assert rc == 0
    after_store = sinks.fingerprints.read().toPandas()
    assert len(after_store) == 3, "store did not shrink"
    # newest 3 kept
    assert set(after_store["document_hash"]) == {"h3", "h4", "h5"}

    after = fingerprint_dedupe_batch(probe, sinks.fingerprints, batch_id=101).toPandas()
    for col in ("is_dupe", "winner_document_hash", "est_jaccard"):
        assert before.loc[0, col] == after.loc[0, col], col
    assert bool(after.loc[0, "is_dupe"]) and after.loc[0, "winner_document_hash"] == "h5"


def test_cli_stream_statsrefresh_maintenance_chain(spark, tmp_path):
    """The full production loop from spark-submit: `stream --drain` lands
    exactly-once sinks, `statsrefresh` recomputes only the affected daily
    partitions off the append delta (second invocation is a cursor no-op),
    and `table-maintenance` expires old snapshots + vacuums orphans
    without breaking reads or replay fencing."""
    import json
    import os

    from dataflow_opinion_analysis_spark.streaming.pipeline import IndexerSinks

    path = str(tmp_path / "t")
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for c in range(3):
        for i in range(4):
            rows.append((
                f"conv-{c}", i, ["user", "assistant"][i % 2],
                f"turn {i} of {c} shows delight and wonder step{i} wave{c}",
                None, (base + pd.Timedelta(days=c, minutes=i)).to_pydatetime(),
            ))
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "overwrite").parquet(path)
    _flush(spark, path)

    out = str(tmp_path / "out")
    store = str(tmp_path / "dailystats")
    cli.main([
        "stream", "--input", path, "--output", out,
        "--checkpoint", str(tmp_path / "ckpt"), "--drain",
    ])
    cli.main(["statsrefresh", "--output", out, "--store-root", store])

    cur = json.load(open(os.path.join(store, "_cursor.json")))
    for pos in cur["tables"].values():
        assert pos["document"] >= 1 and pos["webresource"] >= 1
    imp = spark.read.parquet(os.path.join(store, "statstoryimpact"))
    n1 = imp.count()
    assert n1 > 0
    docs_days = {
        r.PublicationDateId
        for r in IndexerSinks.create(spark, out).document.read()
        .select("PublicationDateId").distinct().collect()
    }
    got_days = {r.SnapshotDateId for r in imp.select("SnapshotDateId").distinct().collect()}
    assert docs_days <= got_days  # every doc day has a snapshot partition

    # no new commits -> cursor no-op, store unchanged
    cli.main(["statsrefresh", "--output", out, "--store-root", store])
    assert spark.read.parquet(os.path.join(store, "statstoryimpact")).count() == n1

    # retention: keep only the latest snapshot per sink, vacuum orphans
    sinks = IndexerSinks.create(spark, out)
    n_doc = sinks.document.read().count()
    committed = min(sinks.document.committed_batch_ids())
    cli.main(["table-maintenance", "--output", out, "--keep-snapshots", "1"])
    sinks2 = IndexerSinks.create(spark, out)
    assert sinks2.document.read().count() == n_doc
    assert sinks2.document.contains_batch(committed)  # replay fence survives
    assert len(sinks2.document.retained_versions()) == 1


def test_cli_dataprep_stream_drain(spark, tmp_path, capsys):
    """`cli dataprep-stream --drain` runs the streaming prep over a
    documents directory and reports the packed store state; the result
    matches the one-shot pipeline (ordering contract: id-ordered files)."""
    import json

    from dataflow_opinion_analysis_spark.operators.dataprep_incremental import (
        IncrementalDataPrep,
    )
    from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
        build_dataprep,
    )
    from tests.conftest import SF_DIR
    from tests.test_dataprep_stream import _write_waves

    input_dir = str(tmp_path / "in")
    _write_waves(input_dir, 0, 10**9, 2)
    store = str(tmp_path / "store")
    assert cli.main([
        "dataprep-stream", "--input", input_dir, "--store", store,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--max-files-per-trigger", "1", "--drain",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["packed_rows"] > 0 and out["cursor"]["total_tokens"] > 0

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = IncrementalDataPrep(spark, store).packed.read()
    full = build_dataprep(spark, docs, materialize=False).packed
    cols = ["doc_id", "n_tokens", "start_offset", "n_chunks", "scrubbed_hash"]
    assert packed.count() == out["packed_rows"] == full.count()
    assert packed.select(cols).exceptAll(full.select(cols)).count() == 0


def test_cli_dataprep_refresh_two_waves(spark, tmp_path, capsys):
    """`cli dataprep-refresh` drives the incremental prep loop end to
    end: two ingest+refresh waves append to the packed store and the
    result equals the one-shot pipeline over the union."""
    import json

    from dataflow_opinion_analysis_spark.operators.dataprep_incremental import (
        IncrementalDataPrep,
    )
    from dataflow_opinion_analysis_spark.operators.dataprep_pipeline import (
        build_dataprep,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    docs.filter(F.col("doc_id") < 250).write.parquet(w1)
    docs.filter(F.col("doc_id") >= 250).write.parquet(w2)
    store = str(tmp_path / "store")

    for wave, path in ((0, w1), (1, w2)):
        assert cli.main(["dataprep-refresh", "--store", store,
                         "--ingest", path, "--wave", str(wave)]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["new_docs"] == 250 and out["packed"] > 0

    packed = IncrementalDataPrep(spark, store).packed.read()
    full = build_dataprep(spark, docs).packed
    cols = ["doc_id", "n_tokens", "start_offset", "n_chunks", "scrubbed_hash"]
    assert packed.select(cols).exceptAll(full.select(cols)).count() == 0
    assert packed.count() == full.count()


def test_cli_vector_index_drain(spark, tmp_path, capsys):
    """`cli vector-index --drain` streams an embeddings directory into
    the codes table; rows match the corpus and the frozen model.json
    exists afterwards."""
    import json
    import os

    from dataflow_opinion_analysis_spark.streaming import vector_index
    from tests.conftest import SF_DIR
    from tests.test_vector_index import _write_waves

    input_dir = str(tmp_path / "in")
    _write_waves(input_dir, 0, 10**9, 2)
    store = str(tmp_path / "store")
    assert cli.main([
        "vector-index", "--input", input_dir, "--store", store,
        "--checkpoint", str(tmp_path / "ckpt"), "--fit-dir", SF_DIR,
        "--max-files-per-trigger", "1", "--drain",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert out["codes_rows"] == n
    assert os.path.exists(os.path.join(store, vector_index.MODEL_FILE))
