"""Connector tests: P1 article-property files (against the REFERENCE's own
test fixtures), P2 CSV, S6/P3 GDELT JSON, P12 date fallback, S4 lineSep
reads, S2 JDBC (embedded Derby), K3/K4 writes."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.operators import ingest
from dataflow_opinion_analysis_spark.plans.indexer import build_indexer_from_input_content
from dataflow_opinion_analysis_spark.sources import files as src

ARTICLES = "/root/reference/src/test/resources/testdatasets/articles-col1"
CSV_DIR = "/root/reference/src/test/resources/testdatasets/kaggle-rotten-tomato"


@pytest.mark.skipif(not os.path.isdir(ARTICLES), reason="reference fixtures absent")
def test_p1_article_fixtures_golden(spark):
    """The 8 reference input fixtures parse to the expected document rows:
    per-file property extraction + body-text equality through the full
    indexer (north-star fixture verification)."""
    arts = src.read_properties_articles(spark, f"{ARTICLES}/*.txt")
    rows = {os.path.basename(r.path): r for r in arts.collect()}
    assert len(rows) == len(glob.glob(f"{ARTICLES}/*.txt")) == 8

    bag = rows["bagram.txt"]
    assert bag.title == "Afghanistan: 4 Americans dead in blast at Bagram Airfield"
    assert bag.author == "Laura Smith-Spark, Joe Sterling and Ehsan Popalzai, CNN"
    assert bag.url == "http://www.cnn.com/2016/11/11/asia/afghanistan-bagram-blast/"
    assert bag.language == "EN"
    assert str(bag.pub_time).startswith("2016-11-12 15:11:00")
    assert bag.text.startswith("Four Americans were killed")
    # body must not leak property lines
    assert "Title=" not in bag.text and "Url=" not in bag.text

    # end-to-end: the fixture articles become document rows with per-file
    # text equality (no article is lost or deduped away — all 8 differ)
    ic = ingest.input_content_from_parsed(
        arts.withColumn("collection_item_id", F.col("path"))
            .withColumn("document_collection_id", F.coalesce("document_collection_id", F.lit("01")))
    )
    out = build_indexer_from_input_content(ic)
    docs = {r.Title: r for r in out.document.collect()}
    assert len(docs) == 8
    got = docs["Afghanistan: 4 Americans dead in blast at Bagram Airfield"]
    assert got.Text == bag.text
    assert got.Author == bag.author
    assert got.PublicationDateId == 20161112
    # articles are long-form -> Type ARTICLE
    assert got.Type == 2
    # sentiments extracted from real article text
    assert out.sentiment.count() > 0


@pytest.mark.skipif(not os.path.isdir(CSV_DIR), reason="reference fixtures absent")
def test_p2_csv_fixture(spark):
    df = src.read_csv_input(
        spark, f"{CSV_DIR}/rotten_tomato_train_10.csv",
        text_column="Phrase", collection_item_id_column="PhraseId",
    )
    rows = df.collect()
    assert len(rows) == 9  # 10 lines incl. header
    by_id = {r.collection_item_id: r for r in rows}
    assert by_id["167"].text.startswith("A comedy-drama of nearly epic proportions")
    assert all(r.document_collection_id == "04" for r in rows)
    # full pipeline over the CSV corpus: every phrase indexes (no pubtime
    # -> processing-time fallback)
    out = build_indexer_from_input_content(ingest.input_content_from_parsed(df))
    assert out.document.count() == 9
    assert out.document.filter(F.col("PublicationDateId").isNull()).count() == 0


def test_s6_gdelt_json_and_language_filter(spark, tmp_path):
    lines = [
        '{"url":"http://a","title":"T1","langcode":"eng","fulltext":"great win today","date":"2016-05-01T10:00:00Z","gkgoffsets":"1"}',
        '{"url":"http://b","title":"T2","langcode":"fra","fulltext":"bof","date":"2016-05-02T11:00:00Z","gkgoffsets":"2"}',
    ]
    p = tmp_path / "gdelt.json"
    p.write_text("\n".join(lines))
    allrows = src.read_gdelt_json(spark, str(p)).collect()
    assert {r.language for r in allrows} == {"EN", "UN"}
    assert str([r for r in allrows if r.url == "http://a"][0].pub_time).startswith("2016-05-01 10:00:00")
    en = src.read_gdelt_json(spark, str(p), english_only=True).collect()
    assert len(en) == 1 and en[0].document_collection_id == "03"


def test_p12_multiformat_date_parse(spark):
    df = spark.createDataFrame(
        [("2016-11-12 15:11:00",), ("2016-05-01T10:00:00Z",), ("2016-07-03",), ("garbage",), (None,)],
        "raw string",
    ).select(src.parse_date_multi("raw").alias("ts"), "raw")
    got = {r.raw: r.ts for r in df.collect()}
    assert str(got["2016-11-12 15:11:00"]).startswith("2016-11-12 15:11:00")
    assert str(got["2016-05-01T10:00:00Z"]).startswith("2016-05-01 10:00:00")
    assert str(got["2016-07-03"]).startswith("2016-07-03 00:00:00")
    assert got["garbage"] is None and got[None] is None


def test_s4_rs_delimited_read(spark, tmp_path):
    p = tmp_path / "records.rs"
    p.write_bytes(("rec one\nwith newline" + src.RS + "rec two" + src.RS + "rec three").encode())
    rows = [r.value for r in src.read_rs_delimited(spark, str(p)).collect()]
    assert rows == ["rec one\nwith newline", "rec two", "rec three"]


def test_s2_jdbc_derby_roundtrip(spark, tmp_path):
    """S2: generated time-windowed import SQL against a real JDBC source
    (Derby embedded — the driver Spark ships with)."""
    url = f"jdbc:derby:{tmp_path}/pagesdb;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    pages = spark.createDataFrame(
        [
            (1, "http://a", "2016-11-12 15:11:00", "T1", "au", "the fast win"),
            (2, "http://b", "2017-01-01 00:00:00", "T2", "au", "a slow fail"),
            (3, "http://c", "2015-01-01 00:00:00", "T3", "au", "too old"),
        ],
        "id int, url string, pub_at_s string, title string, author string, page_text string",
    ).select(
        # Spark's JDBC writer quotes identifiers; write them UPPERCASE so
        # the generated query's unquoted names (which Derby folds to
        # uppercase) resolve — i.e. the table looks like one created with
        # normal unquoted DDL
        F.col("id").alias("ID"), F.col("url").alias("URL"),
        F.col("pub_at_s").cast("timestamp").alias("PUB_AT"),
        F.col("title").alias("TITLE"), F.col("author").alias("AUTHOR"),
        F.col("page_text").alias("PAGE_TEXT"),
    )
    pages.write.format("jdbc").option("url", url).option("driver", driver) \
        .option("dbtable", "PAGES").mode("overwrite").save()

    q = src.build_jdbc_import_query(from_date="2016-01-01 00:00:00")
    got = src.read_jdbc(spark, url, q, driver=driver)
    rows = {r.COLLECTION_ITEM_ID: r for r in got.collect()}
    assert set(rows) == {1, 2}  # 2015 row windowed out
    assert rows[1].TEXT == "the fast win"
    assert all(r.DOCUMENT_COLLECTION_ID == "01" for r in rows.values())


def test_k3_k4_writes_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("hello",), ("world",)], "value string")
    src.write_text(df, str(tmp_path / "txt"))
    back = spark.read.text(str(tmp_path / "txt"))
    assert {r.value for r in back.collect()} == {"hello", "world"}

    from dataflow_opinion_analysis_spark.sources.transcripts import derive_transcripts
    from dataflow_opinion_analysis_spark.plans.indexer import build_indexer
    from tests.conftest import SF_DIR

    out = build_indexer(derive_transcripts(spark, SF_DIR))
    sent = out.sentiment.limit(20)
    src.write_sentiment_csv(sent, str(tmp_path / "csv"))
    back = spark.read.csv(str(tmp_path / "csv"), header=True)
    assert back.count() == sent.count()
    assert "SentimentHash" in back.columns and "Signals" in back.columns


def test_jdbc_date_validation():
    """Window dates are validated before interpolation into the generated
    JDBC SQL (injection guard)."""
    from dataflow_opinion_analysis_spark.sources.files import build_jdbc_import_query

    q = build_jdbc_import_query("2024-01-01", "2024-02-01 23:59:59")
    assert "pub_at >= '2024-01-01'" in q
    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_jdbc_import_query("2024-01-01'; DROP TABLE pages; --")
    with _pytest.raises(ValueError):
        build_jdbc_import_query(to_date="not-a-date")


def test_kafka_value_parser_batch(spark):
    """parse_kafka_turns decodes Kafka-shaped (binary key/value) rows into
    the transcripts schema and drops undecodable messages — exercised on
    a batch frame (no broker needed; the stream applies the identical
    expressions)."""
    import json

    from dataflow_opinion_analysis_spark.sources.transcripts import (
        parse_kafka_turns,
    )

    good = {"conv_id": "c1", "turn_idx": 0, "role": "user",
            "text": "hello there", "tool": None,
            "ts": "2024-01-01T00:00:00Z"}
    rows = [
        ("c1", json.dumps(good)),
        ("c1", json.dumps({**good, "turn_idx": 1, "role": "tool",
                           "tool": "search", "ts": "2024-01-01T00:01:00Z"})),
        ("cX", "{not json"),                      # parse failure -> dropped
        ("cY", json.dumps({"role": "user"})),     # missing keys -> dropped
    ]
    raw = spark.createDataFrame(
        [(k.encode(), v.encode(), "turns", 0, i) for i, (k, v) in enumerate(rows)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    out = parse_kafka_turns(raw).orderBy("turn_idx").collect()
    assert [r.turn_idx for r in out] == [0, 1]
    assert out[0].conv_id == "c1" and out[0].text == "hello there"
    assert out[1].tool == "search"
    assert out[0].ts.isoformat().startswith("2024-01-01T00:00")
    # schema identical to the file-stream source's
    assert [f.name for f in parse_kafka_turns(raw).schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
