"""N2 entity enrichment + F4 deterministic A/B split
(functions/entities.py <- IndexerPipeline.java:1675-1790)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.functions.entities import (
    enrich_with_entities,
    split_ab,
)

TAGS_T = "array<struct<Tag:string,Weight:double,GoodAsTopic:boolean>>"


def test_enrich_appends_capped_cnlp_tags(spark):
    df = spark.createDataFrame(
        [
            ("d1", "Alice Smith met Bob in New York City. Alice Smith smiled.",
             [("alice", 1.0, True), ("smith", 1.0, True)]),
            ("d2", "no capitals here at all", [("none", 1.0, True)]),
        ],
        f"document_hash string, text string, Tags {TAGS_T}",
    )
    out = enrich_with_entities(df, b_ratio=1.0)
    rows = {r.document_hash: r for r in out.collect()}
    tags1 = [t.Tag for t in rows["d1"].Tags]
    # original tags preserved in place, cnlp tags appended (:1737-1740)
    assert tags1[:2] == ["alice", "smith"]
    cnlp = [t for t in rows["d1"].Tags if t.Tag.startswith("cnlp::")]
    # capped at the original tag count (:1719), ordered by salience
    assert [t.Tag for t in cnlp] == ["cnlp::Alice Smith", "cnlp::Bob"]
    assert all(t.GoodAsTopic is None for t in cnlp)
    assert cnlp[0].Weight == 0.5  # 2 of 4 phrase occurrences
    # no entities -> row passes through unchanged (:1743-1744)
    assert [t.Tag for t in rows["d2"].Tags] == ["none"]


def test_split_ab_ratio_and_determinism(spark):
    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    a, b = split_ab(df, 0.25, "k")
    na, nb = a.count(), b.count()
    assert na + nb == 1000
    assert 0.15 < nb / 1000 < 0.35
    _, b2 = split_ab(df, 0.25, "k")
    assert b2.count() == nb
    assert b2.exceptAll(b).count() == 0  # same assignment, not just size
    # edge ratios
    a0, b0 = split_ab(df, 0.0, "k")
    assert b0.count() == 0 and a0.count() == 1000
    a1, b1 = split_ab(df, 1.0, "k")
    assert a1.count() == 0 and b1.count() == 1000
