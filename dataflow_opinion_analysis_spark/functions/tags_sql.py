"""Catalyst-native tag extraction — the JVM fast path for the scorer's
tag stage (same semantics as functions/scorer.extract_tags_map, which
remains as the Arrow-UDF reference implementation).

Top-K frequent tokens per document (len >= TAG_MIN_LEN, stopwords
excluded), Weight = occurrence count, GoodAsTopic = not blocklisted.
The only window is partitioned by document hash — a near-unique key, so
no skew — and everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_opinion_analysis_spark.functions import lexicon


def extract_tags(doc_keyed: DataFrame) -> DataFrame:
    """(document_hash, text, ...) -> (document_hash, Tags, tag_names).

    Docs with no qualifying tokens get empty arrays (matching the Arrow
    reference implementation).
    """
    stop = [F.lit(w) for w in lexicon.TAG_STOPWORDS]
    block = [F.lit(w) for w in lexicon.TOPIC_BLOCKLIST]

    tok = doc_keyed.select(
        "document_hash",
        F.explode(
            F.expr(f"regexp_extract_all(lower(coalesce(text, '')), \"{lexicon.TOKEN_RE}\", 0)")
        ).alias("token"),
    ).filter(
        (F.length("token") >= lexicon.TAG_MIN_LEN)
        & ~F.col("token").isin([w for w in lexicon.TAG_STOPWORDS])
    )
    cnt = tok.groupBy("document_hash", "token").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("document_hash").orderBy(F.desc("n"), F.asc("token"))
    )
    top = cnt.withColumn("rk", rk).filter(F.col("rk") <= lexicon.TAG_TOP_K)
    tagged = top.groupBy("document_hash").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rk"),
                        F.col("token").alias("Tag"),
                        F.col("n").cast("double").alias("Weight"),
                        (~F.col("token").isin(lexicon.TOPIC_BLOCKLIST)).alias(
                            "GoodAsTopic"
                        ),
                    )
                )
            ),
            lambda s: F.struct(
                s["Tag"].alias("Tag"),
                s["Weight"].alias("Weight"),
                s["GoodAsTopic"].alias("GoodAsTopic"),
            ),
        ).alias("Tags")
    )
    # left join back so tag-less docs keep empty arrays
    empty = F.array().cast(
        "array<struct<Tag:string,Weight:double,GoodAsTopic:boolean>>"
    )
    return (
        doc_keyed.select("document_hash")
        .join(tagged, "document_hash", "left")
        .select(
            "document_hash",
            F.coalesce("Tags", empty).alias("Tags"),
            F.transform(F.coalesce("Tags", empty), lambda t: t["Tag"]).alias(
                "tag_names"
            ),
        )
    )
