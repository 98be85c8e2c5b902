"""Entity enrichment (N2) + deterministic A/B split (F4).

Reference path (IndexerPipeline.java:245,264-276): after the NLP stage a
random SplitAB routes a `ratioEnrichWithCNLP` fraction of index summaries
to branch B, which calls the Cloud Natural Language API
(EnrichWithCNLPEntities, :1675-1751) and APPENDS up to len(doc.tags)
entity tags named `cnlp::<entity>` with Weight = salience and
GoodAsTopic = NULL; branch A passes through; the two are flattened.

Spark-first re-expression, no external API:
- The entity extractor is a deterministic capitalized-phrase model run as
  pure Catalyst SQL (regexp_extract_all over the RAW-case text, hash
  aggregate for salience = phrase frequency / total phrase count,
  rank by salience desc then phrase). Entities are "sorted by salience"
  exactly like the API response (:1724), capped at the document's
  existing tag count (:1719).
- SplitAB's ThreadLocalRandom (:1767,1783) is replaced by a HASH split —
  pmod(hash(key), 1e6) < ratio*1e6 — deterministic, reproducible across
  retries/replays (a requirement the reference's random split cannot meet
  under exactly-once), same expected ratio. The hash is the repo's
  portable sha2 bridge so the DuckDB oracle reproduces the assignment
  bit-for-bit; swap in xxhash64 for raw speed when oracle parity is not
  needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CNLP_TAG_PREFIX = "cnlp::"  # IndexerPipelineUtils.java:94
# capitalized word run: 'New York City', "O'Brien", 'Spark SQL'
ENTITY_RE = "[A-Z][A-Za-z0-9']*(?: [A-Z][A-Za-z0-9']*)*"
ENTITY_RE_SQL = ENTITY_RE.replace("'", "''")  # for embedding in SQL literals
SPLIT_MOD = 1_000_000

# portable hash dice (same value on DuckDB:
# cast('0x'||substr(sha256(key),1,8) AS bigint) % 1000000)
def _dice(key_col: str):
    return F.pmod(
        F.expr(f"cast(conv(substr(sha2(cast({key_col} AS string), 256), 1, 8), 16, 10) AS bigint)"),
        F.lit(SPLIT_MOD),
    )


def split_ab(df: DataFrame, b_ratio: float, key_col: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic A/B split (SplitAB, IndexerPipeline.java:1759-1790):
    returns (branch_a, branch_b); branch B receives ~b_ratio of rows,
    chosen by hash of `key_col` so the assignment is stable."""
    b_ratio = min(max(float(b_ratio), 0.0), 1.0)
    threshold = int(SPLIT_MOD * b_ratio)
    dice = _dice(key_col)
    return df.filter(dice >= threshold), df.filter(dice < threshold)


def extract_entities(doc_keyed: DataFrame, text_col: str = "text") -> DataFrame:
    """(document_hash, text) -> one row per (document_hash, entity,
    salience, rank) — capitalized-phrase entities ranked by salience
    (frequency share), fully deterministic Catalyst.

    Pure DataFrame API (no temp view): concurrent or nested callers in
    one SparkSession previously clobbered each other's fixed
    '_entity_input' view and leaked the name into the catalog."""
    from pyspark.sql import Window

    counts = (
        doc_keyed.select(
            "document_hash",
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '{ENTITY_RE_SQL}', 0)")
            ).alias("phrase"),
        )
        .groupBy("document_hash", "phrase")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.groupBy("document_hash").agg(F.sum("n").alias("total"))
    sal = F.col("n") / F.col("total").cast("double")
    w = Window.partitionBy("document_hash").orderBy(sal.desc(), F.col("phrase"))
    return (
        counts.join(tot, "document_hash")
        .select(
            "document_hash",
            F.col("phrase").alias("entity"),
            F.round(sal, 6).alias("salience"),
            F.row_number().over(w).alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# gated driver queries over the `documents` table
# ---------------------------------------------------------------------------

# the fixture corpus is all-lowercase, so the gate capitalizes a
# deterministic ~1/3 of tokens (those whose sha2 bridge hash % 3 == 0)
# before extraction — same transform in the DuckDB oracle, so the
# entity/salience/rank machinery is verified end to end
_CAP_SPARK = """concat_ws(' ', transform(split(coalesce(text, ''), ' '),
  w -> CASE WHEN pmod(cast(conv(substr(sha2(w, 256), 1, 4), 16, 10) AS bigint), 3) = 0
            THEN concat(upper(substr(w, 1, 1)), substr(w, 2)) ELSE w END))"""

ENTITY_TOP_K = 10


def text_entities(spark, sf_dir: str) -> DataFrame:
    """Gated N2 surface: capitalized-phrase entities with salience over
    the documents table (deterministically capitalized), top-{ENTITY_TOP_K}
    per doc by (salience desc, entity)."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(
        f"""
WITH cap AS (SELECT doc_id, {_CAP_SPARK} AS captext FROM documents),
phrases AS (
  SELECT doc_id, explode(regexp_extract_all(captext, '{ENTITY_RE_SQL}', 0)) AS phrase
  FROM cap
),
counts AS (SELECT doc_id, phrase, count(*) AS n FROM phrases GROUP BY doc_id, phrase),
tot AS (SELECT doc_id, sum(n) AS total FROM counts GROUP BY doc_id),
ranked AS (
  SELECT c.doc_id, concat('{CNLP_TAG_PREFIX}', c.phrase) AS entity,
         round(c.n / cast(t.total AS double), 6) AS salience,
         row_number() OVER (PARTITION BY c.doc_id
                            ORDER BY c.n / cast(t.total AS double) DESC, c.phrase) AS entity_rank
  FROM counts c JOIN tot t ON t.doc_id = c.doc_id
)
SELECT doc_id, entity, salience, entity_rank
FROM ranked WHERE entity_rank <= {ENTITY_TOP_K}
"""
    )


def split_ab_assignment(spark, sf_dir: str, b_ratio: float = 0.2) -> DataFrame:
    """Gated F4 surface: the deterministic A/B assignment per document."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    threshold = int(SPLIT_MOD * b_ratio)
    return spark.sql(
        f"""
SELECT doc_id,
  CASE WHEN pmod(cast(conv(substr(sha2(cast(doc_id AS string), 256), 1, 8), 16, 10) AS bigint), {SPLIT_MOD}) < {threshold}
       THEN 'B' ELSE 'A' END AS branch
FROM documents
"""
    )


def enrich_with_entities(
    winners_with_tags: DataFrame,
    b_ratio: float = 1.0,
    hash_col: str = "document_hash",
    text_col: str = "text",
) -> DataFrame:
    """The full N2+F4 path over (document_hash, text, Tags) rows:
    hash-split, enrich branch B by appending up to size(Tags) `cnlp::`
    entity tags (Weight = salience, GoodAsTopic = NULL), union branch A
    back unchanged — mirroring enrichWithCNLP (IndexerPipeline.java:264-276)."""
    branch_a, branch_b = split_ab(winners_with_tags, b_ratio, hash_col)
    ents = extract_entities(branch_b.select(F.col(hash_col).alias("document_hash"), text_col))
    tag_type = "array<struct<Tag:string,Weight:double,GoodAsTopic:boolean>>"
    new_tags = (
        ents.join(
            branch_b.select(
                F.col(hash_col).alias("document_hash"),
                F.size(F.coalesce(F.col("Tags"), F.expr(f"cast(array() AS {tag_type})"))).alias("n_tags"),
            ),
            "document_hash",
        )
        # "at most as many entities as we have tags" (:1719)
        .filter(F.col("rank") <= F.col("n_tags"))
        .groupBy("document_hash")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rank").alias("rank"),
                        F.struct(
                            F.concat(F.lit(CNLP_TAG_PREFIX), F.col("entity")).alias("Tag"),
                            F.col("salience").cast("double").alias("Weight"),
                            F.lit(None).cast("boolean").alias("GoodAsTopic"),
                        ).alias("tag"),
                    )
                )
            ).alias("ranked")
        )
        .select(
            F.col("document_hash").alias("_nt_hash"),
            F.transform(F.col("ranked"), lambda r: r["tag"]).alias("cnlp_tags"),
        )
    )
    enriched_b = (
        branch_b.join(new_tags, F.col(hash_col) == F.col("_nt_hash"), "left")
        .drop("_nt_hash")
        .withColumn(
            "Tags",
            F.when(
                F.col("cnlp_tags").isNotNull(),
                F.concat(
                    F.coalesce(F.col("Tags"), F.expr(f"cast(array() AS {tag_type})")),
                    F.col("cnlp_tags"),
                ),
            ).otherwise(F.col("Tags")),
        )
        .drop("cnlp_tags")
    )
    return branch_a.unionByName(enriched_b)
