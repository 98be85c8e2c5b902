"""File/DB input connectors + text/CSV sinks — the reference's ingest
surface beyond the streaming transcripts source:

P1  bag-of-properties articles  <- util/TextWithProperties.java:34-83 +
                                   InputContent.createInputContent (:94-126)
P2  CSV -> InputContent         <- IndexerPipeline.ParseCSVFile (:1096-1140)
P3  GDELT JSON -> InputContent  <- InputContent.createInputContentFromGDELTJson
                                   (:130-160), language EN iff langcode='eng'
P12 multi-format date fallback  <- IndexerPipelineUtils.parseDateToLong
                                   (:118-146: 'yyyy-MM-dd HH:mm:ss' then
                                   'yyyy-MM-dd'; GDELT ISO-8601 'Z' variant)
S2  JDBC read w/ generated SQL  <- IndexerPipelineUtils.buildJdbcSourceImportQuery
                                   (:160-193: date-windowed page import)
S4  RS-delimited text read      <- RecordFileSource (custom FileBasedSource);
                                   Spark's built-in text source with `lineSep`
                                   replaces the custom source entirely
K3  text write                  <- TextIO sinks
K4  CSV sentiment write         <- IndexerPipeline CSV output of sentiments

All parsed sources land in the same InputContent column shape that
`operators/ingest.py` consumes, so every connector feeds the one indexer.
Document-collection ids follow IndexerPipelineUtils.java:68-71
('01' KGA jdbc, '03' GDELT, '04' CSV).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_COL_ID_KGA = "01"
DOC_COL_ID_GDELT = "03"
DOC_COL_ID_CSV = "04"

RS = "\x1e"  # ASCII record separator (the custom FileBasedSource's delimiter)

# the reference's fallback chain (IndexerPipelineUtils.java:126-131) plus
# the GDELT ISO variant — first parse that succeeds wins
DATE_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd",
]


def parse_date_multi(col) -> F.Column:
    """P12: multi-format timestamp parse with fallback (NULL if none fit)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in DATE_FORMATS])


# ---------------------------------------------------------------------------
# P1: bag-of-properties article files
# ---------------------------------------------------------------------------

ARTICLE_SCHEMA = (
    "path string, url string, pub_time timestamp, title string, author string, "
    "language string, text string, document_collection_id string, "
    "collection_item_id string, skip_indexing int, parent_url string, "
    "parent_pub_time timestamp"
)


def _parse_properties(s: str) -> tuple[dict, str]:
    """TextWithProperties.deserialize (util/TextWithProperties.java:34-83):
    leading `key=value` lines (lowercased keys; '#'/blank lines skipped)
    until the first non-property line; the rest is the text body."""
    props: dict[str, str] = {}
    lines = s.split("\n")
    i = 0
    for i, line in enumerate(lines):
        if line.startswith("#") or line == "":
            continue
        eq = line.find("=")
        if eq >= 0:
            props[line[:eq].lower()] = line[eq + 1 :]
        else:
            break
    else:
        i = len(lines)
    return props, "\n".join(lines[i:]).strip()


def _articles_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for path, content in zip(pdf["path"], pdf["content"]):
        props, text = _parse_properties(content or "")
        rows.append(
            {
                "path": path,
                "url": props.get("url"),
                "pub_time_raw": props.get("pubtime"),
                "title": props.get("title"),
                "author": props.get("author"),
                "language": props.get("language"),
                "text": text,
                "document_collection_id": props.get("collectionid"),
                "collection_item_id": props.get("itemid"),
                "skip_indexing": int(props.get("skipindexing", "0")),
                "parent_url": props.get("parenturl"),
                "parent_pub_time_raw": props.get("parentpubtime"),
            }
        )
    return pd.DataFrame(rows)


def read_properties_articles(spark: SparkSession, path_glob: str) -> DataFrame:
    """P1: one row per article FILE (wholetext read; the per-file parse is
    the file-granular analog of the reference's per-element DoFn — files,
    not turns, are the rows here). Dates parse with the P12 fallback."""
    raw = (
        spark.read.text(path_glob, wholetext=True)
        .withColumn("path", F.col("_metadata.file_path"))
        .withColumnRenamed("value", "content")
    )
    parsed = raw.mapInPandas(
        lambda it: (_articles_batch(p) for p in it),
        "path string, url string, pub_time_raw string, title string, "
        "author string, language string, text string, "
        "document_collection_id string, collection_item_id string, "
        "skip_indexing int, parent_url string, parent_pub_time_raw string",
    )
    return parsed.select(
        "path", "url",
        parse_date_multi("pub_time_raw").alias("pub_time"),
        "title", "author", "language", "text",
        "document_collection_id", "collection_item_id", "skip_indexing",
        "parent_url",
        parse_date_multi("parent_pub_time_raw").alias("parent_pub_time"),
    )


# ---------------------------------------------------------------------------
# P2: CSV -> InputContent
# ---------------------------------------------------------------------------


def read_csv_input(
    spark: SparkSession,
    path: str,
    text_column: str,
    collection_item_id_column: str | None = None,
) -> DataFrame:
    """P2 (ParseCSVFile, IndexerPipeline.java:1096-1140): header CSV with a
    configurable text column; every row becomes an InputContent with
    documentCollectionId='04', no url/time/title, skipIndexing=0."""
    df = spark.read.csv(path, header=True, quote='"', escape='"', multiLine=True)
    item = (
        F.col(collection_item_id_column).cast("string")
        if collection_item_id_column
        else F.lit(None).cast("string")
    )
    return df.select(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("timestamp").alias("pub_time"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("author"),
        F.lit(None).cast("string").alias("language"),
        F.col(text_column).alias("text"),
        F.lit(DOC_COL_ID_CSV).alias("document_collection_id"),
        item.alias("collection_item_id"),
        F.lit(0).alias("skip_indexing"),
    )


# ---------------------------------------------------------------------------
# S6/P3: GDELT JSON -> InputContent
# ---------------------------------------------------------------------------

GDELT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("langcode", T.StringType()),
        T.StructField("fulltext", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("gkgoffsets", T.StringType()),
    ]
)


def parse_gdelt_json(df: DataFrame, json_col: str = "value", english_only: bool = False) -> DataFrame:
    """S6 (+F3): one JSON document per row -> InputContent columns
    (InputContent.createInputContentFromGDELTJson)."""
    g = df.select(F.from_json(F.col(json_col), GDELT_JSON_SCHEMA).alias("g")).select("g.*")
    out = g.select(
        "url",
        parse_date_multi("date").alias("pub_time"),
        "title",
        F.lit(None).cast("string").alias("author"),
        F.when(F.col("langcode") == "eng", F.lit("EN")).otherwise(F.lit("UN")).alias("language"),
        F.col("fulltext").alias("text"),
        F.lit(DOC_COL_ID_GDELT).alias("document_collection_id"),
        F.col("gkgoffsets").alias("collection_item_id"),
        F.lit(0).alias("skip_indexing"),
    )
    if english_only:
        out = out.filter(F.col("language") == "EN")
    return out


def read_gdelt_json(spark: SparkSession, path: str, english_only: bool = False) -> DataFrame:
    return parse_gdelt_json(spark.read.text(path), "value", english_only)


# ---------------------------------------------------------------------------
# S4: RS-delimited text (the custom FileBasedSource replacement)
# ---------------------------------------------------------------------------


def read_rs_delimited(spark: SparkSession, path: str, line_sep: str = RS) -> DataFrame:
    """S4: record-separator-delimited text via the built-in splittable text
    source (`lineSep` option) — no custom FileBasedSource needed."""
    return spark.read.option("lineSep", line_sep).text(path)


# ---------------------------------------------------------------------------
# S2: JDBC read with a generated, time-windowed SQL
# ---------------------------------------------------------------------------


_JDBC_DATE_RE = None


def _validate_sql_date(value: str, name: str) -> str:
    """Strict 'YYYY-MM-DD[ HH:MM:SS]' check before interpolation into the
    generated JDBC SQL — the reference interpolates caller strings
    verbatim (IndexerPipelineUtils.java:160-193), which is SQL injection
    if the dates ever come from untrusted input."""
    global _JDBC_DATE_RE
    if _JDBC_DATE_RE is None:
        import re

        _JDBC_DATE_RE = re.compile(
            r"^\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2})?$"
        )
    if not _JDBC_DATE_RE.match(value):
        raise ValueError(
            f"{name} must be 'YYYY-MM-DD' or 'YYYY-MM-DD HH:MM:SS', got {value!r}"
        )
    return value


def build_jdbc_import_query(from_date: str | None = None, to_date: str | None = None) -> str:
    """The reference's generated page-import SQL
    (IndexerPipelineUtils.java:160-193), in portable SQL: url, pub_time,
    title, author, language, page_text, doc_col_id '01', col_item_id,
    skip_indexing, windowed on pub_at. Dates are validated against a
    strict timestamp format before interpolation."""
    window = ""
    if from_date:
        window += f" AND pages.pub_at >= '{_validate_sql_date(from_date, 'from_date')}'"
    if to_date:
        window += f" AND pages.pub_at <= '{_validate_sql_date(to_date, 'to_date')}'"
    return (
        "SELECT pages.url AS url, pages.pub_at AS pub_time, "
        "pages.title AS title, pages.author AS author, 'EN' AS language, "
        "pages.page_text AS text, "
        f"'{DOC_COL_ID_KGA}' AS document_collection_id, "
        "pages.id AS collection_item_id, 0 AS skip_indexing "
        "FROM pages WHERE pages.page_text IS NOT NULL" + window
    )


def build_jdbc_social_stats_query(
    from_date: str | None = None, to_date: str | None = None
) -> str:
    """The reference's generated social-stats import SQL
    (IndexerPipelineUtils.java:194-224, consumed by
    SocialStatsPipeline.java:79-107), in portable SQL: per
    (page, count_time) the tw/fb provider sums, then the latest
    count_time per page/count combo. Deviations, documented: timestamps
    stay TIMESTAMP (the reference converts to unix seconds for its Avro
    coder — Spark-side we keep the native type), and the reference's
    `s.count` column is named `cnt` (COUNT is a reserved word in
    ANSI/Derby; MySQL tolerates it). Dates are validated before
    interpolation like the page-import query."""
    window = ""
    if from_date:
        window += f" AND s.created_at >= '{_validate_sql_date(from_date, 'from_date')}'"
    if to_date:
        window += f" AND s.created_at <= '{_validate_sql_date(to_date, 'to_date')}'"
    return (
        "SELECT a1.page_pub_time, a1.url, a1.doc_col_id, a1.col_item_id, "
        "MAX(a1.count_time) AS count_time, a1.count_tw, a1.count_fb FROM ("
        "SELECT p.pub_at AS page_pub_time, p.url AS url, "
        f"'{DOC_COL_ID_KGA}' AS doc_col_id, s.page_id AS col_item_id, "
        "s.created_at AS count_time, "
        "SUM(CASE WHEN s.provider_id = 1 THEN s.cnt ELSE 0 END) AS count_tw, "
        "SUM(CASE WHEN s.provider_id = 2 THEN s.cnt ELSE 0 END) AS count_fb "
        "FROM social_stats s INNER JOIN pages p ON p.id = s.page_id "
        "WHERE s.cnt > 0" + window + " "
        "GROUP BY p.pub_at, p.url, s.page_id, s.created_at) a1 "
        "GROUP BY a1.page_pub_time, a1.url, a1.doc_col_id, a1.col_item_id, "
        "a1.count_tw, a1.count_fb"
    )


def read_jdbc(spark: SparkSession, jdbc_url: str, query: str, driver: str | None = None) -> DataFrame:
    """S2: `spark.read.format('jdbc')` over the generated query. Exercised
    in tests against the Derby driver bundled with Spark (embedded DB);
    on a real deployment pass the warehouse's url/driver. Predicate
    pushdown: the WHERE window ships inside the query itself, exactly like
    the reference's generated import SQL."""
    r = spark.read.format("jdbc").option("url", jdbc_url).option("query", query)
    if driver:
        r = r.option("driver", driver)
    return r.load()


# ---------------------------------------------------------------------------
# K3/K4: text + CSV sinks
# ---------------------------------------------------------------------------


def write_text(df: DataFrame, path: str, column: str = "value", mode: str = "overwrite") -> None:
    """K3: one-column text files."""
    df.select(F.col(column).cast("string").alias("value")).write.mode(mode).text(path)


def write_sentiment_csv(sentiment: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K4: the CSV sentiment export (scalar columns; arrays joined)."""
    cols = []
    for f in sentiment.schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            if isinstance(f.dataType.elementType, T.StructType):
                cols.append(
                    F.array_join(
                        F.transform(F.col(f.name), lambda t: t["Tag"]), ";"
                    ).alias(f.name)
                )
            else:
                cols.append(F.array_join(F.col(f.name), ";").alias(f.name))
        else:
            cols.append(F.col(f.name))
    sentiment.select(cols).write.mode(mode).option("header", True).csv(path)
