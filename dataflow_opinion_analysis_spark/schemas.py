"""Single source of truth for every table schema in the engine.

The reference declares its schemas three times (Java POJOs
``model/InputContent.java:37-66``, in-code BigQuery TableSchema builders
``IndexerPipeline.java:684-784``, and JSON DDL under ``bigquery/*.json``).
We declare each exactly once here; pipeline code, sink DDL and tests all
import from this module.

Schema parity notes (reference file:line):
- webresource  <- IndexerPipeline.java:684-703 / bigquery/webresourceSchema.json
- document     <- IndexerPipeline.java:709-736 / bigquery/documentSchema.json
- sentiment    <- IndexerPipeline.java:743-784 / bigquery/sentimentSchema.json
- wrsocialcount<- SocialStatsPipeline.java:163-175
- statngram    <- DictionaryBuilderPipeline.java:209-216
- topic        <- bigquery/topicSchema.json
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: the transcripts table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Derived ingest shape — the analogue of the reference's InputContent POJO
# (model/InputContent.java:37-92), as *columns* rather than a row object.
INPUT_CONTENT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("pub_time", T.TimestampType(), False),
        T.StructField("pub_date_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("language", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("document_collection_id", T.StringType(), False),
        T.StructField("collection_item_id", T.StringType(), False),
        T.StructField("skip_indexing", T.IntegerType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("parent_pub_time", T.TimestampType(), True),
        T.StructField("meta_fields", T.ArrayType(T.StringType()), True),
        T.StructField("expected_document_hash", T.StringType(), False),
        T.StructField("web_resource_hash", T.StringType(), False),
        T.StructField("parent_web_resource_hash", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Output star schema (SURVEY.md §1.4)
# ---------------------------------------------------------------------------

TAG = T.StructType(
    [
        T.StructField("Tag", T.StringType(), False),
        T.StructField("Weight", T.DoubleType(), True),
        T.StructField("GoodAsTopic", T.BooleanType(), True),
    ]
)

WEBRESOURCE = T.StructType(
    [
        T.StructField("WebResourceHash", T.StringType(), False),
        T.StructField("Url", T.StringType(), False),
        T.StructField("PublicationTime", T.TimestampType(), False),
        T.StructField("PublicationDateId", T.IntegerType(), False),
        T.StructField("ProcessingTime", T.TimestampType(), False),
        T.StructField("ProcessingDateId", T.IntegerType(), False),
        T.StructField("DocumentHash", T.StringType(), True),
        T.StructField("DocumentCollectionId", T.StringType(), True),
        T.StructField("CollectionItemId", T.StringType(), True),
        T.StructField("Title", T.StringType(), True),
        T.StructField("Domain", T.StringType(), True),
        T.StructField("Author", T.StringType(), True),
        T.StructField("ParentWebResourceHash", T.StringType(), True),
        T.StructField("MetaFields", T.ArrayType(T.StringType()), True),
    ]
)

DOCUMENT = T.StructType(
    [
        T.StructField("DocumentHash", T.StringType(), False),
        T.StructField("PublicationTime", T.TimestampType(), False),
        T.StructField("PublicationDateId", T.IntegerType(), False),
        T.StructField("ProcessingTime", T.TimestampType(), False),
        T.StructField("ProcessingDateId", T.IntegerType(), False),
        T.StructField("DocumentCollectionId", T.StringType(), True),
        T.StructField("CollectionItemId", T.StringType(), True),
        T.StructField("Title", T.StringType(), True),
        T.StructField("Type", T.IntegerType(), True),  # 0 Unknown / 1 Shorttext / 2 Article
        T.StructField("Language", T.StringType(), True),
        T.StructField("ParseDepth", T.IntegerType(), True),
        T.StructField("ContentLength", T.IntegerType(), True),
        T.StructField("Author", T.StringType(), True),
        T.StructField("Text", T.StringType(), True),
        T.StructField("MainWebResourceHash", T.StringType(), True),
        T.StructField("ParentWebResourceHash", T.StringType(), True),
        T.StructField("Tags", T.ArrayType(TAG), True),
    ]
)

# the 17 emotion/signal score columns, in the reference's declared order
# (IndexerPipeline.java:755-771)
ST_COLUMNS = [
    "StAcceptance",
    "StAnger",
    "StAnticipation",
    "StAmbiguous",
    "StDisgust",
    "StFear",
    "StGuilt",
    "StInterest",
    "StJoy",
    "StSadness",
    "StShame",
    "StSurprise",
    "StPositive",
    "StNegative",
    "StSentiment",
    "StProfane",
    "StUnsafe",
]

SENTIMENT = T.StructType(
    [
        T.StructField("SentimentHash", T.StringType(), False),
        T.StructField("DocumentHash", T.StringType(), False),
        T.StructField("DocumentTime", T.TimestampType(), False),
        T.StructField("DocumentDateId", T.IntegerType(), False),
        T.StructField("Text", T.StringType(), True),
        T.StructField("LabelledPositions", T.StringType(), True),
        T.StructField("AnnotatedText", T.StringType(), True),
        T.StructField("AnnotatedHtml", T.StringType(), True),
        T.StructField("SentimentTotalScore", T.IntegerType(), True),
        T.StructField("DominantValence", T.IntegerType(), True),  # 1 Pos 2 Neg 3 Ambig 5 General
    ]
    + [T.StructField(c, T.IntegerType(), True) for c in ST_COLUMNS]
    + [
        T.StructField("MainWebResourceHash", T.StringType(), True),
        T.StructField("ParentWebResourceHash", T.StringType(), True),
        T.StructField("Tags", T.ArrayType(TAG), True),
        T.StructField("Signals", T.ArrayType(T.StringType()), True),
    ]
)

WRSOCIALCOUNT = T.StructType(
    [
        T.StructField("WebResourceHash", T.StringType(), False),
        T.StructField("WrPublicationDateId", T.IntegerType(), False),
        T.StructField("CountTime", T.TimestampType(), False),
        T.StructField("DocumentCollectionId", T.StringType(), True),
        T.StructField("CollectionItemId", T.StringType(), True),
        T.StructField("FbCount", T.IntegerType(), True),
        T.StructField("TwCount", T.IntegerType(), True),
    ]
)

STATNGRAM = T.StructType(
    [
        T.StructField("Ngram", T.StringType(), False),
        T.StructField("CntOccurrences", T.LongType(), False),
        T.StructField("CntDocs", T.LongType(), False),
    ]
)

TOPIC = T.StructType(
    [
        T.StructField("Topic", T.StringType(), False),
        T.StructField("IsBlocked", T.IntegerType(), False),
    ]
)

# dead-letter table for documents that failed indexing
# (reference Bigtable dead letter: IndexerPipeline.java:307-324,820-841)
DEAD_LETTER = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("document_hash", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), True),
    ]
)

VALENCE_POSITIVE, VALENCE_NEGATIVE, VALENCE_AMBIGUOUS, VALENCE_GENERAL = 1, 2, 3, 5

# Document.Type codes (bigquery/documentSchema.json "Type")
DOC_TYPE_UNKNOWN, DOC_TYPE_SHORTTEXT, DOC_TYPE_ARTICLE = 0, 1, 2

# fixed collection id for the transcripts source (reference uses "01".."04"
# for its sources — IndexerPipelineUtils.java:68-71)
TRANSCRIPTS_COLLECTION_ID = "05"
