"""Similarity search over the `embeddings` table (array<float> column).

Two paths:
- brute-force cosine top-k (the correctness baseline): JVM-side
  higher-order functions (zip_with + ordered aggregate fold, so the
  floating-point sum order is pinned and reproducible in the oracle);
- LSH-bucketed ANN (the scale path): deterministic random-hyperplane
  signs -> bucket key -> candidates only within bucket. At 100 TB the
  bucket key is the shuffle/join key; brute force only runs inside a
  bucket.

A vectorized pandas/Arrow variant (numpy matmul per batch) is provided
for throughput comparisons in bench; the SQL variant is the oracle-gated
one because its FP summation order is deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_PLANES = 8
ANN_TOP_K = 3
# embedding-cosine near-dup: the synthetic embeddings have no natural
# near-pairs (max pairwise cosine ~0.51 at sf0.01), so the gate
# deterministically augments every 20th vector with a perturbed twin
# (x -> x + 0.01*sin(100x), identical transform in the DuckDB oracle) and
# the detector must recover exactly those pairs through the LSH buckets
COSINE_DUP_THRESHOLD = 0.98
COSINE_DUP_EVERY = 20
COSINE_DUP_OFFSET = 1_000_000

# deterministic pseudo-random hyperplane component, portable across
# engines: plane i, dim d -> ((i*64+d) * 2654435761) % 1000003 / 1000003 - 0.5
PLANE_EXPR = "((({i} * 64 + d) * 2654435761) % 1000003) / 1000003.0 - 0.5"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


# ordered fold: dot(a,b) with left-to-right summation (reproducible FP)
DOT = (
    "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)"
)
NORM = "sqrt(aggregate(transform({c}.v, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))"


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-{TOP_K} for the first {N_QUERIES} vectors against the
    whole table (excluding self). Ranks use the 6-dp-rounded similarity
    with vec_id tie-break so ordering is FP-noise-proof."""
    _emb(spark, sf_dir)
    return spark.sql(
        f"""
WITH v AS (
  SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    round({DOT} / ({NORM.format(c='a')} * {NORM.format(c='b')}), 6) AS cosine
  FROM q a CROSS JOIN v b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, cosine, rk FROM ranked WHERE rk <= {TOP_K}
"""
    )


def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: {LSH_PLANES}-bit bucket per vector,
    candidates restricted to the query's bucket, top-{ANN_TOP_K} by cosine
    within it. The bucket key is an equi-join key — the scale path."""
    _emb(spark, sf_dir)
    plane_sign = " + ".join(
        f"(CASE WHEN aggregate(zip_with(v, planes.p{i}, (x, y) -> x * y), "
        f"cast(0.0 AS double), (acc, x) -> acc + x) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_PLANES)
    )
    plane_arrays = ", ".join(
        f"transform(sequence(0, 63), d -> {PLANE_EXPR.format(i=i)}) AS p{i}"
        for i in range(LSH_PLANES)
    )
    return spark.sql(
        f"""
WITH planes AS (SELECT {plane_arrays}),
v AS (
  SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, ({plane_sign}) AS bucket
  FROM v CROSS JOIN planes
),
q AS (SELECT * FROM bucketed WHERE vec_id < {N_QUERIES}),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
    round({DOT} / ({NORM.format(c='a')} * {NORM.format(c='b')}), 6) AS cosine
  FROM q a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, bucket, cosine, rk
FROM ranked WHERE rk <= {ANN_TOP_K}
"""
    )


# ---------------------------------------------------------------------------
# vectorized Arrow path (bench / scale comparison, not oracle-gated)
# ---------------------------------------------------------------------------

def topk_matmul_map(query_matrix, query_ids, k: int = TOP_K):
    """Build a mapInPandas fn: per Arrow batch, numpy matmul against the
    broadcast query matrix, emit (query_id, neighbor_id, cosine)."""
    import numpy as np

    qn = query_matrix / np.linalg.norm(query_matrix, axis=1, keepdims=True)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = qn @ mn.T  # (n_queries, batch)
            qi, bi = np.nonzero(np.ones_like(sims))
            yield pd.DataFrame(
                {
                    "query_id": query_ids[qi],
                    "neighbor_id": pdf["vec_id"].to_numpy()[bi],
                    "cosine": sims[qi, bi],
                }
            )

    return fn


def similarity_topk_arrow(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """The Arrow/numpy brute-force path: broadcast query matrix, per-batch
    matmul, then a global top-k window. Used by bench for throughput."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir)
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    qm = np.stack([np.array(r.embedding) for r in qrows]).astype("float64")
    qids = np.array([r.vec_id for r in qrows])
    sims = emb.mapInPandas(
        topk_matmul_map(qm, qids, k),
        "query_id long, neighbor_id long, cosine double",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return sims.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _plane_sign_spark() -> str:
    return " + ".join(
        f"(CASE WHEN aggregate(zip_with(v, planes.p{i}, (x, y) -> x * y), "
        f"cast(0.0 AS double), (acc, x) -> acc + x) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(LSH_PLANES)
    )


def _plane_arrays_spark() -> str:
    return ", ".join(
        f"transform(sequence(0, 63), d -> {PLANE_EXPR.format(i=i)}) AS p{i}"
        for i in range(LSH_PLANES)
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS via LSH buckets — the dedup
    twin of similarity_ann_lsh: candidates only within a bucket (the
    bucket is the equi-join/shuffle key, the 100 TB path), exact rounded
    cosine >= {COSINE_DUP_THRESHOLD} as the verification. The input is
    augmented with deterministic perturbed twins (see COSINE_DUP_* above)
    because the synthetic corpus has no natural near-pairs."""
    _emb(spark, sf_dir)
    return spark.sql(
        f"""
WITH planes AS (SELECT {_plane_arrays_spark()}),
base AS (
  SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings
),
aug AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + {COSINE_DUP_OFFSET} AS vec_id,
         transform(v, x -> x + 0.01 * sin(100.0 * x)) AS v
  FROM base WHERE vec_id % {COSINE_DUP_EVERY} = 3
),
bucketed AS (
  SELECT vec_id, v, ({_plane_sign_spark()}) AS bucket
  FROM aug CROSS JOIN planes
),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, a.bucket,
    round({DOT} / ({NORM.format(c='a')} * {NORM.format(c='b')}), 6) AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, bucket, cosine
FROM pairs WHERE cosine >= {COSINE_DUP_THRESHOLD}
"""
    )


# IVF parameters: deterministic coarse quantizer (centroids = the first
# IVF_CENTROIDS vectors — the sandbox replacement for k-means training,
# which is a fit-time concern, not a query-plan concern), nprobe lists
# searched per query
IVF_CENTROIDS = 8
IVF_NPROBE = 2


def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) lists — the second scale path next to
    LSH buckets: every vector is assigned to its nearest coarse centroid
    (rounded-cosine argmax, centroid-id tie-break); a query probes its
    {IVF_NPROBE} nearest lists and brute-forces only inside them. The
    list id is the shuffle/join key; the centroid relation is tiny and
    broadcast — at 100 TB the lists ARE the partitioning."""
    _emb(spark, sf_dir)
    return spark.sql(
        f"""
WITH v AS (
  SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings
),
cent AS (
  SELECT vec_id AS cent_id, v AS c FROM v WHERE vec_id < {IVF_CENTROIDS}
),
scored AS (
  SELECT a.vec_id, a.v, cent.cent_id,
    round(aggregate(zip_with(a.v, cent.c, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)
      / ({NORM.format(c='a')} * sqrt(aggregate(transform(cent.c, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))), 6) AS ccos
  FROM v a CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored
  ) WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, cent_id AS probe_cent FROM (
    SELECT vec_id, cent_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crk
    FROM scored WHERE vec_id < {N_QUERIES}
  ) WHERE crk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, x.vec_id AS neighbor_id, x.cent_id, qa.v AS qv, x.v AS nv
  FROM probes p
  JOIN assigned x ON x.cent_id = p.probe_cent
  JOIN assigned qa ON qa.vec_id = p.query_id
  WHERE x.vec_id <> p.query_id
),
sims AS (
  SELECT query_id, neighbor_id, cent_id,
    round(aggregate(zip_with(qv, nv, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)
      / (sqrt(aggregate(transform(qv, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))
         * sqrt(aggregate(transform(nv, x -> x * x), cast(0.0 AS double), (acc, x) -> acc + x))), 6) AS cosine
  FROM cand
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, cent_id, cosine, rk
FROM ranked WHERE rk <= {ANN_TOP_K}
"""
    )
