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
