"""SparkSession factory tuned for this engine.

Single place to pin the configs every pipeline and test needs:
UTC session timezone (oracle comparison against DuckDB), AQE on
(skew-join + partition coalescing at scale), Arrow enabled (all our
UDFs are pandas/Arrow-vectorized), shuffle partitions sized to cores
for local mode (on a real cluster you'd leave 200+ and let AQE
coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opinion-analysis-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # derive a sane local shuffle width from the master string
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 2 * cpus if n == "*" else max(8, 2 * int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's default 64m advisory size coalesces this engine's CPU-bound
        # shuffles (sha256 derivations, Arrow NLP stages read their ckpt
        # partitioning) down to a handful of partitions long before the
        # cores are fed — measured 11 partitions on a 32-core box, capping
        # 2->8-core scaling at 0.58, and 46 partitions starving local[32]
        # (15.4s vs 12.1s steady indexer on the 500k-turn bench). 2m keeps
        # partitions at the shuffle-width cap for local data sizes while
        # still merging tiny fragments; cluster deployments with IO-bound
        # TB-scale shuffles should override via
        # SPARK_GRAFT_ADVISORY_PARTITION (bytes suffix ok).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "2m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    # local mode funnels every shuffle through one disk — a sandbox
    # artifact (a real cluster spreads shuffle over per-node disks).
    # Spill to tmpfs when it exists so measurements reflect compute.
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        b = b.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def scratch_checkpoint(df, storage_env: str = "SPARK_GRAFT_SCRATCH_LEVEL"):
    """Eager localCheckpoint for staged ONE-SHOT intermediates (shingle
    tables, LSH band relations, tf tables...) that are read a few times by
    the queries built over them and then linger for the session (their
    temp views keep the blocks referenced).

    Default storage DISK_ONLY, not the deserialized MEMORY_AND_DISK the
    pipeline's shared _pin barriers use: a bench/driver session runs ~77
    gates back-to-back and every gate's deserialized scratch blocks stay
    pinned on the JVM heap for the rest of the run — measured 2-3x
    slowdown of late-session queries from GC/storage pressure (stattopic
    44s mid-session vs 15s fresh at sf1.0). DISK_ONLY blocks are
    serialized bytes in spark.local.dir (tmpfs /dev/shm here — RAM speed,
    zero heap residency); re-reads pay one deserialization, which the
    A/B below showed is noise for relations consumed 1-3 times.
    Override per-run via $SPARK_GRAFT_SCRATCH_LEVEL."""
    import os as _os

    from pyspark.storagelevel import StorageLevel

    name = _os.environ.get(storage_env, "DISK_ONLY")
    return df.localCheckpoint(eager=True, storageLevel=getattr(StorageLevel, name))
