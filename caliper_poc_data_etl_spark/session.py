"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same plan that is tested on ``local[N]``
degrades gracefully to a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch) — the single most important 100 TB knob.
- ``spark.sql.shuffle.partitions`` sized to local cores here; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant.
- Session timezone pinned to UTC so results are comparable with
  UTC-naive engines (the DuckDB oracle) and stable across hosts.
- Arrow enabled for the (rare, clearly-marked) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "caliper_poc_data_etl_spark",
    cpus: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local mode is one JVM with ``cpus`` executor threads; on a cluster
    the same configs apply unchanged except master/memory, which come
    from the submit environment.
    """
    cpus = cpus or DEFAULT_CPUS
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events table uses parquet TIMESTAMP(NANOS);
        # Spark has no nanos type — read as long, convert in the reader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Files: 128 MiB splits keep scan tasks executor-memory-safe at
        # 100 TB (≈800k tasks — fine for the DAG scheduler).
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Split-size floor. Spark sizes splits as
        # min(maxPartitionBytes, max(openCostInBytes, bytes/cores)), so
        # this knob ONLY moves small inputs: the default 4 MiB floor
        # leaves a 12 MB CSV on 3 tasks of a 32-core session (measured
        # +0.3-0.5 s on the 100k caliper e2e); 1 MiB restores full
        # parallelism there while 100 TB scans still get 128 MiB splits
        # (bytes/cores dominates the max() long before the floor).
        .config("spark.sql.files.openCostInBytes", "1048576")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
        # Managed-table location (bucketed tables) — keep out of the repo.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
        # Local mode only: skip Hadoop's ChecksumFileSystem (.crc
        # sibling per file) — halves many-small-file sink time. On a
        # real cluster the filesystem comes from the deployment
        # (HDFS/S3A committers), not this flag.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        # FileOutputCommitter v2: task commits move files straight to
        # the destination (parallel, across tasks) instead of v1's
        # job-commit rename of every task directory SERIALLY on the
        # driver. On a 5,000-partition-directory sink v1's serial merge
        # is both the bottleneck and the variance (it contends with
        # page-cache writeback); v2 removes that phase. Trade-off —
        # a failed job can leave partial files — is the standard one
        # accepted for object-store-style sinks.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
