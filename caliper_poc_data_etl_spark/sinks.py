"""Sinks: partitioned, overwrite-atomic file writes.

Replaces the reference's rimraf + unbounded concurrent ``fs.writeFile``
sink (``etl.js:39-45,115-125``), which silently lost 80% of writes at
100k rows (SURVEY.md F5), with Spark's job-commit protocol: atomic
overwrite, retries, and backpressure for free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_group_ordinal(df: DataFrame, *, order_col: str) -> DataFrame:
    """Attach the reference's group ordinal (S15): ``_ord`` = 1-based
    rank of ``order_col`` (the group's first-occurrence row id,
    etl.js:56-58 Map-insertion order).

    Global rank via the TWO-PASS RANGE-OFFSET form (the
    ``mix_round_robin_interleave`` r10 re-plan): range-repartition on
    the unique order key, per-range-partition ``row_number``, then each
    partition's global offset joins back as a broadcast
    #partitions-row cumulative-count table — no single partition ever
    holds all groups, so the ordinal stays computable at any group
    cardinality. The ranked frame is persisted so the count branch and
    the output branch see the SAME physical range boundaries."""
    from pyspark.sql.window import Window as W

    w_pid = W.partitionBy("_pid").orderBy(order_col)
    ranked = (
        df.repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn_in", F.row_number().over(w_pid).cast("long"))
        .persist()
    )
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).cast("long").alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("_ord", F.col("_off") + F.col("_rn_in"))
        .drop("_pid", "_rn_in", "_off", order_col)
    )


def _write_reference_ordinal(df: DataFrame, target: str, *, key: str) -> None:
    """Reference filename-ordinal layout (S15 opt-in): ONE flat file
    per group named ``events-{ordinal}-{key}.txt``, ordinal = the
    group's first-occurrence order in the input — the deterministic
    stand-in for the reference's ``events-{i}-{Date.now()}`` (etl.js:116;
    the timestamp suffix is inherently non-deterministic and declared
    non-semantic, SURVEY §7.3 — the ORDINAL is the reproducible part
    and is what this layout reproduces). Same executor-direct POSIX
    writer semantics as :func:`_write_reference_direct` — synchronous
    writes, any I/O error fails the task loudly."""
    shutil.rmtree(target, ignore_errors=True)
    os.makedirs(target, exist_ok=True)

    def _write_partition(rows) -> None:
        for row in rows:
            name = f"events-{row['_ord']}-{row[key]}.txt"
            with open(os.path.join(target, name), "w") as fh:
                fh.write(row["value"])
                fh.write("\n")

    df.foreachPartition(_write_partition)


def _write_reference_direct(df: DataFrame, target: str, *, key: str) -> None:
    """Direct executor-side file-per-group writer (reference layout).

    Input is the pre-serialized ``(key, value: string)`` form; each row
    becomes one ``{key}=<k>/part-<task>-<seq>.txt`` file written with
    plain POSIX I/O from the task — no Hadoop committer. Measured
    motivation: the committer path costs ~2 metadata operations per
    file (temp write + commit rename) plus a job-commit listing over
    every partition directory; at 5,000 one-file groups that overhead
    — not the bytes — dominates the whole pipeline (15.5 s committed
    vs a 0.6 s raw-writer floor for the same files, bench.py's
    ``file_create_ceiling``).

    Semantics: rows write synchronously and any I/O error fails the
    task (and job) loudly — unlike the reference's unbounded async
    ``fs.writeFile`` (etl.js:115-125) this cannot silently drop
    groups (pinned by tests/test_scale_no_loss.py). Trade-offs,
    accepted for this layout only: no task-retry atomicity (a retried
    task rewrites the same deterministic filenames) and the target
    must be POSIX-reachable from executors (local/NFS). File-per-group
    is the parity experiment, not the scale path — ``bulk`` remains
    the 100 TB layout and keeps the committer.
    """
    shutil.rmtree(target, ignore_errors=True)
    os.makedirs(target, exist_ok=True)

    def _write_partition(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        seq = 0
        for row in rows:
            d = os.path.join(target, f"{key}={row[0]}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"part-{pid:05d}-{seq:05d}.txt"), "w") as fh:
                fh.write(row[1])
                fh.write("\n")
            seq += 1

    df.select(F.col(key).cast("string"), "value").foreachPartition(_write_partition)


def write_grouped_json(
    df: DataFrame,
    target: str,
    *,
    key: str = "attempt_id",
    layout: str = "spark",
    group_ordinal: bool = False,
) -> None:
    """Write one JSON document stream per group key.

    - ``layout='spark'`` (default): ``partitionBy(key)`` JSON-lines —
      the idiomatic equivalent of the reference's file-per-group;
      directory per key, null fields pruned.
    - ``layout='reference'``: byte-parity content — each row's
      ``events`` array serialized as ONE JSON-array text line per
      group, matching the reference's ``JSON.stringify(events)`` files
      (file *naming* is declared non-semantic, SURVEY.md §7.3).
      Written executor-direct, bypassing the Hadoop committer — see
      :func:`_write_reference_direct` for the measured rationale and
      trade-offs.
    - ``layout='bulk'``: JSON-lines of ``(key, events)`` with NO per-key
      directories — the 100 TB layout. Any file-per-group layout costs
      O(distinct keys) filesystem metadata operations (measured ≈1 ms
      per file even for a raw serial writer); bulk keeps file count =
      task count and the grouping travels IN the data. Use this when
      keys number in the millions and a downstream consumer can filter
      by key (or re-partition coarsely) instead of addressing files.

    Partitioning strategy: REUSE the input's existing distribution. The
    callers' group-by / per-key projection already hash-partitions (or
    uniquifies) the key, so each key's rows sit in exactly one task and
    each partition directory gets ≈1 file — no extra exchange needed.
    Two rejected alternatives, both measured slower at 100k rows:

    - an explicit ``repartition(N, key)`` is elided as redundant against
      the group-by's hash partitioning, after which AQE coalesces the
      tiny final shuffle to 1-2 tasks that create hundreds of partition
      directories SERIALLY (2-3× the write cost);
    - ``repartitionByRange(N, key)`` survives elision but adds a range-
      sampling pass that RECOMPUTES the entire upstream (scan + agg)
      a second time — 3× the end-to-end wall clock.

    Instead, AQE partition coalescing is disabled just for this write,
    so the upstream's full task width carves the partition directories
    in parallel; the conf is restored afterwards.

    Input forms: ``(key, events: array<struct>)`` (struct form) or
    ``(key, value: string)`` from
    ``pipelines.items.items_grouped_json_by_attempt`` (pre-serialized
    form — measured 3-4× faster end-to-end at 1M rows because events
    serialize before the shuffle; see that function's docstring).
    """
    pre_serialized = dict(df.dtypes).get("value") == "string"
    spark = df.sparkSession
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, None)
    spark.conf.set(coalesce_key, "false")
    try:
        if group_ordinal:
            # S15 opt-in: filename ordinal by first-occurrence order.
            # Requires the pre-serialized form carrying _first_rid
            # (items_grouped_json_by_attempt(with_first_seen=True)).
            if layout != "reference":
                raise ValueError(
                    "group_ordinal is a reference-layout filename parity "
                    f"feature; got layout={layout!r}"
                )
            if not (pre_serialized and "_first_rid" in df.columns):
                raise ValueError(
                    "group_ordinal needs the pre-serialized grouped form "
                    "with _first_rid (with_first_seen=True)"
                )
            _write_reference_ordinal(
                _with_group_ordinal(df, order_col="_first_rid"),
                target,
                key=key,
            )
        elif pre_serialized:
            _write_pre_serialized(df, target, key=key, layout=layout)
        elif layout == "reference":
            _write_reference_direct(
                df.select(F.col(key), F.to_json(F.col("events")).alias("value")),
                target,
                key=key,
            )
        elif layout == "spark":
            (
                df.write.mode("overwrite")
                .option("ignoreNullFields", True)
                .partitionBy(key)
                .json(target)
            )
        elif layout == "bulk":
            (
                df.write.mode("overwrite")
                .option("ignoreNullFields", True)
                .json(target)
            )
        else:
            raise ValueError(
                f"layout must be 'spark', 'reference' or 'bulk', got {layout!r}"
            )
    finally:
        if old is None:
            spark.conf.unset(coalesce_key)
        else:
            spark.conf.set(coalesce_key, old)


def _write_pre_serialized(
    df: DataFrame, target: str, *, key: str, layout: str
) -> None:
    """Sink the ``(key, value: string)`` form — text writes only, no
    datasource re-serialization.

    - reference: same bytes/partition-dirs as the struct path.
    - spark: partition-dir per key, JSON-lines ``{"events": [...]}``
      (field order differs from the struct path; same data).
    - bulk: single flat JSON-lines file set with the key inlined —
      the key is JSON-escaped by serializing a 1-field struct and
      splicing the events array into it, so arbitrary key strings
      stay valid JSON.
    """
    if layout == "reference":
        _write_reference_direct(df, target, key=key)
    elif layout == "spark":
        (
            df.select(
                F.col(key),
                F.concat(F.lit('{"events":'), F.col("value"), F.lit("}")).alias(
                    "value"
                ),
            )
            .write.mode("overwrite")
            .partitionBy(key)
            .text(target)
        )
    elif layout == "bulk":
        head = F.to_json(F.struct(F.col(key)))
        line = F.concat(
            F.substring(head, 1, F.length(head) - 1),
            F.lit(',"events":'),
            F.col("value"),
            F.lit("}"),
        )
        df.select(line.alias("value")).write.mode("overwrite").text(target)
    else:
        raise ValueError(
            f"layout must be 'spark', 'reference' or 'bulk', got {layout!r}"
        )


def write_parquet(
    df: DataFrame,
    target: str,
    *,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink with overwrite (generalized S18)."""
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)


def write_file(
    df: DataFrame,
    target: str,
    *,
    fmt: str = "json",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Generic partitioned overwrite sink (json / csv / orc / parquet /
    text) — one code path, format is a parameter."""
    writer = df.write.mode("overwrite").format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(target)


def compact_files(
    spark,
    source: str,
    target: str,
    *,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Small-file compaction — the table-maintenance operator every
    long-running ingest needs (streaming sinks and per-key layouts
    accrete files; scan cost grows with file COUNT, not bytes).

    Read the source directory and rewrite it with AQE partition
    coalescing deciding the output width: tiny input partitions merge
    up to the session's advisory partition size, so output file count
    tracks data volume instead of historical task counts.
    ``max_records_per_file`` caps the other direction (files too big
    to parallelize over). No driver-side file listing loops — the
    rewrite is one distributed job either way.
    """
    df = spark.read.format(fmt).load(source)
    # REBALANCE is the AQE-native reshuffle: the optimizer sizes the
    # post-shuffle partitions to the advisory size (splitting skewed
    # ones, merging tiny ones); a plain coalesce() would keep
    # historical file boundaries glued into uneven tasks.
    writer = df.hint("rebalance").write.mode("overwrite").format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed parquet table (hash-bucketed by join key, optionally
    sorted within buckets).

    The 100 TB co-location play: two tables bucketed on the same key
    with the same bucket count join with NO shuffle on either side
    (and no sort when sortBy matches) — the shuffle is paid once at
    write time, amortized over every subsequent join/aggregation on
    that key. Verified in tests by asserting the joined plan has zero
    Exchange nodes."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
