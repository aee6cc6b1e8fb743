"""Multimodal operators graded through the oracle.

``documents.text`` adapted to the binary media layout (payload =
utf-8 bytes) so the mapInPandas decode plumbing is checked against
plain SQL over the same bytes. ASCII-only properties (head_byte,
md5) agree between text and blob on this corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from caliper_poc_data_etl_spark.multimodal import (
    documents_as_media,
    fake_decode_pixel_features,
    payload_stats,
    sample_frames,
)
from caliper_poc_data_etl_spark.queries.registry import query

FRAME_BYTES = 64


@query(
    "mm_payload_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5,
           ord(substr(text, 1, 1)) AS head_byte
    FROM documents
    """,
)
def mm_payload_stats(spark, sf_dir):
    """Arrow-batched mapInPandas over binary payloads vs SQL over the
    same bytes — the canonical decode batch shape, oracle-checked."""
    return payload_stats(documents_as_media(spark, sf_dir)).withColumn(
        "head_byte", F.col("head_byte").cast("int")
    )


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id AS media_id,
             CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) AS n_frames,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT media_id, CAST(i AS INT) AS frame_idx,
           CAST(LEAST({FRAME_BYTES}, n_bytes - i * {FRAME_BYTES}) AS INT) AS frame_len
    FROM f, unnest(range(0, n_frames)) AS u(i)
    WHERE i % 2 = 0
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Pure-Column frame sampling (binary substring over generated
    indexes) — zero Python; projected to frame lengths so the oracle
    compares scalars."""
    frames = sample_frames(documents_as_media(spark, sf_dir), FRAME_BYTES, every_n=2)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame").cast("int").alias("frame_len"),
    )


@query(
    "mm_audio_energy",
    oracle=f"""
    WITH f AS (
      SELECT doc_id AS media_id,
             CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT)
               AS n_frames,
             hex(encode(text)) AS hx
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ),
    frames AS (
      SELECT media_id, CAST(i AS INT) AS frame_idx,
             substr(hx, CAST(i * {FRAME_BYTES} * 2 + 1 AS BIGINT),
                    {FRAME_BYTES} * 2) AS fhx
      FROM f, unnest(range(0, n_frames)) AS u(i)
    ),
    samples AS (
      SELECT media_id, frame_idx,
             list_transform(range(1, CAST(len(fhx) / 2 AS BIGINT) + 1),
               j -> ('0x' || substr(fhx, (j - 1) * 2 + 1, 2))::BIGINT) AS s
      FROM frames
    )
    SELECT media_id, frame_idx,
           CAST(len(s) AS INT) AS n_samples,
           ROUND(list_sum(s) * 1.0 / len(s), 3) AS mean_sample,
           ROUND(sqrt(list_sum(list_transform(s, x -> x * x)) * 1.0 / len(s)), 3)
             AS rms
    FROM samples
    """,
)
def mm_audio_energy(spark, sf_dir):
    """Audio-feature access pattern: fixed-size frames over a binary
    payload, per-frame sample mean and RMS energy — entirely
    pure-Column (hex → per-byte parse → integer aggregate), zero
    Python, so it runs in codegen and parallelizes with the scan.

    Integer sums keep the math engine-exact; the single double
    division + sqrt at the end is IEEE-identical across engines, so
    the oracle hash-matches. Swap the hex parse for a real PCM decoder
    (mapInPandas) when samples are 16-bit/compressed — the frame
    plumbing stays the same."""
    frames = sample_frames(documents_as_media(spark, sf_dir), FRAME_BYTES, every_n=1)
    hx = F.hex(F.col("frame"))
    samples = F.transform(
        F.sequence(F.lit(1), F.length("frame")),
        lambda j: F.conv(F.substring(hx, (j - 1) * 2 + 1, 2), 16, 10).cast("long"),
    )
    s = F.col("s")
    n = F.size(s)
    ssum = F.aggregate(s, F.lit(0).cast("long"), lambda acc, x: acc + x)
    sqsum = F.aggregate(s, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    return (
        frames.select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            samples.alias("s"),
        )
        .select(
            "media_id",
            "frame_idx",
            n.cast("int").alias("n_samples"),
            F.round(ssum / n, 3).alias("mean_sample"),
            F.round(F.sqrt(sqsum / n), 3).alias("rms"),
        )
    )


@query("mm_pixel_features", oracle=None)  # numpy decode — checked in pytest
def mm_pixel_features(spark, sf_dir):
    """Deterministic fake image decode (bytes→pixels) via mapInPandas;
    value-checked in tests against a local numpy computation."""
    return fake_decode_pixel_features(documents_as_media(spark, sf_dir))
