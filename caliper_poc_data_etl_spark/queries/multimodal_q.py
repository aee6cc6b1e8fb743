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


@query("mm_pixel_features", oracle=None)  # numpy decode — checked in pytest
def mm_pixel_features(spark, sf_dir):
    """Deterministic fake image decode (bytes→pixels) via mapInPandas;
    value-checked in tests against a local numpy computation."""
    return fake_decode_pixel_features(documents_as_media(spark, sf_dir))
