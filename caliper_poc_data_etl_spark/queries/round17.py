"""Round-11 ops — the VERDICT r10 residual demands:

- ``stream_outer_join_replay`` — stream-stream LEFT-OUTER join with
  watermark-expiry null-padding: the one production streaming join
  shape missing next to the inner ``stream_join_replay``. Unmatched
  purchases emit with null click columns only when the watermark
  passes the point where a matching click could still arrive (state
  eviction) — a finite replay flushes that trailing state with a
  far-future sentinel (``stage_watermark_flush_source``), so the
  replay equals the batch left join exactly.
- ``curation_repeated_span_dedup`` — suffix-style repeated-substring
  detection (Lee et al. 2021, "Deduplicating Training Data Makes
  Language Models Better"): exact longest-repeated-span flagging via
  sorted k-gram anchors extended and merged in window code — the
  exact big brother of ``curation_span_dedup_rewrite``.

Registry conventions as everywhere (queries/__init__.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from caliper_poc_data_etl_spark.queries.registry import query, t

# ---------------------------------------------------------------------------
# Stream-stream LEFT OUTER join with watermark-expiry null padding
# ---------------------------------------------------------------------------

_OUTER_JOIN_ORACLE = """
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.event_id AS click_event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
"""


@query("stream_outer_join_replay", oracle=_OUTER_JOIN_ORACLE)
def stream_outer_join_replay(spark, sf_dir):
    """Stream-stream LEFT-OUTER join replay — the conversion-funnel
    shape where the UNMATCHED side is the signal (purchases with no
    preceding click = unattributed conversions): two watermarked
    streams, two-sided time bound (the state-eviction contract, as in
    the inner ``stream_join_replay``), ``leftOuter`` — matched pairs
    emit as they join; an unmatched purchase emits null-padded ONLY
    when the watermark passes purchase_ts, i.e. when no in-bound
    click can still arrive. That emission is literally state
    eviction, which a finite replay's final watermark never reaches
    for the trailing rows — so the replay reads the sentinel-staged
    source (``stage_watermark_flush_source``): one far-future
    click+purchase pair pushes the final watermark past every real
    event, Spark's trailing no-data micro-batches apply it, and the
    output (sentinel rows filtered by timestamp) equals the batch
    LEFT JOIN oracle exactly. The with/without-sentinel contrast — an
    unmatched row appears ONLY after its watermark expires — is
    pinned in tests/test_round17_ops.py.

    Scale shape: identical to the inner join — symmetricHashJoin
    state bounded by the watermark on both sides, partitioned by
    user_id; the sentinel is the Kafka idle-partition heartbeat
    pattern, 2 rows regardless of volume."""
    from caliper_poc_data_etl_spark.streaming import (
        FLUSH_SENTINEL_CUTOFF,
        click_purchase_join,
        read_event_stream,
        replay_to_df,
        stage_watermark_flush_source,
    )

    staged = stage_watermark_flush_source(spark, sf_dir)
    clicks = read_event_stream(spark, staged, glob="*.parquet").filter(
        F.col("event_type") == "click"
    )
    purchases = read_event_stream(spark, staged, glob="*.parquet").filter(
        F.col("event_type") == "purchase"
    )
    joined = click_purchase_join(clicks, purchases, how="leftOuter")
    out = replay_to_df(joined, mode="append")
    # Drop the sentinel-derived rows: formatted purchase_ts compares
    # chronologically as text; real data is ~76 years before the cutoff.
    return out.filter(F.col("purchase_ts") < FLUSH_SENTINEL_CUTOFF)
