"""Scale smoke: tile the sf0.1 tables K× (default 10 — ~sf1, ~6M
lineitem rows) into a temp dir with key offsets, then run the bench
headline queries against the tiled data.

Purpose: direct evidence for the "would this plan survive a 10×
scale-up?" question — every query must (a) complete, (b) stay roughly
linear vs its sf0.1 time (shuffle- or memory-quadratic plans blow past
that), and (c) produce K×-consistent row counts where the semantics
predict them (per-row ops scale exactly K×; global aggregates stay
fixed-size).

The tiling offsets every key column by i*stride so joins keep their
selectivity instead of multiplying: tile i of orders only matches tile
i of lineitem (same for events.user_id, documents.doc_id,
embeddings.vec_id). Dimension tables (region/nation/customer/supplier/
part) are NOT tiled — at 100 TB the dims stay broadcast-sized while
facts grow, which is exactly the shape this smoke wants to stress.

Caveat for dedup operators: tiling makes every document K×-duplicated
(tile copies are textually identical), so near-dup OUTPUT grows ~K²
(measured: dedup_minhash_lsh 2,506 → 250,600 pairs at K=10 — exactly
100×) and wall-clock follows the output, not the input. Compare their
time ratio against the printed row count, not against K — OR set
``SPARK_GRAFT_SCALE_SALT_TEXT=1``, which suffixes every whitespace
token of tile i's documents.text with ``_t{i}``: shingles become
tile-unique, cross-tile similarity drops to zero, and the dedup
workload scales the way a corpus of NEW content does (per-tile
structure identical to base, Σ df² grows ×K, output grows ×K). The
text salt is the dedup analog of the key offsets: both keep
SELECTIVITY constant while volume grows. (Date-keyed collision ops —
the interval join — have no such knob: packing K× intervals into the
same fixed year genuinely multiplies collisions, so their time is
graded against output growth, not K.)

Usage:
    python tools/scale_smoke.py            # K=10, headline subset
    SPARK_GRAFT_SCALE_K=4 python tools/scale_smoke.py q1 dedup_minhash
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "10"))
SALT_TEXT = os.environ.get("SPARK_GRAFT_SCALE_SALT_TEXT", "") == "1"
# SALT_EMB is the embedding analog of SALT_TEXT: tile i>0 multiplies
# each vector component by a tile-specific deterministic ±1 pattern
# (md5(i:d) parity). Norms and WITHIN-tile geometry are exactly
# preserved (per-tile dedup/ANN structure == base), while cross-tile
# cosines decorrelate (E[cos]=0), so embedding-dedup output grows ~K
# the way a corpus of NEW content does instead of K² tile-clones.
SALT_EMB = os.environ.get("SPARK_GRAFT_SCALE_SALT_EMB", "") == "1"


def _emb_salt_pattern(i: int, dim: int = 64) -> list[float]:
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for d in range(dim)
    ]

# Key columns to offset per tile, per table (fact tables only).
TILE_KEYS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# o_custkey / user_id offsets break the join to untiled dims unless the
# dim side is tiled too — customer IS small, so tile it with orders.
TILE_KEYS["customer"] = ["c_custkey"]

# Headline queries to smoke (bench.py's list minus the caliper e2e,
# which has its own 1M-row entry there).
QUERIES_TO_RUN = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q18_large_volume_customer",
    "join_broadcast_dims",
    "join_asof",
    "window_rank_topk_per_group",
    "window_sessionize",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_label_centroid_stats",
    "text_quality_score",
    "ts_session_window",
    "curriculum_quality_order",
]


def tile_tables(spark, base: str, out: str, k: int) -> None:
    from caliper_poc_data_etl_spark.sources.readers import TABLE_NAMES

    for name in TABLE_NAMES:
        src = spark.read.parquet(f"{base}/{name}.parquet")
        keys = TILE_KEYS.get(name)
        if not keys:
            # Untiled tables copy through as-is; a Spark-written base
            # (including scale_smoke's own output) is a DIRECTORY of
            # part files, not a single parquet file.
            src_path = f"{base}/{name}.parquet"
            dst_path = f"{out}/{name}.parquet"
            if os.path.isdir(src_path):
                shutil.copytree(src_path, dst_path, dirs_exist_ok=True)
            else:
                shutil.copy(src_path, dst_path)
            continue
        strides = {c: (src.agg(F.max(c)).first()[0] or 0) + 1 for c in keys}
        tiles = []
        for i in range(k):
            t = src
            for c in keys:
                t = t.withColumn(c, F.col(c) + F.lit(i * strides[c]))
            if SALT_TEXT and name == "documents" and i > 0:
                t = t.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"$1_t{i}"),
                )
            if SALT_EMB and name == "embeddings" and i > 0:
                pat = F.array(
                    *[F.lit(v).cast("float") for v in _emb_salt_pattern(i)]
                )
                t = t.withColumn(
                    "embedding",
                    F.zip_with("embedding", pat, lambda x, s: x * s),
                )
            tiles.append(t)
        tiled = tiles[0]
        for t in tiles[1:]:
            tiled = tiled.unionByName(t)
        # Write multi-file parquet (task-count files) — the tiled scan
        # must parallelize; the driver fixtures' single row group is
        # exactly the layout bottleneck bench.py demonstrates.
        tiled.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"# tiled {name}: {n} rows ({k}x)", file=sys.stderr)


def main() -> int:
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    json_path = None
    if "--json" in sys.argv:
        # ADVICE r11: validate that a non-flag path follows --json
        # instead of IndexError-ing (bare --json) or silently consuming
        # a following flag as the output path.
        i = sys.argv.index("--json")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("-"):
            print(
                "usage: scale_smoke.py [--json <path>] [query filters...]",
                file=sys.stderr,
            )
            return 2
        json_path = sys.argv[i + 1]
        only = [a for a in only if a != json_path]
    from caliper_poc_data_etl_spark.queries import QUERIES
    from caliper_poc_data_etl_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.range(1).count()
    out = tempfile.mkdtemp(prefix=f"scale_smoke_{K}x_")
    t0 = time.perf_counter()
    tile_tables(spark, BASE_SF_DIR, out, K)
    print(f"# tiling wall: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    names = [n for n in QUERIES_TO_RUN if n in QUERIES]
    if only:
        # Explicit filters select from the FULL registry, not just the
        # headline subset — the point of a filter is to smoke a
        # specific (often newly added) query. Streaming replays need a
        # running query and stay out.
        names = [
            n
            for n in QUERIES
            if any(f in n for f in only) and not n.startswith("stream_")
        ]
    results = {}
    for name in names:
        # sf0.1 reference time (min of 2), then tiled time (min of 2).
        small = tiled = None
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name].spark(spark, BASE_SF_DIR).count()
            w = time.perf_counter() - t0
            small = w if small is None else min(small, w)
        for _ in range(2):
            t0 = time.perf_counter()
            n_rows = QUERIES[name].spark(spark, out).count()
            w = time.perf_counter() - t0
            tiled = w if tiled is None else min(tiled, w)
        ratio = tiled / small if small else float("inf")
        results[name] = (small, tiled, ratio, n_rows)
        print(
            f"{name}: sf0.1 {small:.2f}s -> {K}x {tiled:.2f}s "
            f"(ratio {ratio:.1f}x vs {K}x data; {n_rows} rows)",
        )
    # A plan that blows up superlinearly at 10x data is a scale bug;
    # 3*K is a loose wall that still catches quadratic behavior
    # (a quadratic op would land at ~K*K = 100x).
    bad = {n: r for n, (s, t, r, _) in results.items() if r > 3 * K}
    shutil.rmtree(out, ignore_errors=True)
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "k": K,
                    "base_sf_dir": BASE_SF_DIR,
                    "queries": {
                        n: {
                            "base_sec": round(s, 3),
                            "tiled_sec": round(t, 3),
                            "ratio": round(r, 2),
                            "tiled_rows": rows,
                        }
                        for n, (s, t, r, rows) in results.items()
                    },
                    "superlinear": sorted(bad),
                },
                f,
                indent=1,
            )
    if bad:
        print(f"SUPERLINEAR at {K}x: {bad}")
        return 1
    print(f"\nall {len(results)} queries within 3*K of linear at {K}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
