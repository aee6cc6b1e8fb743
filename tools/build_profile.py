"""Driver-side BUILD cost of every registered query builder.

r12's headline finding was that several builders spend 0.3-3 s of
py4j round-trips *constructing* the DataFrame (literal arrays,
per-element lambdas) — paid on every bench trial and every driver
correctness run. This tool times ONLY ``builder(spark, sf_dir)`` for
every registry entry (no action, no explain), so the build-heavy tail
is visible across all 393 queries, not just the bench headline set.

Builders that run eager work at build time (localCheckpoint(eager),
fixture staging) are reported as measured — their "build" legitimately
includes those jobs; the per-query JSON carries the number either way.

Usage:
    python tools/build_profile.py                  # all queries @ sf0.01
    python tools/build_profile.py --top 40         # print slowest 40
    SPARK_GRAFT_SF_DIR=... python tools/build_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    top_n = None
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])
    filters = [
        a for a in sys.argv[1:] if not a.startswith("--") and not a.isdigit()
    ]
    json_out = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--json=")), None
    )

    import __spark_entry__ as entrymod
    from caliper_poc_data_etl_spark.session import get_spark

    qs = entrymod.queries()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}

    spark = get_spark("build_profile")
    spark.range(1).count()
    spark.range(1024).repartition(32).foreachPartition(lambda it: None)

    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            errs[name] = str(exc)[:200]
            continue
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {out[name]:.3f}s", file=sys.stderr, flush=True)

    ranked = sorted(out.items(), key=lambda kv: -kv[1])
    for name, sec in ranked[: top_n or len(ranked)]:
        print(f"{sec:8.3f}  {name}")
    payload = {
        "sf_dir": SF_DIR,
        "n": len(out),
        "build_sec": dict(ranked),
        "errors": errs,
    }
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if errs:
        print(f"ERRORS: {errs}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
