"""Thin CLIs mirroring the reference entry points (SURVEY.md §3).

    python -m caliper_poc_data_etl_spark items <csv> [--target DIR] ...
    python -m caliper_poc_data_etl_spark assessments <csv> [limit] ...

vs reference ``node etl.js <csv>`` / ``node etl-assessment-level.js
<csv> [rows-to-extract]``.
"""

from __future__ import annotations

import argparse

from caliper_poc_data_etl_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="caliper_poc_data_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_items = sub.add_parser("items", help="item-level pipeline (reference etl.js)")
    p_items.add_argument("csv")
    p_items.add_argument("--target", default="target")
    p_items.add_argument("--mode", choices=["intent", "reference"], default="intent")
    p_items.add_argument("--layout", choices=["spark", "reference"], default="spark")
    p_items.add_argument(
        "--group-ordinal",
        action="store_true",
        help="reference filename parity (S15): name each group file "
        "events-{i}-{key}.txt, i = first-occurrence ordinal "
        "(requires --layout reference)",
    )

    p_att = sub.add_parser(
        "assessments", help="attempt-level pipeline (reference etl-assessment-level.js)"
    )
    p_att.add_argument("csv")
    p_att.add_argument("limit", nargs="?", type=int, default=None)
    p_att.add_argument("--target", default="target")
    p_att.add_argument("--mode", choices=["intent", "reference"], default="intent")
    p_att.add_argument("--layout", choices=["spark", "reference"], default="spark")

    args = parser.parse_args(argv)
    spark = get_spark()
    if args.cmd == "items":
        from caliper_poc_data_etl_spark.pipelines import run_items_pipeline

        run_items_pipeline(
            spark,
            args.csv,
            args.target,
            mode=args.mode,
            layout=args.layout,
            group_ordinal=args.group_ordinal,
        )
    else:
        from caliper_poc_data_etl_spark.pipelines import run_assessments_pipeline

        run_assessments_pipeline(
            spark,
            args.csv,
            args.target,
            limit=args.limit,
            mode=args.mode,
            layout=args.layout,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
