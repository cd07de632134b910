"""CLI entry point (reference: run.ts).

    python -m elastic_asset_etl_poc_spark --read <name> [--write <name>]
        [--sf-dir PATH] [--now ISO] [--limit N] [--assets-out PATH]
    python -m elastic_asset_etl_poc_spark --query <name> [--sf-dir PATH] [--limit N]

Mirrors the reference's lifecycle (SURVEY.md §3 steps 1-5):
  1. argv parse with required --read / optional --write (run.ts:23-26);
  2. catalog resolution against named sources, write defaulting to read
     (run.ts:28-37);
  3. session init (getEsClient analog → get_spark);
  4. the live pipeline collectServicesFromSummaries (run.ts:8-20);
  5. results printed as JSON lines (run.ts:18-19) and — where the
     reference left the write step "TBA" (run.ts:12-15) — an actual
     upsert of the collected assets when --assets-out is given.
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime

from .config import DEFAULT_SF_DIR, Catalog
from .observability import run_and_print_plan_on_error
from .plans.assets import collect_pods, collect_services
from .plans.services import PINNED_NOW, collect_services_from_summaries
from .session import get_spark
from .sinks import to_json_lines, upsert_assets


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="elastic_asset_etl_poc_spark")
    ap.add_argument("--read", default=None, help="named read source (catalog key)")
    ap.add_argument(
        "--query", default=None,
        help="run one named suite query (see QUERIES.md) and print JSON lines",
    )
    ap.add_argument("--write", default=None, help="named write target; defaults to --read")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="data root for the catalog")
    ap.add_argument("--now", default=None, help="pinned ISO timestamp (default: fixture NOW)")
    ap.add_argument("--limit", type=int, default=20, help="rows of JSON to print")
    ap.add_argument(
        "--assets-out", default=None,
        help="path for the asset upsert store (enables the write step)",
    )
    args = ap.parse_args(argv)

    if args.query:
        from . import suite

        qs = suite.queries()
        if args.query not in qs:
            print(
                f"unknown query: {args.query} (see QUERIES.md; {len(qs)} available)",
                file=sys.stderr,
            )
            return 2
        spark = get_spark(app_name=f"query:{args.query}")
        for line in to_json_lines(qs[args.query](spark, args.sf_dir), limit=args.limit):
            print(line)
        return 0

    if not args.read:
        print("--read is required unless --query is given", file=sys.stderr)
        return 2

    # catalog resolution (run.ts:28-37): known names only, write ?? read
    catalog = Catalog(root=args.sf_dir, write_root=None)
    known = {"local": catalog}
    for name in (args.read, args.write or args.read):
        if name not in known:
            print(f"unknown cluster name: {name} (known: {sorted(known)})", file=sys.stderr)
            return 2

    try:
        now = datetime.fromisoformat(args.now) if args.now else PINNED_NOW
    except ValueError:
        print(f"--now must be an ISO timestamp, got: {args.now}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="asset-etl")

    print("Running ETL...")  # run.ts:41
    services, full = collect_services_from_summaries(spark, args.sf_dir, now=now)
    for line in run_and_print_plan_on_error(
        services, lambda d: to_json_lines(d, limit=args.limit)
    ):
        print(line)
    for line in run_and_print_plan_on_error(
        full, lambda d: to_json_lines(d, limit=args.limit)
    ):
        print(line)

    if args.assets_out:
        s, c = collect_services(spark, args.sf_dir, now=now)
        p, n = collect_pods(spark, args.sf_dir, now=now)
        assets = s.unionByName(c).unionByName(p).unionByName(n)
        upsert_assets(spark, args.assets_out, assets)
        print(f"Upserted assets to {args.assets_out}")

    print("Finished running ETL")  # run.ts:43
    return 0


if __name__ == "__main__":
    sys.exit(main())
