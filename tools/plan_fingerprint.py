"""Physical-plan fingerprints for registered queries — the bench-hygiene tool.

For each named query (or the whole bench headline set with --bench), builds
the DataFrame at the given scale factor and prints a compact operator-count
fingerprint of the executed plan. Comparing fingerprints across rounds is how
a >20% bench mover is classified as environmental noise (identical
fingerprint) vs a real plan regression (operator counts changed) — the
policy documented in SCALE.md. Previously recreated in /tmp every round.

    python tools/plan_fingerprint.py flagship_balance_report text_chunk_sliding
    python tools/plan_fingerprint.py --bench            # every bench headline query
    python tools/plan_fingerprint.py --sf sf0.01 name   # smaller data, same shapes
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def fingerprint(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    ops = re.findall(r"^[\s:+\-*]*([A-Za-z]+)", plan, re.M)
    # 'Scan' counts are format-noisy ("Scan parquet" vs "BatchScan"); drop them —
    # scan count never changes without a join/agg change showing up anyway.
    return dict(sorted(Counter(o for o in ops if o not in ("", "Scan")).items()))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="*", help="registered query names")
    ap.add_argument("--bench", action="store_true", help="fingerprint the bench headline set")
    ap.add_argument("--sf", default="sf0.1", help="testdata scale dir name")
    ap.add_argument("--testdata", default="/root/testdata", help="testdata root")
    args = ap.parse_args()

    from rugpull_data_pipeline_spark.session import get_spark
    from rugpull_data_pipeline_spark.plans import registry

    names = list(args.names)
    if args.bench:
        import bench

        names.extend(n for n in bench.HEADLINE if n not in names)
    if not names:
        ap.error("pass query names or --bench")

    sf_dir = os.path.join(args.testdata, args.sf)
    spark = get_spark(app_name="plan-fingerprint")
    for name in names:
        df = registry.get(name).builder(spark, sf_dir)
        print(name, fingerprint(df), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
