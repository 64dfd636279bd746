"""Plan-fingerprint diff between two BENCH_r*.json artifacts.

    python tools/fp_diff.py BENCH_r08.json BENCH_r09.json

Prints the headline queries whose executed-plan fingerprint changed (or
that appear/disappear), and exits 0 iff nothing changed among queries
present in BOTH artifacts. A bench delta with an EMPTY fp-diff is
environmental by construction; a non-empty diff names the plans to audit
(SCALE.md bench-drift policy, automated per the round-8 verdict).
Artifacts from rounds before fingerprints (no "plan_fp" key) compare as
all-absent — the tool reports that rather than failing.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    fa, fb = a.get("plan_fp", {}), b.get("plan_fp", {})
    if not fa:
        print(f"{sys.argv[1]}: no plan_fp key (pre-fingerprint artifact)")
    if not fb:
        print(f"{sys.argv[2]}: no plan_fp key (pre-fingerprint artifact)")
    changed = sorted(
        n for n in set(fa) & set(fb) if fa[n] != fb[n]
    )
    only_a = sorted(set(fa) - set(fb))
    only_b = sorted(set(fb) - set(fa))
    for n in changed:
        print(f"CHANGED {n}: {fa[n]} -> {fb[n]}")
    for n in only_a:
        print(f"ONLY-IN-{sys.argv[1]} {n}")
    for n in only_b:
        print(f"ONLY-IN-{sys.argv[2]} {n}")
    if not changed:
        print(f"fp-diff empty over {len(set(fa) & set(fb))} shared queries")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main())
