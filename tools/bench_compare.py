#!/usr/bin/env python3
"""Diff two bench.py JSON outputs: per-query ratios, worst regressions,
new/broken queries.  Usage:

    python3 tools/bench_compare.py OLD.json NEW.json [threshold]

Exit code 1 when any common query regressed beyond the threshold
(default 1.5x) — wire it after bench runs to make round-over-round
regressions a mechanical failure instead of a judge finding.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d.get("parsed"), dict):  # driver wrapper
        d = d["parsed"]
    return d.get("queries", {})


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    rows = []
    for name in common:
        o, n = old[name], new[name]
        if o <= 0 or n <= 0:
            rows.append((float("inf"), name, o, n, "BROKEN" if n <= 0 else "FIXED"))
            continue
        rows.append((n / o, name, o, n, ""))
    rows.sort(reverse=True)
    regressed = [r for r in rows if r[4] == "BROKEN" or (r[0] != float("inf") and r[0] > threshold)]
    print(f"common={len(common)} added={sorted(set(new) - set(old))}")
    print(f"removed={sorted(set(old) - set(new))}")
    print(f"\nworst ratios (new/old, threshold {threshold}x):")
    for ratio, name, o, n, tag in rows[:15]:
        flag = " <-- REGRESSED" if (tag == "BROKEN" or (ratio != float("inf") and ratio > threshold)) else ""
        print(f"  {name:40s} {o:8.2f} -> {n:8.2f}  {tag or f'{ratio:5.2f}x'}{flag}")
    tot_o = sum(v for v in (old[n] for n in common) if v > 0)
    tot_n = sum(v for v in (new[n] for n in common) if v > 0)
    print(f"\ncommon-query total: {tot_o:.1f}s -> {tot_n:.1f}s ({tot_n / max(tot_o, 1e-9):.2f}x)")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
