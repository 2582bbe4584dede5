#!/usr/bin/env python
"""Promote the plan fingerprints of the latest bench capture
(BENCH_LOCAL.json["plan_sha"], written by bench.py) to the committed
baseline PLAN_FINGERPRINTS.json.

Run this ONLY after adjudicating every changed fingerprint in PLANS.md
— tests/test_plan_fingerprints.py fails any sha that changed without a
PLANS.md entry naming the new value (r09 verdict task 2)."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)
    shas = bench.get("plan_sha")
    if not shas:
        sys.exit("BENCH_LOCAL.json carries no plan_sha — run bench.py first")
    baseline_path = os.path.join(ROOT, "PLAN_FINGERPRINTS.json")
    old: dict = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            old = json.load(f).get("plan_sha", {})
    changed = {k: (old[k], v) for k, v in shas.items() if k in old and old[k] != v}
    for name, (was, now) in sorted(changed.items()):
        print(f"changed: {name}: {was} -> {now}")
    out = {
        "sf": bench.get("sf"),
        "n_queries": len(shas),
        "plan_sha": dict(sorted(shas.items())),
    }
    with open(baseline_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {baseline_path}: {len(shas)} fingerprints, {len(changed)} changed")


if __name__ == "__main__":
    main()
