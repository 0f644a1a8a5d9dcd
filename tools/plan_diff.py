#!/usr/bin/env python3
"""Diff the canonicalized-plan hashes between two bench_out.json files.

Bench records an 8-hex md5 of each query's canonicalized optimized plan
(warm-up pass), so unintended plan drift between rounds is visible in
seconds instead of requiring a per-query .explain review:

    python3 tools/plan_diff.py <old_bench_out.json> <new_bench_out.json>
    # e.g. against a past round's committed artifact:
    git show 59e18bc:bench_out.json > /tmp/r4.json
    python3 tools/plan_diff.py /tmp/r4.json bench_out.json

Prints queries whose plan hash changed (with the timing delta for
context), plus added/removed queries. Exit code 0 always — plan changes
are often intentional; this is a review aid, not a gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("plans", {}), d.get("queries", {})


def main():
    if len(sys.argv) != 3:
        print(__doc__.strip())
        return 2
    old_plans, old_times = load(sys.argv[1])
    new_plans, new_times = load(sys.argv[2])
    common = sorted(set(old_plans) & set(new_plans))
    changed = [q for q in common if old_plans[q] != new_plans[q]]
    added = sorted(set(new_plans) - set(old_plans))
    removed = sorted(set(old_plans) - set(new_plans))
    if changed:
        print(f"{len(changed)} plan(s) changed:")
        for q in changed:
            dt = ""
            if q in old_times and q in new_times:
                dt = f"  ({old_times[q]:.2f}s -> {new_times[q]:.2f}s)"
            print(f"  {q}: {old_plans[q]} -> {new_plans[q]}{dt}")
    else:
        print(f"no plan changes across {len(common)} common queries")
    if added:
        print(f"{len(added)} added: {', '.join(added)}")
    if removed:
        print(f"{len(removed)} removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
