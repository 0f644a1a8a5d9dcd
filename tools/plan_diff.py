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

Plan-flip classification (r7): some queries are ALLOWED to change
physical strategy when the data's statistics move (AQE skew splits,
broadcast-vs-SMJ threshold crossings on derived intermediates); others
must stay shape-stable because every join side is explicitly hinted or
dimension-sized. The classification is derived EMPIRICALLY — run Bench
at two scale factors and diff the plan hashes:

    python3 tools/plan_diff.py --classify sf001_bench.json sf01_bench.json
    # writes tools/plan_classes.json: hash differs across SF =>
    # "stats-dependent", same => "stable"

The normal diff mode then annotates every changed plan with its class,
so "AQE doing its job" separates from regressions at a glance:
stats-dependent flips print as allowed; stable flips print as REVIEW.

Outlier surfacing (r7): --ratios prints per-query new/old time ratios
normalized by the run's median ratio (the uniform-contention divisor),
so genuine stragglers (q226-class) self-identify even when the whole
run is uniformly slower or faster:

    python3 tools/plan_diff.py --ratios old.json new.json
"""
import json
import os
import sys

CLASSES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plan_classes.json")


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("plans", {}), d.get("queries", {})


# Queries OBSERVED to flip physical strategy on regenerated same-SF
# data (r6: plan hash moved with zero source change — AQE/size
# estimates crossed a threshold). The cross-SF diff can't see these
# (same hash at both SFs on any ONE dataset), so they are pinned
# stats-dependent by observation. Keep this list short and dated.
OBSERVED_FLIPS = {
    "q220_nearest_station": "r6: regenerated sf0.1 moved AQE choice",
    "q221_radius_pairs": "r6: regenerated sf0.1 moved AQE choice",
    "q229_grid_density": "r6: regenerated sf0.1 moved AQE choice",
}


def classify(path_a, path_b, out_path=CLASSES_PATH):
    """Two bench artifacts at DIFFERENT scale factors -> class map."""
    plans_a, _ = load(path_a)
    plans_b, _ = load(path_b)
    classes = {}
    for q in sorted(set(plans_a) | set(plans_b)):
        if q not in plans_a or q not in plans_b:
            classes[q] = "unknown"
        elif plans_a[q] != plans_b[q]:
            classes[q] = "stats-dependent"
        else:
            classes[q] = "stable"
    for q in OBSERVED_FLIPS:
        if classes.get(q) == "stable":
            classes[q] = "stats-dependent"
    with open(out_path, "w") as f:
        json.dump({"_note": "derived by plan_diff.py --classify from "
                            "bench runs at two scale factors; "
                            "stats-dependent = plan hash moved with the "
                            "data, so cross-round flips are AQE/stats "
                            "doing their job; stable = every strategy "
                            "is pinned, a flip means review",
                   "classes": classes}, f, indent=1, sort_keys=True)
    n = sum(1 for v in classes.values() if v == "stats-dependent")
    print(f"wrote {out_path}: {len(classes)} queries, "
          f"{n} stats-dependent, "
          f"{sum(1 for v in classes.values() if v == 'stable')} stable")
    return 0


def load_classes():
    try:
        with open(CLASSES_PATH) as f:
            return json.load(f).get("classes", {})
    except (OSError, ValueError):
        return {}


def ratios(path_old, path_new):
    _, old_t = load(path_old)
    _, new_t = load(path_new)
    common = sorted(set(old_t) & set(new_t))
    rs = {q: new_t[q] / old_t[q] for q in common if old_t[q] > 0}
    if not rs:
        print("no common timed queries")
        return 0
    med = sorted(rs.values())[len(rs) // 2]
    print(f"median ratio {med:.3f} (the uniform-contention divisor); "
          f"normalized outliers beyond 2x:")
    flagged = [(q, r / med) for q, r in rs.items()
               if r / med > 2.0 or r / med < 0.5]
    for q, nr in sorted(flagged, key=lambda x: -x[1]):
        print(f"  {q}: normalized {nr:.2f}x "
              f"({old_t[q]:.2f}s -> {new_t[q]:.2f}s)")
    if not flagged:
        print("  none — every per-query drift is within 2x of the "
              "run-wide median")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--classify":
        if len(args) != 3:
            print(__doc__.strip())
            return 2
        return classify(args[1], args[2])
    if args and args[0] == "--ratios":
        if len(args) != 3:
            print(__doc__.strip())
            return 2
        return ratios(args[1], args[2])
    if len(args) != 2:
        print(__doc__.strip())
        return 2
    old_plans, old_times = load(args[0])
    new_plans, new_times = load(args[1])
    classes = load_classes()
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
            cls = classes.get(q)
            tag = {"stats-dependent": "  [stats-dependent: allowed]",
                   "stable": "  [stable: REVIEW]"}.get(cls, "")
            print(f"  {q}: {old_plans[q]} -> {new_plans[q]}{dt}{tag}")
        review = [q for q in changed if classes.get(q) == "stable"]
        if classes:
            print(f"{len(review)} of {len(changed)} flips are in "
                  f"shape-stable queries and need review"
                  + (f": {', '.join(review)}" if review else ""))
    else:
        print(f"no plan changes across {len(common)} common queries")
    if added:
        print(f"{len(added)} added: {', '.join(added)}")
    if removed:
        print(f"{len(removed)} removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
