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

Plan-flip classification (r8 rework): some queries are ALLOWED to
change plan hash when the data moves — they embed DATA-DERIVED content
in the optimized logical plan (collected BPE merge tables, bloom-filter
bytes, pivot distinct-value order, per-round iterative depth, session
variables). Others must stay hash-stable: a flip means review. The
classification is derived EMPIRICALLY from PlanDump probe directories
(each holds one .plan text per query — the exact string planSignature
hashes):

    sbt "runMain graft.PlanDump <sfDir> /tmp/probeA"
    SPARK_GRAFT_MAXPART=1048576 sbt "runMain graft.PlanDump <sfDir> /tmp/probeB"
    sbt "runMain graft.PlanDump <otherSfDir> /tmp/probeC"
    python3 tools/plan_diff.py --classify-dirs /tmp/probeA /tmp/probeB /tmp/probeC
    # writes tools/plan_classes.json: plan text differs across ANY pair
    # of probes => "stats-dependent", identical everywhere => "stable"

This replaces the r7 two-SF bench-hash probe, which conflated genuine
data-dependence with a hash-noise artifact: signature v2 was sensitive
to Catalyst's commutative operand order, which follows expression
hashCodes, which embed the per-JVM ExprId.jvmId UUID — so ANY two runs
in different JVMs could flip hashes with identical code, data, and
stats (reproduced on 7 of the 9 r7 REVIEW-flagged queries with two
identical-config runs). Signature v3 (Graft.planScrub: per-line ATOM
multisets) is invariant to operand reorder; v2 and v3 hashes are not
comparable — diff r8+ artifacts against r8+ artifacts only. Signature
v4 (r9) additionally maps operator symbols to named atoms (a `>` vs
`<=` flip now changes the hash — under v3 it did not); v3 and v4
hashes are likewise not comparable, so diff r9+ against r9+.

Stall guard (r9): Bench re-times suspects (3-pass span > 3x, or median
> 5x the committed same-sf reference) once in isolation after the full
run and records them under "stalls"; --ratios reports those separately
with a host-stall / REVIEW verdict based on the isolated time. Older
artifacts without "stalls"/"passes" fields remain fully supported.

The normal diff mode annotates every changed plan with its class:
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


# Queries pinned stats-dependent by direct observation, keyed by
# REGISTRY NAME (classify warns on keys that match no probed query —
# the r6 pins silently no-op'd on a misspelled name, per ADVICE r7).
# Emptied in r8: the r6 "regenerated sf0.1 moved AQE choice" entries
# (q220_nearest_station, q221_radius_pairs, and a misspelled
# grid-density key) predate signature v3 and are unattributable — the
# flips they recorded are consistent with the per-JVM commutative-order
# hash noise that v3 eliminates, and the v3 perturbation probes show
# all three queries hash-stable. Re-add entries here ONLY with a v3
# reproduction.
OBSERVED_FLIPS = {
    # q232_chi_square's pin retired in r12: the r8/r11 intermittent flip
    # was root-caused to the canonicalized exprId<->attribute binding
    # permuting across runs (same atom multiset, #1/#2L vs #1L/#2 —
    # judge-diffed on the two committed r11 captures) and scrub v6 now
    # drops the ordinals, which unifies ALL observed variants (validated
    # against both committed r11 texts + 6 fresh probes incl. the 1MB
    # maxPartitionBytes perturbation and an sf change). Nothing is
    # currently pinned.
}


def classify_dirs(dirs, out_path=CLASSES_PATH):
    """N PlanDump output dirs (same code, perturbed data/layout) ->
    class map: .plan text differs across any pair => stats-dependent."""
    plan_sets = {}
    for d in dirs:
        for fn in os.listdir(d):
            if fn.endswith(".plan"):
                q = fn[:-5]
                with open(os.path.join(d, fn)) as f:
                    plan_sets.setdefault(q, set()).add(f.read())
    classes = {q: ("stats-dependent" if len(texts) > 1 else "stable")
               for q, texts in sorted(plan_sets.items())}
    for q in OBSERVED_FLIPS:
        if q not in classes:
            print(f"WARNING: OBSERVED_FLIPS key '{q}' matches no probed "
                  f"query — fix the name or drop the pin")
        elif classes[q] == "stable":
            classes[q] = "stats-dependent"
    with open(out_path, "w") as f:
        json.dump({"_note": "derived by plan_diff.py --classify-dirs "
                            "from PlanDump probe dirs (same code; "
                            "perturbed split size and scale factor); "
                            "stats-dependent = the optimized plan "
                            "embeds data-derived content, cross-round "
                            "flips are expected; stable = plan text "
                            "identical across every probe, a flip "
                            "means review. Signature v5 (r10).",
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
    floors = set()
    stalls = {}  # r9: Bench's isolated re-times for stall suspects
    for p in (path_old, path_new):
        try:
            with open(p) as f:
                d = json.load(f)
            floors |= set(d.get("floors", []))
            if p == path_new:
                # "stalls"/"passes" are r9+ fields; older artifacts
                # simply lack them (both formats stay loadable)
                stalls = d.get("stalls", {}) or {}
        except (OSError, ValueError):
            pass
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
    plan_sig = [(q, nr) for q, nr in flagged
                if q not in floors and q not in stalls]
    floor_sig = [(q, nr) for q, nr in flagged if q in floors]
    for q, nr in sorted(plan_sig, key=lambda x: -x[1]):
        print(f"  {q}: normalized {nr:.2f}x "
              f"({old_t[q]:.2f}s -> {new_t[q]:.2f}s)")
    if not plan_sig:
        print("  none — every per-query drift is within 2x of the "
              "run-wide median")
    if stalls:
        print(f"{len(stalls)} stall-tagged quer(ies) — Bench's in-run "
              f"guard re-timed each in isolation after the full run; "
              f"judge the ISOLATED time, the median sat in a host "
              f"stall window:")
        for q, iso in sorted(stalls.items()):
            base = (f"{old_t[q]:.2f}s -> median {new_t[q]:.2f}s"
                    if q in old_t and q in new_t else "new query")
            verdict = ""
            if q in old_t and iso > 0:
                nr = (iso / old_t[q]) / med if old_t[q] > 0 else 0
                verdict = (" [host stall confirmed]" if nr <= 2.0
                           else " [REVIEW: slow even isolated]")
            print(f"  [stall] {q}: {base}, isolated {iso:.2f}s{verdict}")
    if floor_sig:
        print(f"{len(floor_sig)} floor-tagged rig(s) excluded from "
              f"triage (streaming wall-clock floors track host "
              f"contention, not plans):")
        for q, nr in sorted(floor_sig, key=lambda x: -x[1]):
            print(f"  [floor] {q}: normalized {nr:.2f}x "
                  f"({old_t[q]:.2f}s -> {new_t[q]:.2f}s)")
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--classify-dirs":
        if len(args) < 3:
            print(__doc__.strip())
            return 2
        return classify_dirs(args[1:])
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
