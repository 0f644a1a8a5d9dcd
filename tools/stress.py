#!/usr/bin/env python3
"""~sf1 stress rehearsal for the overflow/skew query class (r11,
VERDICT-r10 #3).

The sf0.1 sweep caught q301's Sigma-y^2 BIGINT overflow because the
gate scale grew; the next decade of that class (moment sums, rank
windows, IVM counters, CC/iterative frontiers, mergeable sketches)
needs ~sf1. This harness:

 1. derives a deterministic ~10x input from sf0.1 via graft.StressGen
    (self-union with consistent key remapping; /root/testdata is
    read-only so the derived tables live under /tmp);
 2. runs graft.Verify restricted to the stress FAMILY (the numeric /
    iterative / sketch classes named by the r10 verdict);
 3. replays each family oracle in DuckDB over the SAME derived tables
    (int128 arithmetic keeps the oracle exact while Spark-side Longs
    are the thing under test) via check_oracle's strict compare;
 4. writes a SWEEP-style artifact (default STRESS_r<N>.json).

    python3 tools/stress.py [srcSf] [stressDir] [outJson]

One sbt launch at a time — never run concurrently with another sbt.
Exit 0 iff every family query matches at the stress scale.
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time

# The overflow/skew class (VERDICT-r10 #3): moment sums & regressions,
# rank windows, aggregation folds, IVM counters, iterative fixpoints,
# quantile/cardinality sketches. Prefix-matched by graft.Verify.
FAMILY = [
    # moment sums / regression normal equations
    "q291", "q292", "q297", "q299", "q301", "q302", "q308", "q311", "q324",
    # rank windows / top-k
    "q07", "q08", "q23", "q26", "q61", "q71", "q329",
    # wide aggregation folds
    "q01", "q09", "q24",
    # IVM counters / staged maintenance
    "q131", "q336", "q339", "q347", "q363",
    # iterative fixpoints (HITS / IPF). q69 (connected components) is
    # deliberately NOT here: its oracle is the brute all-pairs cosine
    # replay — O(n^2 d) in DuckDB, feasible at sf0.1 only (and vector
    # replication makes every replica pair cosine-1.0, exploding the
    # edge set 100x on top). q69's own scale path is the banded LSH
    # family (q97/q161); it is not in the numeric-overflow class this
    # rehearsal targets.
    "q304", "q310",
    # sketches / quantiles
    "q58", "q66", "q118", "q288", "q337", "q342",
    # --- near-dup / banded classes (r12, VERDICT-r11 #8). The 10x
    # self-union is the REALISTIC hazard for this family: every doc
    # gains 9 exact replicas, so dup-group sizes, band-bucket fanout,
    # and shingle doc-frequencies all inflate 10x. Which oracle form
    # scales, per family:
    #  - exact/normalized dedup (q34/q35): full O(n) GROUP BY replay —
    #    scales linearly, stays exact;
    #  - signature near-dup (q36/q37): injected-dup CONTRACT oracles
    #    (equal sigs/bands, pair surfaced) — O(n) on the DuckDB side,
    #    the banded join stress lives on the Spark side;
    #  - segment/span dedup (q112/q160) and the curation pipeline
    #    (q152): full token-level recomputes — linear in total tokens
    #    plus bounded windows;
    #  - shingle inverted-index pairs (q38/q189): full replay with the
    #    SAME >256-doc stop-shingle cap mirrored on both sides, so the
    #    bucket self-join stays Sigma(bucket^2)-bounded even after the
    #    10x doc-frequency inflation.
    # STAYS OUT by design (all-pairs replays): q97 (oracle counts
    # brute all-pairs cosine over embeddings - O(n^2 d) at 20k vecs),
    # q39/q161 (same exact-cosine replay), q69 (see above).
    "q34", "q35", "q36", "q37", "q112", "q152", "q160", "q38", "q189",
    # --- ANN index families (r13, VERDICT-r12 #8): IVF, PQ, graph-beam,
    # the recall/param frontiers, and the delta-maintained IVF index —
    # the one operator family with no 10x evidence before this round.
    # All five carry in-query RECALL/EQUIVALENCE contracts computed
    # against an in-job brute-force ground truth (linear in corpus,
    # never an all-pairs DuckDB replay), so the oracle side stays cheap
    # at ~sf1 while the Spark side eats the 10x: replica ties at
    # cosine 1.0 are absorbed by the deterministic (cos desc, id)
    # tie-break both the index and brute paths share.
    "q44", "q107", "q210", "q331", "q338", "q340",
    # --- r14 restructured operators (VERDICT-r13 #9: every operator this
    # round touched that has a linear-cost oracle gets a 10x datapoint):
    # scd2 single-pass emit (q136/q333), recursion-input checkpoint
    # (q138), collect_set gram overlap (q166), parallelized binaryFile
    # staging (q124), single-sort page/footer models (q346/q361 — the
    # Hilbert model CTE is grid-bounded, scale-independent).
    "q124", "q136", "q138", "q166", "q333", "q346", "q361",
]


def run(cmd, cwd):
    return subprocess.run(cmd, cwd=cwd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    stress_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_stress/sf1"
    rnd = os.environ.get("GRAFT_ROUND")
    out_json = sys.argv[3] if len(sys.argv) > 3 else (
        f"STRESS_r{rnd}.json" if rnd else "STRESS.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # exact-prefix the subset with the "_" separator: a bare "q36"
    # also prefix-matches q360..q365 (r12: the manifest family rode
    # along and tripped its scale guard in a run that wasn't meant to
    # cover it — caught the q360 band-width bug, but the subset should
    # say what it means)
    subset = ",".join(p + "_" for p in FAMILY)

    t0 = time.time()
    gen = run(["sbt", "-batch",
               f"runMain graft.StressGen {src} {stress_dir} 10"], repo)
    gen_secs = round(time.time() - t0, 1)
    if gen.returncode != 0:
        print(gen.stdout[-4000:])
        print(f"[stress] StressGen failed rc={gen.returncode}")
        return 2

    verify_dir = tempfile.mkdtemp(prefix="graft_stressv_")
    t1 = time.time()
    ver = run(["sbt", "-batch",
               f"runMain graft.Verify {stress_dir} {verify_dir} {subset}"],
              repo)
    verify_secs = round(time.time() - t1, 1)
    spark_fails = sorted(set(
        re.findall(r"\[verify\] (\S+) failed:", ver.stdout)))

    t2 = time.time()
    chk = run([sys.executable, os.path.join(repo, "tools", "check_oracle.py"),
               stress_dir, verify_dir], repo)
    oracle_secs = round(time.time() - t2, 1)

    # FILE-COUNT stress (r13, VERDICT-r12 #5): the manifest family's
    # scale axis is files, not rows — graft.StressManifest builds a
    # 10^3-file layout through prepublishSlices + deltaRelation
    # (compactEvery) and pins O(1) build jobs, bounded serve legs,
    # zero-footer repeat lookups, and kept-scan == full-scan. One JSON
    # verdict line folded into the artifact below.
    t3 = time.time()
    sm = run(["sbt", "-batch", "runMain graft.StressManifest 1000"], repo)
    manifest_secs = round(time.time() - t3, 1)
    manifest_fc = None
    for line in sm.stdout.splitlines():
        if line.startswith('{"family":"manifest_filecount"'):
            try:
                manifest_fc = json.loads(line)
            except ValueError:
                pass
    if manifest_fc is None:
        manifest_fc = {"family": "manifest_filecount", "ok": False,
                       "error": f"no verdict line (rc={sm.returncode})",
                       "tail": sm.stdout[-2000:]}
    manifest_fc["secs"] = manifest_secs

    statuses = {}
    for line in chk.stdout.splitlines():
        m = re.match(r"^(q\S+): (.+)$", line)
        if m and any(m.group(1).startswith(p + "_") or m.group(1) == p
                     for p in FAMILY):
            statuses[m.group(1)] = m.group(2)
    n_ok = sum(1 for v in statuses.values() if v.startswith("OK"))
    artifact = {
        "src": src,
        "stress_dir": stress_dir,
        "factor": 10,
        "family": FAMILY,
        "n_family": len(statuses),
        "n_ok": n_ok,
        "spark_failures": spark_fails,
        "mismatches": {k: v for k, v in statuses.items()
                       if not v.startswith("OK")},
        "statuses": statuses,
        "manifest_filecount": manifest_fc,
        "gen_secs": gen_secs,
        "verify_secs": verify_secs,
        "oracle_secs": oracle_secs,
    }
    with open(os.path.join(repo, out_json), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"[stress] {n_ok}/{len(statuses)} family queries match at ~sf1 "
          f"(gen {gen_secs}s, verify {verify_secs}s, oracle {oracle_secs}s); "
          f"manifest_filecount ok={manifest_fc.get('ok')} "
          f"({manifest_secs}s) -> {out_json}")
    if spark_fails:
        print(f"[stress] spark failures: {spark_fails}")
    return 0 if (n_ok == len(statuses) and not spark_fails
                 and len(statuses) > 0
                 and manifest_fc.get("ok") is True) else 1


if __name__ == "__main__":
    sys.exit(main())
