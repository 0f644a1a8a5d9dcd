#!/usr/bin/env python3
"""Standing full-registry oracle sweep at sf0.1 (r10, VERDICT-r9 #5).

The r9 sweep caught q301's Sigma-y^2 BIGINT overflow at 600k rows —
an sf0.01-invisible bug class (SURVEY 5.8). This script codifies the
sweep as a per-round gate the judge can verify without re-running:

    python3 tools/sweep.py [sfDir] [outJson]
    # defaults: /root/testdata/sf0.1  SWEEP_r<N?>.json (N from env
    # GRAFT_ROUND, else "SWEEP.json")

It (1) runs the FULL graft.Verify at the sweep scale (one sbt launch —
never run concurrently with another sbt), (2) replays every oracle in
DuckDB via check_oracle's strict compare (columns sorted by name,
exact cells, signed-zero-aware), and (3) writes a machine-readable
artifact: per-query status plus the pass/total summary.

Exit code 0 iff every oracle-backed query matches.
"""
import json
import os
import re
import subprocess
import sys
import tempfile
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rnd = os.environ.get("GRAFT_ROUND")
    default_out = f"SWEEP_r{rnd}.json" if rnd else "SWEEP.json"
    out_json = sys.argv[2] if len(sys.argv) > 2 else default_out
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verify_dir = tempfile.mkdtemp(prefix="graft_sweep_")

    t0 = time.time()
    rc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {verify_dir}"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    verify_secs = round(time.time() - t0, 1)
    # per-query Spark failures surface as "[verify] <name> failed: ..."
    spark_fails = sorted(set(
        re.findall(r"\[verify\] (\S+) failed:", rc.stdout)))

    chk = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "check_oracle.py"),
         sf_dir, verify_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    statuses = {}
    for line in chk.stdout.splitlines():
        m = re.match(r"^(q\S+): (.+)$", line)
        if m:
            statuses[m.group(1)] = m.group(2)
    n_ok = sum(1 for v in statuses.values() if v.startswith("OK"))
    artifact = {
        "sf": sf_dir,
        "n_oracle": len(statuses),
        "n_ok": n_ok,
        "verify_secs": verify_secs,
        "spark_failures": spark_fails,
        "mismatches": {k: v for k, v in sorted(statuses.items())
                       if not v.startswith("OK")},
        "statuses": dict(sorted(statuses.items())),
    }
    with open(os.path.join(repo, out_json), "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{n_ok}/{len(statuses)} match at {sf_dir} "
          f"(verify {verify_secs}s) -> {out_json}")
    if artifact["mismatches"]:
        for k, v in artifact["mismatches"].items():
            print(f"  MISMATCH {k}: {v}")
    # 0/0 is a FAILED gate, not a green one: a wholesale sbt death
    # (concurrent sbt, compile error) produces no statuses and no
    # per-query failure lines — the gate must not report success when
    # it never ran.
    if rc.returncode != 0 or not statuses:
        print(f"GATE DID NOT RUN: sbt rc={rc.returncode}, "
              f"{len(statuses)} statuses")
        return 1
    return 0 if (n_ok == len(statuses) and not spark_fails) else 1


if __name__ == "__main__":
    sys.exit(main())
