"""Attribute the round-4 +22% like-for-like headline drift (VERDICT r4,
"What's wrong" #1).

headline_r3_final.json (53.3s) and headline_r4.json (65.2s) were recorded
days apart on a shared VM; the regression concentrated in code that did
not change between the two HEADs (similarity.py untouched). This script
removes the time-of-day confound: it checks out the three HEADs of record
into throwaway worktrees and runs `python bench.py` in each, INTERLEAVED
(A,B,C, A,B,C, ...) so any VM-level drift hits all three equally, then
reports per-HEAD medians. If the r3/r4 medians land within the documented
±10% band of each other, the drift was environment noise; if r4 stays
slower on the same queries back-to-back, the cause is in the session /
import path (the only same-query code that changed).

Usage: python scripts/bench_drift.py [rounds=3]
Writes BENCH/drift/run_<head>_<i>.json and BENCH/drift/summary.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HEADS = [
    ("r3", "b1d7915"),   # round-3 final code HEAD (headline_r3_final.json)
    ("r4", "35dbdcb"),   # round-4 final code HEAD (headline_r4.json)
    ("r5", "HEAD"),      # current
]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "drift")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.makedirs(OUT, exist_ok=True)
    trees = {}
    for tag, ref in HEADS:
        wt = f"/tmp/drift_{tag}"
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
        subprocess.run(["git", "worktree", "add", "--force", "--detach",
                        wt, ref], cwd=REPO, check=True, capture_output=True)
        trees[tag] = wt

    results: dict[str, list[dict]] = {t: [] for t, _ in HEADS}
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    for i in range(rounds):
        for tag, _ in HEADS:
            p = subprocess.run([sys.executable, "bench.py"],
                               cwd=trees[tag], env=env,
                               capture_output=True, text=True)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("{")][-1]
            rec = json.loads(line)
            results[tag].append(rec)
            with open(f"{OUT}/run_{tag}_{i}.json", "w") as f:
                f.write(line + "\n")
            print(f"[drift] round {i} {tag}: {rec['value']}s "
                  f"(warmup {rec['extra']['warmup_sec']}s)", flush=True)

    # per-HEAD medians over the SHARED query set (r3's set is the subset)
    shared = set(results["r3"][0]["queries"])
    for t in results:
        shared &= set(results[t][0]["queries"])
    summary: dict = {"rounds": rounds, "shared_queries": sorted(shared)}
    for tag in results:
        runs = results[tag]
        summary[tag] = {
            "totals": [r["value"] for r in runs],
            "warmups": [r["extra"]["warmup_sec"] for r in runs],
            "median_total": round(statistics.median(
                r["value"] for r in runs), 3),
            "median_shared_total": round(statistics.median(
                sum(r["queries"][q] for q in shared) for r in runs), 3),
            "median_queries": {
                q: round(statistics.median(
                    r["queries"][q] for r in runs), 3)
                for q in sorted(results[tag][0]["queries"])},
        }
    with open(f"{OUT}/summary.json", "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("shared_queries",)},
                     default=str)[:2000], flush=True)
    for tag in trees:
        subprocess.run(["git", "worktree", "remove", "--force", trees[tag]],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
