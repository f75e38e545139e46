"""Measure bpe_train wall time vs merge-round count R.

The naive shape re-derives the whole merge chain per round (O(R^2)
expression work); the incremental shape keeps the segmented vocab
materialized and applies only the newest merge (O(R)). This script records
the growth curve at a few R values so PLANS.md carries a measured number,
not a claim.

Usage: python scripts/bench_bpe_rounds.py [sf_dir] [R ...]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from sparkstract.operators.bpe import bpe_train  # noqa: E402
from sparkstract.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = [int(a) for a in sys.argv[2:]] or [6, 12, 24, 48]
    spark = get_spark("local[8]", app="bpe-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm the JVM/codegen path once
    bpe_train(docs, merges=2)
    out = {}
    for r in rounds:
        t0 = time.monotonic()
        model = bpe_train(docs, merges=r)
        dt = time.monotonic() - t0
        out[r] = round(dt, 2)
        print(f"R={r:4d}  {dt:7.2f}s  learned={len(model)}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "seconds_by_rounds": out}))
    spark.stop()


if __name__ == "__main__":
    main()
