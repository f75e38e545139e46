"""The full local correctness gate, pinned in CI (VERDICT r3 item 9).

The driver's per-round CORRECTNESS run samples ~50 of the queries() map;
this wrapper runs scripts/check_oracle.py — the same Spark-vs-DuckDB
value/dtype/row comparison — over EVERY query at sf0.01 so the
driver-unsampled entries can never silently rot. Subprocess isolation
keeps its Spark session (local[8], its own shuffle config) out of the
suite's shared session. Named test_zz_* so the slow gate runs after the
unit tests under pytest's alphabetical collection; skipped when the
driver-generated testdata is absent (the gate is meaningless without it).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.mark.skipif(not os.path.isdir(SF_DIR),
                    reason=f"no driver testdata at {SF_DIR}")
def test_every_query_matches_its_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py"),
         SF_DIR],
        cwd=REPO, capture_output=True, text=True, timeout=1800)
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, (
        f"oracle gate failed (exit {proc.returncode}):\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}")
    assert "ALL OK" in proc.stdout, tail
