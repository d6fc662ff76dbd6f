"""Oracle parity for registry entries PAST the driver gate's 50-entry
recording window.

The driver's correctness gate hashes only the first 50 ``queries()``
entries; the registry deliberately parks subsumed variants past the
cap (see the ordering comment in ``__spark_entry__.queries``). Each of
those still has an ``oracle_sql()`` — this test runs exactly that set
through ``scripts/check_oracle.py --past-cap`` so dropping a query
from the gated window never removes its only correctness check.

Marked ``pastcap`` (runs by default; ``-m 'not pastcap'`` skips it
for quick loops). Runs in a subprocess: check_oracle owns its own
SparkSession, which must not collide with the suite's session fixture.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.pastcap
def test_past_cap_queries_match_oracles():
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "8"
    sf = env.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "--past-cap", sf],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900)
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, \
        f"past-cap oracle check failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "FAILURES: none" in proc.stdout
