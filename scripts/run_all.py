"""Execute EVERY registry query at a chosen SF (no oracle — execution
smoke + timing sweep). Catches scale-dependent failures (ANSI overflow,
skew, memory) and slow-tail regressions that the sf0.01 oracle gate
cannot see.

Usage: [RUN_SF_DIR=/root/testdata/sf0.1] python scripts/run_all.py
Prints one line per query: name, rows, seconds; exits nonzero on error.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = os.environ.get("RUN_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    spark = get_spark(
        app_name="run-all",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    failures = []
    timings = []
    for name, fn in Q.registry().items():
        t0 = time.time()
        try:
            n = fn(spark, SF_DIR).count()
            dt = time.time() - t0
            release_transient()
            timings.append((dt, name))
            print(f"{name:34s} rows={n:<8d} {dt:6.2f}s", flush=True)
        except Exception:
            failures.append(name)
            print(f"{name:34s} FAILED", flush=True)
            traceback.print_exc()
    timings.sort(reverse=True)
    print("\nslowest:", ", ".join(f"{n}={t:.1f}s" for t, n in timings[:8]))
    if failures:
        print("FAILURES:", failures)
        return 1
    print(f"all {len(timings)} queries executed at {SF_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
