"""Per-query profiling for the bench headline set (guide §1: measure first).

For each headline entry: one untimed pre-build pass (same policy as
bench.py), then a warmup, then N timed runs. Records per query:

- min/median wall seconds,
- number of Spark jobs launched by one run (job-group delta),
- executed-plan node counts: Exchange, BatchEvalPython/ArrowEvalPython/
  MapInArrow/FlatMapGroupsInPandas, SortMergeJoin/BroadcastHashJoin/
  ShuffledHashJoin/BroadcastNestedLoopJoin/CartesianProduct,
  WholeStageCodegen spans, AQEShuffleRead.

Writes JSON to $PROFILE_OUT (default /tmp/profile_queries.json).
Usage: python scripts/profile_queries.py [name ...]   (default: full headline)
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))
OUT = os.environ.get("PROFILE_OUT", "/tmp/profile_queries.json")

NODE_PATTERNS = {
    "exchange": re.compile(r"\bExchange\b"),
    "py_eval": re.compile(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas|PythonMapInArrow)\b"
    ),
    "smj": re.compile(r"\bSortMergeJoin\b"),
    "bhj": re.compile(r"\bBroadcastHashJoin\b"),
    "shj": re.compile(r"\bShuffledHashJoin\b"),
    "bnlj": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
    "codegen": re.compile(r"\*\(\d+\)"),
    "aqeread": re.compile(r"\bAQEShuffleRead\b"),
    "sort": re.compile(r"\bSort\b"),
}


def plan_counts(df) -> dict:
    # executedPlan AFTER execution reflects AQE's final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {}
    for k, pat in NODE_PATTERNS.items():
        out[k] = len(pat.findall(plan))
    out["codegen"] = len(set(NODE_PATTERNS["codegen"].findall(plan)))
    return out


def main() -> None:
    names = sys.argv[1:]
    import bench  # reuse the bench HEADLINE list

    if not names:
        names = list(bench.HEADLINE)
    spark = get_spark(
        app_name="hvdb-profile",
        cpus=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    registry = Q.registry()

    # pre-build pass (bench.py policy: derived state + JIT untimed)
    for name in names:
        registry[name](spark, SF_DIR).collect()
        release_transient()

    results = {}
    for name in names:
        fn = registry[name]
        fn(spark, SF_DIR).collect()  # warmup
        release_transient()
        samples = []
        jobs = None
        pc = None
        for i in range(RUNS):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)  # type: ignore[arg-type]
            samples.append(dt)
            if i == 0:
                tracker = sc.statusTracker()
                jobs = len(tracker.getJobIdsForGroup(group))
                pc = plan_counts(df)
            release_transient()
        results[name] = {
            "min_sec": round(min(samples), 4),
            "med_sec": round(statistics.median(samples), 4),
            "jobs": jobs,
            **(pc or {}),
        }
        print(
            f"{name:35s} min={min(samples):7.3f} jobs={jobs:3d} "
            f"exch={pc['exchange']:2d} py={pc['py_eval']} smj={pc['smj']} "
            f"sort={pc['sort']}",
            flush=True,
        )
    spark.stop()
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
