"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> name [name ...]
  suffix: 'before' or 'after'  (PLAN_TAG env overrides the dir, default r13)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homemade_vector_db_spark import queries as Q
from homemade_vector_db_spark.session import get_spark, release_transient

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLAN_TAG", "r13")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="hvdb-plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.registry()
    for name in names:
        df = registry[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        release_transient()
        print(f"dumped {name}_{suffix}")
    spark.stop()


if __name__ == "__main__":
    main()
