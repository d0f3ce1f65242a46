"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship exact k-NN on sf0.001.
`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2, defined side-by-side in homemade_vector_db_spark/queries.py so
literals, aliases and rounding stay in lockstep with the DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from homemade_vector_db_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.q_knn_exact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.registry()


def oracle_sql() -> dict[str, str]:
    return _q.oracles()
