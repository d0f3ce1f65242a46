"""Physical-plan inspection helpers.

The scale contract of every operator is a plan property, not a code
property: filters must reach the parquet scan (PushedFilters), global
top-k must plan as TakeOrderedAndProject (partition-local heaps, no full
sort), small dims must broadcast. tests/test_plans.py pins these so a
refactor that silently de-optimizes a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in a parquet PushedFilters list."""
    plan = physical_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def has_operator(df: DataFrame, name: str) -> bool:
    return name in physical_plan(df)


def codegen_operators(df: DataFrame) -> list[str]:
    """Operator names participating in whole-stage codegen (the `*(n)`
    prefix in the executed plan / `[codegen id : n]` in formatted)."""
    import re

    out = []
    for line in simple_plan(df).splitlines():
        m = re.match(r"\s*(?:[+:]-\s*)?\*\(\d+\)\s+(\w+)", line)
        if m:
            out.append(m.group(1))
    return out


def count_exchanges(df: DataFrame) -> int:
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
    )
