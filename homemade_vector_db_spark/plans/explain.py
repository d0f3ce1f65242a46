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


def executed_shuffle_details(df: DataFrame) -> list[dict]:
    """Per-shuffle-exchange metrics of the EXECUTED plan: a list of
    {partitioning, bytes, records} — runs the query (collect) first so
    the SQL metrics are populated, then walks the adaptive plan tree
    through QueryStage / ReusedExchange wrappers.

    This turns "this operator never shuffles the text column" from a
    docstring claim into an assertable contract: plan-shape tests pin
    WHERE exchanges are, this pins HOW MUCH flows through them.
    Note: bytes are post-compression (lz4), so assertions should leave
    generous margins.
    """
    df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "ShuffleExchangeExec":
            row = {"partitioning": node.outputPartitioning().toString(),
                   "bytes": 0, "records": 0}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "shuffleBytesWritten":
                    row["bytes"] = int(kv._2().value())
                elif kv._1() == "shuffleRecordsWritten":
                    row["records"] = int(kv._2().value())
            out.append(row)
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name == "ReusedExchangeExec":
            # metrics belong to the original exchange; do not double count
            return
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def executed_shuffle_stats(df: DataFrame) -> tuple[int, int]:
    """(total shuffle bytes, total shuffle records) of the executed plan."""
    rows = executed_shuffle_details(df)
    return sum(r["bytes"] for r in rows), sum(r["records"] for r in rows)
