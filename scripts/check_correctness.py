"""Local replica of the driver's correctness gate.

Runs every `queries()` entry on Spark at sf0.01 and its `oracle_sql()` twin
on DuckDB over the same parquet, then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted by all
values, floats as written — both sides round inside the query).

Usage: python scripts/check_correctness.py [--json OUT.json] [name ...]

With --json, writes driver-format rows ({rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}) for the checked queries —
used to produce the standing CORRECTNESS_sf0.1.json artifact
(CHECK_SF_DIR=/root/testdata/sf0.1).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import os as _os
SF_DIR = _os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        # normalize int-like (spark long vs duckdb int32/hugeint) to int64
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as ent
    from homemade_vector_db_spark.session import get_spark, release_transient

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    # --warm: one untimed warmup call per entry before the timed run, so
    # first-touch derived-state builds (parquet cache, _materialized
    # artifacts, session caches) don't masquerade as entry cost in the
    # standing artifact's spark_sec telemetry — the same policy
    # scale_audit.py and bench.py already apply (r11 measured lang_id at
    # 21.3 s cold vs 0.6 s steady-state from exactly this effect).
    warm = "--warm" in args
    if warm:
        args.remove("--warm")
    only = set(args)
    spark = get_spark(app_name="correctness-check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = ent.queries()
    oracles = ent.oracle_sql()
    # maxsim_token_topk's oracle reads the repo-derived token-vector
    # fixture with the sf0.01 basename hardwired (the driver's
    # correctness SF); when checking another SF, generate that SF's
    # fixture and rewrite the basename so both engines read it.
    base = _os.path.basename(SF_DIR.rstrip("/"))
    if base != "sf0.01":
        from homemade_vector_db_spark.sources import tokenvec

        tokenvec.ensure_token_fixture(SF_DIR)
        src = tokenvec.token_fixture_path("/root/testdata/sf0.01")
        dst = tokenvec.token_fixture_path(SF_DIR)
        oracles = {k: v.replace(src, dst) for k, v in oracles.items()}
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if warm:
            fn(spark, SF_DIR).count()
        t0 = time.time()
        spark_pdf = fn(spark, SF_DIR).toPandas()
        t_spark = time.time() - t0
        release_transient()
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(spark_pdf)} rows  ({t_spark:.1f}s)")
            continue
        ora_pdf = con.execute(oracles[name]).df()
        a, b = norm_frame(spark_pdf), norm_frame(ora_pdf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_hash = ok_rows and ok_cols and value_hash(a) == value_hash(b)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        records[name] = {
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "spark_rows": len(a),
            "oracle_rows": len(b),
            "spark_sec": round(t_spark, 2),
            "err": None,
        }
        print(
            f"  {name:28s} {status} rows={len(a)}/{len(b)} cols={ok_cols} "
            f"hash={ok_hash}  ({t_spark:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            print(f"    spark cols: {list(a.columns)}  oracle cols: {list(b.columns)}")
            merged = a.merge(b, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(12).to_string())
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump({"sf_dir": SF_DIR, "queries": records}, f, indent=2)
        print(f"wrote {json_out}")
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall checked queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
