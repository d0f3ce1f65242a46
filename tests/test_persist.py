"""Table-layout contracts: partition pruning and shuffle-free bucketed joins
— the physical properties that hold the engine together at 100 TB."""

import pytest
from pyspark.sql import functions as F

from homemade_vector_db_spark.plans.explain import count_exchanges, physical_plan
from homemade_vector_db_spark.sources.persist import (
    read_table,
    write_bucketed,
    write_partitioned,
)
from homemade_vector_db_spark.sources.tables import load_documents, load_embeddings
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_documents(spark, SF_SMOKE)
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    back = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = physical_plan(back)
    # the lang filter must be a PartitionFilter (directory pruning),
    # not a row-level filter
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf_line
    assert back.count() == docs.where("lang = 'en'").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_embs_b")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directories survive; clear them or saveAsTable refuses
    for t in ("t_docs_b", "t_embs_b"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    docs = load_documents(spark, SF_SMOKE).select("doc_id", "lang")
    embs = load_embeddings(spark, SF_SMOKE).select(
        F.col("vec_id").alias("doc_id"), "label"
    )
    write_bucketed(docs, "t_docs_b", "doc_id", num_buckets=8)
    write_bucketed(embs, "t_embs_b", "doc_id", num_buckets=8)

    # disable auto-broadcast: at test scale Spark would broadcast the tiny
    # table (a BroadcastExchange), masking the property under test — at
    # real scale neither side fits a broadcast and bucketing is what
    # removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_docs_b").join(
            read_table(spark, "t_embs_b"), "doc_id"
        )
        # co-bucketed tables join without shuffling either side
        assert count_exchanges(joined) == 0
        assert joined.count() > 0

        # control: the same join on raw parquet needs exchanges
        raw = load_documents(spark, SF_SMOKE).select("doc_id", "lang").join(
            load_embeddings(spark, SF_SMOKE).select(
                F.col("vec_id").alias("doc_id"), "label"
            ),
            "doc_id",
        )
        assert count_exchanges(raw) > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    # groupBy on the bucket key reuses the bucketing — no shuffle
    agg = read_table(spark, "t_docs_b").groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert count_exchanges(agg) == 0


def test_write_partitioned_sorted_rowgroups(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from homemade_vector_db_spark.sources.persist import write_partitioned
    from homemade_vector_db_spark.sources.tables import load_documents
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE).repartition(2)
    out = str(tmp_path / "sorted_docs")
    write_partitioned(docs, out, ["lang"], sort_cols=["doc_id"])
    files = glob.glob(out + "/lang=*/*.parquet")
    assert files
    for f in files[:6]:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)  # min/max stats are selective per row group
    # round-trip content unchanged
    back = spark.read.parquet(out)
    assert back.count() == docs.count()


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from homemade_vector_db_spark.sources.persist import write_zordered
    from homemade_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    n_files = 8
    zpath = str(tmp_path / "events_z")
    write_zordered(ev, zpath, ["user_id", "value"], num_files=n_files)

    # linear baseline: sorted by user_id only — value is unclustered
    lpath = str(tmp_path / "events_linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def mean_span(path: str, col: str) -> float:
        spans, total = [], None
        files = glob.glob(path + "/*.parquet")
        assert len(files) >= n_files // 2
        for f in files:
            vals = pq.read_table(f, columns=[col])[col].to_pylist()
            if vals:
                spans.append(max(vals) - min(vals))
        glo = ev.agg(
            (F.max(col) - F.min(col)).alias("s")
        ).first()["s"]
        del total
        return sum(spans) / len(spans) / float(glo)

    # z-order: BOTH dimensions cluster (each file covers a fraction of
    # each axis); linear: the secondary column spans ~the full range in
    # every file, so min/max pruning on it is useless
    z_user, z_val = mean_span(zpath, "user_id"), mean_span(zpath, "value")
    l_val = mean_span(lpath, "value")
    assert z_user < 0.8
    assert z_val < 0.8
    assert z_val < l_val * 0.85

    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()


def test_zorder_key_validations(spark):
    from homemade_vector_db_spark.sources.persist import zorder_key
    from homemade_vector_db_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        zorder_key(ev, ["value"])
    with pytest.raises(ValueError):
        zorder_key(ev, ["user_id", "value"], bits=32)
